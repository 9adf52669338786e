package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance by Myers' bit-parallel algorithm (Myers,
  * JACM 1999) with Hyyrö's block extension for patterns longer than one
  * machine word (Hyyrö, 2003) — bit-identical to Spark's built-in
  * `levenshtein` (unit-cost edits over Unicode code points), at
  * O(⌈m/64⌉·n) word operations instead of the O(m·n) cell-by-cell dynamic
  * program: one 64-row stripe of the DP matrix advances per instruction.
  *
  * This is q_edit_verify's verification kernel: its candidate pairs are
  * near-identical documents (token-set Jaccard ≥ 0.95), so the kernel cost
  * is ~|text|² per distinct representative pair and dominates the query's
  * CPU at every scale. The bit-parallel form cuts that per-pair constant
  * ~40-60× for fixture-sized documents while computing the identical
  * integer (LevenshteinMyersSpec pins equality against the built-in on
  * randomized unicode inputs across the word-boundary lengths and on
  * fixture text pairs).
  *
  * Semantics matched to the built-in: distance over CODE POINTS (a
  * surrogate pair is one edit unit), null-intolerant via nullSafeEval,
  * empty sides degenerate to the other side's length.
  */
case class LevenshteinMyers(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"levenshtein_myers requires two string arguments, " +
          s"got ${left.dataType} and ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinMyers.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.expr.LevenshteinMyers.distance($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LevenshteinMyers =
    copy(left = l, right = r)

  override def prettyName: String = "levenshtein_myers"
}

object LevenshteinMyers {

  /** Runtime kernel shared by interpreted eval and generated code. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    if (a.equals(b)) return 0
    val ca = codePoints(a.toString)
    val cb = codePoints(b.toString)
    // pattern = shorter side (fewer bit-vector blocks); distance is symmetric
    val (p, t) = if (ca.length <= cb.length) (ca, cb) else (cb, ca)
    val m = p.length
    val n = t.length
    if (m == 0) return n
    if (m <= 64) single(p, t) else blocked(p, t)
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Single-word Myers (m ≤ 64): the textbook formulation. Peq lookups go
    * through a direct-indexed array for ASCII code points (the dominant
    * case — one unboxed load per text char) with a HashMap fallback for
    * the rest. */
  private def single(p: Array[Int], t: Array[Int]): Int = {
    val m = p.length
    val ascii = new Array[Long](128)
    var peq: java.util.HashMap[Integer, java.lang.Long] = null
    var i = 0
    while (i < m) {
      val cp = p(i)
      if (cp < 128) ascii(cp) |= 1L << i
      else {
        if (peq == null) peq = new java.util.HashMap[Integer, java.lang.Long]()
        val prev = peq.get(cp: Integer)
        peq.put(cp, (if (prev == null) 0L else prev.longValue()) | (1L << i))
      }
      i += 1
    }
    val last = 1L << (m - 1)
    var vp = -1L
    var vn = 0L
    var score = m
    var j = 0
    while (j < t.length) {
      val c = t(j)
      val eq =
        if (c < 128) ascii(c)
        else if (peq == null) 0L
        else { val b = peq.get(c: Integer); if (b == null) 0L else b.longValue() }
      val xv = eq | vn
      val xh = (((eq & vp) + vp) ^ vp) | eq
      var ph = vn | ~(xh | vp)
      var mh = vp & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      vp = mh | ~(xv | ph)
      vn = ph & xv
      j += 1
    }
    score
  }

  /** Blocked Myers/Hyyrö (m > 64): per text character the horizontal
    * delta hin ∈ {-1, 0, +1} chains bottom-up through ⌈m/64⌉ blocks; the
    * score delta is read from the LAST block at the pattern-end bit
    * (information in a block only flows upward — left shifts and addition
    * carries — so the unused high bits of a partial last block never
    * contaminate the score bit). */
  private def blocked(p: Array[Int], t: Array[Int]): Int = {
    val m = p.length
    val blocks = (m + 63) >>> 6
    val lastBits = m - ((blocks - 1) << 6) // 1..64
    val scoreBit = 1L << (lastBits - 1)
    // Peq: char -> per-block position masks. ASCII code points (the
    // dominant case) index a flat [128 × blocks] array — one unboxed load
    // per (text char, block) — with a HashMap fallback for the rest.
    val ascii = new Array[Long](128 * blocks)
    var peq: java.util.HashMap[Integer, Array[Long]] = null
    var i = 0
    while (i < m) {
      val cp = p(i)
      if (cp < 128) ascii(cp * blocks + (i >>> 6)) |= 1L << (i & 63)
      else {
        if (peq == null) peq = new java.util.HashMap[Integer, Array[Long]]()
        var masks = peq.get(cp: Integer)
        if (masks == null) { masks = new Array[Long](blocks); peq.put(cp, masks) }
        masks(i >>> 6) |= 1L << (i & 63)
      }
      i += 1
    }
    val vp = new Array[Long](blocks)
    val vn = new Array[Long](blocks)
    java.util.Arrays.fill(vp, -1L)
    var score = m
    var j = 0
    while (j < t.length) {
      val c = t(j)
      val asciiBase = if (c < 128) c * blocks else -1
      val masks =
        if (c < 128 || peq == null) null
        else peq.get(c: Integer)
      var hin = 1 // boundary row: D[0][j] − D[0][j−1] = +1
      var b = 0
      while (b < blocks) {
        var eq =
          if (asciiBase >= 0) ascii(asciiBase + b)
          else if (masks == null) 0L
          else masks(b)
        val xv = eq | vn(b)
        if (hin < 0) eq |= 1L
        val xh = (((eq & vp(b)) + vp(b)) ^ vp(b)) | eq
        var ph = vn(b) | ~(xh | vp(b))
        var mh = vp(b) & xh
        val outBit = if (b == blocks - 1) scoreBit else java.lang.Long.MIN_VALUE
        var hout = 0
        if ((ph & outBit) != 0L) hout = 1
        else if ((mh & outBit) != 0L) hout = -1
        ph = ph << 1
        mh = mh << 1
        if (hin < 0) mh |= 1L
        else if (hin > 0) ph |= 1L
        vp(b) = mh | ~(xv | ph)
        vn(b) = ph & xv
        hin = hout
        b += 1
      }
      score += hin
      j += 1
    }
    score
  }

  def column(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(LevenshteinMyers(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
