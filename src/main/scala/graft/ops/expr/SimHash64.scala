package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token array, as one native codegen'd kernel.
  *
  * Semantics are bit-identical to the HOF formulation it replaces
  * (DedupOps.simhash): per token, `xxhash64(token)` with Spark's default
  * seed 42; counter k gets +1 when bit k of the hash is set, else -1; output
  * bit k is set iff counter k ≥ 0 (so an empty array yields all-ones). The
  * HOF form built a 64-long intermediate array per token per row
  * (O(tokens·64) allocations inside `aggregate`/`zip_with`); this kernel is
  * the same arithmetic in a flat loop with one 64-int scratch array per row,
  * inside whole-stage codegen — the SimHash signature pass stops dominating
  * the near-dup pipeline.
  *
  * SimHash itself models the reference's sanctioned near-dup extension
  * surface (SURVEY.md §2.3 Group C, q_dedup_simhash).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Spark's xxhash64 default seed (XxHash64 expression). */
  private final val Seed = 42L

  /** Runtime kernel shared by interpreted eval and generated code. A null
    * token contributes hash = Seed — exactly the HOF form's `xxhash64(t)`,
    * where a null child leaves the running hash at its seed. */
  def hash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) Seed
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        }
      var k = 0
      while (k < 64) {
        counts(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) >= 0) out |= (1L << k)
      k += 1
    }
    out
  }

  def column(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  }
}
