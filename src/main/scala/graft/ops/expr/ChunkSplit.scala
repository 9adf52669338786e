package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a payload (the rsync/LBFS storage-dedup
  * splitter): a chunk boundary falls after byte i when the FNV-1a hash of
  * the trailing 8-byte window satisfies hash ≡ 0 (mod 32) — so boundaries
  * move WITH the content and an insertion does not shift every later
  * chunk, unlike fixed-offset framing. Returns the chunk strings between
  * consecutive boundaries (first chunk starts at byte 0, last ends at the
  * payload end; expected chunk length = 32 bytes).
  *
  * Native expression rather than a SQL `aggregate` lambda because FNV
  * needs WRAPPING 64-bit multiplication, which ANSI mode (Spark 4's
  * default) rejects in expression arithmetic; the kernel is also one flat
  * byte pass instead of per-position array slices. An external SQL engine
  * replays the same arithmetic in 128-bit integers (see q_chunk_dedup's
  * oracle), so the split is cross-engine checkable.
  */
case class ChunkSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_split requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    ChunkSplit.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.ChunkSplit.split($c)")

  override protected def withNewChildInternal(newChild: Expression): ChunkSplit =
    copy(child = newChild)

  override def prettyName: String = "chunk_split"
}

object ChunkSplit {
  private final val Offset = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L
  private final val Window = 8
  private final val Mask = 32

  /** Runtime kernel shared by interpreted eval and generated code. */
  def split(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var lo = 0
    var i = Window // boundary candidate AFTER byte i-1 (window bytes[i-8..i-1])
    while (i <= n) {
      var h = Offset
      var k = i - Window
      while (k < i) {
        h ^= (bytes(k) & 0xffL)
        h *= Prime
        k += 1
      }
      if (java.lang.Math.floorMod(h, Mask.toLong) == 0L) {
        out.add(UTF8String.fromBytes(bytes, lo, i - lo))
        lo = i
      }
      i += 1
    }
    if (lo < n) out.add(UTF8String.fromBytes(bytes, lo, n - lo))
    new GenericArrayData(out.toArray)
  }

  def column(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ChunkSplit(GraftBridge.expression(c)))
  }
}
