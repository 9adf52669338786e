package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash over a string's UTF-8 bytes.
  *
  * This is the Qdrant sink's point-id scheme in the reference
  * (reference: internal/sink/qdrant/qdrant.go:174-179): external ids are
  * hashed to u64 point ids. Implemented as a native Catalyst expression with
  * whole-stage codegen (a static-call `defineCodeGen`, the same pattern
  * Spark's own `XxHash64` uses) so id hashing never breaks a codegen span.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.Fnv1a64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)

  override def prettyName: String = "fnv1a64"
}

object Fnv1a64 {
  private final val Offset = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** Runtime kernel shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = fold(Offset, s)

  def hash(s: String): Long = hash(UTF8String.fromString(s))

  /** Continue an FNV-1a fold from an intermediate state — lets callers
    * precompute a salt-prefix state once and stream suffixes through it
    * (`fold(fold(Offset, prefix), suffix) == hash(prefix + suffix)`). */
  def fold(state: Long, s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = state
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def column(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(Fnv1a64(GraftBridge.expression(c)))
  }
}
