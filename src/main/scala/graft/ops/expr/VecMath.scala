package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic over `ARRAY<FLOAT|DOUBLE>` columns.
  *
  * The HOF formulations (`aggregate`/`zip_with`) are codegen'd but build an
  * intermediate products array per row per call; ranking paths evaluate them
  * per candidate pair (LSH/IVF/near-dup verify — SURVEY.md §2.3 Group C), so
  * the allocation cost multiplies by the candidate count. These kernels are
  * the same double-accumulator arithmetic in a flat loop over the unsafe
  * array data, no intermediates.
  *
  * Element semantics: the loop runs over the common prefix of the two
  * arrays and null elements contribute 0 — embedding columns are
  * fixed-dimension with non-null elements, so both conditions are
  * unreachable there. The exact-DECIMAL forms used by oracle-checked
  * queries (VectorOps.dotExact/l2normExact) stay HOF-based on purpose:
  * their cost is the determinism contract, not the loop shape.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes() =
    if (isVec(left.dataType) && isVec(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType} and ${right.dataType}")

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Σ aᵢ·bᵢ in double accumulation. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.expr.VecMath.dot($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dot"
}

/** Σ (aᵢ-bᵢ)² in double accumulation. */
case class VecDist2(left: Expression, right: Expression) extends VecBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.expr.VecMath.dist2($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDist2 =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dist2"
}

object VecMath {

  private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (arr.isNullAt(i)) 0.0
    else if (isFloat) arr.getFloat(i).toDouble
    else arr.getDouble(i)

  /** Runtime kernel shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    acc
  }

  def dist2(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = elem(a, i, aFloat) - elem(b, i, bFloat)
      acc += d * d
      i += 1
    }
    acc
  }

  def dotColumn(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  def dist2Column(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VecDist2(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
