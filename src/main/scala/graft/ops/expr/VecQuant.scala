package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Quantized-integer vector arithmetic — the determinism contract of the
  * oracle-checked ANN family, at codegen'd long-arithmetic speed.
  *
  * Every float component is mapped to `floor(x · 2²⁴)` — one IEEE double
  * multiply by a power of two (exact: a pure exponent shift) and one floor,
  * so the quantized value is a deterministic function of the input bits that
  * any engine replays with `CAST(floor(CAST(x AS DOUBLE) * 16777216) AS
  * BIGINT)`. Dot products, norms, and squared distances over the quantized
  * components are then EXACT 64-bit integer sums — associative, order- and
  * engine-independent — which is the whole contract the previous
  * DECIMAL(30,15) higher-order-function folds bought, minus their per-element
  * Decimal allocations (the round-4 bench showed those folds costing 24 s
  * across the four LSH/IVF queries at sf0.1).
  *
  * Overflow audit at dim ≤ 512, |x| < 1: |q| < 2²⁴, pair products < 2⁴⁸,
  * Σ over 512 < 2⁵⁷; plane weights |w| ≤ 7 keep weighted sums < 2³⁶;
  * squared diffs < 2⁵⁰ sum to < 2⁵⁹ — all inside Long. The final
  * long→double conversion (for cosine division) is itself exactly-rounded
  * IEEE, hence also engine-independent.
  */
object VecQuant {

  /** Quantization scale: 2²⁴. */
  val Scale: Double = 16777216.0

  /** Driver-side quantizer (seed centroids, specs). */
  def q(x: Double): Long = math.floor(x * Scale).toLong

  private def elemQ(arr: ArrayData, i: Int, isFloat: Boolean): Long = {
    val d = if (arr.isNullAt(i)) 0.0
            else if (isFloat) arr.getFloat(i).toDouble
            else arr.getDouble(i)
    math.floor(d * Scale).toLong
  }

  /** Σ q(aᵢ)·q(bᵢ) — quantized dot (b = a gives the squared quantized norm). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += elemQ(a, i, aFloat) * elemQ(b, i, bFloat)
      i += 1
    }
    acc
  }

  /** Σ wᵢ·q(aᵢ) — integer-weighted quantized projection (LSH planes). */
  def wdot(a: ArrayData, w: ArrayData, aFloat: Boolean): Long = {
    val n = math.min(a.numElements(), w.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (if (w.isNullAt(i)) 0L else w.getLong(i)) * elemQ(a, i, aFloat)
      i += 1
    }
    acc
  }

  /** Σ (q(aᵢ) − cᵢ)² — squared distance to an already-quantized centroid. */
  def dist2(a: ArrayData, c: ArrayData, aFloat: Boolean): Long = {
    val n = math.min(a.numElements(), c.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = elemQ(a, i, aFloat) - (if (c.isNullAt(i)) 0L else c.getLong(i))
      acc += d * d
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.GraftBridge

  def dotColumn(a: Column, b: Column): Column =
    GraftBridge.column(
      VecQuantDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def wdotColumn(a: Column, w: Column): Column =
    GraftBridge.column(
      VecQuantWDot(GraftBridge.expression(a), GraftBridge.expression(w)))

  def dist2Column(a: Column, c: Column): Column =
    GraftBridge.column(
      VecQuantDist2(GraftBridge.expression(a), GraftBridge.expression(c)))
}

abstract class VecQuantBinary extends BinaryExpression {
  override def dataType: DataType = LongType

  protected def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  protected def isLongArr(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Σ q(aᵢ)·q(bᵢ) over two float/double vectors. */
case class VecQuantDot(left: Expression, right: Expression) extends VecQuantBinary {
  private def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double>, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    VecQuant.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.expr.VecQuant.dot($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_qdot"
}

/** Σ wᵢ·q(aᵢ): left a float/double vector, right an integer weight array. */
case class VecQuantWDot(left: Expression, right: Expression) extends VecQuantBinary {
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isLongArr(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> and array<long>, " +
        s"got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, w: Any): Any =
    VecQuant.wdot(a.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData], leftIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, w) =>
      s"graft.ops.expr.VecQuant.wdot($a, $w, $leftIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantWDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_qwdot"
}

/** Σ (q(aᵢ) − cᵢ)²: left a float/double vector, right a quantized centroid. */
case class VecQuantDist2(left: Expression, right: Expression) extends VecQuantBinary {
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isLongArr(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> and array<long>, " +
        s"got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, c: Any): Any =
    VecQuant.dist2(a.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], leftIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, c) =>
      s"graft.ops.expr.VecQuant.dist2($a, $c, $leftIsFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantDist2 =
    copy(left = l, right = r)

  override def prettyName: String = "vec_qdist2"
}
