package graft

import graft.ops.expr.{Fnv1a64, SimHash64}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * into the SQL function registry, so `spark.sql("SELECT fnv1a64(id)")`
  * works next to the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def unary(name: String, clazz: Class[_],
                    make: Expression => Expression): Descriptor = (
    new FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"$name takes exactly one argument")
      make(children.head)
    })

  private val descriptors: Seq[Descriptor] = Seq(
    unary("fnv1a64", classOf[Fnv1a64], Fnv1a64(_)),
    unary("simhash64", classOf[SimHash64], SimHash64(_)))

  /** Imperative registration onto a live session (the extensions class
    * covers sessions built with `spark.sql.extensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
