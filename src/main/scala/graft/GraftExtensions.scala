package graft

import graft.ops.expr.Fnv1a64

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * into the SQL function registry, so `spark.sql("SELECT fnv1a64(id)")`
  * works next to the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.fnv1a64Descriptor)
  }
}

object GraftExtensions {
  private val fnv1a64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("fnv1a64"),
    new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "fnv1a64 takes exactly one argument")
      Fnv1a64(children.head)
    })

  /** Imperative registration onto a live session (the extensions class
    * covers sessions built with `spark.sql.extensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      fnv1a64Descriptor._1, fnv1a64Descriptor._2, fnv1a64Descriptor._3)
}
