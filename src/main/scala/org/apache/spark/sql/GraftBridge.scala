package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters, needed
  * to expose native Catalyst expressions (e.g. [[graft.ops.expr.Fnv1a64]]) as
  * user-facing `Column`s on Spark 4's implementation-agnostic Column API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
