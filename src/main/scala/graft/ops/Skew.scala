package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys. AQE's skew-join handling covers
  * joins at runtime; for aggregations over pathological key distributions
  * (one user/domain producing a large fraction of 100 TB), two-stage salted
  * aggregation keeps every task bounded: stage 1 aggregates on
  * (key, salt ∈ [0, factor)), stage 2 merges the `factor` partials per key.
  * Correct for any algebraic aggregate expressed as (partial, merge) pair.
  */
object Skew {

  /** Two-stage salted sum/count aggregation. `partials` maps output column
    * name → (stage-1 expression over rows, stage-2 merge over partials). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partials: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (e, _)) => e.as(n) }.toSeq: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._2._2(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (n, (_, m)) => m(col(n)).as(n) }.toSeq: _*)
  }

  /** Salted exact count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltFactor: Int = 16): DataFrame =
    saltedAgg(df, keys, saltFactor,
      Map("n" -> (count(lit(1)), (c: Column) => sum(c).cast("long"))))

  /** Salted exact sum per key (decimal-exact, order-independent). */
  def saltedSum(df: DataFrame, valueCol: String, keys: Seq[String],
                saltFactor: Int = 16): DataFrame =
    saltedAgg(df, keys, saltFactor,
      Map("total" -> (
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(25, 6))),
        (c: Column) => sum(c).cast("double"))))
}
