package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q_range_join and q_range_join_agg both declare the count/sum-per-order
  * contract, and since round 15 both REGISTER the calendar-bounded
  * pre-aggregated plan (per-day count/sum pushed BELOW the join, day table
  * broadcast — GroupB.rangeJoinDayAggPlan). The generic pair-level bucketed
  * equi-join they were proven against lives HERE as an inline reference
  * implementation: this spec pins the registered plan bit-for-bit against
  * it, so the equivalence evidence survives the plan swap. Decimal day
  * sums make the fold exact, so this is an equality pin, not a tolerance
  * check. Verified at two fixture scales so a day-boundary defect (the
  * explode probe set vs the residual range filter) can't hide in a single
  * calendar.
  */
class RangeJoinAggSpec extends SparkSpec {

  /** The pair-level bucketed range join (the pre-round-15 registered plan
    * of q_range_join): 2-day time-axis buckets turn the interval join into
    * an equi-join on bucket with the exact range predicate as a residual
    * filter — the shape a workload needing the PAIR ROWS would run. */
  private def pairLevelReference(dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity"),
        datediff(col("l_shipdate").cast("date"), epoch).as("lday"))
      .withColumn("lbucket", floor(col("lday") / 2))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).as("oday"))
      .withColumn("obucket", explode(array_distinct(array(
        floor(col("oday") / 2), floor((col("oday") + 1) / 2)))))
    ord.join(li,
        col("obucket") === col("lbucket") &&
          col("lday") >= col("oday") && col("lday") < col("oday") + 2,
        "left")
      .groupBy("o_orderkey")
      .agg(queries.Q.big(count(col("lday"))).as("n_items"),
        coalesce(queries.Q.dsum(col("l_quantity")), lit(0.0)).as("total_qty"))
      .orderBy("o_orderkey")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"registered day-agg plan matches the pair-level reference on $dir") {
      val ref = rows(pairLevelReference(dir))
      val rj = rows(SparkEntry.queries("q_range_join")(spark, dir))
      val agg = rows(SparkEntry.queries("q_range_join_agg")(spark, dir))
      assert(ref.nonEmpty)
      assert(rj == ref)
      assert(agg == ref)
      // at least one urgent order must actually have shipments in-window,
      // or the agreement is vacuous (both all-zero)
      assert(ref.exists(_._2 > 0L))
    }
  }
}
