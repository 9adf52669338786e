package graft

import graft.queries.Q

import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables — at 100 TB the fact⋈fact join is
  * the dominant shuffle; pre-bucketing both sides on the join key makes it
  * a zero-exchange merge. This spec proves the engine produces that plan:
  * the bucketed join's physical plan contains NO ShuffleExchange, while the
  * plain parquet join does. */
class BucketingSpec extends SparkSpec {

  /** Count shuffle exchanges below the join (exclude the final single
    * aggregation exchange) in the executed adaptive plan. */
  private def joinShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE settles on the final plan
    val plan = df.queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(plan).size
  }

  test("bucketed fact join plans with zero shuffle exchanges") {
    // force the shuffle path (broadcast would hide the comparison)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Q.tbl(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Q.tbl(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    val bucketed = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plain = Q.tbl(spark, sfDir, "lineitem")
      .join(Q.tbl(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))

    try {
      assert(joinShuffles(plain) >= 2, "plain join should shuffle both inputs")
      assert(joinShuffles(bucketed) == 0,
        s"bucketed join still shuffles: ${bucketed.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
