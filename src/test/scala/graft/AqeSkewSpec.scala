package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime complement of the static salting
  * operators (q_agg_salted / q_join_salted): at 100 TB a hot key inflates
  * one shuffle partition by orders of magnitude, and AQE must split it
  * into parallel sub-partitions at runtime instead of letting one task
  * straggle. This spec builds a deliberately skewed join (one key holds
  * ~half the fact side), lowers the skew thresholds to fixture scale, and
  * asserts the executed sort-merge join actually marked the skewed side. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scale thresholds: a partition is "skewed" past 64 KB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~half the fact rows share key 0; dim side is uniform
      val fact = spark.range(0, 200000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id" % 1000).as("k"),
          concat(lit("payload-"), $"id").as(("payload")))
      val dim = spark.range(0, 1000)
        .select($"id".as("k"), concat(lit("dim-"), $"id").as("d"))
      val joined = fact.join(dim, "k")
        .groupBy("d").agg(count(lit(1)).as("n"))
      // collect() executes THIS DataFrame's own QueryExecution (count()
      // would plan a separate query and leave this one isFinalPlan=false)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected the SMJ to mark the skewed side (skew=true):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
