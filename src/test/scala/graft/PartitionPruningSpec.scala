package graft

import graft.queries.Q

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition pruning on date-laid-out tables — at 100 TB a time-range query
  * must touch only the partitions inside the range, not list-then-filter
  * the whole table. This spec lays the events table out as a real pipeline
  * would (`partitionBy(event_date)`), runs a range query, and asserts the
  * file scan selected only the in-range partition directories. */
class PartitionPruningSpec extends SparkSpec {

  private def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec in the plan")
    scans.map(_.selectedPartitions.partitionCount).sum
  }

  test("date-range filters prune the partitioned scan to matching dates") {
    // AQE wraps stages in leaf QueryStageExec nodes the plan collect can't
    // see through; pruning itself is AQE-independent, so assert without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-part").toString
      Q.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)

      val part = spark.read.parquet(out)
      val allDates = scannedPartitions(part.groupBy("event_type").count())
      assert(allDates > 3, s"fixture should span >3 dates, saw $allDates")

      val oneDate = part
        .filter(col("event_date") === part.select(min("event_date"))
          .head().getDate(0))
        .groupBy("event_type").count()
      assert(scannedPartitions(oneDate) == 1,
        s"equality filter must scan exactly 1 partition:\n" +
          oneDate.queryExecution.executedPlan)

      // dynamic pruning shape: the date filter arrives via a dimension-table
      // join (dim has the selective predicate DPP requires), so the fact
      // scan's partition filter can only be injected at runtime
      val dimPath = java.nio.file.Files.createTempDirectory("graft-dim")
        .toString
      part.select(col("event_date").as("d")).distinct()
        .withColumn("keep",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("d"))))
        .coalesce(1)
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("keep") === 1)
      val joined = part.join(dim, col("event_date") === col("d"))
        .groupBy("event_type").count()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"dimension-join date filter should inject a runtime partition " +
          s"filter:\n$planStr")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
