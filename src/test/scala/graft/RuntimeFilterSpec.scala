package graft

/** Runtime (Bloom-filter) join pruning: when a fact-fact shuffle join has a
  * selective filter on one side, Catalyst can inject a Bloom filter built
  * from the filtered side into the OTHER side's scan, so most of the big
  * side is dropped before the shuffle — at 100 TB this is the difference
  * between shuffling the whole lineitem table and shuffling the ~1% of it
  * that can possibly join. This spec pins that the engine's plans are
  * SHAPED so the optimizer can do this: an equi shuffle join with a
  * pushed-down selective predicate, no expression on the join key.
  */
class RuntimeFilterSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("selective fact-fact join gets a runtime bloom filter on the big side") {
    val conf = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture tables are tiny — the application side must normally be
      // ≥ 10 GB for injection to pay; drop that MINIMUM so the decision
      // exercises the PLAN SHAPE, not the size gate (creationSideThreshold
      // is a MAXIMUM on the build side and the fixture is far under it)
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // the q_tpch_q4 shape: date-pruned orders joined to lineitem on the
      // orderkey both sides already hash by
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered result is still correct
      val n = joined.count()
      val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(spark.read.parquet(s"$sfDir/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == expected, s"bloom-filtered join changed the result: $n vs $expected")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
