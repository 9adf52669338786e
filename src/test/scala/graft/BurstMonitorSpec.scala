package graft

import graft.stream.{BurstMonitor, BurstRow, MinuteArrival}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming burst detector vs the registered batch query: the keyed-state
  * transition must reproduce q_burst_detect's exact integer contract, both
  * as a one-pass batch twin (flush) and streamed across micro-batch splits
  * (where only each key's open tail minute may still be pending). */
class BurstMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def row(r: BurstRow) = (r.key, r.mi, r.c, r.trail_sum, r.is_burst)

  /** Fixture arrivals, event-time ordered (the replay-from-log regime). */
  private lazy val arrivals: Seq[MinuteArrival] =
    SparkEntry.queries("q_burst_detect")(spark, sfDir)
      .selectExpr("event_type", "mi", "c").collect()
      .flatMap(r => Seq.fill(r.getLong(2).toInt)(
        MinuteArrival(r.getString(0), r.getLong(1))))
      .sortBy(_.mi)

  private lazy val batchExpected: Set[(String, Long, Long, Long, Long)] =
    SparkEntry.queries("q_burst_detect")(spark, sfDir)
      .selectExpr("event_type", "mi", "c", "trail_sum", "is_burst")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  test("batch twin reproduces q_burst_detect exactly") {
    val got = BurstMonitor.monitorBatch(arrivals.toDS()).collect().map(row).toSet
    assert(got == batchExpected,
      s"batch twin diverged: ${(got diff batchExpected).take(3)} / " +
        s"${(batchExpected diff got).take(3)}")
  }

  test("streamed monitor matches the batch result up to each key's open tail") {
    val (first, second) = arrivals.splitAt(arrivals.size / 2)
    val mem = MemoryStream[MinuteArrival](spark)
    val q = BurstMonitor.monitor(mem.toDS())
      .writeStream.format("memory").queryName("burst_out")
      .outputMode("append").start()
    mem.addData(first); q.processAllAvailable()
    mem.addData(second); q.processAllAvailable()
    val streamed = spark.table("burst_out").as[BurstRow].collect().map(row).toSet
    q.stop()
    // the open tail: each key's max finalized-by-flush minute never closes
    // in the stream (no later minute arrives to seal it)
    val tails = batchExpected.groupBy(_._1).values
      .map(_.maxBy(_._2)).toSet
    assert(streamed == batchExpected -- tails,
      s"stream diverged: extra=${(streamed -- batchExpected).take(3)} " +
        s"missing=${(batchExpected -- tails -- streamed).take(3)}")
    // every emitted row appeared exactly once (append mode, no re-emission)
    assert(spark.table("burst_out").count() == streamed.size)
  }

  test("late rows are dropped and counted, state stays bounded") {
    val rows = Seq(MinuteArrival("k", 100), MinuteArrival("k", 101),
      MinuteArrival("k", 102))
    val (out1, s1) = BurstMonitor.transition("k", rows.iterator,
      BurstMonitor.empty, flush = false)
    assert(out1.map(_.mi) == Seq(100L, 101L)) // 102 stays open
    val (out2, s2) = BurstMonitor.transition("k",
      Iterator(MinuteArrival("k", 50), MinuteArrival("k", 103)), s1,
      flush = false)
    assert(out2.map(_.mi) == Seq(102L)) // 103 opens, 102 seals; 50 is late
    assert(s2._4 == 1L, "late arrival not counted")
    assert(s2._2.size <= BurstMonitor.TrailMinutes, "ring unbounded")
    // a long in-order stream never grows state: 1000 minutes, one pass
    val long = (0L until 1000L).map(m => MinuteArrival("k", m))
    val (_, s3) = BurstMonitor.transition("k", long.iterator,
      BurstMonitor.empty, flush = false)
    assert(s3._2.size <= BurstMonitor.TrailMinutes && s3._3.size == 1,
      s"state grew: ring=${s3._2.size} open=${s3._3.size}")
  }
}
