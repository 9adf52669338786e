package graft

import java.sql.Timestamp

import graft.stream.{ClickEvt, IntervalJoin, ViewEvt}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join: split-replay equivalence with the batch
  * twin, and watermark-driven late-data eviction. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fixtures: (Seq[ViewEvt], Seq[ClickEvt]) = {
    // Q.events normalizes whichever physical ts type this fixture
    // generation carries (nanos-as-long or µs NTZ) to an instant timestamp
    val ev = graft.queries.Q.events(spark, sfDir)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"event_id".as("view_id"),
        $"ts".as("v_ts")).as[ViewEvt].collect().toSeq
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"ts".as("c_ts")).as[ClickEvt].collect().toSeq
    (views, clicks)
  }

  test("two-micro-batch replay == batch twin on the fixture events") {
    val (views, clicks) = fixtures
    // split by TIME (not id): batch 2 holds only events after the median
    // instant, so nothing in it is ever behind the post-batch-1 watermark
    // (30 min) and the inner join must reproduce the batch result exactly
    val cut = (views.map(_.v_ts.getTime) ++ clicks.map(_.c_ts.getTime))
      .sorted.apply((views.size + clicks.size) / 2)
    val vMem = MemoryStream[ViewEvt](spark)
    val cMem = MemoryStream[ClickEvt](spark)
    val q = IntervalJoin.attribute(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    vMem.addData(views.filter(_.v_ts.getTime <= cut))
    cMem.addData(clicks.filter(_.c_ts.getTime <= cut))
    q.processAllAvailable()
    vMem.addData(views.filter(_.v_ts.getTime > cut))
    cMem.addData(clicks.filter(_.c_ts.getTime > cut))
    q.processAllAvailable()
    val streamed = spark.table("attrib_out")
      .select("user_id", "click_id", "view_id")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()

    val batch = IntervalJoin.attributeBatch(
        views.toDF(), clicks.toDF())
      .select("user_id", "click_id", "view_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture must produce at least one attribution")
    assert(streamed == batch)
  }

  test("views behind the watermark are evicted, not joined") {
    val t0 = Timestamp.valueOf("2024-06-01 00:00:00")
    def at(min: Long) = new Timestamp(t0.getTime + min * 60000L)
    val vMem = MemoryStream[ViewEvt](spark)
    val cMem = MemoryStream[ClickEvt](spark)
    val q = IntervalJoin.attribute(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("attrib_late")
      .outputMode("append").start()
    // batch 1 pushes event time to t0+120min → watermark t0+90min
    vMem.addData(Seq(ViewEvt(1L, 100L, at(120))))
    cMem.addData(Seq(ClickEvt(2L, 200L, at(120))))
    q.processAllAvailable()
    // batch 2: a view and click pair 2h BEHIND the watermark — a batch
    // join would match them (5 min apart); the stream must drop both
    vMem.addData(Seq(ViewEvt(3L, 101L, at(0))))
    cMem.addData(Seq(ClickEvt(3L, 201L, at(5))))
    q.processAllAvailable()
    val out = spark.table("attrib_late").collect()
    q.stop()
    assert(!out.exists(_.getLong(0) == 3L),
      "late pair behind the watermark must be evicted, not joined")
  }
}
