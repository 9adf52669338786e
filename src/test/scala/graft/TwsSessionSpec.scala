package graft

import graft.stream.{ClosedSession, SessionEvent, SessionMaterializer}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState session materialization: timer-driven closes against
  * hand-built timelines, and closed-session equality with the batch
  * q_sessionize rule on fixture events. */
class TwsSessionSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = SessionMaterializer.DefaultGapUs // 30 min
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run a list of micro-batches of (user, event-second) through the
    * materializer with a zero-delay watermark; returns closed sessions. */
  private def run(name: String, batches: Seq[Seq[(Long, Long)]],
                  watermarkDelay: String = "0 seconds"): Seq[ClosedSession] = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", Rocks)
      val mem = MemoryStream[(Long, Long)](spark)
      val events = mem.toDF().toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withWatermark("ts", watermarkDelay)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .as[SessionEvent]
      val q = SessionMaterializer.sessions(events)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val out = spark.table(name).as[ClosedSession].collect().toSeq
      q.stop()
      out
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("gaps close sessions in-batch; watermark timers close them across batches") {
    val closed = run("tws_basic", Seq(
      Seq((1L, 1000L), (1L, 1010L), (2L, 1005L)),     // two open sessions
      Seq((1L, 5000L)),  // u1: 3990s gap closes [1000,1010] in-batch;
                         // watermark 5000s fires u2's 2805s timer
      Seq((1L, 9000L)),  // u1: gap closes [5000,5000]
      Seq((3L, 1000000L)) // sentinel pushes the watermark: u1 [9000] closes
    ))
    val got = closed.map(c =>
      (c.user_id, c.start_us / 1000000, c.end_us / 1000000, c.n_events)).toSet
    val want = Set(
      (1L, 1000L, 1010L, 2L),
      (2L, 1005L, 1005L, 1L),
      (1L, 5000L, 5000L, 1L),
      (1L, 9000L, 9000L, 1L))
    assert(got == want, s"closed sessions diverged: $got")
  }

  test("cross-batch late arrivals: disjoint-earlier closes standalone, in-span extends") {
    // generous watermark delay so late events reach the operator instead
    // of being dropped at the watermark filter
    val closed = run("tws_late", Seq(
      Seq((1L, 10000L), (4L, 20000L)),  // two open sessions
      // u1: 9000s BEFORE its open session's start (gap is 1800s) — a
      // disjoint earlier session, must close standalone, NOT inflate the
      // open one; u4: 1000s before start — inside the span, extends it
      Seq((1L, 1000L), (4L, 19000L)),
      Seq((9L, 2000000L))               // sentinel closes everything open
    ), watermarkDelay = "4 hours")
    val got = closed.map(c =>
      (c.user_id, c.start_us / 1000000, c.end_us / 1000000, c.n_events)).toSet
    val want = Set(
      (1L, 1000L, 1000L, 1L),      // the late disjoint session, standalone
      (1L, 10000L, 10000L, 1L),    // the open session, NOT inflated
      (4L, 19000L, 20000L, 2L))    // extended downward to the late event
    assert(got == want, s"late-arrival handling diverged: $got")
  }

  test("co-batch late events within a gap of each other merge into one late session") {
    val closed = run("tws_late_merge", Seq(
      Seq((1L, 50000L)),                           // open session at 50000s
      // three late events (well over a gap before 50000): the first two
      // are 600s apart (< 1800s gap) and must MERGE into one closed
      // session — the batch rule on that run; the third is 3000s later,
      // a separate late session
      Seq((1L, 1000L), (1L, 1600L), (1L, 4600L)),
      Seq((9L, 2000000L))                          // sentinel closes the rest
    ), watermarkDelay = "20 hours")
    val got = closed.map(c =>
      (c.user_id, c.start_us / 1000000, c.end_us / 1000000, c.n_events)).toSet
    val want = Set(
      (1L, 1000L, 1600L, 2L),       // the merged late run — NOT two singles
      (1L, 4600L, 4600L, 1L),       // the disjoint later late event
      (1L, 50000L, 50000L, 1L))     // the open session, untouched
    assert(got == want, s"co-batch late merge diverged: $got")
  }

  test("a gap-bridging arrival merges the pending late run into the open " +
    "session — one session, exactly the batch rule") {
    val closed = run("tws_bridge", Seq(
      Seq((1L, 10000L)),            // open session at 10000s
      // a late run climbing toward the open session at 1500s steps
      // (< 1800s gap), then a bridging event at 9500s within a gap of
      // BOTH the run's end (8000s) and the open start — the batch rule
      // sessionizes all 8 events as ONE session. (The pre-fix operator
      // closed the run standalone at the bridge and emitted two.)
      Seq((1L, 1000L), (1L, 2000L), (1L, 3500L), (1L, 5000L), (1L, 6500L),
        (1L, 8000L), (1L, 9500L)),
      Seq((9L, 2000000L))           // sentinel closes everything open
    ), watermarkDelay = "20 hours")
    val got = closed.filter(_.user_id == 1).map(c =>
      (c.user_id, c.start_us / 1000000, c.end_us / 1000000, c.n_events)).toSet
    assert(got == Set((1L, 1000L, 10000L, 8L)),
      s"gap-bridging late run diverged from the batch rule: $got")
  }

  test("closed-session stream equals the batch q_sessionize rule on fixture events") {
    val ev = graft.queries.Q.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[SessionEvent].collect().toSeq.sortBy(e => (e.us, e.user_id))
    val maxUs = ev.map(_.us).max
    val (a, b) = ev.splitAt(ev.size / 2)
    val sentinel = SessionEvent(-1L, maxUs + 10 * GapUs)
    val closed = run("tws_fixture", Seq(
      a.map(e => (e.user_id, e.us / 1000000)),
      b.map(e => (e.user_id, e.us / 1000000)),
      Seq((sentinel.user_id, sentinel.us / 1000000))))
      .filter(_.user_id >= 0)
    // batch twin: the q_sessionize lag + cumulative-sum rule, but on
    // second-truncated times (the stream run feeds whole seconds)
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("us")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.queries.Q.events(spark, sfDir)
        .select(col("user_id"),
          (expr("unix_micros(ts) div 1000000") * 1000000L).as("us"))
        .withColumn("prev", lag("us", 1).over(byUser))
        .withColumn("new", when(col("prev").isNull ||
          col("us") - col("prev") > GapUs, 1L).otherwise(0L))
        .withColumn("sid", sum("new").over(cum))
        .groupBy("user_id", "sid")
        .agg(min("us").as("start_us"), max("us").as("end_us"),
          count(lit(1)).as("n_events"))
        .select("user_id", "start_us", "end_us", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    val got = closed.map(c => (c.user_id, c.start_us, c.end_us, c.n_events)).toSet
    assert(got == batch,
      s"stream ${got.size} sessions vs batch ${batch.size}; " +
        s"missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
  }
}
