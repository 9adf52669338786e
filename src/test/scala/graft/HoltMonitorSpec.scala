package graft

import graft.stream.{EwmaEvent, HoltMonitor, HoltPoint}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Holt smoother: bit-exact equality with the oracle-gated
  * batch q_holt fold for in-order arrivals under ANY micro-batch split,
  * split invariance, and the DECLARED arrival-order semantics for
  * cross-batch late events — the EwmaMonitorSpec equivalence contract,
  * applied to the trend-aware smoother. */
class HoltMonitorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val arrivals: Seq[EwmaEvent] =
    graft.queries.Q.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "value")
      .collect()
      .sortBy(r => (r.getLong(1), r.getLong(2)))
      .map(r => EwmaEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toSeq

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def streamed(batches: Seq[Seq[EwmaEvent]],
                       name: String): Map[Long, HoltPoint] = {
    val mem = MemoryStream[EwmaEvent](spark)
    val q = HoltMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[HoltPoint].collect().toSeq
    q.stop()
    out.groupBy(_.user_id).map { case (u, ps) => u -> ps.maxBy(_.n_events) }
  }

  test("streamed fold equals the oracle-gated batch q_holt bit-for-bit " +
    "across micro-batch splits") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "holt_3way")
    val batch = graft.queries.GroupY.all.find(_.name == "q_holt").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(batch.nonEmpty)
    batch.foreach { case (u, n, l, t, f1) =>
      val p = fin(u)
      assert(p.n_events == n && round6(p.level) == l &&
        round6(p.trend) == t && round6(p.forecast_1) == f1,
        s"user $u: streamed (${p.n_events}, ${round6(p.level)}, " +
          s"${round6(p.trend)}, ${round6(p.forecast_1)}) " +
          s"vs batch ($n, $l, $t, $f1)")
    }
    val twin = HoltMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.user_id -> p).toMap
    batch.foreach { case (u, n, l, t, f1) =>
      assert(twin(u).n_events == n && round6(twin(u).level) == l &&
        round6(twin(u).trend) == t && round6(twin(u).forecast_1) == f1,
        s"user $u")
    }
  }

  test("final state is split-invariant for in-order arrivals " +
    "(exact double equality)") {
    val quarters = {
      val (a, rest) = arrivals.splitAt(arrivals.size / 4)
      val (b, rest2) = rest.splitAt(rest.size / 3)
      val (c, d) = rest2.splitAt(rest2.size / 2)
      Seq(a, b, c, d)
    }
    val one = streamed(Seq(arrivals), "holt_one")
    val four = streamed(quarters, "holt_four")
    assert(one.keySet == four.keySet)
    one.foreach { case (u, p) =>
      assert(four(u).level == p.level && four(u).trend == p.trend &&
        four(u).n_events == p.n_events, s"user $u")
    }
  }

  test("a cross-batch late event folds at ARRIVAL position — the declared " +
    "streaming semantics, diverging from the event-order batch fold") {
    val early = EwmaEvent(7L, 1000L, 1L, 10.0)
    val late = EwmaEvent(7L, 500L, 2L, 90.0) // event-time BEFORE `early`
    val fin = streamed(Seq(Seq(early), Seq(late)), "holt_late")(7L)
    // arrival-order fold: l=10, b=0; then l' = (90 + 3*(10+0))/4 = 30,
    // b' = (30-10)/2 + 0/2 = 10, forecast 40
    assert(fin.level == 30.0 && fin.trend == 10.0 && fin.forecast_1 == 40.0
      && fin.n_events == 2L)
    // the event-ORDER fold (l=90 first) would give l' = (10+3*90)/4 = 70 —
    // the documented divergence, not this operator's contract
    assert(fin.level != 70.0)
  }
}
