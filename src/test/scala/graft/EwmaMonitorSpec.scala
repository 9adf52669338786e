package graft

import graft.stream.{EwmaEvent, EwmaMonitor, EwmaPoint}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming EWMA: bit-exact equality with the oracle-gated batch
  * q_ewma fold for in-order arrivals under ANY micro-batch split, split
  * invariance, and the DECLARED arrival-order semantics for cross-batch
  * late events. */
class EwmaMonitorSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture arrivals in global (ts, event_id) order — per-user
    * subsequences are then in event-time order. */
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
                       name: String): Map[Long, EwmaPoint] = {
    val mem = MemoryStream[EwmaEvent](spark)
    val q = EwmaMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[EwmaPoint].collect().toSeq
    q.stop()
    out.groupBy(_.user_id).map { case (u, ps) => u -> ps.maxBy(_.n_events) }
  }

  test("streamed fold equals the oracle-gated batch q_ewma bit-for-bit " +
    "across micro-batch splits") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "ewma_3way")
    val batch = graft.queries.GroupY.all.find(_.name == "q_ewma").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.nonEmpty)
    batch.foreach { case (u, n, e) =>
      val p = fin(u)
      assert(p.n_events == n && round6(p.ewma) == e,
        s"user $u: streamed (${p.n_events}, ${round6(p.ewma)}) vs batch ($n, $e)")
    }
    // the bounded-dataset twin folds to the same points (per-key arrival
    // order preserved: mapGroups iterates each key's rows in input order
    // only after an explicit in-fold sort, which `fold` performs)
    val twin = EwmaMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.user_id -> p).toMap
    batch.foreach { case (u, n, e) =>
      assert(twin(u).n_events == n && round6(twin(u).ewma) == e, s"user $u")
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
    val one = streamed(Seq(arrivals), "ewma_one")
    val four = streamed(quarters, "ewma_four")
    assert(one.keySet == four.keySet)
    one.foreach { case (u, p) =>
      assert(four(u).ewma == p.ewma && four(u).n_events == p.n_events, s"user $u")
    }
  }

  test("a cross-batch late event folds at ARRIVAL position — the declared " +
    "streaming semantics, diverging from the event-order batch fold") {
    val early = EwmaEvent(7L, 1000L, 1L, 10.0)
    val late = EwmaEvent(7L, 500L, 2L, 90.0) // event-time BEFORE `early`
    val fin = streamed(Seq(Seq(early), Seq(late)), "ewma_late")(7L)
    // arrival-order fold: y = 10, then (90 + 3*10)/4 = 30
    assert(fin.ewma == 30.0 && fin.n_events == 2L)
    // the event-ORDER fold would give (10 + 3*90)/4 = 70 — the documented
    // divergence, not this operator's contract
    assert(fin.ewma != 70.0)
  }
}
