package graft

import graft.stream.{SrEvent, SrPoint, SrmMonitor}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming SRM guardrail: bit-exact equality with the oracle-gated batch
  * q_srm under ANY micro-batch split, any arrival order, AND duplicate
  * re-delivery — the set-union state is commutative and idempotent, the
  * strongest invariance contract in the monitor family. */
class SrmMonitorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val arrivals: Seq[SrEvent] =
    graft.queries.Q.events(spark, sfDir)
      .selectExpr("unix_micros(ts) div 86400000000 AS day", "user_id")
      .collect().map(r => SrEvent(r.getLong(0), r.getLong(1))).toSeq

  private def streamed(batches: Seq[Seq[SrEvent]],
                       name: String): Map[Long, SrPoint] = {
    val mem = MemoryStream[SrEvent](spark)
    val q = SrmMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[SrPoint].collect().toSeq
    q.stop()
    out.groupBy(_.day).map { case (d, ps) =>
      d -> ps.maxBy(p => p.n_even + p.n_odd) }
  }

  private lazy val batchRows: Array[(Long, Long, Long, Long, Long)] =
    graft.queries.GroupAC.all.find(_.name == "q_srm").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  private def assertMatches(fin: Map[Long, SrPoint]): Unit = {
    assert(batchRows.nonEmpty)
    assert(fin.keySet == batchRows.map(_._1).toSet)
    batchRows.foreach { case (day, ne, no, chi2, flag) =>
      val p = fin(day)
      assert(p.n_even == ne && p.n_odd == no && p.chi2_ppm == chi2 &&
        p.srm_flag == flag,
        s"day $day: streamed (${p.n_even}, ${p.n_odd}, ${p.chi2_ppm}, " +
          s"${p.srm_flag}) vs batch ($ne, $no, $chi2, $flag)")
    }
  }

  test("streamed guardrail equals the oracle-gated batch q_srm bit-for-bit " +
    "across micro-batch splits") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    assertMatches(streamed(Seq(a, b, c), "srm_3way"))
    val twin = SrmMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.day -> p).toMap
    assertMatches(twin)
  }

  test("duplicate re-delivery is a no-op: an at-least-once upstream that " +
    "replays a whole batch cannot move the statistic") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 2)
    val shuffledRest = new scala.util.Random(13).shuffle(rest)
    // batch 2 re-delivers ALL of batch 1 (shuffled) alongside new data
    assertMatches(streamed(Seq(a, new scala.util.Random(17).shuffle(a),
      shuffledRest ++ a), "srm_dup"))
  }

  test("evicting deployment form: a live call folds + emits + re-arms the " +
    "idle timer; a timed-out call retires state with no emission") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val live = TestGroupState.create[SrmMonitor.S](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty(), false)
    val out = SrmMonitor.evictingHandler(60000L)(7L,
      Iterator(SrEvent(7L, 2L), SrEvent(7L, 3L), SrEvent(7L, 3L)), live).toSeq
    assert(out == Seq(SrmMonitor.point(7L, (Set(2L), Set(3L)))))
    assert(live.exists && live.get == ((Set(2L), Set(3L))))
    // setTimeoutDuration(60s) at batch processing time 1s → fires at 61s
    assert(live.getTimeoutTimestampMs.get == 61000L)
    val dead = TestGroupState.create[SrmMonitor.S](
      Optional.of((Set(1L), Set(2L)): SrmMonitor.S),
      GroupStateTimeout.ProcessingTimeTimeout, 120000L, Optional.empty(), true)
    assert(SrmMonitor.evictingHandler(60000L)(7L, Iterator.empty, dead).isEmpty)
    assert(dead.isRemoved)
  }

  // No memory-stream leg for trackEvicting: with ProcessingTimeTimeout,
  // FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true, so the
  // engine re-runs no-data batches back-to-back to poll timers and
  // processAllAvailable never quiesces. The TestGroupState leg above pins
  // both handler paths; the live path IS track's fold+point, so emission
  // equality while a key is live holds by construction.
}
