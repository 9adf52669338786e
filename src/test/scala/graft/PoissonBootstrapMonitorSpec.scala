package graft

import graft.stream.{PbEvent, PbPoint, PoissonBootstrapMonitor}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Poisson-bootstrap CI: bit-exact equality with the
  * oracle-gated batch q_poisson_bootstrap under ANY micro-batch split AND
  * any arrival order — the state is a commutative monoid of exact decimal
  * sums, so this monitor carries a strictly stronger invariance contract
  * than the sequential SPC family. */
class PoissonBootstrapMonitorSpec extends SparkSpec {
  import spark.implicits._

  /** The batch query's exact keying: flag, "bs:"∥(ok·8+ln)∥":", quantity. */
  private lazy val arrivals: Seq[PbEvent] =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_returnflag", "l_orderkey * 8 + l_linenumber AS rk",
        "l_quantity").collect()
      .map(r => PbEvent(r.getString(0), s"bs:${r.getLong(1)}:", r.getDouble(2)))
      .toSeq

  private def streamed(batches: Seq[Seq[PbEvent]],
                       name: String): Map[String, PbPoint] = {
    val mem = MemoryStream[PbEvent](spark)
    val q = PoissonBootstrapMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[PbPoint].collect().toSeq
    q.stop()
    out.groupBy(_.key).map { case (k, ps) => k -> ps.maxBy(_.n_rows) }
  }

  test("streamed CI equals the oracle-gated batch q_poisson_bootstrap " +
    "bit-for-bit across micro-batch splits") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "pb_3way")
    val batch = graft.queries.GroupAB.all
      .find(_.name == "q_poisson_bootstrap").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(batch.nonEmpty)
    batch.foreach { case (flag, n, mean, lo, hi) =>
      val p = fin(flag)
      assert(p.n_rows == n && p.mean_qty == mean &&
        p.boot_lo == lo && p.boot_hi == hi,
        s"flag $flag: streamed (${p.n_rows}, ${p.mean_qty}, ${p.boot_lo}, " +
          s"${p.boot_hi}) vs batch ($n, $mean, $lo, $hi)")
    }
    val twin = PoissonBootstrapMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.key -> p).toMap
    batch.foreach { case (flag, n, mean, lo, hi) =>
      assert(twin(flag).n_rows == n && twin(flag).mean_qty == mean &&
        twin(flag).boot_lo == lo && twin(flag).boot_hi == hi, s"flag $flag")
    }
  }

  test("the CI is ORDER-invariant, not just split-invariant: a shuffled " +
    "arrival stream yields the bit-identical final point") {
    val shuffled = new scala.util.Random(7).shuffle(arrivals)
    val quarters = {
      val (a, rest) = shuffled.splitAt(shuffled.size / 4)
      val (b, rest2) = rest.splitAt(rest.size / 3)
      val (c, d) = rest2.splitAt(rest2.size / 2)
      Seq(a, b, c, d)
    }
    val one = streamed(Seq(arrivals), "pb_one")
    val four = streamed(quarters, "pb_four")
    assert(one.keySet == four.keySet)
    one.foreach { case (k, p) =>
      val q = four(k)
      assert(q.n_rows == p.n_rows && q.mean_qty == p.mean_qty &&
        q.boot_lo == p.boot_lo && q.boot_hi == p.boot_hi, s"key $k")
    }
  }

  test("evicting deployment form: a live call folds + emits + re-arms the " +
    "idle timer; a timed-out call retires state with no emission") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val events = arrivals.take(5)
    val expected = PoissonBootstrapMonitor.point(events.head.key,
      PoissonBootstrapMonitor.fold(None, events.iterator.map(
        e => e.copy(key = events.head.key))))
    val live = TestGroupState.create[PoissonBootstrapMonitor.S](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty(), false)
    val out = PoissonBootstrapMonitor.evictingHandler(60000L)(
      events.head.key, events.iterator.map(e => e.copy(key = events.head.key)),
      live).toSeq
    assert(out == Seq(expected))
    assert(live.exists && live.getTimeoutTimestampMs.get == 61000L)
    val dead = TestGroupState.create[PoissonBootstrapMonitor.S](
      Optional.of(PoissonBootstrapMonitor.fold(None, events.iterator)),
      GroupStateTimeout.ProcessingTimeTimeout, 120000L, Optional.empty(), true)
    assert(PoissonBootstrapMonitor.evictingHandler(60000L)(
      events.head.key, Iterator.empty, dead).isEmpty)
    assert(dead.isRemoved)
  }

  // No memory-stream leg for trackEvicting: with ProcessingTimeTimeout,
  // FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true, so the
  // engine re-runs no-data batches back-to-back to poll timers and
  // processAllAvailable never quiesces. The TestGroupState leg above pins
  // both handler paths; the live path IS track's fold+point, so emission
  // equality while a key is live holds by construction.
}
