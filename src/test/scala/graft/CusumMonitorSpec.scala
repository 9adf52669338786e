package graft

import graft.stream.{CuEvent, CuPoint, CusumMonitor}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming CUSUM chart: bit-exact equality with the oracle-gated batch
  * q_cusum fold for in-order arrivals under ANY micro-batch split, plus
  * split invariance — the monitor-family equivalence contract applied to
  * the fixed-reference SPC statistic (max position included). */
class CusumMonitorSpec extends SparkSpec {
  import spark.implicits._

  /** Daily means per event type + the batch reference μ (Q.dsum's exact
    * expression), shipped on each event — the config-join shape. */
  private lazy val arrivals: Seq[CuEvent] = {
    val d = graft.queries.Q.events(spark, sfDir)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg((sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
        / count(lit(1)).cast(DoubleType)).as("m"))
    val ref = d.groupBy("t")
      .agg((sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
        / count(lit(1)).cast(DoubleType)).as("mu"))
    d.join(ref, Seq("t")).collect()
      .map(r => CuEvent(r.getString(0), r.getLong(1), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
      .sortBy(e => (e.us, e.key))
      .toSeq
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def streamed(batches: Seq[Seq[CuEvent]],
                       name: String): Map[String, CuPoint] = {
    val mem = MemoryStream[CuEvent](spark)
    val q = CusumMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[CuPoint].collect().toSeq
    q.stop()
    out.groupBy(_.key).map { case (k, ps) => k -> ps.maxBy(_.n_events) }
  }

  test("streamed fold equals the oracle-gated batch q_cusum bit-for-bit " +
    "across micro-batch splits (max value, max position, alarms)") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "cu_3way")
    val batch = graft.queries.GroupZ.all.find(_.name == "q_cusum").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    assert(batch.nonEmpty)
    batch.foreach { case (t, n, mx, mxDay, alarms) =>
      val p = fin(t)
      assert(p.n_events == n && round6(p.max_cusum) == mx &&
        p.max_at == mxDay && p.alarm_count == alarms,
        s"type $t: streamed (${p.n_events}, ${round6(p.max_cusum)}, " +
          s"${p.max_at}, ${p.alarm_count}) vs batch ($n, $mx, $mxDay, $alarms)")
    }
    val twin = CusumMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.key -> p).toMap
    batch.foreach { case (t, n, mx, mxDay, alarms) =>
      assert(twin(t).n_events == n && round6(twin(t).max_cusum) == mx &&
        twin(t).max_at == mxDay && twin(t).alarm_count == alarms, s"type $t")
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
    val one = streamed(Seq(arrivals), "cu_one")
    val four = streamed(quarters, "cu_four")
    assert(one.keySet == four.keySet)
    one.foreach { case (k, p) =>
      assert(four(k).cusum == p.cusum && four(k).max_cusum == p.max_cusum &&
        four(k).max_at == p.max_at && four(k).alarm_count == p.alarm_count &&
        four(k).n_events == p.n_events, s"key $k")
    }
  }
}
