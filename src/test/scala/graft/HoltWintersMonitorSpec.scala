package graft

import graft.stream.{HoltWintersMonitor, HwEvent, HwPoint}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming Holt–Winters smoother: bit-exact equality with the
  * oracle-gated batch q_holt_winters fold for in-order arrivals under
  * ANY micro-batch split, plus split invariance — the HoltMonitorSpec
  * equivalence contract extended to the 7-slot seasonal state. The
  * arrival series is the SAME daily-mean axis the batch query reduces
  * the corpus to (exact DECIMAL sums ÷ counts), so the comparison is
  * against the REGISTERED query's output, not a re-derivation. */
class HoltWintersMonitorSpec extends SparkSpec {
  import spark.implicits._

  /** Daily means per event type, ordered by day — Q.dsum's exact
    * expression (DECIMAL(25,6) sum ÷ count) so doubles match the batch
    * query's series bit-for-bit. */
  private lazy val arrivals: Seq[HwEvent] =
    graft.queries.Q.events(spark, sfDir)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg((sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
        / count(lit(1)).cast(DoubleType)).as("m"))
      .collect()
      .map(r => HwEvent(r.getString(0), r.getLong(1), r.getLong(1),
        r.getDouble(2)))
      .sortBy(e => (e.us, e.key))
      .toSeq

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def streamed(batches: Seq[Seq[HwEvent]],
                       name: String): Map[String, HwPoint] = {
    val mem = MemoryStream[HwEvent](spark)
    val q = HoltWintersMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[HwPoint].collect().toSeq
    q.stop()
    out.groupBy(_.key).map { case (k, ps) => k -> ps.maxBy(_.n_events) }
  }

  test("streamed fold equals the oracle-gated batch q_holt_winters " +
    "bit-for-bit across micro-batch splits") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "hw_3way")
    val batch = graft.queries.GroupZ.all.find(_.name == "q_holt_winters").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(batch.nonEmpty)
    batch.foreach { case (t, n, l, tr, f1, amp) =>
      val p = fin(t)
      assert(p.n_events == n && round6(p.level) == l &&
        round6(p.trend) == tr && round6(p.forecast_1) == f1 &&
        round6(p.seasonal_amplitude) == amp,
        s"type $t: streamed (${p.n_events}, ${round6(p.level)}, " +
          s"${round6(p.trend)}, ${round6(p.forecast_1)}, " +
          s"${round6(p.seasonal_amplitude)}) vs batch ($n, $l, $tr, $f1, $amp)")
    }
    val twin = HoltWintersMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.key -> p).toMap
    batch.foreach { case (t, n, l, tr, f1, amp) =>
      assert(twin(t).n_events == n && round6(twin(t).level) == l &&
        round6(twin(t).trend) == tr && round6(twin(t).forecast_1) == f1 &&
        round6(twin(t).seasonal_amplitude) == amp, s"type $t")
    }
  }

  test("final state is split-invariant for in-order arrivals " +
    "(exact double equality, including every seasonal-derived output)") {
    val quarters = {
      val (a, rest) = arrivals.splitAt(arrivals.size / 4)
      val (b, rest2) = rest.splitAt(rest.size / 3)
      val (c, d) = rest2.splitAt(rest2.size / 2)
      Seq(a, b, c, d)
    }
    val one = streamed(Seq(arrivals), "hw_one")
    val four = streamed(quarters, "hw_four")
    assert(one.keySet == four.keySet)
    one.foreach { case (k, p) =>
      assert(four(k).level == p.level && four(k).trend == p.trend &&
        four(k).forecast_1 == p.forecast_1 &&
        four(k).seasonal_amplitude == p.seasonal_amplitude &&
        four(k).n_events == p.n_events, s"key $k")
    }
  }
}
