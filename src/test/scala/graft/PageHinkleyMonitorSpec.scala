package graft

import graft.stream.{PageHinkleyMonitor, PhEvent, PhPoint}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming Page–Hinkley detector: bit-exact equality with the
  * oracle-gated batch q_page_hinkley fold for in-order arrivals under
  * ANY micro-batch split, plus split invariance. The arrival series is
  * the SAME exact-decimal daily-mean axis the batch query reduces the
  * corpus to, with (δ, λ) derived the batch way (μ/8, μ/2 of the series
  * mean) and shipped on each event — the config-join deployment shape. */
class PageHinkleyMonitorSpec extends SparkSpec {
  import spark.implicits._

  /** Daily means per event type + the batch (δ, λ), all via Q.dsum's
    * exact expression so doubles match the registered query's series. */
  private lazy val arrivals: Seq[PhEvent] = {
    val d = graft.queries.Q.events(spark, sfDir)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg((sum(col("value").cast(DecimalType(25, 6))).cast(DoubleType)
        / count(lit(1)).cast(DoubleType)).as("m"))
    val ref = d.groupBy("t")
      .agg((sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
        / count(lit(1)).cast(DoubleType) / lit(8)).as("delta"),
        (sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
          / count(lit(1)).cast(DoubleType) / lit(2)).as("lambda"))
    d.join(ref, Seq("t")).collect()
      .map(r => PhEvent(r.getString(0), r.getLong(1), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(e => (e.us, e.key))
      .toSeq
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def streamed(batches: Seq[Seq[PhEvent]],
                       name: String): Map[String, PhPoint] = {
    val mem = MemoryStream[PhEvent](spark)
    val q = PageHinkleyMonitor.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[PhPoint].collect().toSeq
    q.stop()
    out.groupBy(_.key).map { case (k, ps) => k -> ps.maxBy(_.n_events) }
  }

  test("streamed fold equals the oracle-gated batch q_page_hinkley " +
    "bit-for-bit across micro-batch splits") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "ph_3way")
    val batch = graft.queries.GroupAA.all.find(_.name == "q_page_hinkley")
      .get.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(batch.nonEmpty)
    batch.foreach { case (t, n, mean, g, mx, alarms) =>
      val p = fin(t)
      assert(p.n_events == n && round6(p.adapted_mean) == mean &&
        round6(p.ph_value) == g && round6(p.max_excursion) == mx &&
        p.alarm_count == alarms,
        s"type $t: streamed (${p.n_events}, ${round6(p.adapted_mean)}, " +
          s"${round6(p.ph_value)}, ${round6(p.max_excursion)}, " +
          s"${p.alarm_count}) vs batch ($n, $mean, $g, $mx, $alarms)")
    }
    val twin = PageHinkleyMonitor.trackBatch(arrivals.toDS()).collect()
      .map(p => p.key -> p).toMap
    batch.foreach { case (t, n, mean, g, mx, alarms) =>
      assert(twin(t).n_events == n && round6(twin(t).adapted_mean) == mean &&
        round6(twin(t).ph_value) == g &&
        round6(twin(t).max_excursion) == mx &&
        twin(t).alarm_count == alarms, s"type $t")
    }
  }

  test("final state is split-invariant for in-order arrivals " +
    "(exact double equality, alarms and excursions included)") {
    val quarters = {
      val (a, rest) = arrivals.splitAt(arrivals.size / 4)
      val (b, rest2) = rest.splitAt(rest.size / 3)
      val (c, d) = rest2.splitAt(rest2.size / 2)
      Seq(a, b, c, d)
    }
    val one = streamed(Seq(arrivals), "ph_one")
    val four = streamed(quarters, "ph_four")
    assert(one.keySet == four.keySet)
    one.foreach { case (k, p) =>
      assert(four(k).adapted_mean == p.adapted_mean &&
        four(k).ph_value == p.ph_value &&
        four(k).max_excursion == p.max_excursion &&
        four(k).alarm_count == p.alarm_count &&
        four(k).n_events == p.n_events, s"key $k")
    }
  }
}
