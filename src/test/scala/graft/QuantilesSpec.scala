package graft

import graft.stream.{Quantiles, QuantileEstimate, ValueArrival}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** GK streaming quantile sketch: the εn rank guarantee against exact batch
  * ranks on fixture value streams (split across micro-batches), and
  * sublinear summary growth under a 100k-value churn. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val Eps = 0.01

  /** Fixture value stream: (event_type, value-in-cents) in (event_id)
    * arrival order. */
  private lazy val arrivals: Seq[ValueArrival] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "event_type",
        "CAST(round(value * 100) AS LONG) AS cents")
      .collect()
      .sortBy(_.getLong(0))
      .map(r => ValueArrival(r.getString(1), r.getLong(2)))
      .toSeq

  private lazy val sortedByGroup: Map[String, Array[Long]] =
    arrivals.groupBy(_.group)
      .map { case (g, as) => g -> as.map(_.value).sorted.toArray }

  /** True rank range of `v` in group `g`: [#less+1, #lessOrEqual]. */
  private def rankRange(g: String, v: Long): (Long, Long) = {
    val xs = sortedByGroup(g)
    val lo = xs.count(_ < v).toLong
    val hi = xs.count(_ <= v).toLong
    (lo + 1, hi)
  }

  private def checkGuarantee(es: Seq[QuantileEstimate]): Unit =
    es.foreach { e =>
      val n = sortedByGroup(e.group).length.toLong
      assert(e.n == n, s"${e.group}: folded ${e.n} of $n")
      val target = math.max(1L, math.ceil(e.q * n).toLong)
      val slack = math.ceil(Eps * n).toLong
      val (lo, hi) = rankRange(e.group, e.value)
      // some rank attainable by the returned value lies within εn of target
      assert(lo <= target + slack && hi >= target - slack,
        s"${e.group} q=${e.q}: value ${e.value} ranks [$lo,$hi], " +
          s"target $target ± $slack")
    }

  test("batch twin meets the εn rank guarantee at every standard quantile") {
    checkGuarantee(Quantiles.trackBatch(arrivals.toDS(), Eps).collect().toSeq)
  }

  test("streamed sketch keeps the guarantee across micro-batch splits") {
    val (first, rest) = arrivals.splitAt(arrivals.size / 4)
    val (second, third) = rest.splitAt(rest.size / 2)
    val mem = MemoryStream[ValueArrival](spark)
    val q = Quantiles.track(mem.toDS(), Eps)
      .writeStream.format("memory").queryName("gk_out")
      .outputMode("append").start()
    mem.addData(first); q.processAllAvailable()
    mem.addData(second); q.processAllAvailable()
    mem.addData(third); q.processAllAvailable()
    val streamed = spark.table("gk_out").as[QuantileEstimate].collect().toSeq
    q.stop()
    val finals = streamed.groupBy(e => (e.group, e.q)).values
      .map(_.maxBy(_.n)).toSeq
    checkGuarantee(finals)
  }

  test("summary stays sublinear under a 100k-value churn") {
    // adversarial-ish: strictly increasing values (every insert lands at
    // the max; no duplicates ever merge for free)
    var s: Quantiles.Summary = (0L, Vector.empty)
    val period = math.max(1, math.floor(1.0 / (2 * Eps)).toInt)
    var k = 0
    (0 until 100000).foreach { i =>
      s = Quantiles.insert(s, i.toLong, Eps)
      k += 1
      if (k >= period) { s = Quantiles.compress(s, Eps); k = 0 }
    }
    s = Quantiles.compress(s, Eps)
    assert(s._1 == 100000L)
    // GK bound is O((1/ε)·log(εn)) ≈ a few hundred at ε=0.01, n=1e5;
    // pin an order-of-magnitude ceiling, far below n
    assert(s._2.size < 2000, s"summary grew to ${s._2.size} entries")
    // and the guarantee holds on the churn stream too
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val Some((v, _)) = Quantiles.query(s, q, Eps)
      val target = math.ceil(q * 100000).toLong
      assert(math.abs((v + 1) - target) <= math.ceil(Eps * 100000).toLong,
        s"q=$q: value $v vs target rank $target")
    }
  }
}
