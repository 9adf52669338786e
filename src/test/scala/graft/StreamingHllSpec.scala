package graft

import graft.stream.{HllArrival, HllEstimate, StreamingHll}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming HLL: register-level agreement with the oracle-gated batch
  * q_hll_distinct, and the monoid invariances (split, shuffle,
  * re-delivery) that make it safe behind a replayed CDC source. */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture arrivals: (return flag, orderkey) — the q_hll_distinct
    * population, in whatever order the scan yields. */
  private lazy val arrivals: Seq[HllArrival] =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_orderkey").distinct().collect()
      .map(r => HllArrival(r.getString(0), r.getLong(1).toString)).toSeq

  private def streamed(batches: Seq[Seq[HllArrival]],
                       name: String): Map[String, HllEstimate] = {
    val mem = MemoryStream[HllArrival](spark)
    val q = StreamingHll.track(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[HllEstimate].collect().toSeq
    q.stop()
    // the LAST estimate per group is the final state's
    out.zipWithIndex.groupBy(_._1.group)
      .map { case (g, es) => g -> es.maxBy(_._2)._1 }
  }

  test("streamed registers equal the oracle-gated batch q_hll_distinct " +
    "(v_empty and rounded estimate, exact doubles)") {
    val (a, rest) = arrivals.splitAt(arrivals.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val fin = streamed(Seq(a, b, c), "hll_3way")
    val batch = graft.queries.GroupY.all.find(_.name == "q_hll_distinct").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(batch.nonEmpty)
    batch.foreach { case (g, vEmpty, est) =>
      val p = fin(g)
      assert(p.v_empty == vEmpty && p.est == est,
        s"$g: streamed (${p.v_empty}, ${p.est}) vs batch ($vEmpty, $est)")
    }
  }

  test("monoid invariance: shuffled order, a different split, and a " +
    "RE-DELIVERED chunk all converge to bit-identical estimates") {
    val one = streamed(Seq(arrivals), "hll_one")
    val shuffled = new scala.util.Random(7).shuffle(arrivals)
    val (a, b) = shuffled.splitAt(shuffled.size / 4)
    // chunk `a` delivered twice — at-least-once replay
    val redelivered = streamed(Seq(a, b, a), "hll_redeliver")
    assert(one.keySet == redelivered.keySet)
    one.foreach { case (g, p) =>
      assert(redelivered(g).est == p.est &&
        redelivered(g).v_empty == p.v_empty, s"$g")
    }
  }

  test("batch twin equals the stream") {
    val one = streamed(Seq(arrivals), "hll_twin_ref")
    val twin = StreamingHll.trackBatch(arrivals.toDS()).collect()
      .map(p => p.group -> p).toMap
    assert(one.keySet == twin.keySet)
    one.foreach { case (g, p) =>
      assert(twin(g).est == p.est && twin(g).v_empty == p.v_empty, s"$g")
    }
  }
}
