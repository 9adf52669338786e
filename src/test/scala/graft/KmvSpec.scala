package graft

import graft.stream.{KmvArrival, KmvEstimate, StreamingKmv}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming KMV distinct-count sketch: batch-split invariance (the KMV
  * state is a commutative idempotent monoid — any micro-batch partitioning
  * converges to identical state), agreement with the q_kmv_distinct batch
  * formula, bounded state, and estimate accuracy on fixture vocabularies. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  /** Fixture element stream: (lang, token) arrivals from documents,
    * deterministic order (doc_id, position). */
  private lazy val arrivals: Seq[KmvArrival] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang",
        "filter(split(lower(text), ' '), t -> t != '') AS toks")
      .collect()
      .sortBy(_.getLong(0))
      .flatMap(r => r.getSeq[String](2).map(KmvArrival(r.getString(1), _)))
      .toSeq

  private lazy val exact: Map[String, Long] =
    arrivals.groupBy(_.group).map { case (g, as) =>
      g -> as.map(_.value).distinct.size.toLong
    }

  test("summary is a commutative idempotent monoid: any split, same state") {
    val byGroup = arrivals.groupBy(_.group)
    byGroup.foreach { case (g, as) =>
      val whole = as.foldLeft(Seq.empty[Long])((s, a) =>
        StreamingKmv.step(s, graft.ops.expr.Fnv1a64.hashCodePoints(a.value), K))
      // three different partitionings, one with duplicated (re-delivered) data
      val splits = Seq(
        as.grouped(7).toSeq,
        as.reverse.grouped(97).toSeq,
        (as ++ as.take(as.size / 2)).grouped(13).toSeq)
      splits.foreach { chunks =>
        val folded = chunks.foldLeft(Seq.empty[Long]) { (s, chunk) =>
          chunk.foldLeft(s)((s2, a) =>
            StreamingKmv.step(s2, graft.ops.expr.Fnv1a64.hashCodePoints(a.value), K))
        }
        assert(folded == whole, s"$g: split produced different state")
      }
      assert(whole.size <= K, s"$g state exceeded k")
    }
  }

  test("streamed estimates equal the batch twin and track true distincts") {
    val (first, second) = arrivals.splitAt(arrivals.size / 3)
    val mem = MemoryStream[KmvArrival](spark)
    val q = StreamingKmv.track(mem.toDS(), K)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("append").start()
    mem.addData(first); q.processAllAvailable()
    mem.addData(second); q.processAllAvailable()
    val streamed = spark.table("kmv_out").as[KmvEstimate].collect().toSeq
    q.stop()
    // the last (2nd) emission per group must equal the batch twin exactly
    val batch = StreamingKmv.trackBatch(arrivals.toDS(), K).collect()
      .map(e => e.group -> e).toMap
    val finals = streamed.groupBy(_.group).map { case (g, es) =>
      // per-group emissions are (batch1, batch2); order within the table
      // follows batch order because each processAllAvailable appends
      g -> es.last
    }
    finals.foreach { case (g, e) =>
      assert(e == batch(g), s"$g: stream ${e} != batch ${batch(g)}")
      val truth = exact(g)
      // KMV with k=16 has ~1/sqrt(k-1) ≈ 26% relative standard error;
      // assert a loose 3σ envelope so the test pins sanity, not luck
      assert(math.abs(e.est - truth) <= (truth * 4) / 5 + K,
        s"$g: estimate ${e.est} vs true $truth outside the envelope")
    }
    assert(finals.keySet == exact.keySet)
  }

  test("state stays bounded at k hashes under unbounded-vocabulary churn") {
    val s = (0 until 100000).foldLeft(Seq.empty[Long]) { (s, i) =>
      StreamingKmv.step(s, graft.ops.expr.Fnv1a64.hashCodePoints(s"v_$i"), K)
    }
    assert(s.size == K)
    // the estimate over 100k uniform-hashed distincts lands in the KMV
    // error envelope (k=16 → rse ≈ 26%; allow 4σ)
    val est = StreamingKmv.estimate(s, K)
    assert(est > 20000 && est < 300000, s"estimate $est wildly off 100000")
    // unsigned ascending order is maintained
    assert(s.sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
      case _ => true
    })
  }

  test("merged streaming sketches reproduce the batch q_kmv_setops union estimate") {
    // the batch AQP estimator and the streaming sketch share one contract:
    // per-type k-min summaries of fnv(user_id) merge by union-keep-k, and
    // the merged estimate must equal the ORACLED q_kmv_setops est_union
    // column. sf0.01 (150+ users/type) keeps every sketch at capacity,
    // where both sides use the same ⌊(k−1)·2⁶⁴/h_k⌋ formula.
    val dir = "/root/testdata/sf0.01"
    val summaries: Map[String, StreamingKmv.Summary] =
      spark.read.parquet(s"$dir/events.parquet")
        .selectExpr("event_type", "CAST(user_id AS STRING) AS u")
        .distinct().collect()
        .groupBy(_.getString(0))
        .map { case (t, rows) =>
          t -> rows.map(_.getString(1)).sorted.foldLeft(Seq.empty[Long]) {
            (s, u) => StreamingKmv.step(s,
              graft.ops.expr.Fnv1a64.hashCodePoints(u), K)
          }
        }
    def merged(a: String, b: String): StreamingKmv.Summary =
      summaries(b).foldLeft(summaries(a))((s, h) => StreamingKmv.step(s, h, K))
    val batch = SparkEntry.queries("q_kmv_setops")(spark, dir)
      .selectExpr("ta", "tb", "est_union").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(batch.size == 10)
    batch.foreach { case ((ta, tb), est) =>
      val m = merged(ta, tb)
      assert(m.size == K, s"$ta/$tb sketch below capacity")
      assert(StreamingKmv.estimate(m, K) == est,
        s"$ta/$tb: stream-merged ${StreamingKmv.estimate(m, K)} != batch $est")
    }
  }
}
