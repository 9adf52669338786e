package graft

import graft.stream.{HeavyHitters, HeavyHitter, TokenArrival}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** SpaceSaving streaming heavy hitters: the sketch guarantees (count
  * bounds, guaranteed-frequent coverage, bounded state) on real fixture
  * token streams, held across arbitrary micro-batch splits. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32

  /** Fixture token stream: (lang, token) arrivals from the documents
    * table, deterministic order (doc_id, position). */
  private lazy val arrivals: Seq[TokenArrival] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang",
        "filter(split(lower(text), ' '), t -> t != '') AS toks")
      .collect()
      .sortBy(_.getLong(0))
      .flatMap(r => r.getSeq[String](2).map(TokenArrival(r.getString(1), _)))
      .toSeq

  private lazy val exact: Map[(String, String), Long] =
    arrivals.groupBy(a => (a.group, a.token)).map { case (k, v) => k -> v.size.toLong }

  private lazy val totals: Map[String, Long] =
    arrivals.groupBy(_.group).map { case (g, v) => g -> v.size.toLong }

  private def checkGuarantees(finals: Seq[HeavyHitter]): Unit = {
    finals.foreach { h =>
      val truth = exact.getOrElse((h.group, h.token), 0L)
      assert(h.count_hat >= truth,
        s"${h.group}/${h.token}: hat ${h.count_hat} < true $truth")
      assert(h.count_hat - h.err <= truth,
        s"${h.group}/${h.token}: lower bound ${h.count_hat - h.err} > true $truth")
    }
  }

  test("batch twin: bounds hold and every guaranteed-frequent token is tracked") {
    val out = HeavyHitters.trackBatch(arrivals.toDS(), K).collect().toSeq
    checkGuarantees(out)
    // coverage check runs on the full summaries, not the emitted top-10
    val summaries = arrivals.groupBy(_.group).map { case (g, as) =>
      g -> as.foldLeft((0L, Seq.empty[HeavyHitters.Entry])) { (s, a) =>
        HeavyHitters.step(s, a.token, K)
      }
    }
    summaries.foreach { case (g, (n, es)) =>
      assert(es.size <= K, s"$g summary exceeded k")
      val tracked = es.map(_._1).toSet
      exact.collect { case ((`g`, t), c) if c > n / K => t }.foreach { t =>
        assert(tracked(t), s"$g: guaranteed-frequent '$t' missing from summary")
      }
    }
  }

  test("streamed summary keeps the guarantees across micro-batch splits") {
    val (first, second) = arrivals.splitAt(arrivals.size / 3)
    val mem = MemoryStream[TokenArrival](spark)
    val q = HeavyHitters.track(mem.toDS(), K)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    mem.addData(first); q.processAllAvailable()
    mem.addData(second); q.processAllAvailable()
    val streamed = spark.table("hh_out").as[HeavyHitter].collect().toSeq
    q.stop()
    // final emission per group = the one with the largest n
    val finals = streamed.groupBy(_.group).toSeq.flatMap { case (g, hs) =>
      val nMax = hs.map(_.n).max
      assert(nMax == totals(g), s"$g: stream folded ${nMax} of ${totals(g)}")
      hs.filter(_.n == nMax)
    }
    checkGuarantees(finals)
    // the top tracked token per group is the true per-group top token:
    // its true count dominates n/k on this corpus, so SpaceSaving cannot
    // have evicted it and count_hat of the leader is exact or inflated
    // by at most err — compare against the exact leader
    finals.groupBy(_.group).foreach { case (g, hs) =>
      val lead = hs.minBy(h => (-h.count_hat, h.token))
      val trueLead = exact.collect { case ((`g`, t), c) => (t, c) }
        .toSeq.minBy { case (t, c) => (-c, t) }
      assert(lead.count_hat >= trueLead._2,
        s"$g: stream leader underestimates the true leader")
    }
  }

  test("state stays bounded at k entries under adversarial churn") {
    // 10k distinct tokens, each once: worst case for SpaceSaving state
    val churn = (0 until 10000).map(i => TokenArrival("x", s"tok_$i"))
    val (n, es) = churn.foldLeft((0L, Seq.empty[HeavyHitters.Entry])) {
      (s, a) => HeavyHitters.step(s, a.token, K)
    }
    assert(n == 10000L)
    assert(es.size == K)
    // every entry's lower bound is still sound (true count = 0 or 1)
    es.foreach { e =>
      assert(e._2 - e._3 <= 1L, s"${e._1}: lower bound ${e._2 - e._3} > 1")
    }
  }
}
