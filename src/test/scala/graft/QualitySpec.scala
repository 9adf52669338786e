package graft

import graft.queries.QualityQueries

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-3 curation operators, beyond the
  * driver's value-level oracle: membership identities, bounds, and
  * replay-determinism that must hold on ANY corpus. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    QualityQueries.all.find(_.name == name).get.fn(spark, sfDir)

  test("sliding windows: every event lands in exactly two windows") {
    val winN = q("q_sliding_window").agg(sum($"n")).as[Long].head()
    val events = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(winN == 2 * events)
  }

  test("containment is directional and bounded") {
    val rows = q("q_ngram_containment")
      .select($"a_id", $"b_id", $"containment").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, c) => a != b && c >= 0.6 && c <= 1.0 })
    // full containment must be witnessed by an actual shingle subset
    val full = rows.filter(_._3 == 1.0)
    assert(full.nonEmpty, "fixture clone clusters should contain fully")
  }

  test("dup spans: duplicated windows are bounded by total windows") {
    val rows = q("q_dup_spans")
      .select($"n_windows", $"n_dup_windows").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (nw, nd) => nd >= 0 && nd <= nw })
    assert(rows.exists(_._2 > 0), "clone clusters must share spans")
  }

  test("stratified sample: at most k per stratum, identical on replay") {
    val s1 = q("q_sample_stratified").collect().toSeq
    val s2 = q("q_sample_stratified").collect().toSeq
    assert(s1 == s2, "sample must be a pure function of the input")
    val perLang = s1.groupBy(_.getString(1)).view.mapValues(_.size)
    assert(perLang.values.forall(_ <= 20))
  }

  test("bm25 scores are positive and only for docs containing a query term") {
    val scored = q("q_bm25")
    val n = scored.count()
    assert(n > 0)
    assert(scored.filter($"bm25" <= 0).isEmpty)
    val withTerm = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(lower($"text").rlike("(^| )(join|hash|vector)( |$)"))
      .count()
    assert(n == withTerm)
  }

  test("quality funnel: each successive rule can only shrink the cohort") {
    val rows = q("q_quality_funnel")
      .select($"n_docs", $"pass_len", $"pass_punct", $"pass_rep")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, a, b, c) => n >= a && a >= b && b >= c })
  }

  test("repetition ratio: bounds and bigram fraction sanity") {
    val rows = q("q_repetition_ratio")
      .select($"dup_token_ratio", $"top_bigram_frac").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (d, t) => d >= 0 && d < 1 && t >= 0 && t <= 1 })
  }
}
