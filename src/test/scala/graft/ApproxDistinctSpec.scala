package graft

import org.apache.spark.sql.functions._

/** Quantified error bound for the one query the DuckDB gate can only
  * rows-check: `q_agg_approx_distinct` uses Spark's HLL++ with rsd = 0.02,
  * whose register layout is engine-private (no cross-engine hash oracle
  * possible). This spec closes the gap the hash gate cannot: per group,
  * the estimate must sit within 5×rsd (10%) of the exact distinct count —
  * far wider than the expected 1σ error, so it only trips on a real
  * regression (wrong column, wrong grouping, broken rsd plumbing), not on
  * estimator noise. With this, every registered query carries either a
  * hash oracle or a quantified bound.
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("q_agg_approx_distinct estimates within 5x rsd of exact per group") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .select($"event_type", $"approx_users")
      .as[(String, Long)].collect().toMap
    val exact = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet, "group sets diverge")
    assert(exact.values.forall(_ > 0), "fixture has empty groups")
    val worst = exact.map { case (k, ex) =>
      k -> math.abs(approx(k) - ex).toDouble / ex
    }
    val bound = 5 * 0.02
    assert(worst.values.forall(_ <= bound),
      s"HLL estimate outside the ${bound} envelope: " +
        worst.filter(_._2 > bound).toSeq.sortBy(-_._2).take(3).toString)
    info(s"max relative error ${worst.values.max} (bound $bound)")
  }
}
