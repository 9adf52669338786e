package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Scale regression guard: every declared query must compile to a plan with
  * no cartesian product, no partition-less window (single-task global
  * sorts), and no broadcast-nested-loop join outside the documented
  * exceptions where the broadcast side is a bounded literal-sized input.
  * These are exactly the plan shapes that stop scaling at 100× data.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries deliberately joining a bounded broadcast side on a non-equi
    * condition: the brute-force cosine baseline streams all candidates
    * against 10 broadcast query vectors (its LSH/IVF siblings are the
    * scale paths), and BM25 cross-joins a ONE-ROW corpus-stats aggregate
    * (N, avgdl) — the scalar-subquery shape, bounded by construction.
    * q_snapshot_at / q_merge_upsert cross-join a ONE-ROW max-LSN cut the
    * same way. */
  private val nonEquiAllowed =
    Set("q_cosine_topk", "q_knn_vote", "q_bm25", "q_maxsim", "q_snapshot_at",
      "q_merge_upsert", "q_idf_novelty", "q_collocations",
      "q_binary_ann", // same 10-query broadcast scan shape as q_cosine_topk
      "q_ivf_stats",  // ONE-ROW index-stats cross join, the q_bm25 shape
      "q_tpch_q22",   // ONE-ROW global-average cross join (scalar subquery)
      "q_tpch_q11",   // ONE-ROW global-total cross join (scalar subquery)
      "q_dsir",       // ONE-ROW feature-total cross join (scalar subquery)
      "q_bpe_apply",  // ONE-ROW top-merge-pair cross join (scalar subquery)
      "q_inverted_topk", // ONE-ROW corpus-count cross join (the q_bm25 shape)
      "q_rank_fusion",   // dense leg = q_cosine_topk's 10-query broadcast scan
      "q_hard_negatives", // same 10-query broadcast scan, label-mismatch pred
      "q_class_balance",  // ONE-ROW minority-count cross join (scalar shape)
      "q_mix_temperature", // ONE-ROW weight-total cross join (scalar shape)
      "q_crosstab",        // ONE-ROW grand-total cross join (scalar shape)
      "q_recall_at_k",     // composes q_cosine_topk's broadcast scan leg
      "q_ks_drift",        // bounded-type-set grid cross + ONE-ROW total
      "q_wasserstein_drift", // same bounded grid cross + ONE-ROW total as KS
      "q_bloom_fpr",       // ONE-ROW stat cross joins (the q_bm25 shape)
      "q_kaplan_meier",    // ONE-ROW horizon cross join (scalar shape)
      "q_log_rank",        // ONE-ROW horizon cross join (scalar shape)
      "q_mann_whitney",    // 2-row type grid cross + ONE-ROW counts cross
      "q_skyline",         // calendar-bounded date-max × date-max dominance
      "q_rolling_distinct", // ≤7-offset calendar range join over the bounded day axis
      "q_basket_pairs",    // ONE-ROW order-count cross join (scalar shape)
      "q_skew_advisor",    // ONE-ROW Σc² cross join (scalar shape)
      "q_mmr_diversify",   // shortlist from the 10-query broadcast scan
      "q_rfm_segments",    // ONE-ROW max-date + ONE-ROW median cross joins
      "q_rollup_share",    // ONE-ROW grand-total cross join (scalar shape)
      "q_label_noise",     // FIXED 64-row panel broadcast scan (q_knn_vote shape)
      "q_dow_profile",     // ONE-ROW grand-total cross join (scalar shape)
      "q_benford",         // ONE-ROW grand-total cross join (scalar shape)
      "q_rolling_median",  // ≤7-offset calendar range join (bounded day axis)
      "q_vocab_coverage",  // ONE-ROW token-total cross join (scalar shape)
      "q_kmv_setops",      // bounded type-axis pair grid (the q_ks_drift shape)
      "q_join_sample",     // ONE-ROW exact×sample cross join (scalar shape)
      "q_fair_quota",      // ONE-ROW budget + water-level cross joins
      "q_join_order",      // ONE-ROW cardinality-probe cross joins
      "q_fk_violations",   // ONE-ROW child-total cross join per relationship
      "q_kruskal_wallis",  // ONE-ROW (N, Σq) H-statistic cross join (scalar shape)
      "q_detector_agreement", // ONE-ROW truth-count cross join (scalar shape)
      "q_cuped",           // ONE-ROW calendar-midpoint + moment cross joins
      "q_friedman",        // ONE-ROW k + (n,k,ΣR²) statistic cross joins
      "q_source_divergence", // bounded |sources|² pair grid (the q_ks_drift shape)
      "q_cohens_kappa",      // ONE-ROW count cross joins (scalar shape)
      "q_permutation_test",  // ONE-ROW observed-gap + 64-row replicate crosses
      "q_ab_lift",           // ONE-ROW obs × 16-row replicate-rank cross
      "q_winsorized_lift",   // ONE-ROW arm × ONE-ROW arm cross (scalar shape)
      "q_ndcg",              // composes q_cosine_topk's broadcast scan leg
      "q_mrr",               // composes q_cosine_topk's broadcast scan leg
      "q_bh_fdr")            // bounded |event types|² BH-rank self-join +
                             // ONE-ROW m/i* crosses (the q_ks_drift shape)

  /** Queries deliberately running a partition-less window over a BOUNDED
    * axis (the frame is dimension-sized by construction, never data-sized):
    * q_revenue_growth lags over the ≤decades-row year axis, q_wilson_rank
    * ranks the 20-row source dimension. */
  private val globalWindowAllowed =
    Set("q_revenue_growth", "q_wilson_rank",
      "q_fair_quota", // waterfilling over the ≤|sources|-row mass axis
      "q_kaplan_meier", // at-risk cumsum over the calendar-bounded axis
      "q_log_rank",     // same bounded-axis per-cohort cumsums
      "q_kruskal_wallis", // global rank over the bounded types×days axis
      "q_ab_lift")        // rank over EXACTLY 16 replicate rows (literal-bounded)

  test("no global windows, cartesian products, or stray nested-loop joins") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val qe = fn(spark, sfDir).queryExecution
        val globalWindows = qe.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        val physical = qe.sparkPlan.toString
        val problems =
          (if (globalWindows.nonEmpty && !globalWindowAllowed(name))
            Seq("partition-less window") else Nil) ++
          (if (physical.contains("CartesianProduct")) Seq("cartesian product") else Nil) ++
          (if (physical.contains("BroadcastNestedLoopJoin") &&
            !nonEquiAllowed(name)) Seq("nested-loop join") else Nil)
        problems.map(p => s"$name: $p")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("TPC-H headline joins: hinted dims broadcast, fact-fact shuffles") {
    // disable size-based auto-broadcast so the asserted shapes are the
    // ones a 100TB run would get (where no fact side fits the threshold):
    // explicit broadcast() hints must survive, everything else must
    // shuffle on its join key
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      // q2: the EUROPE-supplier slice broadcasts under a documented bound
      // (supplier:fact = 1:6000, ~60-100 MB at sf10k; see GroupF), while
      // the LARGE slice of part follows the q14/q19 convention and
      // SHUFFLES — its join reuses the window's l_partkey partitioning
      for (name <- Seq("q_tpch_q3", "q_tpch_q10", "q_tpch_q18", "q_tpch_q5",
        "q_tpch_q21", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q17",
        "q_tpch_q2")) {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.sparkPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"$name lost its dimension broadcast")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name fact-fact join is not a shuffle join")
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"), s"$name degenerate join")
      }
      // Q4's EXISTS set is lineitem-sized distinct orderkeys, and Q14/Q19
      // join a type-filtered slice of part (1/6 of a growing dimension) —
      // none broadcastable at scale, so their honest plans are pure
      // shuffle joins on the keys both sides already hash by
      for (name <- Seq("q_tpch_q4", "q_tpch_q14", "q_tpch_q19")) {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.sparkPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name join is not a shuffle join")
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"), s"$name degenerate join")
      }
      assert(SparkEntry.queries("q_tpch_q4")(spark, sfDir)
        .queryExecution.sparkPlan.toString.contains("LeftSemi"),
        "q_tpch_q4 lost its semi-join")
    } finally spark.conf.set(key, prev)
  }

  test("multi-index simhash blocking stays sub-quadratic where chunks saturate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // saturation-shaped fixture: uniform random 64-bit signatures (no true
    // near-dups) — everything the blocker emits is a random collision.
    // At n=4000, 16-bit chunks expect 4·C(n,2)/2^16 ≈ 488 spurious
    // candidates (and grow quadratically: 100× docs → 10,000× pairs);
    // 20 block-triple tables at ~32 bits expect ≈ 0.02.
    val n = 4000
    val rnd = new scala.util.Random(11)
    val sigs = Seq.fill(n)(rnd.nextLong()).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "sim")
    def candidates(keys: org.apache.spark.sql.Column): Long = {
      val k = sigs.withColumn("k", explode(keys))
      k.select($"id".as("a"), $"k")
        .join(k.select($"id".as("b"), $"k"), "k")
        .filter($"a" < $"b").select("a", "b").distinct().count()
    }
    val viaChunks = candidates(graft.ops.DedupOps.simhashChunks($"sim"))
    val viaMulti = candidates(graft.ops.DedupOps.simhashMultiKeys($"sim"))
    info(s"random-collision candidates: chunks=$viaChunks multi=$viaMulti")
    assert(viaChunks > 100, s"fixture not saturation-shaped: $viaChunks")
    assert(viaMulti < viaChunks / 20,
      s"multi-index blocking lost its selectivity: $viaMulti vs $viaChunks")
    // losslessness: every pair within hamming distance 3 must still be a
    // candidate (pigeonhole over the 6 blocks — ≥3 untouched blocks form
    // one of the C(6,3) triple tables)
    val base = Seq.fill(200)(rnd.nextLong())
    val perturbed = base.zipWithIndex.flatMap { case (s, i) =>
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val mutated = (0 until flips).foldLeft(s)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      Seq((i.toLong * 2, s), (i.toLong * 2 + 1, mutated))
    }.toDF("id", "sim")
    val keys = perturbed.withColumn("k",
      explode(graft.ops.DedupOps.simhashMultiKeys($"sim")))
    val found = keys.select($"id".as("a"), $"sim".as("sa"), $"k")
      .join(keys.select($"id".as("b"), $"sim".as("sb"), $"k"), "k")
      .filter($"a" < $"b" && bit_count($"sa".bitwiseXOR($"sb")) <= 3)
      .select("a", "b").distinct()
      .as[(Long, Long)].collect().toSet
    val expected = perturbed.as[(Long, Long)].collect()
      .combinations(2).collect {
        case Array((ia, sa), (ib, sb))
          if java.lang.Long.bitCount(sa ^ sb) <= 3 =>
          (math.min(ia, ib), math.max(ia, ib))
      }.toSet
    assert(expected.subsetOf(found),
      s"multi-index blocking dropped ${(expected -- found).size} true pairs")
  }
}
