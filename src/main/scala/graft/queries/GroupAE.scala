package graft.queries

import graft.ops.{DedupOps, VectorOps}
import graft.queries.Q._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-13 wave: k-detector agreement and retrieval-quality statistics —
  * the layer that extends round 12's pairwise detector evaluation (McNemar,
  * Cohen's κ) to THREE detectors and grades the ANN index the way IR teams
  * actually do.
  *
  * `q_cochran_q` is the k-sample generalization of McNemar: over the
  * exact-Jaccard truth-pair universe, do the exact-clone, MinHash, and
  * SimHash detectors have EQUAL recall? (McNemar can only compare two; with
  * three detectors in the suite the omnibus test comes first, pairwise
  * post-hocs after.) `q_fleiss_kappa` is the k-rater agreement coefficient
  * over the union universe of everything any detector or the truth set
  * flagged — the three-detector sibling of q_cohens_kappa, and the number
  * that says whether a 2-of-3 detector ensemble buys anything at 100 TB.
  * `q_ndcg` and `q_mrr` complete the index-quality family q_recall_at_k
  * started: recall@5 treats the exact top-5 as unordered, nDCG@5 grades the
  * LSH ranking with position discounts and graded gains (6−true_rank), MRR
  * asks the sharpest question — where does the TRUE nearest neighbor land?
  * `q_bh_fdr` is the multiple-testing layer the per-segment test family
  * (χ², KS, Mann–Whitney, permutation) was missing: per-event-type
  * permutation p-values corrected by Benjamini–Hochberg at α = 0.05 — the
  * guardrail between "some segment moved" and shipping a regression.
  * `q_sign_test` closes the paired-nonparametrics gap: the exact binomial
  * sign test on daily purchase-vs-view mean values, with the tail
  * probability computed by EXACT integer combinatorics (no normal
  * approximation — the calendar axis is ~30 days, where z-approximations
  * are at their worst).
  *
  * Determinism contracts: every statistic here is either pure integer
  * arithmetic carried in HUGEINT/DECIMAL(38,0) (Cochran, Fleiss, nDCG, MRR,
  * the binomial tail) or the house fixed-IEEE-op-sequence double
  * (permutation means), with ppm integerization by truncating division
  * sign-split where a statistic can go negative (Fleiss κ). nDCG's rank
  * discounts 1/log2(i+1) are engine-transcendental, so they enter as the
  * SAME five integer-ppm literals on both sides (a k=5 constant table, not
  * a runtime log) — determinism by construction.
  */
object GroupAE {

  /** Exact-clone pairs: docs whose distinct TOKEN SETS are identical —
    * the cheapest detector in the family (a hash groupBy, no banding, no
    * signatures), materialized once per session like the MinHash/SimHash
    * pair artifacts. Clone compaction is inherent: groups join nothing,
    * pairs expand by double explode (never one C(m,2) allocation). The
    * oracle recomputes it all-pairs via sorted-list equality. */
  private[graft] def exactTokPairs(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrMaterialize(spark, s"exact_tok_pairs:$dir") {
      tbl(spark, dir, "documents")
        .select(col("doc_id"), DedupOps.sortedTokenSet(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .groupBy(col("t"))
        .agg(sort_array(collect_list(col("doc_id"))).as("members"))
        .filter(size(col("members")) > 1)
        .select(explode(col("members")).as("a_id"), col("members"))
        .select(col("a_id"), explode(col("members")).as("b_id"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
    }

  /** Oracle CTE for [[exactTokPairs]], appended after GroupAB.detectorCtes
    * (consumes its `net`). */
  private val exCte: String =
    """ex AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM net a JOIN net b
      |    ON a.doc_id < b.doc_id AND list_sort(a.t) = list_sort(b.t))"""
      .stripMargin

  /** nDCG@5 rank discounts: floor(10⁶ / log2(rank+1)) for ranks 1..5 —
    * integer literals shared verbatim with the oracle (log2 is libm-
    * dependent; a constant table is not). IDCG@5 = Σ (6−j)·D(j) for the
    * ideal permutation = 10,271,920. */
  private[graft] val NdcgDiscountPpm = Seq(1000000L, 630929L, 500000L, 430676L, 386852L)
  private[graft] val IdcgPpm: Long =
    (1 to 5).map(j => (6L - j) * NdcgDiscountPpm(j - 1)).sum

  val all: Seq[Q] = Seq(

    // Cochran's Q omnibus test: do the three near-dup detectors (exact
    // token-set clone, MinHash ≥15/16, SimHash hamming ≤3) hit the same
    // share of the exact-Jaccard truth pairs? Per truth pair the three
    // binary hit indicators form a randomized-block design (block = pair,
    // treatment = detector); Q = (k−1)·(k·ΣCⱼ² − S²)/(k·S − ΣRᵢ²) with
    // k = 3, Cⱼ the per-detector hit totals, Rᵢ the per-pair hit counts,
    // S = ΣC = ΣR — all integers, carried in HUGEINT/DECIMAL(38,0)
    // (10⁶·C² passes 2⁶³ once detectors hit ~10⁶ pairs at sf1+). Q is
    // χ²₍k₋₁₎ under H₀; reject_05 compares the ppm value against
    // χ²₂,₀.₀₅ = 5.991465 in integers. den = 0 (every pair hit by none or
    // all) → the −1 sentinel. num ≥ 0 and den ≥ 0 algebraically (r² ≤ 3r
    // for r ∈ {0..3}), so truncating division needs no sign split.
    Q("q_cochran_q",
      s"""WITH ${GroupAB.detectorCtes},
        |$exCte,
        |x AS (
        |  SELECT coalesce(e.oe, 0) AS xe, coalesce(m.om, 0) AS xm,
        |         coalesce(s.os, 0) AS xs
        |  FROM jp
        |  LEFT JOIN (SELECT a_id, b_id, 1 AS oe FROM ex) e USING (a_id, b_id)
        |  LEFT JOIN (SELECT a_id, b_id, 1 AS om FROM mh) m USING (a_id, b_id)
        |  LEFT JOIN (SELECT a_id, b_id, 1 AS os FROM sh) s USING (a_id, b_id)),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(xe) AS HUGEINT) AS ce,
        |         CAST(sum(xm) AS HUGEINT) AS cm,
        |         CAST(sum(xs) AS HUGEINT) AS cs,
        |         CAST(sum((xe + xm + xs) * (xe + xm + xs)) AS HUGEINT) AS r2
        |  FROM x),
        |k AS (
        |  SELECT n, ce, cm, cs, ce + cm + cs AS st, r2,
        |         3 * (ce * ce + cm * cm + cs * cs)
        |           - (ce + cm + cs) * (ce + cm + cs) AS num,
        |         3 * (ce + cm + cs) - r2 AS den
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n_truth,
        |       CAST(ce AS BIGINT) AS c_exact,
        |       CAST(cm AS BIGINT) AS c_minhash,
        |       CAST(cs AS BIGINT) AS c_simhash,
        |       CAST(CASE WHEN den = 0 THEN -1
        |                 ELSE (1000000 * 2 * num) // den END AS BIGINT) AS q_ppm,
        |       CAST(CASE WHEN den = 0 THEN 0
        |                 WHEN (1000000 * 2 * num) // den > 5991465 THEN 1
        |                 ELSE 0 END AS BIGINT) AS reject_05
        |FROM k ORDER BY n_truth""".stripMargin) { (spark, dir) =>
      val wide = DecimalType(38, 0)
      val truth = PipelineQueries.jaccardPairs(spark, dir).select("a_id", "b_id")
      def flag(df: DataFrame, name: String) =
        df.select("a_id", "b_id").withColumn(name, lit(1))
      val x = truth
        .join(flag(exactTokPairs(spark, dir), "oe"), Seq("a_id", "b_id"), "left")
        .join(flag(PipelineDedup.minhashPairs(spark, dir), "om"),
          Seq("a_id", "b_id"), "left")
        .join(flag(PipelineDedup.simhashPairs(spark, dir), "os"),
          Seq("a_id", "b_id"), "left")
        .select(coalesce(col("oe"), lit(0)).as("xe"),
          coalesce(col("om"), lit(0)).as("xm"),
          coalesce(col("os"), lit(0)).as("xs"))
      x.agg(count(lit(1)).cast(wide).as("n"),
        sum(col("xe")).cast(wide).as("ce"),
        sum(col("xm")).cast(wide).as("cm"),
        sum(col("xs")).cast(wide).as("cs"),
        sum((col("xe") + col("xm") + col("xs"))
          * (col("xe") + col("xm") + col("xs"))).cast(wide).as("r2"))
        .withColumn("st", expr("ce + cm + cs"))
        .withColumn("num",
          expr("3 * (ce * ce + cm * cm + cs * cs) - st * st"))
        .withColumn("den", expr("3 * st - r2"))
        .select(big(col("n")).as("n_truth"), big(col("ce")).as("c_exact"),
          big(col("cm")).as("c_minhash"), big(col("cs")).as("c_simhash"),
          big(expr("CASE WHEN den = 0 THEN -1 ELSE " +
            "(CAST(1000000 AS DECIMAL(38,0)) * 2 * num) div den END"))
            .as("q_ppm"),
          big(expr("CASE WHEN den = 0 THEN 0 WHEN " +
            "(CAST(1000000 AS DECIMAL(38,0)) * 2 * num) div den > 5991465 " +
            "THEN 1 ELSE 0 END")).as("reject_05"))
    },

    // Fleiss' κ for the three detectors over the UNION universe (any pair
    // flagged by a detector or present in the truth set): chance-corrected
    // k-rater agreement, the 3-detector sibling of q_cohens_kappa. Per
    // item the rater-pair agreement is a(r) = r(r−1) + (3−r)(2−r) =
    // 2r² − 6r + 6 of the hit count r, so P̄ and the marginal p₁ come from
    // THREE sums (N, S = Σr, R2 = Σr²) — the universe is scanned once,
    // never re-rated. κ = (P̄ − Pₑ)/(1 − Pₑ) with Pₑ = p₁² + p₀²;
    // clearing denominators by 18N² keeps everything integer:
    //   num = 3N·(2R2 − 6S + 6N) − 2(S² + (3N−S)²)
    //   den = 18N² − 2(S² + (3N−S)²)
    // ppm integerization truncates toward zero with an explicit sign split
    // (κ < 0 = systematic disagreement — must not hit engine-specific
    // floor-vs-truncate). den = 0 (all items unanimous with p₁ ∈ {0,1})
    // → the −1 sentinel; p1_ppm carries the same −1 sentinel at N = 0 (an
    // empty union universe must not divide by zero — DuckDB errors where
    // Spark nulls, so the guard is the only engine-agreeing form).
    // HUGEINT/DECIMAL(38,0): 10⁶·N² passes 2⁶³ at ~10⁴
    // union pairs, which the sf1 clone fixture exceeds immediately.
    Q("q_fleiss_kappa",
      s"""WITH ${GroupAB.detectorCtes},
        |$exCte,
        |u AS (
        |  SELECT DISTINCT a_id, b_id FROM (
        |    SELECT a_id, b_id FROM jp UNION ALL SELECT a_id, b_id FROM ex
        |    UNION ALL SELECT a_id, b_id FROM mh
        |    UNION ALL SELECT a_id, b_id FROM sh)),
        |x AS (
        |  SELECT coalesce(e.oe, 0) + coalesce(m.om, 0) + coalesce(s.os, 0) AS r
        |  FROM u
        |  LEFT JOIN (SELECT a_id, b_id, 1 AS oe FROM ex) e USING (a_id, b_id)
        |  LEFT JOIN (SELECT a_id, b_id, 1 AS om FROM mh) m USING (a_id, b_id)
        |  LEFT JOIN (SELECT a_id, b_id, 1 AS os FROM sh) s USING (a_id, b_id)),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(r) AS HUGEINT) AS st,
        |         CAST(sum(r * r) AS HUGEINT) AS r2
        |  FROM x),
        |k AS (
        |  SELECT n, st, r2,
        |         3 * n * (2 * r2 - 6 * st + 6 * n)
        |           - 2 * (st * st + (3 * n - st) * (3 * n - st)) AS num,
        |         18 * n * n
        |           - 2 * (st * st + (3 * n - st) * (3 * n - st)) AS den
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n_items, CAST(st AS BIGINT) AS s_total,
        |       CAST(CASE WHEN n = 0 THEN -1
        |                 ELSE (1000000 * st) // (3 * n) END
        |            AS BIGINT) AS p1_ppm,
        |       CAST(CASE WHEN den = 0 THEN -1
        |                 WHEN num >= 0 THEN (1000000 * num) // den
        |                 ELSE -((1000000 * (-num)) // den) END
        |            AS BIGINT) AS kappa_ppm
        |FROM k ORDER BY n_items""".stripMargin) { (spark, dir) =>
      val wide = DecimalType(38, 0)
      def pairs(df: DataFrame) = df.select("a_id", "b_id")
      val ex = pairs(exactTokPairs(spark, dir))
      val mh = pairs(PipelineDedup.minhashPairs(spark, dir))
      val sh = pairs(PipelineDedup.simhashPairs(spark, dir))
      // round 15 (guide §2.3/§2.4): the hit count r per union pair is ONE
      // tagged-union aggregation — each detector table lists a pair at
      // most once (all three are built from disjoint signature groups
      // with a < b ordering), so sum(tag) over the concatenation equals
      // the three coalesced join flags, and the truth set rides along at
      // tag 0 only to complete the universe. Replaces the previous
      // union+distinct plus THREE shuffle joins (4 wide exchanges → 1)
      // with identical (a_id, b_id) → r, hence identical N/S/R2.
      def tagged(df: DataFrame, t: Int) = df.withColumn("tag", lit(t))
      val x = tagged(ex, 1)
        .unionByName(tagged(mh, 1)).unionByName(tagged(sh, 1))
        .unionByName(tagged(pairs(PipelineQueries.jaccardPairs(spark, dir)), 0))
        .groupBy("a_id", "b_id").agg(sum(col("tag")).as("r"))
        .select(col("r"))
      x.agg(count(lit(1)).cast(wide).as("n"),
        sum(col("r")).cast(wide).as("st"),
        sum(col("r") * col("r")).cast(wide).as("r2"))
        .withColumn("num",
          expr("3 * n * (2 * r2 - 6 * st + 6 * n)" +
            " - 2 * (st * st + (3 * n - st) * (3 * n - st))"))
        .withColumn("den",
          expr("18 * n * n - 2 * (st * st + (3 * n - st) * (3 * n - st))"))
        .select(big(col("n")).as("n_items"), big(col("st")).as("s_total"),
          big(expr("CASE WHEN n = 0 THEN -1 ELSE " +
            "(CAST(1000000 AS DECIMAL(38,0)) * st) div (3 * n) END"))
            .as("p1_ppm"),
          big(expr("CASE WHEN den = 0 THEN -1" +
            " WHEN num >= 0 THEN (CAST(1000000 AS DECIMAL(38,0)) * num) div den" +
            " ELSE -((CAST(1000000 AS DECIMAL(38,0)) * (-num)) div den) END"))
            .as("kappa_ppm"))
    },

    // nDCG@5 of the LSH ANN ranking against the exact brute-force ranking,
    // per query: gain of a returned neighbor = 6 − its TRUE rank (0 if
    // outside the exact top-5), discount = the shared integer-ppm table
    // (1/log2(rank+1) — literals, not runtime logs), IDCG the constant
    // ideal. Composes the two REGISTERED queries like q_recall_at_k — the
    // index definition cannot drift from the audit. Everything integer:
    // dcg ≤ 5·10⁶·5, ndcg_ppm = ⌊10⁶·dcg/IDCG⌋.
    Q("q_ndcg",
      s"""WITH ${PipelineAnn.annExactCtes},
        |ds AS (SELECT * FROM (VALUES (1, 1000000), (2, 630929), (3, 500000),
        |                             (4, 430676), (5, 386852)) AS v(rn, d)),
        |gains AS (SELECT query_id, neighbor_id, 6 - rn AS g
        |          FROM ex_rank WHERE rn <= 5),
        |dcg AS (
        |  SELECT r.query_id,
        |         sum(coalesce(g.g, 0) * ds.d) AS dcg
        |  FROM (SELECT query_id, neighbor_id, rn FROM ranked WHERE rn <= 5) r
        |  JOIN ds USING (rn)
        |  LEFT JOIN gains g USING (query_id, neighbor_id)
        |  GROUP BY 1),
        |qs AS (SELECT DISTINCT vec_id AS query_id FROM qn WHERE vec_id < 10)
        |SELECT query_id, CAST(coalesce(dcg, 0) AS BIGINT) AS dcg,
        |       CAST((1000000 * CAST(coalesce(dcg, 0) AS HUGEINT)) // $IdcgPpm
        |            AS BIGINT) AS ndcg_ppm
        |FROM qs LEFT JOIN dcg USING (query_id)
        |ORDER BY query_id""".stripMargin) { (spark, dir) =>
      val ann = graft.SparkEntry.queries("q_ann_lsh")(spark, dir)
        .select(col("query_id"), col("neighbor_id"), col("rn"))
      val exact = graft.SparkEntry.queries("q_cosine_topk")(spark, dir)
        .select(col("query_id"), col("neighbor_id"),
          (lit(6L) - col("rn")).as("g"))
      val disc = typedLit(NdcgDiscountPpm)
      val dcg = ann
        .join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("d", element_at(disc, col("rn").cast("int")))
        .groupBy("query_id")
        .agg(sum(coalesce(col("g"), lit(0L)) * col("d")).as("dcg"))
      exact.select("query_id").distinct()
        .join(dcg, Seq("query_id"), "left")
        .select(col("query_id"),
          big(coalesce(col("dcg"), lit(0L))).as("dcg"),
          big(expr(s"(CAST(1000000 AS DECIMAL(38,0)) * coalesce(dcg, 0))" +
            s" div $IdcgPpm")).as("ndcg_ppm"))
        .orderBy("query_id")
    },

    // MRR@5: per query, where does the TRUE nearest neighbor (exact rank
    // 1) land in the LSH ranking? ann_rank = 0 when outside the returned
    // top-5; rr_ppm = ⌊10⁶ / ann_rank⌋, 0 on miss. The sharpest
    // index-quality number — recall@5 forgives a top-1 at position 5,
    // MRR does not. Same registered-query composition as q_ndcg.
    Q("q_mrr",
      s"""WITH ${PipelineAnn.annExactCtes},
        |t1 AS (SELECT query_id, neighbor_id AS target_id
        |       FROM ex_rank WHERE rn = 1),
        |ar AS (SELECT query_id, neighbor_id, rn FROM ranked WHERE rn <= 5),
        |m AS (
        |  SELECT t1.query_id, t1.target_id, coalesce(ar.rn, 0) AS ann_rank
        |  FROM t1 LEFT JOIN ar
        |    ON t1.query_id = ar.query_id AND t1.target_id = ar.neighbor_id)
        |SELECT query_id, CAST(target_id AS BIGINT) AS target_id,
        |       CAST(ann_rank AS BIGINT) AS ann_rank,
        |       CAST(CASE WHEN ann_rank = 0 THEN 0
        |                 ELSE 1000000 // ann_rank END AS BIGINT) AS rr_ppm
        |FROM m ORDER BY query_id""".stripMargin) { (spark, dir) =>
      val ann = graft.SparkEntry.queries("q_ann_lsh")(spark, dir)
        .select(col("query_id"), col("neighbor_id").as("target_id"),
          col("rn").as("arn"))
      val t1 = graft.SparkEntry.queries("q_cosine_topk")(spark, dir)
        .filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id").as("target_id"))
      t1.join(ann, Seq("query_id", "target_id"), "left")
        .select(col("query_id"), big(col("target_id")).as("target_id"),
          big(coalesce(col("arn"), lit(0L))).as("ann_rank"))
        .withColumn("rr_ppm", big(expr(
          "CASE WHEN ann_rank = 0 THEN 0 ELSE 1000000 div ann_rank END")))
        .orderBy("query_id")
    },

    // Benjamini–Hochberg FDR across the per-event-type permutation tests:
    // each type's even/odd-user-cohort mean-value gap gets the
    // q_permutation_test treatment (64 deterministic FNV relabelings,
    // codes 48..111 distinct mod 64 — the repStep balanced-design
    // contract, salt 'bh:'), p = share of |relabeled gap| ≥ |observed|;
    // then the m p-values are BH-corrected at α = 0.05: rank ascending by
    // (p, type), reject ranks 1..i* where i* = max{i : pᵢ·m ≤ i·50000} —
    // pure integer comparisons. The per-type rank and the i* cutoff come
    // from a bounded m×m self-join + one scalar cross join (m = event
    // types, ≤ a handful — no global window, the q_bm25 shape). ONE scan
    // of events explodes ×64 into a map-side-combinable (type × replicate)
    // hash agg; observed and relabeled gaps are identical fixed IEEE op
    // sequences on exact-decimal sums.
    Q("q_bh_fdr",
      s"""WITH r AS (
        |  SELECT event_type AS t, value,
        |         'bh:' || CAST(event_id AS VARCHAR) || ':' AS ks,
        |         user_id
        |  FROM events),
        |h AS (
        |  SELECT t, value,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(list_filter(string_split(ks, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS HUGEINT))),
        |      (acc, x) -> (xor(acc, x) * 1099511628211)
        |                  % CAST(18446744073709551616 AS HUGEINT)) AS kh,
        |    user_id
        |  FROM r),
        |obs AS (
        |  SELECT t,
        |         CAST(sum(CASE WHEN user_id % 2 = 0
        |                       THEN CAST(value AS DECIMAL(25,6)) END) AS DOUBLE)
        |           / CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS DOUBLE)
        |         - CAST(sum(CASE WHEN user_id % 2 = 1
        |                         THEN CAST(value AS DECIMAL(25,6)) END) AS DOUBLE)
        |           / CAST(count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS DOUBLE)
        |           AS t_obs
        |  FROM h
        |  GROUP BY t
        |  HAVING count(CASE WHEN user_id % 2 = 0 THEN 1 END) > 0
        |     AND count(CASE WHEN user_id % 2 = 1 THEN 1 END) > 0),
        |rep AS (
        |  SELECT t, b,
        |         CAST(sum(CASE WHEN side = 0
        |                       THEN CAST(value AS DECIMAL(25,6)) END) AS DOUBLE)
        |           / CAST(count(CASE WHEN side = 0 THEN 1 END) AS DOUBLE)
        |         - CAST(sum(CASE WHEN side = 1
        |                         THEN CAST(value AS DECIMAL(25,6)) END) AS DOUBLE)
        |           / CAST(count(CASE WHEN side = 1 THEN 1 END) AS DOUBLE)
        |           AS tb
        |  FROM (
        |    SELECT t, value, b,
        |           (((xor(kh, CAST(48 + b AS HUGEINT)) * 1099511628211)
        |             % CAST(18446744073709551616 AS HUGEINT)) % 64) // 32 AS side
        |    FROM h, range(0, 64) AS br(b))
        |  GROUP BY t, b
        |  HAVING count(CASE WHEN side = 0 THEN 1 END) > 0
        |     AND count(CASE WHEN side = 1 THEN 1 END) > 0),
        |pv AS (
        |  SELECT obs.t, obs.t_obs,
        |         count(*) AS n_reps,
        |         count(CASE WHEN abs(rep.tb) >= abs(obs.t_obs) THEN 1 END)
        |           AS n_extreme
        |  FROM obs JOIN rep ON obs.t = rep.t
        |  GROUP BY obs.t, obs.t_obs),
        |pp AS (
        |  SELECT t, t_obs,
        |         CAST((1000000 * CAST(n_extreme AS HUGEINT)) // n_reps
        |              AS BIGINT) AS p_ppm
        |  FROM pv),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pp),
        |rk AS (
        |  SELECT a.t, a.t_obs, a.p_ppm, count(*) AS bh_rank
        |  FROM pp a JOIN pp b
        |    ON b.p_ppm < a.p_ppm OR (b.p_ppm = a.p_ppm AND b.t <= a.t)
        |  GROUP BY a.t, a.t_obs, a.p_ppm),
        |cut AS (
        |  SELECT coalesce(max(CASE WHEN rk.p_ppm * mm.m <= rk.bh_rank * 50000
        |                           THEN rk.bh_rank END), 0) AS istar
        |  FROM rk, mm)
        |SELECT rk.t AS event_type, rk.t_obs, rk.p_ppm,
        |       CAST(rk.bh_rank AS BIGINT) AS bh_rank,
        |       CAST(CASE WHEN rk.bh_rank <= cut.istar THEN 1 ELSE 0 END
        |            AS BIGINT) AS rejected
        |FROM rk, cut
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val dec = DecimalType(25, 6)
      // row prefix hashed once; replicates extend by the native FnvStep
      // (codes 48..111 distinct mod 64 — the repStep contract)
      val r = events(spark, dir)
        .select(col("event_type").as("t"), col("value"), col("user_id"),
          VectorOps.fnv1a64(concat(lit("bh:"), col("event_id").cast("string"),
            lit(":"))).as("kh"))
      val obs = r.groupBy("t")
        .agg(
          sum(when(col("user_id") % 2 === 0, col("value").cast(dec))).as("s0"),
          count(when(col("user_id") % 2 === 0, 1)).as("c0"),
          sum(when(col("user_id") % 2 === 1, col("value").cast(dec))).as("s1"),
          count(when(col("user_id") % 2 === 1, 1)).as("c1"))
        .filter(col("c0") > 0 && col("c1") > 0)
        .select(col("t"),
          (col("s0").cast(DoubleType) / col("c0").cast(DoubleType)
            - col("s1").cast(DoubleType) / col("c1").cast(DoubleType))
            .as("t_obs"))
      // drop user_id before the ×64 explode — the replicate path only
      // needs (t, value, ks); the observed-arm column would be amplified
      // 64× for nothing. AMPLIFICATION-AWARE REPARTITION (measured at sf1):
      // the explode inherits the SCAN's partitioning, sized for the
      // pre-amplified bytes (a 7.5 MB events file scans as 2 partitions),
      // so the ×64-amplified agg ran in 2 tasks with 30 cores idle — 43 s
      // for work that takes ~2 s spread out. One cheap shuffle of the
      // small pre-explode rows fixes the layout; the agg is a commutative
      // exact-decimal fold, so row order cannot change the result. The
      // same rule holds at 100 TB: size partitions for the post-explode
      // volume, not the scan bytes.
      val rep = r.drop("user_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("b", explode(sequence(lit(0), lit(63))))
        .withColumn("hb", VectorOps.fnvStep(col("kh"), col("b") + lit(48L)))
        .withColumn("side", expr("pmod(hb, 64) div 32"))
        .groupBy("t", "b")
        .agg(sum(when(col("side") === 0, col("value").cast(dec))).as("s0"),
          count(when(col("side") === 0, 1)).as("c0"),
          sum(when(col("side") === 1, col("value").cast(dec))).as("s1"),
          count(when(col("side") === 1, 1)).as("c1"))
        .filter(col("c0") > 0 && col("c1") > 0)
        .select(col("t"),
          (col("s0").cast(DoubleType) / col("c0").cast(DoubleType)
            - col("s1").cast(DoubleType) / col("c1").cast(DoubleType))
            .as("tb"))
      val pp = obs.join(rep, Seq("t"))
        .groupBy("t", "t_obs")
        .agg(count(lit(1)).as("n_reps"),
          count(when(abs(col("tb")) >= abs(col("t_obs")), 1)).as("n_extreme"))
        .select(col("t"), col("t_obs"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * n_extreme) div n_reps"))
            .as("p_ppm"))
        // the p-value table is m rows (event types): pin it before the
        // self-join + scalar cross join below re-derive it twice
        .localCheckpoint(true)
      val mm = broadcast(pp.agg(count(lit(1)).as("m")))
      // rank without a global window (PlanGuard): bounded m×m self-join
      val b2 = pp.select(col("t").as("t2"), col("p_ppm").as("p2"))
      val rk = pp.join(broadcast(b2),
        col("p2") < col("p_ppm") ||
          (col("p2") === col("p_ppm") && col("t2") <= col("t")))
        .groupBy("t", "t_obs", "p_ppm")
        .agg(count(lit(1)).as("bh_rank"))
      val cut = broadcast(rk.crossJoin(mm)
        .agg(coalesce(max(when(col("p_ppm") * col("m") <= col("bh_rank") * 50000,
          col("bh_rank"))), lit(0L)).as("istar")))
      rk.crossJoin(cut)
        .select(col("t").as("event_type"), col("t_obs"), col("p_ppm"),
          big(col("bh_rank")).as("bh_rank"),
          big(when(col("bh_rank") <= col("istar"), 1L).otherwise(0L))
            .as("rejected"))
        .orderBy("event_type")
    },

    // Exact binomial sign test on paired daily means: for each calendar
    // day with both a purchase and a view mean, score the sign of
    // (purchase − view); under H₀ signs are fair coin flips, so the
    // two-sided p-value is 2·P(X ≤ min(pos, neg)) with X ~ Bin(n, ½) —
    // computed EXACTLY: C(n,i) by the stepwise-exact product
    // ∏ⱼ (n−j+1)/j (each prefix is itself a binomial coefficient, so the
    // truncating division never loses a remainder), summed over
    // i = 0..min, scaled by 2·10⁶, divided by 2ⁿ, capped at 10⁶ (the
    // classical convention when pos = neg double-counts the middle term).
    // The stepwise product carries in HUGEINT/DECIMAL(38,0): the PREFIX
    // coefficients all fit int64 up to n = 66, but the intermediate
    // acc·(n−j+1) passes 2⁶³ at n = 62 (C(62,30)·32 ≈ 1.44e19), where
    // non-ANSI Spark would wrap silently while DuckDB BIGINT errors —
    // widening keeps both engines exact, and the binding constraint
    // becomes the 2ⁿ BIGINT shift on the Spark side: exact for n ≤ 62,
    // and ENFORCED — n > 62 returns the −1 sentinel on BOTH engines
    // (ADVICE r14: Spark's `1L << n` wraps silently past 62 while
    // DuckDB's HUGEINT shift stays exact, so an unguarded bound would
    // diverge silently exactly where the old comment claimed safety).
    // The calendar axis is ~30 days, half that bound. Ties (exactly equal
    // means — the means are identical IEEE op sequences on both engines)
    // drop from n, the standard sign-test treatment.
    Q("q_sign_test",
      s"""WITH ${GroupAB.dailyCte},
        |x AS (
        |  SELECT p.day, p.m AS mp, v.m AS mv
        |  FROM d p JOIN d v ON p.day = v.day
        |  WHERE p.t = 'purchase' AND v.t = 'view'),
        |s AS (
        |  SELECT count(CASE WHEN mp > mv THEN 1 END) AS pos,
        |         count(CASE WHEN mp < mv THEN 1 END) AS neg
        |  FROM x),
        |k AS (SELECT pos, neg, pos + neg AS n, least(pos, neg) AS kk FROM s),
        |t AS (
        |  SELECT pos, neg, n, kk,
        |         CASE WHEN n = 0 THEN CAST(0 AS HUGEINT) ELSE
        |           list_sum(list_transform(range(0, kk + 1), i ->
        |             CASE WHEN i = 0 THEN CAST(1 AS HUGEINT) ELSE
        |               list_reduce(
        |                 list_prepend(CAST(1 AS HUGEINT), range(1, i + 1)),
        |                 (acc, j) -> (acc * (n - j + 1)) // j) END))
        |         END AS tail
        |  FROM k)
        |SELECT CAST(n AS BIGINT) AS n_days, CAST(pos AS BIGINT) AS n_pos,
        |       CAST(neg AS BIGINT) AS n_neg,
        |       CAST(CASE WHEN n = 0 OR n > 62 THEN -1
        |                 ELSE least(1000000,
        |                   (2000000 * CAST(tail AS HUGEINT))
        |                     // (CAST(1 AS HUGEINT) << n)) END
        |            AS BIGINT) AS p_ppm,
        |       CAST(CASE WHEN n > 0 AND n <= 62
        |                  AND (2000000 * CAST(tail AS HUGEINT))
        |                     // (CAST(1 AS HUGEINT) << n) <= 50000
        |                 THEN 1 ELSE 0 END AS BIGINT) AS significant_05
        |FROM t ORDER BY n_days""".stripMargin) { (spark, dir) =>
      val d = GroupAB.daily(spark, dir)
      val x = d.filter(col("t") === "purchase")
        .select(col("day"), col("m").as("mp"))
        .join(d.filter(col("t") === "view")
          .select(col("day"), col("m").as("mv")), Seq("day"))
      x.agg(count(when(col("mp") > col("mv"), 1)).as("pos"),
        count(when(col("mp") < col("mv"), 1)).as("neg"))
        .withColumn("n", col("pos") + col("neg"))
        .withColumn("kk", least(col("pos"), col("neg")))
        // Spark's sequence(1, 0) runs DESCENDING (it infers step sign), so
        // the i = 0 term is guarded rather than folded over an empty range
        .withColumn("tail", expr(
          """CASE WHEN n = 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE
            |  aggregate(sequence(0, kk), CAST(0 AS DECIMAL(38,0)), (acc, i) ->
            |    CAST(acc + CASE WHEN i = 0 THEN CAST(1 AS DECIMAL(38,0)) ELSE
            |      aggregate(sequence(1, i), CAST(1 AS DECIMAL(38,0)),
            |        (a2, j) -> CAST((a2 * (n - j + 1)) div j AS DECIMAL(38,0)))
            |      END AS DECIMAL(38,0)))
            |END""".stripMargin))
        .select(big(col("n")).as("n_days"), big(col("pos")).as("n_pos"),
          big(col("neg")).as("n_neg"),
          big(expr("CASE WHEN n = 0 OR n > 62 THEN -1 ELSE least(CAST(1000000 AS " +
            "DECIMAL(38,0)), (CAST(2000000 AS DECIMAL(38,0)) * tail) div " +
            "(CAST(1 AS BIGINT) << n)) END")).as("p_ppm"),
          big(expr("CASE WHEN n > 0 AND n <= 62 AND (CAST(2000000 AS DECIMAL(38,0)) * " +
            "tail) div (CAST(1 AS BIGINT) << n) <= 50000 THEN 1 ELSE 0 END"))
            .as("significant_05"))
    },
  )
}
