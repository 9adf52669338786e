package graft.queries

import graft.ops.{DedupOps, VectorOps}
import graft.queries.Q._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-12 second wave: experimentation & detector-evaluation statistics —
  * the decision layer a data team runs on top of the pipeline's outputs.
  *
  * `q_mcnemar` and `q_cohens_kappa` complete the detector-evaluation story
  * q_detector_agreement started: McNemar's paired test asks whether the
  * MinHash and SimHash detectors' ERROR RATES differ (only discordant pairs
  * carry information — all of which lie inside the two detected-pair sets,
  * so the test never touches the quadratic pair universe), and Cohen's κ
  * measures their agreement beyond chance over the C(n,2) pair universe —
  * computed ALGEBRAICALLY from four counts (the universe is never
  * enumerated). `q_permutation_test` is the assumption-free two-sample
  * test: 64 deterministic FNV-derived relabelings of the purchase/view
  * slice, p = share of relabeled mean gaps at least as extreme as the
  * observed one. `q_jackknife` is the classic leave-one-out standard error
  * over the calendar-bounded daily-mean axis — each leave-one-day-out mean
  * is pure algebra on the per-type total, so the replicates cost one join,
  * not n passes. `q_srm` is the sample-ratio-mismatch guardrail every
  * experiment platform runs before reading any metric (a 50/50 split whose
  * per-day χ² crosses 3.841 invalidates the day). `q_ab_lift` is the
  * experiment read-out itself: the even/odd-cohort mean-value lift with a
  * one-pass Poisson-bootstrap CI (q_poisson_bootstrap's machinery applied
  * to the DIFFERENCE statistic).
  *
  * Determinism contracts follow the house rules: exact-DECIMAL sums, fixed
  * IEEE op sequences mirrored term-for-term in the oracle, integer ppm with
  * explicit truncation, and all replicate randomness from FNV-1a folds
  * whose replicate character extends the row hash by ONE fold step.
  * Buckets are the LOW k bits of that extended hash (`% 2^k`), with the
  * replicate CODES chosen distinct mod 2^k (ASCII 48..63 for k=4, 48..111
  * for k=6): one closing mod-2⁶⁴ multiply diffuses differences upward
  * only, so the low k bits are an odd-multiplier bijection of
  * (kh ⊕ code) mod 2^k — distinct codes therefore give every row a
  * bucket map that is a BIJECTION over replicates (the balanced design,
  * spec-pinned by GroupABSpec's replicate-bijection test). No fixed
  * "upper bit window" works: GroupAB's round-12 note records that a
  * bits-40+ extraction aliased replicates at 100% row agreement and was
  * rejected. See `repStep` below for the per-row algebra.
  */
object GroupAC {

  /** One FNV-1a64 fold of a DuckDB VARCHAR expression, as HUGEINT in
    * [0, 2⁶⁴) — the per-character xor-multiply chain every hash oracle in
    * the repo replays. */
  private def fnvFold(e: String): String =
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
      s"list_transform(list_filter(string_split($e, ''), c -> c <> ''), " +
      "c -> CAST(ascii(c) AS HUGEINT))), " +
      "(acc, x) -> (xor(acc, x) * 1099511628211) " +
      "% CAST(18446744073709551616 AS HUGEINT))"

  /** One replicate-extension step from a prefolded hash `kh`: xor the
    * replicate character's code, one closing multiply, mod 2⁶⁴. Extract
    * buckets with `% 2^k` and give the replicates codes DISTINCT mod 2^k —
    * a single mod-2⁶⁴ multiply diffuses differences upward only, so the
    * low k bits are an (odd-multiplier) bijection of (kh ⊕ code) mod 2^k:
    * distinct codes mean every replicate pair differs on every row, and
    * per row the bucket map is a bijection over replicates (the balanced
    * design — see GroupAB's q_poisson_bootstrap aliasing note). */
  private def repStep(codeSql: String): String =
    s"((xor(kh, CAST($codeSql AS HUGEINT)) * 1099511628211) " +
      "% CAST(18446744073709551616 AS HUGEINT))"

  val all: Seq[Q] = Seq(

    // McNemar's paired test over the two near-dup detectors: b = pairs
    // where MinHash is right and SimHash wrong (a truth pair only MinHash
    // caught, or a false alarm only SimHash raised), c = the mirror image;
    // χ² = (b−c)²/(b+c). Concordant pairs — both fired or neither —
    // contribute nothing, and every discordant pair lies in the UNION of
    // the two detected sets, so the whole test runs on detector-output-
    // sized data (the quadratic both-silent universe never materializes).
    // Spark side composes the session-cached detector pipelines + the
    // shared truth artifact (the q_detector_agreement shape); the oracle
    // recomputes all three pair sets all-pairs.
    Q("q_mcnemar",
      s"""WITH ${GroupAB.detectorCtes},
        |am AS (SELECT a_id, b_id, 1 AS ina FROM mh),
        |bm AS (SELECT a_id, b_id, 1 AS inb FROM sh),
        |u AS (SELECT a_id, b_id, ina, inb FROM am FULL JOIN bm USING (a_id, b_id)),
        |x AS (
        |  SELECT ina, inb, CASE WHEN jp.a_id IS NOT NULL THEN 1 END AS hit
        |  FROM u LEFT JOIN jp USING (a_id, b_id)),
        |s AS (SELECT
        |  count(CASE WHEN ina = 1 THEN 1 END) AS a1,
        |  count(CASE WHEN inb = 1 THEN 1 END) AS b1,
        |  count(CASE WHEN ina = 1 AND hit = 1 AND inb IS NULL THEN 1
        |             WHEN inb = 1 AND ina IS NULL AND hit IS NULL THEN 1 END) AS nb,
        |  count(CASE WHEN inb = 1 AND hit = 1 AND ina IS NULL THEN 1
        |             WHEN ina = 1 AND inb IS NULL AND hit IS NULL THEN 1 END) AS nc
        |  FROM x)
        |SELECT CAST(a1 AS BIGINT) AS n_minhash, CAST(b1 AS BIGINT) AS n_simhash,
        |  CAST(nb AS BIGINT) AS n_minhash_right,
        |  CAST(nc AS BIGINT) AS n_simhash_right,
        |  CAST(CASE WHEN nb + nc = 0 THEN -1
        |       ELSE (1000000 * CAST(nb - nc AS HUGEINT) * (nb - nc)) // (nb + nc)
        |       END AS BIGINT) AS chi2_ppm
        |FROM s ORDER BY n_minhash""".stripMargin) { (spark, dir) =>
      val t = PipelineQueries.jaccardPairs(spark, dir)
        .select(col("a_id"), col("b_id")).withColumn("hit", lit(1))
      val a = PipelineDedup.minhashPairs(spark, dir)
        .select("a_id", "b_id").withColumn("ina", lit(1))
      val b = PipelineDedup.simhashPairs(spark, dir)
        .select("a_id", "b_id").withColumn("inb", lit(1))
      val x = a.join(b, Seq("a_id", "b_id"), "full")
        .join(t, Seq("a_id", "b_id"), "left")
      x.agg(
        count(when(col("ina") === 1, 1)).as("a1"),
        count(when(col("inb") === 1, 1)).as("b1"),
        count(when(col("ina") === 1 && col("hit") === 1 && col("inb").isNull, 1)
          .when(col("inb") === 1 && col("ina").isNull && col("hit").isNull, 1))
          .as("nb"),
        count(when(col("inb") === 1 && col("hit") === 1 && col("ina").isNull, 1)
          .when(col("ina") === 1 && col("inb").isNull && col("hit").isNull, 1))
          .as("nc"))
        .select(big(col("a1")).as("n_minhash"), big(col("b1")).as("n_simhash"),
          big(col("nb")).as("n_minhash_right"),
          big(col("nc")).as("n_simhash_right"),
          big(expr("CASE WHEN nb + nc = 0 THEN -1 ELSE " +
            "(CAST(1000000 AS DECIMAL(38,0)) * (nb - nc) * (nb - nc))" +
            " div (nb + nc) END")).as("chi2_ppm"))
    },

    // Cohen's κ between the two detectors over the full C(n,2) pair
    // universe of non-empty docs — agreement beyond chance, the number
    // that says whether running BOTH detectors buys anything. The universe
    // is never enumerated: with a1 = |MinHash|, b1 = |SimHash|,
    // m = |overlap|, N = n(n−1)/2, observed agreement = N − a1 − b1 + 2m
    // and chance agreement N²·pe = a1·b1 + (N−a1)(N−b1) — four counts and
    // exact integer algebra (HUGEINT / DECIMAL(38,0); N² ~ 1.6e22 at sf1).
    // κ integerizes by ppm with explicit toward-zero truncation on both
    // engines (a sign split — negative κ must not hit engine-specific
    // floor-vs-truncate division).
    Q("q_cohens_kappa",
      s"""WITH ${GroupAB.detectorCtes},
        |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM net),
        |am AS (SELECT CAST(count(*) AS HUGEINT) AS a1 FROM mh),
        |bm AS (SELECT CAST(count(*) AS HUGEINT) AS b1 FROM sh),
        |om AS (SELECT CAST(count(*) AS HUGEINT) AS m
        |       FROM mh JOIN sh USING (a_id, b_id)),
        |s AS (SELECT n, (n * (n - 1)) // 2 AS np, a1, b1, m
        |      FROM nn, am, bm, om),
        |k AS (SELECT n, np, a1, b1, m,
        |             np - a1 - b1 + 2 * m AS agree,
        |             np * (np - a1 - b1 + 2 * m)
        |               - (a1 * b1 + (np - a1) * (np - b1)) AS num,
        |             np * np - (a1 * b1 + (np - a1) * (np - b1)) AS den
        |      FROM s)
        |SELECT CAST(n AS BIGINT) AS n_docs, CAST(np AS BIGINT) AS n_pairs,
        |  CAST(a1 AS BIGINT) AS n_minhash, CAST(b1 AS BIGINT) AS n_simhash,
        |  CAST(m AS BIGINT) AS n_overlap,
        |  CAST((1000000 * agree) // np AS BIGINT) AS agree_ppm,
        |  CAST(CASE WHEN den = 0 THEN -1
        |            WHEN num >= 0 THEN (1000000 * num) // den
        |            ELSE -((1000000 * (-num)) // den) END AS BIGINT) AS kappa_ppm
        |FROM k ORDER BY n_docs""".stripMargin) { (spark, dir) =>
      val wide = DecimalType(38, 0)
      val a = PipelineDedup.minhashPairs(spark, dir).select("a_id", "b_id")
      val b = PipelineDedup.simhashPairs(spark, dir).select("a_id", "b_id")
      val nn = tbl(spark, dir, "documents")
        .filter(size(DedupOps.tokens(col("text"))) > 0)
        .agg(count(lit(1)).cast(wide).as("n"))
      val am = a.agg(count(lit(1)).cast(wide).as("a1"))
      val bm = b.agg(count(lit(1)).cast(wide).as("b1"))
      val om = a.join(b, Seq("a_id", "b_id"))
        .agg(count(lit(1)).cast(wide).as("m"))
      nn.crossJoin(broadcast(am)).crossJoin(broadcast(bm))
        .crossJoin(broadcast(om))
        // Spark's `div` narrows to LONG — re-widen np immediately, or the
        // np*np below silently wraps past ~4.3e9 docs' worth of pairs
        .withColumn("np", expr("CAST((n * (n - 1)) div 2 AS DECIMAL(38,0))"))
        .withColumn("agree", expr("np - a1 - b1 + 2 * m"))
        .withColumn("num",
          expr("np * (np - a1 - b1 + 2 * m) - (a1 * b1 + (np - a1) * (np - b1))"))
        .withColumn("den", expr("np * np - (a1 * b1 + (np - a1) * (np - b1))"))
        .select(big(col("n")).as("n_docs"), big(col("np")).as("n_pairs"),
          big(col("a1")).as("n_minhash"), big(col("b1")).as("n_simhash"),
          big(col("m")).as("n_overlap"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * agree) div np"))
            .as("agree_ppm"),
          big(expr("CASE WHEN den = 0 THEN -1" +
            " WHEN num >= 0 THEN (CAST(1000000 AS DECIMAL(38,0)) * num) div den" +
            " ELSE -((CAST(1000000 AS DECIMAL(38,0)) * (-num)) div den) END"))
            .as("kappa_ppm"))
    },

    // Two-sample permutation test on the purchase-vs-view mean value gap:
    // 64 deterministic relabelings — replicate b's side is bit 5 of
    // fnv1a64('pt:' ∥ event_id ∥ ':' ∥ chr(48+b)) mod 64; the codes
    // 48..111 are DISTINCT mod 64, so the per-row map b ↦ side_b factors
    // through a bijection of Z/64 (the repStep contract): all 64
    // relabelings are distinct, none is another's complement, and each row
    // sits in side 0 in exactly 32 of them (a balanced relabeling design —
    // stratified permutation). p = share of |relabeled gap| ≥ |observed
    // gap|; the only distributional assumption is exchangeability — the
    // test the Mann–Whitney/Welch pair cannot replace when the metric is
    // heavy-tailed. ONE scan explodes ×64 into a map-side-combinable hash
    // agg (64 running sums per partition — never materialized); replicate
    // and observed gaps are identical fixed IEEE op sequences on
    // exact-decimal sums, so the ≥ comparisons match bit-for-bit across
    // engines.
    Q("q_permutation_test",
      s"""WITH r AS (
        |  SELECT event_type AS t, value,
        |         'pt:' || CAST(event_id AS VARCHAR) || ':' AS ks
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |h AS (SELECT t, value, ${fnvFold("ks")} AS kh FROM r),
        |w AS (
        |  SELECT value, b,
        |         (${repStep("48 + b")} % 64) // 32 AS side
        |  FROM h, range(0, 64) tb(b)),
        |rep AS (
        |  SELECT b,
        |    CAST(sum(CASE WHEN side = 0 THEN CAST(value AS DECIMAL(25,6)) END)
        |         AS DOUBLE)
        |      / CAST(count(CASE WHEN side = 0 THEN 1 END) AS DOUBLE)
        |    - CAST(sum(CASE WHEN side = 1 THEN CAST(value AS DECIMAL(25,6)) END)
        |           AS DOUBLE)
        |      / CAST(count(CASE WHEN side = 1 THEN 1 END) AS DOUBLE) AS tb
        |  FROM w GROUP BY b
        |  HAVING count(CASE WHEN side = 0 THEN 1 END) > 0
        |     AND count(CASE WHEN side = 1 THEN 1 END) > 0),
        |obs AS (
        |  SELECT count(CASE WHEN t = 'purchase' THEN 1 END) AS n_purchase,
        |         count(CASE WHEN t = 'view' THEN 1 END) AS n_view,
        |    CAST(sum(CASE WHEN t = 'purchase' THEN CAST(value AS DECIMAL(25,6)) END)
        |         AS DOUBLE)
        |      / CAST(count(CASE WHEN t = 'purchase' THEN 1 END) AS DOUBLE)
        |    - CAST(sum(CASE WHEN t = 'view' THEN CAST(value AS DECIMAL(25,6)) END)
        |           AS DOUBLE)
        |      / CAST(count(CASE WHEN t = 'view' THEN 1 END) AS DOUBLE) AS t_obs
        |  FROM h),
        |ext AS (
        |  SELECT count(*) AS n_reps,
        |         count(CASE WHEN abs(tb) >= abs(t_obs) THEN 1 END) AS n_extreme
        |  FROM rep, obs)
        |SELECT CAST(n_purchase AS BIGINT) AS n_purchase,
        |       CAST(n_view AS BIGINT) AS n_view, t_obs,
        |       CAST(n_reps AS BIGINT) AS n_reps,
        |       CAST(n_extreme AS BIGINT) AS n_extreme,
        |       CAST((1000000 * CAST(n_extreme AS HUGEINT)) // n_reps AS BIGINT)
        |         AS p_ppm
        |FROM obs, ext ORDER BY n_purchase""".stripMargin) { (spark, dir) =>
      // replicate codes ascii 48..111: distinct mod 64 (repStep). The row
      // prefix hashes ONCE (kh); each replicate extends it by the native
      // FnvStep kernel — the oracle's one-step xor-multiply, no per-
      // replicate string concat/refold.
      val dec = DecimalType(25, 6)
      val r = events(spark, dir)
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_type").as("t"), col("value"),
          VectorOps.fnv1a64(concat(lit("pt:"), col("event_id").cast("string"),
            lit(":"))).as("kh"))
      // amplification-aware repartition (the q_bh_fdr finding, measured at
      // sf1): the ×64 explode inherits the scan's partitioning, sized for
      // the PRE-amplified bytes — the amplified agg ran in 2 tasks with 30
      // cores idle. One cheap shuffle of the small pre-explode rows sizes
      // the layout for the post-explode volume; the agg is a commutative
      // exact-decimal fold, so row order cannot move the result.
      val rep = r.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("b", explode(sequence(lit(0), lit(63))))
        .withColumn("hb", VectorOps.fnvStep(col("kh"), col("b") + lit(48L)))
        .withColumn("side", expr("pmod(hb, 64) div 32"))
        .groupBy("b")
        .agg(sum(when(col("side") === 0, col("value").cast(dec))).as("s0"),
          count(when(col("side") === 0, 1)).as("c0"),
          sum(when(col("side") === 1, col("value").cast(dec))).as("s1"),
          count(when(col("side") === 1, 1)).as("c1"))
        .filter(col("c0") > 0 && col("c1") > 0)
        .select((col("s0").cast(DoubleType) / col("c0").cast(DoubleType)
          - col("s1").cast(DoubleType) / col("c1").cast(DoubleType)).as("tb"))
      val obs = r.agg(
        count(when(col("t") === "purchase", 1)).as("n_purchase"),
        count(when(col("t") === "view", 1)).as("n_view"),
        (sum(when(col("t") === "purchase", col("value").cast(dec)))
          .cast(DoubleType)
          / count(when(col("t") === "purchase", 1)).cast(DoubleType)
          - sum(when(col("t") === "view", col("value").cast(dec)))
            .cast(DoubleType)
            / count(when(col("t") === "view", 1)).cast(DoubleType)).as("t_obs"))
      val ext = rep.crossJoin(broadcast(obs.select("t_obs")))
        .agg(count(lit(1)).as("n_reps"),
          count(when(abs(col("tb")) >= abs(col("t_obs")), 1)).as("n_extreme"))
      obs.crossJoin(broadcast(ext))
        .select(big(col("n_purchase")).as("n_purchase"),
          big(col("n_view")).as("n_view"), col("t_obs"),
          big(col("n_reps")).as("n_reps"),
          big(col("n_extreme")).as("n_extreme"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * n_extreme) div n_reps"))
            .as("p_ppm"))
    },

    // Leave-one-day-out jackknife standard error of each event type's mean
    // daily value: with S = Σ mᵈ over n days, every replicate mean is
    // (S − mᵈ)/(n−1) — algebra on the per-type total, so n replicates cost
    // one equi-join on the calendar-bounded axis, not n passes. Exact
    // identity used: the mean of the loo replicates equals S/n, so the
    // deviations center on the plain mean (both engines compute it the
    // same way). var_jack = (n−1)/n · Σ(loo − mean)², se = one IEEE sqrt.
    // Types with a single day are excluded (the replicate is undefined).
    Q("q_jackknife",
      s"""WITH ${GroupAB.dailyCte},
        |s AS (SELECT t, count(*) AS n, sum(CAST(m AS DECIMAL(25,6))) AS sm
        |      FROM d GROUP BY 1 HAVING count(*) > 1),
        |l AS (SELECT d.t AS t, s.n AS n,
        |             CAST(s.sm AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean,
        |             CAST(s.sm - CAST(d.m AS DECIMAL(25,6)) AS DOUBLE)
        |               / CAST(s.n - 1 AS DOUBLE) AS loo
        |      FROM d JOIN s ON d.t = s.t),
        |v AS (SELECT t, n, mean,
        |             CAST(sum(CAST((loo - mean) * (loo - mean) AS DECIMAL(38,12)))
        |                  AS DOUBLE) AS ssq
        |      FROM l GROUP BY t, n, mean)
        |SELECT t AS event_type, CAST(n AS BIGINT) AS n_days, mean AS mean_daily,
        |       sqrt(ssq * CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE)) AS jack_se
        |FROM v ORDER BY event_type""".stripMargin) { (spark, dir) =>
      // accumulate at the house dsum scale (25,6): a (38,12) − (38,12)
      // subtraction needs precision 39, which Spark's precision-loss rule
      // resolves by DROPPING the scale to 11 while DuckDB keeps 12 — a
      // measured last-ulp divergence; at scale 6 the subtraction is
      // (36,6), exact on both engines
      val dec = DecimalType(25, 6)
      val wide = DecimalType(38, 12)
      val d = GroupAB.daily(spark, dir)
      val s = d.groupBy("t")
        .agg(count(lit(1)).as("n"), sum(col("m").cast(dec)).as("sm"))
        .filter(col("n") > 1)
      val l = d.join(s, Seq("t"))
        .select(col("t"), col("n"),
          (col("sm").cast(DoubleType) / col("n").cast(DoubleType)).as("mean"),
          ((col("sm") - col("m").cast(dec)).cast(DoubleType)
            / (col("n") - 1).cast(DoubleType)).as("loo"))
      l.groupBy("t", "n", "mean")
        .agg(sum(((col("loo") - col("mean")) * (col("loo") - col("mean")))
          .cast(wide)).cast(DoubleType).as("ssq"))
        .select(col("t").as("event_type"), big(col("n")).as("n_days"),
          col("mean").as("mean_daily"),
          sqrt(col("ssq") * (col("n") - 1).cast(DoubleType)
            / col("n").cast(DoubleType)).as("jack_se"))
        .orderBy("event_type")
    },

    // Sample-ratio mismatch guardrail: per day, distinct active users in
    // the even vs odd user-id cohort (the q_chi_square assignment
    // convention) and the 50/50 χ² = (nₐ−n_b)²/(nₐ+n_b) in ppm; a day
    // crossing 3.841459 (χ²₁ at 95%) is flagged — the invalidation check
    // every experiment platform runs BEFORE reading any metric. One hash
    // agg on the calendar-bounded day axis; all-integer outputs.
    Q("q_srm",
      """WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, user_id % 2 AS arm,
        |         user_id
        |  FROM events),
        |c AS (
        |  SELECT day,
        |         count(DISTINCT CASE WHEN arm = 0 THEN user_id END) AS na,
        |         count(DISTINCT CASE WHEN arm = 1 THEN user_id END) AS nb
        |  FROM e GROUP BY 1)
        |SELECT CAST(day AS BIGINT) AS day,
        |       CAST(na AS BIGINT) AS n_even, CAST(nb AS BIGINT) AS n_odd,
        |       CAST((1000000 * CAST(na - nb AS HUGEINT) * (na - nb))
        |            // (na + nb) AS BIGINT) AS chi2_ppm,
        |       CAST(CASE WHEN (1000000 * CAST(na - nb AS HUGEINT) * (na - nb))
        |                      // (na + nb) > 3841459
        |                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
        |FROM c ORDER BY day""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          pmod(col("user_id"), lit(2L)).as("arm"), col("user_id"))
        .groupBy("day")
        .agg(countDistinct(when(col("arm") === 0, col("user_id"))).as("na"),
          countDistinct(when(col("arm") === 1, col("user_id"))).as("nb"))
        .select(big(col("day")).as("day"),
          big(col("na")).as("n_even"), big(col("nb")).as("n_odd"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * (na - nb) * (na - nb))" +
            " div (na + nb)")).as("chi2_ppm"))
        .withColumn("srm_flag",
          when(col("chi2_ppm") > 3841459L, 1L).otherwise(0L))
        .orderBy("day")
    },

    // The experiment read-out: even/odd-cohort mean-value lift with a
    // one-pass Poisson-bootstrap CI — q_poisson_bootstrap's machinery
    // applied to the DIFFERENCE statistic (each replicate reweights BOTH
    // arms with the same deterministic balanced Poisson(1) draws, so the
    // replicate lift distribution reflects joint sampling noise). 16
    // replicates: bucket = one-step-extended row hash mod 16 with codes
    // 48..63 (distinct mod 16 — the GroupAB aliasing note); CI = (2nd,
    // 15th) order statistics of the replicate lifts (87.5%). The rank
    // window is partition-less over EXACTLY 16 rows (bounded by the
    // replicate literal, never by data).
    Q("q_ab_lift",
      s"""WITH r AS (
        |  SELECT user_id % 2 AS arm, value,
        |         'ab:' || CAST(event_id AS VARCHAR) || ':' AS ks
        |  FROM events),
        |h AS (SELECT arm, value, ${fnvFold("ks")} AS kh FROM r),
        |w AS (
        |  SELECT arm, value, b,
        |         CASE WHEN bucket < 6 THEN 0 WHEN bucket < 12 THEN 1
        |              WHEN bucket < 15 THEN 2 ELSE 3 END AS w
        |  FROM (SELECT arm, value, b,
        |          ${repStep("48 + b")} % 16 AS bucket
        |        FROM h, range(0, 16) tb(b))),
        |rep AS (
        |  SELECT b,
        |    CAST(sum(CASE WHEN arm = 0 THEN w * CAST(value AS DECIMAL(25,6)) END)
        |         AS DOUBLE)
        |      / CAST(sum(CASE WHEN arm = 0 THEN w END) AS DOUBLE)
        |    - CAST(sum(CASE WHEN arm = 1 THEN w * CAST(value AS DECIMAL(25,6)) END)
        |           AS DOUBLE)
        |      / CAST(sum(CASE WHEN arm = 1 THEN w END) AS DOUBLE) AS lb
        |  FROM w GROUP BY b
        |  HAVING sum(CASE WHEN arm = 0 THEN w END) > 0
        |     AND sum(CASE WHEN arm = 1 THEN w END) > 0),
        |rk AS (SELECT lb, row_number() OVER (ORDER BY lb, b) AS rn FROM rep),
        |obs AS (
        |  SELECT count(CASE WHEN arm = 0 THEN 1 END) AS n_even,
        |         count(CASE WHEN arm = 1 THEN 1 END) AS n_odd,
        |    CAST(sum(CASE WHEN arm = 0 THEN CAST(value AS DECIMAL(25,6)) END)
        |         AS DOUBLE)
        |      / CAST(count(CASE WHEN arm = 0 THEN 1 END) AS DOUBLE)
        |    - CAST(sum(CASE WHEN arm = 1 THEN CAST(value AS DECIMAL(25,6)) END)
        |           AS DOUBLE)
        |      / CAST(count(CASE WHEN arm = 1 THEN 1 END) AS DOUBLE) AS lift
        |  FROM r)
        |SELECT CAST(n_even AS BIGINT) AS n_even, CAST(n_odd AS BIGINT) AS n_odd,
        |       lift,
        |       max(CASE WHEN rn = 2 THEN lb END) AS lift_lo,
        |       max(CASE WHEN rn = 15 THEN lb END) AS lift_hi
        |FROM obs, rk
        |GROUP BY n_even, n_odd, lift
        |ORDER BY n_even""".stripMargin) { (spark, dir) =>
      val dec = DecimalType(25, 6)
      // row prefix hashed once; replicates extend by the native FnvStep
      // (codes 48..63 distinct mod 16 — see q_permutation_test above)
      val r = events(spark, dir)
        .select(pmod(col("user_id"), lit(2L)).as("arm"), col("value"),
          VectorOps.fnv1a64(concat(lit("ab:"), col("event_id").cast("string"),
            lit(":"))).as("kh"))
      // amplification-aware repartition before the ×16 explode (the
      // q_bh_fdr finding — see q_permutation_test above)
      val rep = r.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("b", explode(sequence(lit(0), lit(15))))
        .withColumn("hb", VectorOps.fnvStep(col("kh"), col("b") + lit(48L)))
        .withColumn("bucket", pmod(col("hb"), lit(16L)))
        .withColumn("w",
          when(col("bucket") < 6, 0L).when(col("bucket") < 12, 1L)
            .when(col("bucket") < 15, 2L).otherwise(3L))
        .groupBy("b")
        .agg(sum(when(col("arm") === 0, col("value").cast(dec) * col("w"))).as("s0"),
          sum(when(col("arm") === 0, col("w"))).as("w0"),
          sum(when(col("arm") === 1, col("value").cast(dec) * col("w"))).as("s1"),
          sum(when(col("arm") === 1, col("w"))).as("w1"))
        .filter(col("w0") > 0 && col("w1") > 0)
        .select(col("b"),
          (col("s0").cast(DoubleType) / col("w0").cast(DoubleType)
            - col("s1").cast(DoubleType) / col("w1").cast(DoubleType)).as("lb"))
      val rk = rep.withColumn("rn",
        row_number().over(Window.orderBy(col("lb"), col("b"))))
      val obs = r.agg(
        count(when(col("arm") === 0, 1)).as("n_even"),
        count(when(col("arm") === 1, 1)).as("n_odd"),
        (sum(when(col("arm") === 0, col("value").cast(dec))).cast(DoubleType)
          / count(when(col("arm") === 0, 1)).cast(DoubleType)
          - sum(when(col("arm") === 1, col("value").cast(dec))).cast(DoubleType)
            / count(when(col("arm") === 1, 1)).cast(DoubleType)).as("lift"))
      obs.crossJoin(broadcast(rk))
        .groupBy("n_even", "n_odd", "lift")
        .agg(max(when(col("rn") === 2, col("lb"))).as("lift_lo"),
          max(when(col("rn") === 15, col("lb"))).as("lift_hi"))
        .select(big(col("n_even")).as("n_even"), big(col("n_odd")).as("n_odd"),
          col("lift"), col("lift_lo"), col("lift_hi"))
    }
  )
}
