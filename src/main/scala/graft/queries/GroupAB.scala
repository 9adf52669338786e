package graft.queries

import graft.ops.{DedupOps, TextAnalysis, VectorOps}
import graft.queries.Q._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-12 wave: release-engineering statistics for a training-data
  * pipeline — the queries a data team runs BETWEEN detection and shipping.
  *
  * `q_detector_agreement` closes the dedup loop: the suite has three
  * independent near-dup detectors (MinHash ≥15/16 agreement, SimHash
  * hamming ≤3, exact ≥0.95 token Jaccard); this is the confusion audit —
  * per detector, precision/recall in ppm against the exact-Jaccard truth
  * set — the decision input for WHICH detector to run at 100 TB (SimHash
  * is 8 bytes/doc, MinHash 128; their miss profiles differ).
  * `q_poisson_bootstrap` is THE scalable confidence interval: classic
  * resampling shuffles the corpus B times, the Poisson bootstrap
  * (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
  * 2012) draws each row's per-replicate multiplicity independently — ONE
  * pass, map-side combinable, no resample shuffle. Weights here are a
  * deterministic 16-bucket Poisson(1) approximation from an FNV hash, so
  * the whole CI replays in DuckDB. `q_cuped` is the experimentation
  * pipeline's variance-reduction step (CUPED, Deng et al. 2013):
  * θ = cov(pre, post)/var(pre) over per-user period means, with the
  * achieved variance ratio — all moments from exact decimal sums, the
  * statistic a fixed IEEE op sequence. `q_shard_plan` is the output-writer
  * planner: token-budgeted shard assignment from a per-language cumulative
  * sum — the step between "corpus curated" and "100 TB of training shards
  * on disk" (at scale the order key becomes (lang, file, rowgroup); the
  * window stays partitioned, never global). `q_source_divergence` is the
  * mixture-design input: total-variation distance between source unigram
  * distributions — TV instead of KL/JS because Σ|cntₐ·totᵦ − cntᵦ·totₐ| is
  * EXACT integer arithmetic end to end (libm logs diverge across engines;
  * verified hash-match instead of a rounding contract). `q_friedman`
  * completes the nonparametric family (χ², KS, Mann–Whitney, Kruskal–
  * Wallis, Kendall, runs): the within-block rank test for "do event types
  * keep their daily ordering?" — blocks are calendar days, so ranks run on
  * the bounded types×days axis, flat in corpus size.
  */
object GroupAB {

  /** Shared oracle CTE: per-(type, day) count + exact mean (GroupAA's
    * daily axis — the calendar-bounded reduction every monitor runs on). */
  private[queries] val dailyCte =
    """d AS (
      |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
      |         count(*) AS cnt,
      |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      |           / CAST(count(*) AS DOUBLE) AS m
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private[queries] def daily(spark: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame =
    // round 16: identical expression to GroupAA.daily — read the one
    // session-cached rollup instead of re-aggregating the fact
    GroupAA.daily(spark, dir)

  /** Shared oracle CTE block: the three pair sets every detector-evaluation
    * query compares — `jp` (exact ≥0.95 token-Jaccard truth), `mh` (MinHash
    * ≥15/16 agreement), `sh` (SimHash hamming ≤3), plus `net` (docs with a
    * non-empty token set — the universe the detectors run on). Recomputed
    * all-pairs by DuckDB so the oracle never depends on which Spark
    * banding/verification path produced them. Used by q_detector_agreement
    * here and Group AC's q_mcnemar / q_cohens_kappa. */
  private[queries] val detectorCtes: String =
    """toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |jp AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6)
        |        >= 0.95),
        |net AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), p ->
        |      list_min(
        |        list_transform(
        |          list_transform(t, tok ->
        |            list_reduce(
        |              list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                list_transform(
        |                  list_filter(string_split('#' || CAST(p AS VARCHAR) || '#' || tok,
        |                                           ''), c -> c <> ''),
        |                  c -> CAST(ascii(c) AS HUGEINT))),
        |              (acc, x) -> (xor(acc, x) * 1099511628211)
        |                          % CAST(18446744073709551616 AS HUGEINT))),
        |          h -> CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                    THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                    ELSE h END AS BIGINT)))) AS s
        |  FROM net),
        |mh AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(0, 16), i -> a.s[i+1] = b.s[i+1])) >= 15),
        |th AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(t, tok ->
        |        list_reduce(
        |          list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |            list_transform(list_filter(string_split(tok, ''), c -> c <> ''),
        |              c -> CAST(ascii(c) AS HUGEINT))),
        |          (acc, x) -> (xor(acc, x) * 1099511628211)
        |                      % CAST(18446744073709551616 AS HUGEINT))),
        |      h -> CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                ELSE h END AS BIGINT)) AS hs
        |  FROM net),
        |bits AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), k ->
        |      CASE WHEN 2 * len(list_filter(hs, h -> ((h >> CAST(k AS BIGINT)) & 1) = 1))
        |                >= len(hs)
        |           THEN 1 ELSE 0 END) AS b
        |  FROM th),
        |sh AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |  WHERE len(list_filter(range(0, 64), k -> a.b[k+1] <> b.b[k+1])) <= 3)"""
      .stripMargin

  val all: Seq[Q] = Seq(

    // Near-dup detector confusion audit: precision/recall (ppm floors) of
    // the MinHash estimator (≥15/16 permutation agreement) and the SimHash
    // detector (hamming ≤3) against the exact ≥0.95 token-Jaccard truth
    // set. The Spark side COMPOSES the three already-registered pipelines
    // (the q_recall_at_k pattern): detectors re-run from their
    // session-cached group tables, truth is the shared verified pair
    // artifact — so the audit is near-free after any of them has run. The
    // oracle recomputes all three pair sets its own all-pairs way
    // ([[detectorCtes]]). Shapes: two equi-joins on (a_id, b_id) +
    // per-detector counts; the ONE-ROW truth count cross-joins back (the
    // q_bm25 scalar shape).
    Q("q_detector_agreement",
      s"""WITH $detectorCtes,
        |det AS (
        |  SELECT 'minhash' AS detector, a_id, b_id FROM mh
        |  UNION ALL SELECT 'simhash', a_id, b_id FROM sh),
        |agg AS (
        |  SELECT detector, count(*) AS n_det,
        |         sum(CASE WHEN jp.a_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |  FROM det LEFT JOIN jp USING (a_id, b_id) GROUP BY 1),
        |tt AS (SELECT count(*) AS n_truth FROM jp)
        |SELECT detector, CAST(n_det AS BIGINT) AS n_detected,
        |       CAST(n_truth AS BIGINT) AS n_truth,
        |       CAST(n_hit AS BIGINT) AS n_hits,
        |       CAST(CASE WHEN n_det = 0 THEN -1
        |                 ELSE (1000000 * CAST(n_hit AS HUGEINT)) // n_det END
        |            AS BIGINT) AS precision_ppm,
        |       CAST(CASE WHEN n_truth = 0 THEN -1
        |                 ELSE (1000000 * CAST(n_hit AS HUGEINT)) // n_truth END
        |            AS BIGINT) AS recall_ppm
        |FROM agg, tt
        |ORDER BY detector""".stripMargin) { (spark, dir) =>
      val truth = PipelineQueries.jaccardPairs(spark, dir).select("a_id", "b_id")
      // the detectors' session-cached PAIR artifacts, not the registered
      // queries: re-deriving both pair sets re-paid the full emission per
      // audit (190 s at sf1 on the ×100-pair clone fixture — round-12 fix)
      val det = PipelineDedup.minhashPairs(spark, dir)
        .select(lit("minhash").as("detector"), col("a_id"), col("b_id"))
        .unionByName(PipelineDedup.simhashPairs(spark, dir)
          .select(lit("simhash").as("detector"), col("a_id"), col("b_id")))
      val agg = det
        .join(truth.withColumn("hit", lit(1L)), Seq("a_id", "b_id"), "left")
        .groupBy("detector")
        .agg(count(lit(1)).as("n_det"), count(col("hit")).as("n_hit"))
      agg.crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
        .select(col("detector"), big(col("n_det")).as("n_detected"),
          big(col("n_truth")).as("n_truth"), big(col("n_hit")).as("n_hits"),
          big(expr("CASE WHEN n_det = 0 THEN -1 ELSE " +
            "(CAST(1000000 AS DECIMAL(38,0)) * n_hit) div n_det END"))
            .as("precision_ppm"),
          big(expr("CASE WHEN n_truth = 0 THEN -1 ELSE " +
            "(CAST(1000000 AS DECIMAL(38,0)) * n_hit) div n_truth END"))
            .as("recall_ppm"))
        .orderBy("detector")
    },

    // Poisson-bootstrap CI for per-returnflag mean quantity: each row's
    // multiplicity in replicate b is an independent approximately-
    // Poisson(1) draw — the one-pass bootstrap that scales (no resample
    // shuffle: explode ×16, ONE hash agg with map-side combine; at 100 TB
    // the 16× row amplification is pipelined inside the partial aggregate,
    // never materialized). Determinism contract: the draw is bucket =
    // fnv1a64('bs:' ∥ rowkey ∥ ':' ∥ chr(48+b)) mod 16 mapped through the
    // 16-bucket Poisson(1) pmf quantization {6,6,3,1}/16 → weights
    // {0,1,2,3} (mean 15/16; the mean STATISTIC is weight-ratio invariant).
    // REPLICATE CODES ASCII 48..63 ('0'..'9',':'..'?'), NOT hex chars —
    // the round-12 aliasing fix. The low k bits of the closing FNV
    // multiply depend only on the low k bits of its operands (odd
    // multiplier: bucket = 3·(kh₄ ⊕ code₄) mod 16), so hex codes, whose
    // low nibbles collide ('1'…'6' vs 'a'…'f'), made replicate 10 ≡ 1 …
    // 15 ≡ 6 on EVERY row — 16 nominal replicates, 10 distinct, invisible
    // to the hash gate because both engines shared the flaw. No fixed
    // bit window can fix this (a single mod-2⁶⁴ multiply diffuses
    // differences UPWARD only — bits 40..43 alias '1'/'a' pairs because
    // their xor, 80, is a multiple of 16; measured, not theoretical). With
    // 16 codes DISTINCT mod 16, the per-row bucket map b ↦ 3·(kh₄⊕b) is a
    // BIJECTION: every row sees each bucket exactly once across its 16
    // replicates — the BALANCED bootstrap (Davison & Hinkley's variance-
    // reduced design): per-replicate marginals keep the exact pmf, every
    // row's weights across replicates are the same {0⁶,1⁶,2³,3¹} multiset
    // (Σ_b w_b = 15 exactly), and replicate pairs now disagree on every
    // row. GroupABSpec pins the bijection and the balance.
    // DuckDB folds the row prefix once and extends by the single replicate
    // character — fnv(s1∥c) = one xor-multiply step from fnv(s1) — so 16
    // replicates cost 16 integer ops, not 16 refolds. Replicate means are
    // exact-decimal sums ÷ weight totals; the reported interval is the
    // (2nd, 15th) order statistic of the 16 replicate means (87.5% CI),
    // ranked per flag with a b tiebreak.
    Q("q_poisson_bootstrap",
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |         'bs:' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) || ':' AS ks,
        |         l_quantity AS qty
        |  FROM lineitem),
        |h AS (
        |  SELECT flag, qty,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(list_filter(string_split(ks, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS HUGEINT))),
        |      (acc, x) -> (xor(acc, x) * 1099511628211)
        |                  % CAST(18446744073709551616 AS HUGEINT)) AS kh
        |  FROM r),
        |w AS (
        |  SELECT flag, qty, b,
        |         CASE WHEN bucket < 6 THEN 0 WHEN bucket < 12 THEN 1
        |              WHEN bucket < 15 THEN 2 ELSE 3 END AS w
        |  FROM (
        |    SELECT flag, qty, b,
        |           ((xor(kh, CAST(48 + b AS HUGEINT)) * 1099511628211)
        |            % CAST(18446744073709551616 AS HUGEINT)) % 16 AS bucket
        |    FROM h, range(0, 16) tb(b))),
        |rep AS (
        |  SELECT flag, b,
        |         CAST(sum(w * CAST(qty AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(sum(w) AS DOUBLE) AS mb
        |  FROM w GROUP BY 1, 2),
        |rk AS (
        |  SELECT flag, mb,
        |         row_number() OVER (PARTITION BY flag ORDER BY mb, b) AS rn
        |  FROM rep),
        |base AS (
        |  SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(CAST(qty AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS mean_qty
        |  FROM r GROUP BY 1)
        |SELECT base.flag AS flag, n_rows, mean_qty,
        |       max(CASE WHEN rn = 2 THEN mb END) AS boot_lo,
        |       max(CASE WHEN rn = 15 THEN mb END) AS boot_hi
        |FROM base JOIN rk ON base.flag = rk.flag
        |GROUP BY base.flag, n_rows, mean_qty
        |ORDER BY flag""".stripMargin) { (spark, dir) =>
      // replicate codes ascii 48..63: distinct mod 16 (see the aliasing
      // note above). The row PREFIX hashes once (kh); each replicate then
      // extends it by the native one-step kernel FnvStep(kh, 48+b) — two
      // ALU ops, exactly the oracle's `(xor(kh, code) * prime) % 2⁶⁴`
      // (refolding the full string per replicate cost 16 UTF8String
      // concats + refolds per row: 10 s at sf1, round-13 measurement).
      val r = tbl(spark, dir, "lineitem").select(
        col("l_returnflag").as("flag"),
        VectorOps.fnv1a64(concat(lit("bs:"),
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("string"),
          lit(":"))).as("kh"),
        col("l_quantity").as("qty"))
      // Amplification-aware repartition (the round-13 q_bh_fdr finding):
      // the ×16 explode inherits the SCAN's partitioning, sized for the
      // pre-amplified bytes (sf1 lineitem scans as 2 partitions → the
      // amplified agg ran 2 tasks with 30 cores idle, 61 s isolated). One
      // cheap shuffle of the pre-explode rows sizes the layout for the
      // post-explode volume; the agg is a commutative exact-decimal fold,
      // order cannot move the result.
      val w = r
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("b", explode(sequence(lit(0), lit(15))))
        .withColumn("hb", VectorOps.fnvStep(col("kh"), col("b") + lit(48L)))
        .withColumn("bucket", pmod(col("hb"), lit(16L)))
        .withColumn("w",
          when(col("bucket") < 6, 0L).when(col("bucket") < 12, 1L)
            .when(col("bucket") < 15, 2L).otherwise(3L))
      val rep = w.groupBy("flag", "b")
        .agg((sum(col("qty").cast(DecimalType(25, 6)) * col("w"))
          .cast(DoubleType) / sum(col("w")).cast(DoubleType)).as("mb"))
      val rk = rep.withColumn("rn",
        row_number().over(Window.partitionBy("flag").orderBy(col("mb"), col("b"))))
      val base = r.groupBy("flag")
        .agg(big(count(lit(1))).as("n_rows"),
          (dsum(col("qty")) / count(lit(1)).cast(DoubleType)).as("mean_qty"))
      base.join(rk, Seq("flag"))
        .groupBy("flag", "n_rows", "mean_qty")
        .agg(max(when(col("rn") === 2, col("mb"))).as("boot_lo"),
          max(when(col("rn") === 15, col("mb"))).as("boot_hi"))
        .orderBy("flag")
    },

    // CUPED variance reduction (Deng et al. 2013): per-user pre-period
    // mean X (first calendar half) and post-period mean Y, θ = cov(X,Y)/
    // var(X), and the achieved ratio var(Y − θX)/var(Y) = 1 − ρ² — the
    // number that says how much smaller every experiment on this metric
    // can be. Shapes: ONE-ROW calendar-midpoint cross join (the q_bm25
    // scalar shape), one hash agg on user_id, one 6-column moment
    // aggregate. Determinism: period means and all five moments are exact
    // DECIMAL sums (products of doubles are single exactly-rounded IEEE
    // ops before the decimal cast); the θ / variance algebra is a fixed
    // double op sequence mirrored term for term in the oracle; outputs
    // integerize by floor (no half-way ties).
    Q("q_cuped",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, value FROM events),
        |md AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN day <= mid THEN CAST(value AS DECIMAL(25,6)) END)
        |         AS DOUBLE)
        |      / CAST(sum(CASE WHEN day <= mid THEN 1 END) AS DOUBLE) AS x,
        |    CAST(sum(CASE WHEN day > mid THEN CAST(value AS DECIMAL(25,6)) END)
        |         AS DOUBLE)
        |      / CAST(sum(CASE WHEN day > mid THEN 1 END) AS DOUBLE) AS y
        |  FROM e, md
        |  GROUP BY user_id, mid
        |  HAVING sum(CASE WHEN day <= mid THEN 1 END) > 0
        |     AND sum(CASE WHEN day > mid THEN 1 END) > 0),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
        |  FROM u)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  CAST(CASE WHEN ((sxx - sx * sx / n) / n) <= 0 THEN -1
        |       ELSE floor(1000000.0 * (((sxy - sx * sy / n) / n)
        |                               / ((sxx - sx * sx / n) / n))) END
        |       AS BIGINT) AS theta_ppm,
        |  CAST(floor(1000000.0 * ((syy - sy * sy / n) / n)) AS BIGINT) AS var_y_e6,
        |  CAST(CASE WHEN ((sxx - sx * sx / n) / n) <= 0 THEN -1
        |       ELSE floor(1000000.0 * (((syy - sy * sy / n) / n)
        |             - ((sxy - sx * sy / n) / n) * ((sxy - sx * sy / n) / n)
        |               / ((sxx - sx * sx / n) / n))) END
        |       AS BIGINT) AS var_adj_e6
        |FROM s
        |ORDER BY n_users""".stripMargin) { (spark, dir) =>
      val e = events(spark, dir).select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      val md = e.agg(expr("(min(day) + max(day)) div 2").as("mid"))
      val dec = DecimalType(25, 6)
      val u = e.crossJoin(broadcast(md))
        .groupBy("user_id", "mid")
        .agg(sum(when(col("day") <= col("mid"), col("value").cast(dec))).as("xs"),
          count(when(col("day") <= col("mid"), lit(1))).as("xc"),
          sum(when(col("day") > col("mid"), col("value").cast(dec))).as("ys"),
          count(when(col("day") > col("mid"), lit(1))).as("yc"))
        .filter(col("xc") > 0 && col("yc") > 0)
        .select((col("xs").cast(DoubleType) / col("xc").cast(DoubleType)).as("x"),
          (col("ys").cast(DoubleType) / col("yc").cast(DoubleType)).as("y"))
      val wide = DecimalType(38, 12)
      val s = u.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("x").cast(wide)).cast(DoubleType).as("sx"),
        sum(col("y").cast(wide)).cast(DoubleType).as("sy"),
        sum((col("x") * col("x")).cast(wide)).cast(DoubleType).as("sxx"),
        sum((col("x") * col("y")).cast(wide)).cast(DoubleType).as("sxy"),
        sum((col("y") * col("y")).cast(wide)).cast(DoubleType).as("syy"))
      // the θ / variance algebra below mirrors the oracle's double op
      // sequence TERM FOR TERM (same IEEE ops, same order = same bits)
      val cov = (col("sxy") - col("sx") * col("sy") / col("n")) / col("n")
      val varx = (col("sxx") - col("sx") * col("sx") / col("n")) / col("n")
      val vary = (col("syy") - col("sy") * col("sy") / col("n")) / col("n")
      s.select(big(col("n")).as("n_users"),
        big(when(varx <= 0, -1.0)
          .otherwise(floor(lit(1000000.0) * (cov / varx)))).as("theta_ppm"),
        big(floor(lit(1000000.0) * vary)).as("var_y_e6"),
        big(when(varx <= 0, -1.0)
          .otherwise(floor(lit(1000000.0) * (vary - cov * cov / varx))))
          .as("var_adj_e6"))
        .orderBy("n_users")
    },

    // Token-budgeted output-shard planner: assign documents to ~4000-token
    // shards by a per-language cumulative token sum (a doc belongs to the
    // shard its FIRST token lands in — the start-offset rule, so shards
    // never split documents), then report per-shard doc counts, token
    // totals, and id ranges — the writer-planning step between a curated
    // corpus and training shards on disk. The window is PARTITIONED by
    // lang (never global); at 100 TB the order key generalizes to
    // (lang, input file, rowgroup) and the same plan emits a shard
    // manifest per partition.
    Q("q_shard_plan",
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, tok,
        |         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING
        |                        AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT lang, CAST((cum - tok) // 4000 AS BIGINT) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(tok) AS BIGINT) AS shard_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc,
        |       CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM c
        |GROUP BY lang, (cum - tok) // 4000
        |ORDER BY lang, shard""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.bpeEstimate(col("text")).as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .withColumn("shard", expr("(cum - tok) div 4000"))
        .groupBy("lang", "shard")
        .agg(big(count(lit(1))).as("n_docs"),
          big(sum(col("tok"))).as("shard_tokens"),
          big(min(col("doc_id"))).as("first_doc"),
          big(max(col("doc_id"))).as("last_doc"))
        .orderBy("lang", "shard")
    },

    // Total-variation distance between source unigram distributions — the
    // mixture-design matrix (which sources are redundant, which add mass
    // the others lack). TV = ½ Σ_t |p_a(t) − p_b(t)| rewritten over raw
    // counts as Σ|cntₐ·totᵦ − cntᵦ·totₐ| / (2·totₐ·totᵦ): EXACT integer
    // arithmetic until the single ppm floor division — no logs, no float
    // sums (KL/JS need libm logs whose last-ulp rounding differs across
    // engines; TV carries the same redundancy ordering hash-exactly).
    // Shapes: one token-count agg, a vocabulary equi-join on term for the
    // matched mass (one-sided mass is algebra with the totals — terms
    // unique to a source never join), and the bounded |sources|² pair
    // grid (the q_ks_drift shape).
    Q("q_source_divergence",
      """WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(string_split(lower(text), ' '),
        |                            x -> x <> '')) AS term
        |  FROM documents),
        |c AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |tot AS (SELECT source, sum(cnt) AS tot FROM c GROUP BY 1),
        |grid AS (
        |  SELECT a.source AS sa, a.tot AS ta, b.source AS sb, b.tot AS tb
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |m AS (
        |  SELECT a.source AS sa, b.source AS sb,
        |         sum(abs(CAST(a.cnt AS HUGEINT) * tb.tot
        |                 - CAST(b.cnt AS HUGEINT) * ta.tot)) AS sd,
        |         sum(a.cnt) AS ma, sum(b.cnt) AS mb
        |  FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
        |       JOIN tot ta ON ta.source = a.source
        |       JOIN tot tb ON tb.source = b.source
        |  GROUP BY 1, 2)
        |SELECT grid.sa AS source_a, grid.sb AS source_b,
        |       CAST((1000000 * (coalesce(m.sd, 0)
        |                        + CAST(ta - coalesce(m.ma, 0) AS HUGEINT) * tb
        |                        + CAST(tb - coalesce(m.mb, 0) AS HUGEINT) * ta))
        |            // (2 * CAST(ta AS HUGEINT) * tb) AS BIGINT) AS tv_ppm
        |FROM grid LEFT JOIN m ON grid.sa = m.sa AND grid.sb = m.sb
        |ORDER BY source_a, source_b""".stripMargin) { (spark, dir) =>
      val wide = DecimalType(38, 0)
      // vocabulary-sized count table, read by three plans (both join
      // sides + the totals) — materialize once; SessionCache persist
      // (lineage kept, executor-loss safe, LRU-boundable), not
      // localCheckpoint — the round-11 artifact policy
      val c = graft.util.SessionCache.getOrMaterialize(
        spark, s"src_divergence_counts:$dir") {
        tbl(spark, dir, "documents")
          .select(col("source"), explode(DedupOps.tokens(col("text"))).as("term"))
          .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      }
      val tot = c.groupBy("source").agg(sum(col("cnt")).as("tot"))
      val grid = tot.select(col("source").as("sa"), col("tot").as("ta"))
        .join(tot.select(col("source").as("sb"), col("tot").as("tb")),
          col("sa") < col("sb"))
      val m = c.select(col("source").as("sa"), col("term"), col("cnt").as("cnt_a"))
        .join(c.select(col("source").as("sb"), col("term"), col("cnt").as("cnt_b")),
          Seq("term"))
        .filter(col("sa") < col("sb"))
        .join(tot.select(col("source").as("sa"), col("tot").as("jta")), Seq("sa"))
        .join(tot.select(col("source").as("sb"), col("tot").as("jtb")), Seq("sb"))
        .groupBy("sa", "sb")
        .agg(sum(abs(col("cnt_a").cast(wide) * col("jtb")
          - col("cnt_b").cast(wide) * col("jta"))).as("sd"),
          sum(col("cnt_a")).as("ma"), sum(col("cnt_b")).as("mb"))
      grid.join(m, Seq("sa", "sb"), "left")
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * (coalesce(sd, 0)" +
            " + CAST(ta - coalesce(ma, 0) AS DECIMAL(38,0)) * tb" +
            " + CAST(tb - coalesce(mb, 0) AS DECIMAL(38,0)) * ta))" +
            " div (CAST(2 AS DECIMAL(38,0)) * ta * tb)")).as("tv_ppm"))
        .orderBy("source_a", "source_b")
    },

    // Friedman test over the daily panel: within each complete calendar
    // day (every event type present), rank the types by daily mean
    // (row_number with the total (m, t) tiebreak — the deterministic rank
    // convention stated for q_kruskal_wallis), then
    // χ²_F = 12·ΣR_j²/(n·k·(k+1)) − 3·n·(k+1) over the per-type rank sums
    // — "do the types keep one consistent daily ordering?", the blocked
    // counterpart to Kruskal–Wallis's pooled ranks (days as blocks remove
    // day-level level shifts Kruskal–Wallis confounds). Everything past
    // the daily agg runs on the bounded types×days axis; the ONE-ROW
    // (k) and (n, k, ΣR²) aggregates cross-join back (scalar shape), and
    // the statistic integerizes as ppm with floor division.
    Q("q_friedman",
      s"""WITH $dailyCte,
        |kk AS (SELECT count(DISTINCT t) AS k FROM d),
        |cb AS (SELECT day FROM d GROUP BY day
        |       HAVING count(*) = (SELECT k FROM kk)),
        |r AS (
        |  SELECT d.t, d.day,
        |         row_number() OVER (PARTITION BY d.day ORDER BY d.m, d.t) AS rk
        |  FROM d JOIN cb USING (day)),
        |g AS (SELECT t, count(*) AS n, CAST(sum(rk) AS BIGINT) AS rs
        |      FROM r GROUP BY 1),
        |s AS (
        |  SELECT max(n) AS nb, count(*) AS k,
        |         sum(CAST(rs AS HUGEINT) * rs) AS ss
        |  FROM g)
        |SELECT g.t AS event_type, CAST(g.n AS BIGINT) AS n_blocks,
        |       g.rs AS rank_sum,
        |       CAST((12000000 * s.ss) // (CAST(s.nb AS HUGEINT) * s.k * (s.k + 1))
        |            - 3000000 * s.nb * (s.k + 1) AS BIGINT) AS chi2_ppm
        |FROM g, s
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = daily(spark, dir)
      val kAgg = d.agg(countDistinct(col("t")).as("k"))
      val cb = d.groupBy("day").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(kAgg))
        .filter(col("c") === col("k")).select("day")
      val r = d.join(cb, Seq("day"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("day").orderBy(col("m"), col("t"))))
      val g = r.groupBy(col("t").as("event_type"))
        .agg(count(lit(1)).as("n"), big(sum(col("rk"))).as("rs"))
      val s = g.agg(max(col("n")).as("nb"), count(lit(1)).as("k"),
        sum(col("rs").cast(DecimalType(38, 0)) * col("rs")).as("ss"))
      g.crossJoin(broadcast(s))
        .select(col("event_type"), big(col("n")).as("n_blocks"),
          col("rs").as("rank_sum"),
          big(expr("(CAST(12000000 AS DECIMAL(38,0)) * ss)" +
            " div (CAST(nb AS DECIMAL(38,0)) * k * (k + 1))" +
            " - CAST(3000000 AS DECIMAL(38,0)) * nb * (k + 1)")).as("chi2_ppm"))
        .orderBy("event_type")
    }
  )
}
