package graft.queries

import graft.queries.Q._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-11 wave: nonparametric monitoring statistics over the
  * calendar-bounded daily-means axis — the tests a data-quality loop
  * runs when it cannot assume normality (the parametric SPC pair
  * q_cusum/q_control_chart already covers the Gaussian stance).
  *
  * `q_kendall_tau` is the rank-correlation monitor robust to any
  * monotone transform (the τ twin of q_spearman_corr — τ's pair counts
  * are what concordance-based drift tests consume directly);
  * `q_kruskal_wallis` asks "do the event types draw from one daily-mean
  * distribution?" — the nonparametric ANOVA every mixture rebalance
  * decision starts from; `q_page_hinkley` is the sequential drift
  * detector (running-mean form) the streaming literature pairs with
  * ADWIN — where q_cusum watches deviation from a FIXED reference,
  * Page–Hinkley adapts its reference as the mean drifts; `q_runs_test`
  * (Wald–Wolfowitz) checks the above/below-median sign sequence for
  * serial dependence — the cheapest "is this series actually random?"
  * gate, and the pre-test that tells you whether q_autocorr's lags are
  * worth reading.
  *
  * All four reduce the corpus to per-(type, day) means first (one hash
  * agg — the q_cusum shape), so every downstream join/window/fold runs
  * on the CALENDAR-BOUNDED axis: day pairs, global ranks, and recursive
  * folds are all O(types × days²) at worst, flat in corpus size at any
  * SF. Determinism: the q_spearman_corr contract — daily means are
  * exact DECIMAL sums ÷ counts (identical doubles both engines), rank
  * windows carry total tiebreaks, statistics integerize as ppm via
  * truncating division (`div` ≡ DuckDB `//`), and the Page–Hinkley fold
  * is a fixed IEEE op sequence mirrored in a recursive CTE.
  *
  * The wave's second half are dedup-TUNING advisors over the shared
  * verified ≥0.95 pair artifact ([[PipelineQueries.jaccardPairs]] —
  * computed once per session, so both sweeps are near-free):
  * `q_lsh_curve` evaluates the banding S-curve 1 − (1 − sʳ)ᵇ on the
  * corpus's OBSERVED similarity buckets (fixed multiply chains, never
  * libm pow), and `q_dup_threshold_sweep` counts surviving pairs and
  * dropped docs at each candidate threshold — the two numbers that
  * decide banding parameters and τ before a 100 TB pass.
  */
object GroupAA {

  /** Shared oracle CTE: per-(type, day) count + exact mean. */
  private val dailyCte =
    """d AS (
      |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
      |         count(*) AS cnt,
      |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      |           / CAST(count(*) AS DOUBLE) AS m
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Per-(type, day) count + exact mean — the bounded series axis every
    * trend/nonparametric query reduces the corpus to first. Round 16:
    * materialized ONCE per session ([[graft.util.SessionCache]], the
    * jaccardPairs principle) — twelve queries across Groups Y/Z/AA start
    * from this identical aggregate, and a real monitoring pipeline
    * derives its whole statistic battery from one daily rollup, not one
    * fact scan per statistic. Values unchanged: same DECIMAL-exact sum,
    * same one IEEE divide. */
  private[queries] def daily(spark: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame =
    graft.util.SessionCache.getOrMaterialize(spark, s"daily:$dir") {
      events(spark, dir)
        .groupBy(col("event_type").as("t"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"),
          (dsum(col("value")) / count(lit(1)).cast(DoubleType)).as("m"))
    }

  val all: Seq[Q] = Seq(

    // Kendall's τ-a between daily volume and daily mean per event type:
    // concordant/discordant day-pair counts (strict sign agreement; ties
    // counted in neither — the τ-a convention, reported so the consumer
    // can reconstruct τ-b's denominators). The day-pair join is an
    // equi-join on type with a day< filter — O(days²) per type on the
    // calendar-bounded axis, flat in corpus size. τ in ppm via the exact
    // integer division both engines truncate identically.
    Q("q_kendall_tau",
      s"""WITH $dailyCte,
        |p AS (
        |  SELECT a.t,
        |         CASE WHEN (a.cnt > b.cnt AND a.m > b.m)
        |                OR (a.cnt < b.cnt AND a.m < b.m)
        |              THEN 1 ELSE 0 END AS con,
        |         CASE WHEN (a.cnt > b.cnt AND a.m < b.m)
        |                OR (a.cnt < b.cnt AND a.m > b.m)
        |              THEN 1 ELSE 0 END AS dis
        |  FROM d a JOIN d b ON a.t = b.t AND a.day < b.day),
        |agg AS (
        |  SELECT t, count(*) AS np, sum(con) AS nc, sum(dis) AS nd
        |  FROM p GROUP BY 1)
        |SELECT t AS event_type, CAST(np AS BIGINT) AS n_pairs,
        |       CAST(nc AS BIGINT) AS concordant,
        |       CAST(nd AS BIGINT) AS discordant,
        |       CAST((1000000 * (nc - nd)) // np AS BIGINT) AS tau_ppm
        |FROM agg WHERE np > 0
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = daily(spark, dir)
      val x = d.select(col("t"), col("day").as("da"),
        col("cnt").as("ca"), col("m").as("ma"))
      val y = d.select(col("t"), col("day").as("db"),
        col("cnt").as("cb"), col("m").as("mb"))
      x.join(y, Seq("t")).filter(col("da") < col("db"))
        .select(col("t"),
          when((col("ca") > col("cb") && col("ma") > col("mb")) ||
            (col("ca") < col("cb") && col("ma") < col("mb")), 1L)
            .otherwise(0L).as("con"),
          when((col("ca") > col("cb") && col("ma") < col("mb")) ||
            (col("ca") < col("cb") && col("ma") > col("mb")), 1L)
            .otherwise(0L).as("dis"))
        .groupBy(col("t").as("event_type"))
        .agg(count(lit(1)).as("np"), sum("con").as("nc"), sum("dis").as("nd"))
        .filter(col("np") > 0)
        .select(col("event_type"), big(col("np")).as("n_pairs"),
          big(col("nc")).as("concordant"), big(col("nd")).as("discordant"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * (nc - nd)) div np"))
            .as("tau_ppm"))
        .orderBy("event_type")
    },

    // Kruskal–Wallis H across event types over daily means — the
    // nonparametric one-way ANOVA: rank every (type, day) mean on ONE
    // global axis (total tiebreak (m, t, day) — a deterministic variant
    // of the average-rank convention, stated as the contract), then
    // H = 12·Σ R_t²/n_t / (N(N+1)) − 3(N+1), integerized as ppm with the
    // per-type quotient truncated FIRST (q_t = ⌊10⁶·R_t²/n_t⌋) so both
    // engines sum identical integers — no floating sum-order hazard.
    // The global rank window runs over the bounded types×days axis; the
    // one-row (N, Σq) aggregate cross-joins back (the q_bm25 scalar
    // shape).
    Q("q_kruskal_wallis",
      s"""WITH $dailyCte,
        |rk AS (
        |  SELECT t, row_number() OVER (ORDER BY m, t, day) AS r FROM d),
        |g AS (
        |  SELECT t, count(*) AS n,
        |         CAST(sum(CAST(r AS DECIMAL(19,0))) AS BIGINT) AS rs
        |  FROM rk GROUP BY 1),
        |e AS (
        |  SELECT t, n, rs,
        |         CAST((1000000 * CAST(rs AS HUGEINT) * rs) // n AS BIGINT) AS q
        |  FROM g),
        |tot AS (
        |  SELECT CAST(sum(n) AS HUGEINT) AS bign,
        |         CAST(sum(CAST(q AS HUGEINT)) AS HUGEINT) AS sq
        |  FROM e)
        |SELECT e.t AS event_type, CAST(e.n AS BIGINT) AS n_days,
        |       e.rs AS rank_sum,
        |       CAST((12 * tot.sq) // (tot.bign * (tot.bign + 1))
        |            - 3000000 * (tot.bign + 1) AS BIGINT) AS h_ppm
        |FROM e, tot
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = daily(spark, dir)
      val rk = d.withColumn("r",
        row_number().over(Window.orderBy(col("m"), col("t"), col("day"))))
      val g = rk.groupBy("t")
        .agg(count(lit(1)).as("n"), sum(dec(col("r"))).cast(LongType).as("rs"))
      val e = g.withColumn("q",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * rs * rs) div n")
          .cast(LongType))
      val tot = e.agg(sum("n").cast(LongType).as("bign"),
        sum(dec(col("q"))).as("sq"))
      e.crossJoin(broadcast(tot))
        .select(col("t").as("event_type"), big(col("n")).as("n_days"),
          big(col("rs")).as("rank_sum"),
          big(expr("(12 * sq) div (CAST(bign AS DECIMAL(38,0)) " +
            "* (bign + 1)) - CAST(3000000 AS DECIMAL(38,0)) * (bign + 1)"))
            .as("h_ppm"))
        .orderBy("event_type")
    },

    // Page–Hinkley sequential drift detector per event type (the
    // running-mean form): mean_t = mean_{t−1} + (x_t − mean_t−1)/t,
    // g_t = g_{t−1} + ((x_t − mean_t) − δ), M_t = min(M_{t−1}, g_t),
    // alarm when g_t − M_t > λ — δ = μ/8 and λ = μ/2 dyadic fractions of
    // the series' own exact mean (the q_cusum constants). Where CUSUM
    // measures deviation from a FIXED reference, Page–Hinkley's
    // reference adapts, so a slow drift that re-centers CUSUM still
    // accumulates here. Inherently sequential → calendar-bounded fold
    // after one hash agg; the oracle replays the identical fixed IEEE op
    // sequence as a recursive CTE (the q_cusum/q_holt_winters contract).
    Q("q_page_hinkley",
      s"""WITH RECURSIVE $dailyCte,
        |s AS (SELECT t, day, m,
        |             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
        |      FROM d),
        |n AS (SELECT t, max(rn) AS n_days FROM s GROUP BY 1),
        |ref AS (
        |  SELECT t,
        |         CAST(sum(CAST(m AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) / 8 AS delta,
        |         CAST(sum(CAST(m AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) / 2 AS lambda
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT s.t, s.rn, s.m AS mean,
        |         0 + ((s.m - s.m) - f.delta) AS g,
        |         0 + ((s.m - s.m) - f.delta) AS mn
        |  FROM s JOIN ref f USING (t) WHERE s.rn = 1
        |  UNION ALL
        |  SELECT s.t, s.rn,
        |         r.mean + (s.m - r.mean) / s.rn,
        |         r.g + ((s.m - (r.mean + (s.m - r.mean) / s.rn)) - f.delta),
        |         least(r.mn,
        |           r.g + ((s.m - (r.mean + (s.m - r.mean) / s.rn)) - f.delta))
        |  FROM r JOIN s ON s.t = r.t AND s.rn = r.rn + 1
        |         JOIN ref f ON f.t = r.t)
        |SELECT n.t AS event_type, CAST(n.n_days AS BIGINT) AS n_days,
        |       round(fin.mean, 6) AS adapted_mean,
        |       round(fin.g, 6) AS ph_final,
        |       round(mx.max_exc, 6) AS max_excursion,
        |       CAST(al.alarms AS BIGINT) AS alarm_days
        |FROM n
        |JOIN r fin ON fin.t = n.t AND fin.rn = n.n_days
        |JOIN (SELECT t, max(g - mn) AS max_exc FROM r GROUP BY 1) mx
        |  ON mx.t = n.t
        |JOIN (SELECT r3.t,
        |             sum(CASE WHEN r3.g - r3.mn > f.lambda
        |                      THEN 1 ELSE 0 END) AS alarms
        |      FROM r r3 JOIN ref f ON f.t = r3.t GROUP BY 1) al
        |  ON al.t = n.t
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = daily(spark, dir)
      val ref = d.groupBy("t")
        .agg(((dsum(col("m")) / count(lit(1)).cast(DoubleType)) / lit(8))
          .as("delta"),
          ((dsum(col("m")) / count(lit(1)).cast(DoubleType)) / lit(2))
            .as("lambda"))
      val acc0 = struct(lit(0.0).as("mean"), lit(0.0).as("g"),
        lit(0.0).as("mn"), lit(0L).as("n"),
        lit(0L).as("alarms"), lit(Double.NegativeInfinity).as("mx"))
      d.groupBy("t")
        .agg(sort_array(collect_list(struct(col("day"), col("m")))).as("ds"))
        .join(broadcast(ref), Seq("t"))
        .select(col("t").as("event_type"),
          big(size(col("ds"))).as("n_days"),
          aggregate(col("ds"), acc0, (a, e) => {
            val x = e.getField("m")
            val first = a.getField("n") === 0L
            val rn = (a.getField("n") + 1L).cast(DoubleType)
            val meanP = when(first, x)
              .otherwise(a.getField("mean") +
                (x - a.getField("mean")) / rn)
            // op order mirrors the CTE: ((x − mean') − δ), then + prior g
            val gP = when(first, lit(0.0) + ((x - x) - col("delta")))
              .otherwise(a.getField("g") + ((x - meanP) - col("delta")))
            val mnP = when(first, gP)
              .otherwise(least(a.getField("mn"), gP))
            val exc = gP - mnP
            struct(meanP.as("mean"), gP.as("g"), mnP.as("mn"),
              (a.getField("n") + 1L).as("n"),
              (a.getField("alarms") +
                when(exc > col("lambda"), 1L).otherwise(0L)).as("alarms"),
              greatest(a.getField("mx"), exc).as("mx"))
          }).as("st"))
        .select(col("event_type"), col("n_days"),
          round(col("st.mean"), 6).as("adapted_mean"),
          round(col("st.g"), 6).as("ph_final"),
          round(col("st.mx"), 6).as("max_excursion"),
          big(col("st.alarms")).as("alarm_days"))
        .orderBy("event_type")
    },

    // Wald–Wolfowitz runs test per event type: the above/below-median
    // sign sequence of daily means, its run count, and the expected run
    // count 1 + 2n₁n₂/n as exact ppm — randomness screening for the
    // series the trend family then models (too few runs = positive
    // serial dependence, too many = oscillation). Median is the LOWER
    // median by the total order (m, day) — deterministic, no averaging
    // of doubles; values equal to the median count as "below" (stated
    // convention, same comparison both engines).
    Q("q_runs_test",
      s"""WITH $dailyCte,
        |med AS (
        |  SELECT t, m AS med FROM (
        |    SELECT t, m, day,
        |           row_number() OVER (PARTITION BY t ORDER BY m, day) AS rv,
        |           count(*) OVER (PARTITION BY t) AS nd
        |    FROM d) WHERE rv = (nd + 1) // 2),
        |b AS (
        |  SELECT d.t, d.day,
        |         CASE WHEN d.m > med.med THEN 1 ELSE 0 END AS ab
        |  FROM d JOIN med ON d.t = med.t),
        |r AS (
        |  SELECT t, day, ab,
        |         lag(ab) OVER (PARTITION BY t ORDER BY day) AS pab
        |  FROM b),
        |agg AS (
        |  SELECT t, sum(ab) AS n1, sum(1 - ab) AS n2,
        |         1 + sum(CASE WHEN pab IS NOT NULL AND ab <> pab
        |                      THEN 1 ELSE 0 END) AS runs
        |  FROM r GROUP BY 1)
        |SELECT t AS event_type, CAST(n1 + n2 AS BIGINT) AS n_days,
        |       CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
        |       CAST(runs AS BIGINT) AS runs,
        |       CAST((1000000 * (n1 + n2 + 2 * n1 * n2)) // (n1 + n2)
        |            AS BIGINT) AS expected_runs_ppm
        |FROM agg
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = daily(spark, dir)
      val byVal = Window.partitionBy("t").orderBy(col("m"), col("day"))
      val overT = Window.partitionBy("t")
      val med = d
        .withColumn("rv", row_number().over(byVal))
        .withColumn("nd", count(lit(1)).over(overT))
        .filter(col("rv") === expr("(nd + 1) div 2"))
        .select(col("t"), col("m").as("med"))
      val byDay = Window.partitionBy("t").orderBy(col("day"))
      d.join(broadcast(med), Seq("t"))
        .withColumn("ab", when(col("m") > col("med"), 1L).otherwise(0L))
        .withColumn("pab", lag(col("ab"), 1).over(byDay))
        .groupBy(col("t").as("event_type"))
        .agg(sum("ab").as("n1"), sum(lit(1L) - col("ab")).as("n2"),
          (lit(1L) + sum(when(col("pab").isNotNull &&
            col("ab") =!= col("pab"), 1L).otherwise(0L))).as("runs"))
        .select(col("event_type"), big(col("n1") + col("n2")).as("n_days"),
          big(col("n1")).as("n_above"), big(col("n2")).as("n_below"),
          big(col("runs")).as("runs"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) " +
            "* (n1 + n2 + 2 * n1 * n2)) div (n1 + n2)"))
            .as("expected_runs_ppm"))
        .orderBy("event_type")
    },

    // LSH banding S-curve advisor on the OBSERVED similarity profile:
    // per 0.01-wide Jaccard bucket of the verified ≥0.95 near-dup pairs
    // (the shared session artifact every dedup query consumes), the
    // probability the banding catches a pair at the bucket midpoint —
    // p = 1 − (1 − s^r)^b for the engine's own (b=2, r=8) config and the
    // calibration family's (b=4, r=4) — plus the expected caught count.
    // This is the number that decides banding parameters BEFORE a 100 TB
    // pass. Determinism: s^r and (1−s^r)^b are FIXED multiply chains
    // (s²→s⁴→s⁸; q²; (q²)²·(q²)² …) mirrored token-for-token — never
    // pow(), whose libm rounding differs across engines; ppm via floor.
    Q("q_lsh_curve",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |               / CAST(len(list_distinct(list_concat(a.t, b.t)))
        |                      AS DOUBLE), 6) AS jac
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t)))
        |                     AS DOUBLE), 6) >= 0.95),
        |bk AS (
        |  SELECT CAST(floor(jac * 100) AS BIGINT) AS bucket, count(*) AS n
        |  FROM pairs GROUP BY 1),
        |c AS (
        |  SELECT bucket, n,
        |         least((CAST(bucket AS DOUBLE) + 0.5) / 100, 1.0) AS s
        |  FROM bk),
        |e AS (
        |  SELECT bucket, n, s,
        |         ((s * s) * (s * s)) AS s4,
        |         (((s * s) * (s * s)) * ((s * s) * (s * s))) AS s8
        |  FROM c)
        |SELECT bucket, CAST(n AS BIGINT) AS n_pairs,
        |       CAST(floor(1000000 * (1 - (1 - s8) * (1 - s8))) AS BIGINT)
        |         AS p_b2r8_ppm,
        |       CAST(floor(1000000 * (1 - ((1 - s4) * (1 - s4))
        |                                 * ((1 - s4) * (1 - s4))))
        |            AS BIGINT) AS p_b4r4_ppm,
        |       CAST(floor(CAST(n AS DOUBLE)
        |                  * (1 - (1 - s8) * (1 - s8))) AS BIGINT)
        |         AS exp_caught_b2r8
        |FROM e
        |ORDER BY bucket""".stripMargin) { (spark, dir) =>
      // clamp the midpoint: the exact-duplicate bucket (jac=1.0 → bucket
      // 100) must be scored at s=1.0, not the s=1.005 extrapolation whose
      // (1−s^r)^b dips below zero and reports ≈998343 ppm for the bucket
      // the advisory matters most for
      val s = least((col("bucket").cast(DoubleType) + lit(0.5)) / lit(100),
        lit(1.0))
      val s2 = s * s
      val s4 = s2 * s2
      val s8 = s4 * s4
      val p28 = lit(1) - (lit(1) - s8) * (lit(1) - s8)
      val q4 = lit(1) - s4
      val p44 = lit(1) - (q4 * q4) * (q4 * q4)
      PipelineQueries.jaccardPairs(spark, dir)
        .groupBy(floor(col("jac") * lit(100)).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(col("bucket"), big(col("n")).as("n_pairs"),
          big(floor(lit(1000000) * p28)).as("p_b2r8_ppm"),
          big(floor(lit(1000000) * p44)).as("p_b4r4_ppm"),
          big(floor(col("n").cast(DoubleType) * p28)).as("exp_caught_b2r8"))
        .orderBy("bucket")
    },

    // Dedup threshold sensitivity: how many verified pairs (and how many
    // dropped documents, keep-smallest-id convention) survive each
    // candidate Jaccard threshold from 0.95 to 1.0 — the sweep a
    // pipeline owner reads before moving τ, directly from the shared
    // pair artifact (6 grid rows per pair via one explode — no join, no
    // second dedup pass). Integer threshold compare on the ppm-scaled
    // double (identical product both engines).
    Q("q_dup_threshold_sweep",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |               / CAST(len(list_distinct(list_concat(a.t, b.t)))
        |                      AS DOUBLE), 6) AS jac
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t)))
        |                     AS DOUBLE), 6) >= 0.95),
        |g AS (SELECT 950000 + 10000 * CAST(i AS BIGINT) AS threshold_ppm
        |      FROM range(0, 6) t(i))
        |SELECT g.threshold_ppm,
        |       CAST(count(CASE WHEN p.jac * 1000000 >= g.threshold_ppm
        |                       THEN 1 END) AS BIGINT) AS n_pairs,
        |       CAST(count(DISTINCT CASE WHEN p.jac * 1000000 >= g.threshold_ppm
        |                                THEN p.b_id END) AS BIGINT)
        |         AS n_docs_dropped
        |FROM g, pairs p
        |GROUP BY g.threshold_ppm
        |ORDER BY threshold_ppm""".stripMargin) { (spark, dir) =>
      PipelineQueries.jaccardPairs(spark, dir)
        .withColumn("threshold_ppm", explode(array(
          (0 until 6).map(i => lit(950000L + 10000L * i)): _*)))
        .groupBy("threshold_ppm")
        .agg(
          big(count(when(col("jac") * lit(1000000) >= col("threshold_ppm"),
            1))).as("n_pairs"),
          big(countDistinct(when(
            col("jac") * lit(1000000) >= col("threshold_ppm"),
            col("b_id")))).as("n_docs_dropped"))
        .orderBy("threshold_ppm")
    }
  )
}
