package graft.queries

import graft.queries.Q._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-10 wave: statistical process control and training-data hygiene.
  *
  * `q_cusum` + `q_control_chart` are the classic SPC pair the round-9
  * inference battery stopped short of: CUSUM is the SEQUENTIAL detector
  * (accumulates small persistent shifts the Shewhart chart's
  * point-at-a-time limits miss), the X̄–R chart is the SUBGROUP monitor
  * (a week of daily means per point, range-based limits). Both run on the
  * bounded (type, day) axis the trend queries already reduce the corpus
  * to, so nothing scales past one hash aggregation of the event stream.
  *
  * `q_spearman_corr` is the rank-correlation monitor (is volume related
  * to intensity, monotonically, without assuming linearity?) —
  * complementing q_autocorr's Pearson-on-lag and q_mann_kendall's
  * trend-vs-time τ. All-integer once ranks are fixed: Σd² is exact, the
  * ppm output is one integer division.
  *
  * `q_split_leakage` is the train/val/test hygiene check every LLM data
  * pipeline runs before a release: near-duplicate pairs that CROSS the
  * q_train_split assignment leak evaluation signal into training. It
  * consumes the session-shared verified ≥0.95 Jaccard pair artifact
  * ([[PipelineQueries.jaccardPairs]]) — the split audit is a free join
  * over an artifact the dedup family already built, exactly how a real
  * pipeline derives it.
  *
  * `q_vocab_nucleus` inverts q_vocab_coverage: instead of "what mass do
  * the top-K terms carry", it answers the tokenizer-sizing question "how
  * many terms cover 90% of the mass" — WITHOUT a vocabulary-sized rank
  * window. The vocabulary collapses to the (lang, count)-value axis
  * first (Zipf: O(√mass) distinct counts), the 90% threshold is located
  * by an exact integer prefix over that bounded axis, and the crossing
  * group's partial take is a ceiling division — the same
  * bounded-axis-window convention as q_kaplan_meier's duration axis.
  *
  * Determinism: every fold step is a fixed sequence of exact IEEE ops
  * mirrored operation-for-operation in the recursive-CTE oracles (the
  * q_ewma contract); thresholds compare in integer arithmetic; doubles
  * aggregate through DECIMAL accumulators; every ORDER BY ends in a
  * unique non-null key.
  */
object GroupZ {

  val all: Seq[Q] = Seq(

    // One-sided CUSUM control chart per event type over the per-day mean
    // series: s_t = max(0, s_{t-1} + (m_t − μ) − μ/8), reference μ = the
    // series' own mean (exact DECIMAL sum ÷ count), slack k = μ/8 and
    // decision threshold h = μ/2 both DYADIC (exact halvings of the same
    // double on both engines). The fold is inherently sequential — so it
    // runs on the CALENDAR-BOUNDED (type, day) axis after the corpus
    // reduces to daily means (one hash agg), and the oracle replays the
    // identical fold as a recursive CTE — each step is the fixed sequence
    // ((m − μ) − μ/8), + prior, max(0, ·) on both engines, so doubles
    // hash-match with no tolerance.
    // Alarms and the argmax report aggregate over the per-day cs rows
    // (double equality of identically-computed values).
    Q("q_cusum",
      """WITH RECURSIVE d AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT t, day, m,
        |             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
        |      FROM d),
        |mu AS (SELECT t,
        |              CAST(sum(CAST(m AS DECIMAL(25,6))) AS DOUBLE)
        |                / CAST(count(*) AS DOUBLE) AS mu,
        |              max(rn) AS n_days
        |       FROM s GROUP BY 1),
        |r AS (
        |  SELECT s.t, s.rn, s.day,
        |         greatest(CAST(0 AS DOUBLE), s.m - mu.mu - mu.mu / 8) AS cs
        |  FROM s JOIN mu USING (t) WHERE s.rn = 1
        |  UNION ALL
        |  SELECT s.t, s.rn, s.day,
        |         greatest(CAST(0 AS DOUBLE), r.cs + (s.m - mu.mu - mu.mu / 8))
        |  FROM r JOIN s ON s.t = r.t AND s.rn = r.rn + 1
        |       JOIN mu ON mu.t = s.t),
        |mx AS (SELECT t, max(cs) AS mx FROM r GROUP BY 1)
        |SELECT r.t AS event_type, CAST(mu.n_days AS BIGINT) AS n_days,
        |       round(mx.mx, 6) AS max_cusum,
        |       CAST(min(r.day) FILTER (WHERE r.cs = mx.mx) AS BIGINT)
        |         AS max_day,
        |       CAST(count(*) FILTER (WHERE r.cs > mu.mu / 2) AS BIGINT)
        |         AS n_alarms
        |FROM r JOIN mx USING (t) JOIN mu USING (t)
        |GROUP BY r.t, mu.n_days, mx.mx
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val per = GroupY.dailyMeans(spark, dir)
        .groupBy("t")
        .agg(sort_array(collect_list(struct(col("day"), col("m")))).as("ds"),
          (sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
            / count(lit(1)).cast(DoubleType)).as("mu"))
      // fold state: (cs, mx, mxday, alarms, init) — mxday is the FIRST
      // day attaining the max, which equals the oracle's min-day-at-max
      // because the fold visits days in ascending order
      val acc0 = struct(lit(0.0).as("cs"), lit(0.0).as("mx"),
        lit(0L).as("mxday"), lit(0L).as("alarms"), lit(false).as("init"))
      per.select(col("t").as("event_type"),
          big(size(col("ds"))).as("n_days"),
          aggregate(col("ds"), acc0, (a, e) => {
            val step = e.getField("m") - col("mu") - col("mu") / lit(8.0)
            val cs = greatest(lit(0.0),
              when(a.getField("init"), a.getField("cs") + step)
                .otherwise(step))
            val isMax = !a.getField("init") || cs > a.getField("mx")
            struct(cs.as("cs"),
              when(isMax, cs).otherwise(a.getField("mx")).as("mx"),
              when(isMax, e.getField("day"))
                .otherwise(a.getField("mxday")).as("mxday"),
              (a.getField("alarms") +
                when(cs > col("mu") / lit(2.0), 1L).otherwise(0L))
                .as("alarms"),
              lit(true).as("init"))
          }).as("s"))
        .select(col("event_type"), col("n_days"),
          round(col("s.mx"), 6).as("max_cusum"),
          big(col("s.mxday")).as("max_day"),
          big(col("s.alarms")).as("n_alarms"))
        .orderBy("event_type")
    },

    // Shewhart X̄–R chart per event type: subgroups are COMPLETE epoch
    // weeks (exactly 7 daily means), x̄_w = exact DECIMAL sum of the 7
    // means ÷ 7, R_w = max − min (exact IEEE subtract of identically-
    // derived doubles). Limits use the standard n=7 constants as exact
    // rationals — A2 = 419/1000, D4 = 1924/1000 — applied in a pinned
    // operation order (center + (419·R̄)/1000), so both engines compute
    // bit-identical limits and the out-of-control counts are exact
    // double comparisons. Shape: daily means (one hash agg) → ≤53
    // subgroups per type per year — everything past the first agg runs
    // on a calendar-bounded axis.
    Q("q_control_chart",
      """WITH d AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT t, day // 7 AS week,
        |         CAST(sum(CAST(m AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(7 AS DOUBLE) AS xbar,
        |         max(m) - min(m) AS r
        |  FROM d GROUP BY 1, 2 HAVING count(*) = 7),
        |lim AS (
        |  SELECT t, count(*) AS n_weeks,
        |         CAST(sum(CAST(xbar AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS center,
        |         CAST(sum(CAST(r AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS rbar
        |  FROM w GROUP BY 1)
        |SELECT w.t AS event_type, CAST(lim.n_weeks AS BIGINT) AS n_weeks,
        |       round(lim.center, 6) AS center,
        |       round(lim.rbar, 6) AS rbar,
        |       round(lim.center + (419 * lim.rbar) / 1000, 6) AS ucl,
        |       round(lim.center - (419 * lim.rbar) / 1000, 6) AS lcl,
        |       CAST(count(*) FILTER (
        |         WHERE w.xbar > lim.center + (419 * lim.rbar) / 1000
        |            OR w.xbar < lim.center - (419 * lim.rbar) / 1000)
        |         AS BIGINT) AS n_out,
        |       CAST(count(*) FILTER (
        |         WHERE w.r > (1924 * lim.rbar) / 1000) AS BIGINT)
        |         AS n_range_out
        |FROM w JOIN lim USING (t)
        |GROUP BY w.t, lim.n_weeks, lim.center, lim.rbar
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val weekly = GroupY.dailyMeans(spark, dir)
        .groupBy(col("t"), expr("day div 7").as("week"))
        .agg((sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
          / lit(7.0)).as("xbar"),
          (max(col("m")) - min(col("m"))).as("r"),
          count(lit(1)).as("nd"))
        .filter(col("nd") === 7)
      val lim = weekly.groupBy("t")
        .agg(count(lit(1)).as("n_weeks"),
          (sum(col("xbar").cast(DecimalType(25, 6))).cast(DoubleType)
            / count(lit(1)).cast(DoubleType)).as("center"),
          (sum(col("r").cast(DecimalType(25, 6))).cast(DoubleType)
            / count(lit(1)).cast(DoubleType)).as("rbar"))
      val ucl = col("center") + (lit(419.0) * col("rbar")) / lit(1000.0)
      val lcl = col("center") - (lit(419.0) * col("rbar")) / lit(1000.0)
      val d4r = (lit(1924.0) * col("rbar")) / lit(1000.0)
      weekly.join(lim, Seq("t"))
        .groupBy(col("t").as("event_type"), col("n_weeks"),
          col("center"), col("rbar"))
        .agg(
          big(sum(when(col("xbar") > ucl || col("xbar") < lcl, 1L)
            .otherwise(0L))).as("n_out"),
          big(sum(when(col("r") > d4r, 1L).otherwise(0L))).as("n_range_out"))
        .select(col("event_type"), big(col("n_weeks")).as("n_weeks"),
          round(col("center"), 6).as("center"),
          round(col("rbar"), 6).as("rbar"),
          round(ucl, 6).as("ucl"), round(lcl, 6).as("lcl"),
          col("n_out"), col("n_range_out"))
        .orderBy("event_type")
    },

    // Spearman rank correlation per event type between the two per-day
    // series a monitor actually has — daily event COUNT (volume) and
    // daily mean VALUE (intensity): ρ = 1 − 6Σd²/(n(n²−1)) in ppm. Ranks
    // are row_number over (metric, day) — the deterministic tie-break
    // variant (integer counts tie freely; the day tiebreak makes both
    // engines assign identical ranks), documented in the output name.
    // Everything after the daily reduction is integer: d² sums exactly
    // (DECIMAL against n⁴ growth), one integer division at the end.
    // Windows partition by type over the calendar-bounded day axis.
    Q("q_spearman_corr",
      """WITH d AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS cnt,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT t, day,
        |         row_number() OVER (PARTITION BY t ORDER BY cnt, day) AS rc,
        |         row_number() OVER (PARTITION BY t ORDER BY m, day) AS rm
        |  FROM d),
        |agg AS (
        |  SELECT t, count(*) AS n,
        |         sum(CAST((rc - rm) AS DECIMAL(19,0))
        |             * CAST((rc - rm) AS DECIMAL(19,0))) AS d2
        |  FROM rk GROUP BY 1)
        |SELECT t AS event_type, CAST(n AS BIGINT) AS n_days,
        |       CAST(d2 AS BIGINT) AS sum_d2,
        |       CAST(1000000 - CAST(6000000 * d2 AS HUGEINT)
        |            // (CAST(n AS HUGEINT) * (n * n - 1)) AS BIGINT)
        |         AS rho_ppm
        |FROM agg WHERE n > 1
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = events(spark, dir)
        .groupBy(col("event_type").as("t"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"),
          (dsum(col("value")) / count(lit(1)).cast(DoubleType)).as("m"))
      val byCnt = Window.partitionBy("t").orderBy(col("cnt"), col("day"))
      val byM = Window.partitionBy("t").orderBy(col("m"), col("day"))
      d.withColumn("rc", row_number().over(byCnt))
        .withColumn("rm", row_number().over(byM))
        .groupBy(col("t").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("rc") - col("rm")) * dec(col("rc") - col("rm")))
            .as("d2"))
        .filter(col("n") > 1)
        // `div` (not decimal `/`): truncating integral division, the exact
        // twin of DuckDB's `//` on the HUGEINT products
        .select(col("event_type"), big(col("n")).as("n_days"),
          big(col("d2")).as("sum_d2"),
          big(expr("1000000 - (CAST(6000000 AS DECIMAL(38,0)) * d2) div " +
            "(CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) " +
            "* CAST(n AS DECIMAL(38,0)) - 1))")).as("rho_ppm"))
        .orderBy("event_type")
    },

    // Train/val/test split leakage: verified ≥0.95 near-duplicate pairs
    // whose endpoints landed in DIFFERENT q_train_split buckets — each
    // one leaks evaluation signal into training. Consumes the
    // session-shared pair artifact (computed once, reused by the whole
    // dedup family); the split is the same pure doc_id function as
    // q_train_split, so the audit is one artifact join + a filter — free
    // at any scale relative to the dedup pass itself. The oracle
    // recomputes the exact pair set its own all-pairs way (the
    // q_triangle_count stance), so the gate does not depend on the
    // banding path.
    Q("q_split_leakage",
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
        |sp AS (
        |  SELECT a_id, b_id, jac,
        |         CASE WHEN a_id % 10 <= 7 THEN 'train'
        |              WHEN a_id % 10 = 8 THEN 'validation'
        |              ELSE 'test' END AS split_a,
        |         CASE WHEN b_id % 10 <= 7 THEN 'train'
        |              WHEN b_id % 10 = 8 THEN 'validation'
        |              ELSE 'test' END AS split_b
        |  FROM pairs)
        |SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
        |       split_a, split_b, jac
        |FROM sp WHERE split_a <> split_b
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      def splitOf(c: Column): Column =
        when(c % 10 <= 7, "train")
          .when(c % 10 === 8, "validation")
          .otherwise("test")
      PipelineQueries.jaccardPairs(spark, dir)
        .select(big(col("a_id")).as("a_id"), big(col("b_id")).as("b_id"),
          splitOf(col("a_id")).as("split_a"),
          splitOf(col("b_id")).as("split_b"), col("jac"))
        .filter(col("split_a") =!= col("split_b"))
        .orderBy("a_id", "b_id")
    },

    // Holt–Winters additive seasonal smoothing (period 7 — the weekly
    // cycle q_dow_profile observes) per event type over daily means:
    //   l′ = ((x − s_old) + 3(l + b))/4        (α = 1/4)
    //   b′ = (l′ − l)/2 + b/2                  (β = 1/2)
    //   s′ = (x − l′)/2 + s_old/2              (γ = 1/2)
    // initialized l₁ = x₁, b₁ = 0, s = 0⁷ (seasonal indices learned in
    // place) — the forecaster that beats q_holt exactly when
    // q_seasonal_strength says the weekly cycle carries signal. All
    // three smoothing constants dyadic, every step a fixed IEEE op
    // sequence; the DuckDB oracle carries the 7-slot seasonal state as a
    // LIST column through the same recursive fold, so doubles hash-match
    // with no tolerance. Calendar-bounded fold after one hash agg, the
    // q_cusum shape.
    Q("q_holt_winters",
      """WITH RECURSIVE d AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT t, day, m,
        |             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
        |      FROM d),
        |n AS (SELECT t, max(rn) AS n_days FROM s GROUP BY 1),
        |r AS (
        |  SELECT t, rn, m AS l, CAST(0 AS DOUBLE) AS b,
        |         [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0] AS sv
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.t, s.rn,
        |         ((s.m - r.sv[(r.rn % 7) + 1]) + 3 * (r.l + r.b)) / 4,
        |         ((((s.m - r.sv[(r.rn % 7) + 1]) + 3 * (r.l + r.b)) / 4)
        |           - r.l) / 2 + r.b / 2,
        |         list_transform(range(1, 8), i ->
        |           CASE WHEN i = (r.rn % 7) + 1
        |                THEN (s.m - (((s.m - r.sv[(r.rn % 7) + 1])
        |                              + 3 * (r.l + r.b)) / 4)) / 2
        |                     + r.sv[(r.rn % 7) + 1] / 2
        |                ELSE r.sv[i] END)
        |  FROM r JOIN s ON s.t = r.t AND s.rn = r.rn + 1)
        |SELECT r.t AS event_type, CAST(n.n_days AS BIGINT) AS n_days,
        |       round(r.l, 6) AS level, round(r.b, 6) AS trend,
        |       round((r.l + r.b) + r.sv[(r.rn % 7) + 1], 6) AS forecast_1,
        |       round(list_max(r.sv) - list_min(r.sv), 6)
        |         AS seasonal_amplitude
        |FROM r JOIN n USING (t) WHERE r.rn = n.n_days
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val acc0 = struct(lit(0.0).as("l"), lit(0.0).as("b"),
        array_repeat(lit(0.0), 7).as("sv"), lit(0L).as("n"))
      GroupY.dailyMeans(spark, dir)
        .groupBy("t")
        .agg(sort_array(collect_list(struct(col("day"), col("m")))).as("ds"))
        .select(col("t").as("event_type"),
          big(size(col("ds"))).as("n_days"),
          aggregate(col("ds"), acc0, (a, e) => {
            val x = e.getField("m")
            val slot = (a.getField("n") % 7).cast("int")
            val sOld = element_at(a.getField("sv"), slot + 1)
            val lp = ((x - sOld) +
              lit(3.0) * (a.getField("l") + a.getField("b"))) / lit(4.0)
            val bp = (lp - a.getField("l")) / lit(2.0) + a.getField("b") / lit(2.0)
            val sp = (x - lp) / lit(2.0) + sOld / lit(2.0)
            val first = a.getField("n") === 0L
            struct(
              when(first, x).otherwise(lp).as("l"),
              when(first, lit(0.0)).otherwise(bp).as("b"),
              when(first, a.getField("sv")).otherwise(
                transform(sequence(lit(1), lit(7)), i =>
                  when(i === slot + 1, sp)
                    .otherwise(element_at(a.getField("sv"), i)))).as("sv"),
              (a.getField("n") + 1L).as("n"))
          }).as("st"),
          // the NEXT day's slot after folding n_days elements is
          // (n_days − 1) % 7 + 1 in 1-indexed terms — the oracle's
          // r.rn % 7 + 1 at rn = n_days... both reduce to the same slot
          size(col("ds")).as("nd"))
        .select(col("event_type"), col("n_days"),
          round(col("st.l"), 6).as("level"),
          round(col("st.b"), 6).as("trend"),
          round((col("st.l") + col("st.b")) +
            element_at(col("st.sv"),
              (((col("nd") % 7) + lit(1))).cast("int")), 6).as("forecast_1"),
          round(array_max(col("st.sv")) - array_min(col("st.sv")), 6)
            .as("seasonal_amplitude"))
        .orderBy("event_type")
    },

    // Weekly-seasonality strength per event type: the share of daily-mean
    // variance explained by the day-of-week factor — between-group sum of
    // squares over total sum of squares, in ppm. THE pre-test for
    // q_holt_winters vs q_holt: strength near 0 says the seasonal state
    // is noise, near 1 says the weekly cycle dominates. Determinism: the
    // grand and per-dow means are exact DECIMAL sums ÷ counts; every
    // squared deviation routes through DECIMAL(25,6)·DECIMAL(25,6) exact
    // products summed exactly, with ONE double divide at the end.
    // Everything after the daily reduction runs on ≤7+366 bounded rows.
    Q("q_seasonal_strength",
      """WITH d AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT t, count(*) AS n,
        |             CAST(sum(CAST(m AS DECIMAL(25,6))) AS DOUBLE)
        |               / CAST(count(*) AS DOUBLE) AS gm
        |      FROM d GROUP BY 1),
        |dw AS (
        |  SELECT d.t, d.day % 7 AS dow, count(*) AS nd,
        |         CAST(sum(CAST(d.m AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS dm
        |  FROM d GROUP BY 1, 2),
        |bss AS (
        |  SELECT dw.t,
        |         sum(CAST(nd AS DECIMAL(4,0))
        |             * CAST(dm - g.gm AS DECIMAL(15,6))
        |             * CAST(dm - g.gm AS DECIMAL(15,6))) AS b
        |  FROM dw JOIN g USING (t) GROUP BY 1),
        |tss AS (
        |  SELECT d.t,
        |         sum(CAST(d.m - g.gm AS DECIMAL(15,6))
        |             * CAST(d.m - g.gm AS DECIMAL(15,6))) AS tot
        |  FROM d JOIN g USING (t) GROUP BY 1)
        |SELECT g.t AS event_type, CAST(g.n AS BIGINT) AS n_days,
        |       CAST(CASE WHEN CAST(tss.tot AS DOUBLE) = 0 THEN 0
        |            ELSE floor(1000000 * CAST(bss.b AS DOUBLE)
        |                       / CAST(tss.tot AS DOUBLE)) END AS BIGINT)
        |         AS strength_ppm
        |FROM g JOIN bss USING (t) JOIN tss USING (t)
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = GroupY.dailyMeans(spark, dir)
      val g = d.groupBy("t").agg(count(lit(1)).as("n"),
        (sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
          / count(lit(1)).cast(DoubleType)).as("gm"))
      val dw = d.groupBy(col("t"), (col("day") % 7).as("dow"))
        .agg(count(lit(1)).as("nd"),
          (sum(col("m").cast(DecimalType(25, 6))).cast(DoubleType)
            / count(lit(1)).cast(DoubleType)).as("dm"))
      // decimal widths sized so the 3-factor product stays inside 38
      // digits on BOTH engines (DuckDB p1+p2, Spark p1+p2+1): (4,0)·
      // (15,6)·(15,6) — nd ≤ 366 days, deviations are value-scaled
      val bss = dw.join(g, Seq("t"))
        .groupBy("t")
        .agg(sum(col("nd").cast(DecimalType(4, 0))
          * (col("dm") - col("gm")).cast(DecimalType(15, 6))
          * (col("dm") - col("gm")).cast(DecimalType(15, 6))).as("b"))
      val tss = d.join(g, Seq("t"))
        .groupBy("t")
        .agg(sum((col("m") - col("gm")).cast(DecimalType(15, 6))
          * (col("m") - col("gm")).cast(DecimalType(15, 6))).as("tot"))
      g.join(bss, Seq("t")).join(tss, Seq("t"))
        // floor, not a bare BIGINT cast: DuckDB rounds double→int casts
        // where Spark truncates — floor is identical on both
        .select(col("t").as("event_type"), big(col("n")).as("n_days"),
          big(when(col("tot").cast(DoubleType) === 0.0, lit(0L))
            .otherwise(floor(lit(1000000.0) * col("b").cast(DoubleType)
              / col("tot").cast(DoubleType)))).as("strength_ppm"))
        .orderBy("event_type")
    },

    // Nucleus (top-p) vocabulary size per language: the smallest number
    // of terms covering ≥90% of token mass — the tokenizer-sizing answer
    // q_vocab_coverage only brackets. NO vocabulary-sized rank window:
    // the vocabulary collapses to the (lang, count)-VALUE axis (Zipf:
    // O(√mass) distinct counts), an exact integer prefix over that
    // bounded axis locates the count-group where cumulative mass crosses
    // ceil(0.9·total), and the crossing group contributes a CEILING
    // DIVISION of the remaining need (every term in the group carries
    // exactly c tokens, so no within-group order matters) — the
    // bounded-axis-window convention of q_kaplan_meier.
    Q("q_vocab_nucleus",
      """WITH tf AS (
        |  SELECT lang, t, count(*) AS c FROM (
        |    SELECT lang,
        |           unnest(list_filter(string_split(lower(text), ' '),
        |                              x -> x <> '')) AS t
        |    FROM documents) GROUP BY 1, 2),
        |grp AS (
        |  SELECT lang, c, count(*) AS nterms, c * count(*) AS mass
        |  FROM tf GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, c, nterms, mass,
        |         coalesce(sum(mass) OVER (PARTITION BY lang ORDER BY c DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS before_mass,
        |         coalesce(sum(nterms) OVER (PARTITION BY lang ORDER BY c DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS before_terms,
        |         sum(mass) OVER (PARTITION BY lang) AS total,
        |         sum(nterms) OVER (PARTITION BY lang) AS vocab
        |  FROM grp),
        |hit AS (
        |  SELECT lang, vocab, total,
        |         before_terms
        |           + ((total * 9 + 9) // 10 - before_mass + c - 1) // c
        |           AS nucleus
        |  FROM cum
        |  WHERE before_mass * 10 < total * 9
        |    AND (before_mass + mass) * 10 >= total * 9)
        |SELECT lang, CAST(vocab AS BIGINT) AS vocab_size,
        |       CAST(total AS BIGINT) AS total_tokens,
        |       CAST(nucleus AS BIGINT) AS nucleus90,
        |       CAST(1000000 * nucleus // vocab AS BIGINT) AS nucleus_ppm
        |FROM hit ORDER BY lang""".stripMargin) { (spark, dir) =>
      val grp = tbl(spark, dir, "documents")
        .select(col("lang"),
          explode(graft.ops.DedupOps.tokens(lower(col("text")))).as("t"))
        .groupBy("lang", "t").agg(count(lit(1)).as("c"))
        .groupBy("lang", "c").agg(count(lit(1)).as("nterms"),
          (col("c") * count(lit(1))).as("mass"))
      val byLang = Window.partitionBy("lang").orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val whole = Window.partitionBy("lang")
      grp
        .withColumn("before_mass", coalesce(sum("mass").over(byLang), lit(0L)))
        .withColumn("before_terms", coalesce(sum("nterms").over(byLang), lit(0L)))
        .withColumn("total", sum("mass").over(whole))
        .withColumn("vocab", sum("nterms").over(whole))
        .filter(col("before_mass") * 10 < col("total") * 9 &&
          (col("before_mass") + col("mass")) * 10 >= col("total") * 9)
        .select(col("lang"), big(col("vocab")).as("vocab_size"),
          big(col("total")).as("total_tokens"),
          big(col("before_terms") +
            expr("((total * 9 + 9) div 10 - before_mass + c - 1) div c"))
            .as("nucleus90"),
          big(expr("1000000 * (before_terms + " +
            "((total * 9 + 9) div 10 - before_mass + c - 1) div c) " +
            "div vocab")).as("nucleus_ppm"))
        .orderBy("lang")
    }
  )
}
