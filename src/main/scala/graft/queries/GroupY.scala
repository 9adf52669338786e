package graft.queries

import graft.ops.VectorOps
import graft.queries.Q._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Group Y — round-9 wave: temporal smoothing and trend statistics,
  * capacity planning, a transport-distance drift metric, and a
  * bloom-pruning audit.
  *
  * `q_ewma` is the classic per-key exponential moving average — the
  * recurrence y_t = α·x_t + (1−α)·y_{t−1} expressed as a fold over each
  * user's time-ordered events (`functions.aggregate`), the batch twin of
  * the keyed streaming smoother (stream/EwmaMonitor). α is the dyadic
  * 1/4, so every step is three exact IEEE ops in a fixed order and the
  * DuckDB recursive-CTE oracle replays them bit-for-bit. `q_holt`
  * extends it with the linear-trend recurrence (level + trend + one-step
  * forecast); `q_mann_kendall` and `q_theil_sen` are the nonparametric
  * trend TEST and robust SLOPE over the bounded per-day mean axis — the
  * four together are the monitoring stack's trend battery.
  *
  * `q_bloom_fpr` is the measured false-positive audit behind a
  * bloom-pruned join decision, fully oracle-replayed because the bit
  * positions are salted linear FNV folds; `q_hll_distinct` is the fully
  * oracle-gated HLL (Mix64-finalized FNV) next to the rows-only native
  * sketch.
  *
  * The inference battery: `q_chi_square` (2×2 cohort A/B test, sqrt-free
  * integer form), `q_mann_whitney` (rank-sum U + AUC, the numeric
  * two-sample test), `q_kaplan_meier` (censored product-limit survival
  * over order lifetimes), and `q_log_rank` (the two-cohort comparison
  * over the same censored data) — categorical, ordinal, and censored
  * outcomes each get their standard test.
  *
  * `q_peak_concurrency` is the capacity-planner's number: per day, the
  * maximum number of simultaneously-open sessions. The sweep itself is a
  * prefix sum over +1/−1 session endpoints — inherently sequential — so
  * the Spark side DECOMPOSES it: running sums within (day, hour) cells
  * plus a tiny per-day prefix over the 24 cell totals, the same
  * two-level-scan trick q_ks_drift uses for its pooled CDF. A single
  * per-day window would serialize an entire day's sessions through one
  * task at 100 TB; the cell decomposition caps a window partition at one
  * hour of one day and generalizes (minutes at higher densities).
  *
  * `q_wasserstein_drift` complements `q_ks_drift`: KS is the supremum
  * CDF gap (sensitive to the single worst point), W₁ is the INTEGRAL of
  * the gap (the earth-mover's distance — how much probability mass moved
  * how far), the metric of choice for numeric-feature drift monitors.
  * Same exact-integer grid/CDF scaffolding as KS; each trapezoid term is
  * gap·|integer cross-product| accumulated in DECIMAL(38,12) so the sum
  * is order- and engine-independent, with ONE final double divide.
  */
object GroupY {

  /** Per-(type, day) mean value — the bounded series axis the trend
    * queries reduce the corpus to first. The mean is an exact DECIMAL sum
    * ÷ count (one IEEE divide), so both engines see identical doubles. */
  private[queries] def dailyMeans(spark: org.apache.spark.sql.SparkSession,
                                  dir: String): org.apache.spark.sql.DataFrame =
    // round 16: one projection over the session-shared (t, day, cnt, m)
    // rollup (GroupAA.daily) instead of a private re-aggregation of the
    // fact — the mean column there is the identical DECIMAL-sum ÷ count
    // expression, so every consumer's values are unchanged
    GroupAA.daily(spark, dir).select(col("t"), col("day"), col("m"))

  /** The fold-tail length shared by q_ewma/q_holt and their oracles: a
    * point 1024 steps old carries weight ≤ (3/4)^1024 ≈ 1e-128 (EWMA) or
    * decays at the Holt update's spectral radius √(3/4) ≈ 0.87 per step
    * (~1e-64 after 1024), far below one ulp of any accumulated double. */
  private val FoldTail = 1024

  /** Per-user sorted TAIL of the event stream — the last [[FoldTail]]
    * events by (ts, event_id) — plus the FULL event count. This is the
    * bounded-memory contract of the smoothing folds: the descending
    * row_number pre-filter caps collect_list at FoldTail elements per key
    * (the window SORT spills; the collect never exceeds 1024 structs), so
    * a hot key with millions of events costs one spillable sort, not one
    * giant in-task array. Both oracles fold the SAME tail (their recursive
    * CTEs start at greatest(1, n−1023)), so the gate stays bit-exact —
    * no appeal to the (true but rounding-boundary-fragile) argument that
    * truncation is invisible at 6 decimals. One shuffle: the groupBy
    * reuses the window's hash partitioning on user_id. */
  private def tailEvents(spark: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val part = Window.partitionBy("user_id")
    val desc = part.orderBy(col("e.ts").desc, col("e.event_id").desc)
    events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("value")).as("e"))
      .withColumn("rdesc", row_number().over(desc))
      .withColumn("n_all", count(lit(1)).over(part))
      .filter(col("rdesc") <= FoldTail)
      .groupBy("user_id")
      .agg(max("n_all").as("n_events"),
        sort_array(collect_list(col("e"))).as("es"))
  }

  val all: Seq[Q] = Seq(

    // Per-user exponential moving average (α = 1/4) of the event value
    // stream, folded in (ts, event_id) order. Expressible as a fold, not
    // a window: y_t depends on ALL priors with geometric weights, which
    // no bounded window frame reproduces. Shape: ONE shuffle (groupBy
    // user), a spillable in-partition sort, and a linear fold over the
    // per-user TAIL (tailEvents: the last FoldTail events, full count
    // kept) — collect_list is hard-capped at 1024 structs per key, the
    // bounded-memory shape at 100 TB, and the oracle folds the IDENTICAL
    // tail (its CTE starts at greatest(1, n−1023)) so the gate stays
    // bit-exact without any truncation-invisibility argument. The
    // dyadic α makes every step (x + 3y)/4 three exactly-reproducible
    // IEEE ops; the DuckDB oracle replays the same fold as a recursive
    // CTE in the same operation order, so the gate hash-matches doubles
    // without tolerance.
    Q("q_ewma",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |n AS (SELECT user_id, max(rn) AS n_events FROM s GROUP BY 1),
        |r AS (
        |  SELECT s.user_id, s.rn, s.value AS y
        |  FROM s JOIN n USING (user_id)
        |  WHERE s.rn = greatest(1, n.n_events - 1023)
        |  UNION ALL
        |  SELECT s.user_id, s.rn, (s.value + 3 * r.y) / 4
        |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT CAST(r.user_id AS BIGINT) AS user_id,
        |       CAST(n.n_events AS BIGINT) AS n_events,
        |       round(r.y, 6) AS ewma
        |FROM r JOIN n USING (user_id) WHERE r.rn = n.n_events
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val acc0 = struct(lit(0.0).as("y"), lit(false).as("init"))
      tailEvents(spark, dir)
        .select(big(col("user_id")).as("user_id"),
          big(col("n_events")).as("n_events"),
          round(aggregate(col("es"), acc0,
            (acc, e) => struct(
              when(acc.getField("init"),
                (e.getField("value") + lit(3.0) * acc.getField("y"))
                  / lit(4.0))
                .otherwise(e.getField("value")).as("y"),
              lit(true).as("init")),
            acc => acc.getField("y")), 6).as("ewma"))
        .orderBy("user_id")
    },

    // Holt linear-trend smoothing (double exponential): per user,
    // l ← (x + 3(l+b))/4, b ← (l′−l)/2 + b/2 (α = 1/4, β = 1/2, both
    // dyadic), initialized l₁ = x₁, b₁ = 0 — the one-step-ahead
    // forecaster (l+b) a monitoring pipeline runs where q_ewma's flat
    // smoother lags trending signals. Same shape and determinism
    // contract as q_ewma: one user shuffle, a fold over the same
    // hard-capped tailEvents tail (both CTEs start at
    // greatest(1, n−1023), so the engines fold identical inputs);
    // every step is a fixed sequence of exact IEEE ops (the l′
    // subexpression is duplicated IDENTICALLY in the trend update on
    // both engines), so the recursive-CTE oracle hash-matches doubles
    // with no tolerance. The 1024 tail length is generous here too:
    // perturbations decay at the update map's spectral radius
    // √(3/4) ≈ 0.87 per step (complex eigenpair of [[3/4,3/4],[−1/8,7/8]]),
    // ~1e-64 after 1024 steps.
    Q("q_holt",
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |n AS (SELECT user_id, max(rn) AS n_events FROM s GROUP BY 1),
        |r AS (
        |  SELECT s.user_id, s.rn, s.value AS l, CAST(0 AS DOUBLE) AS b
        |  FROM s JOIN n USING (user_id)
        |  WHERE s.rn = greatest(1, n.n_events - 1023)
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |         (s.value + 3 * (r.l + r.b)) / 4,
        |         (((s.value + 3 * (r.l + r.b)) / 4) - r.l) / 2 + r.b / 2
        |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT CAST(r.user_id AS BIGINT) AS user_id,
        |       CAST(n.n_events AS BIGINT) AS n_events,
        |       round(r.l, 6) AS level,
        |       round(r.b, 6) AS trend,
        |       round(r.l + r.b, 6) AS forecast_1
        |FROM r JOIN n USING (user_id) WHERE r.rn = n.n_events
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val acc0 = struct(lit(0.0).as("l"), lit(0.0).as("b"),
        lit(false).as("init"))
      tailEvents(spark, dir)
        .select(big(col("user_id")).as("user_id"),
          big(col("n_events")).as("n_events"),
          aggregate(col("es"), acc0, (acc, e) => {
            val l = acc.getField("l")
            val b = acc.getField("b")
            val x = e.getField("value")
            val lp = (x + lit(3.0) * (l + b)) / lit(4.0)
            struct(
              when(acc.getField("init"), lp).otherwise(x).as("l"),
              when(acc.getField("init"),
                (lp - l) / lit(2.0) + b / lit(2.0))
                .otherwise(lit(0.0)).as("b"),
              lit(true).as("init"))
          }).as("s"))
        .select(col("user_id"), col("n_events"),
          round(col("s.l"), 6).as("level"),
          round(col("s.b"), 6).as("trend"),
          round(col("s.l") + col("s.b"), 6).as("forecast_1"))
        .orderBy("user_id")
    },

    // Peak concurrent sessions per day: sessionize (the q_sessionize
    // 30-min-gap rule), clip each session to the days it overlaps, then
    // sweep +1/−1 endpoints. The oracle states the semantics as the
    // naive one-pass-per-day prefix sum; the Spark plan computes the SAME
    // values via a two-level scan — running sums inside (day, hour)
    // cells, a per-day exclusive prefix over the ≤24 cell totals (a
    // 24-row window partition), and their sum — because a per-day window
    // partition would put every session of a day through one task. Tie
    // order inside a cell is (t asc, delta desc): starts sort before
    // ends at the same instant, so touching sessions count as
    // concurrent; within a run of identical (t, delta) rows the running
    // sums form the same multiset under any order, so max(cur) is
    // deterministic even though per-row attribution is not. All-integer
    // arithmetic end to end.
    Q("q_peak_concurrency",
      """WITH sess AS (
        |  SELECT user_id, session_id,
        |         min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
        |  FROM (
        |    SELECT user_id, ts,
        |           sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                    THEN 1 ELSE 0 END)
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS session_id
        |    FROM (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                         ORDER BY ts, event_id)
        |                   AS prev_us
        |          FROM events))
        |  GROUP BY user_id, session_id),
        |days AS (
        |  SELECT s_us, e_us, u.d AS day
        |  FROM sess,
        |       UNNEST(range(s_us // 86400000000, e_us // 86400000000 + 1))
        |         AS u(d)),
        |pts AS (
        |  SELECT day, greatest(s_us, day * 86400000000) AS t, 1 AS delta
        |  FROM days
        |  UNION ALL
        |  SELECT day, least(e_us, (day + 1) * 86400000000) AS t, -1 AS delta
        |  FROM days),
        |run AS (
        |  SELECT day, delta,
        |         sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
        |                          ROWS UNBOUNDED PRECEDING) AS cur
        |  FROM pts)
        |SELECT CAST(day AS BIGINT) AS day,
        |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_sessions,
        |       CAST(max(cur) AS BIGINT) AS peak_concurrent
        |FROM run GROUP BY day ORDER BY day""".stripMargin) { (spark, dir) =>
      val dayUs = 86400000000L
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(min("us").as("s_us"), max("us").as("e_us"))
      val days = sess.select(col("s_us"), col("e_us"),
        explode(sequence(expr(s"s_us div $dayUs"), expr(s"e_us div $dayUs")))
          .as("day"))
      // both endpoints from ONE explode — a union of two selects over
      // `days` would recompute the whole sessionize subtree per branch —
      // and the point set is MATERIALIZED (SessionCache: persisted WITH
      // lineage, so a lost executor recomputes): the per-cell window and
      // the cell-totals aggregate below are different exchange subtrees
      // ReuseExchange cannot collapse, so an unmaterialized pts would run
      // the whole sessionize sweep twice
      val pts = graft.util.SessionCache
        .getOrMaterialize(spark, s"conc_pts:$dir") {
          days
            .select(col("day"), explode(array(
              struct(greatest(col("s_us"), col("day") * lit(dayUs)).as("t"),
                lit(1L).as("delta")),
              struct(least(col("e_us"), (col("day") + 1) * lit(dayUs)).as("t"),
                lit(-1L).as("delta")))).as("p"))
            .select(col("day"), col("p.t").as("t"), col("p.delta").as("delta"))
            .withColumn("cell",
              expr(s"(t - day * $dayUs) div 3600000000"))
        }
      // two-level scan: running sum inside each (day, hour) cell …
      val byCell = Window.partitionBy("day", "cell")
        .orderBy(col("t").asc, col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // … plus a per-day EXCLUSIVE prefix over the ≤24 cell totals
      val cellTotals = pts.groupBy("day", "cell")
        .agg(sum("delta").as("tot"))
      val byDayCells = Window.partitionBy("day").orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = cellTotals
        .withColumn("off", coalesce(sum("tot").over(byDayCells), lit(0L)))
        .select("day", "cell", "off")
      pts
        .withColumn("cur_c", sum("delta").over(byCell))
        .join(offsets, Seq("day", "cell"))
        .withColumn("cur", col("off") + col("cur_c"))
        .groupBy("day")
        .agg(big(sum(when(col("delta") === 1L, 1L).otherwise(0L)))
          .as("n_sessions"),
          big(max(col("cur"))).as("peak_concurrent"))
        .select(big(col("day")).as("day"), col("n_sessions"),
          col("peak_concurrent"))
        .orderBy("day")
    },

    // Mann–Kendall trend test per event type over the per-day mean-value
    // series: S = Σ_{i<j} sign(m_j − m_i) and Kendall's τ as integer ppm
    // — the standard NONPARAMETRIC "is this metric trending?" monitor
    // (no distribution assumption, robust to outliers), next to
    // q_changepoint's level-shift detector. All-integer once the daily
    // means are fixed: sign comparisons of deterministic doubles (each
    // mean is an exact DECIMAL sum ÷ count, one IEEE divide), an
    // integer-pair sum, one integer divide. Shape: the corpus reduces to
    // the BOUNDED (type, day) axis first (one hash agg); the pair join
    // is per-type day², bounded by the calendar (365² ≈ 133k/type/year),
    // never corpus-sized.
    Q("q_mann_kendall",
      """WITH daily AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.t,
        |         CASE WHEN b.m > a.m THEN 1
        |              WHEN b.m < a.m THEN -1 ELSE 0 END AS sg
        |  FROM daily a JOIN daily b ON a.t = b.t AND a.day < b.day),
        |n AS (SELECT t, count(*) AS n_days FROM daily GROUP BY 1)
        |SELECT p.t AS event_type, CAST(n.n_days AS BIGINT) AS n_days,
        |       CAST(sum(p.sg) AS BIGINT) AS s_stat,
        |       CAST(1000000 * sum(p.sg)
        |            // ((n.n_days * (n.n_days - 1)) // 2) AS BIGINT) AS tau_ppm
        |FROM p JOIN n ON n.t = p.t
        |GROUP BY p.t, n.n_days
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val daily = dailyMeans(spark, dir)
      val pairs = daily.select(col("t"), col("day").as("da"), col("m").as("ma"))
        .join(daily.select(col("t"), col("day").as("db"), col("m").as("mb")),
          Seq("t"))
        .filter(col("da") < col("db"))
        .select(col("t"),
          when(col("mb") > col("ma"), 1L)
            .when(col("mb") < col("ma"), -1L).otherwise(0L).as("sg"))
      val n = daily.groupBy("t").agg(count(lit(1)).as("n_days"))
      pairs.groupBy("t").agg(sum(col("sg")).as("s"))
        .join(broadcast(n), Seq("t"))
        .select(col("t").as("event_type"), big(col("n_days")).as("n_days"),
          big(col("s")).as("s_stat"),
          big(expr("1000000 * s div ((n_days * (n_days - 1)) div 2)"))
            .as("tau_ppm"))
        .orderBy("event_type")
    },

    // Theil–Sen trend estimator per event type: the MEDIAN of all
    // pairwise per-day slopes (m_j − m_i)/(j − i) — the robust slope the
    // Mann–Kendall test above detects (up to 29% contamination breaks an
    // OLS fit; the pairwise-slope median shrugs it off). Median rule:
    // the lower median (rank ⌈m/2⌉ of the ascending slope order) — a
    // DETERMINISTIC pick both engines express as row_number = (m+1)÷2;
    // ties among equal slopes make any tied pick the same value. Same
    // bounded (type, day) reduction as q_mann_kendall; the slope-rank
    // window partitions by type over day²-bounded rows.
    Q("q_theil_sen",
      """WITH daily AS (
        |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS m
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.t, (b.m - a.m) / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.t = b.t AND a.day < b.day),
        |r AS (
        |  SELECT t, slope,
        |         row_number() OVER (PARTITION BY t ORDER BY slope) AS rn,
        |         count(*) OVER (PARTITION BY t) AS m
        |  FROM sl)
        |SELECT t AS event_type, CAST(m AS BIGINT) AS n_pairs,
        |       round(slope, 9) AS sen_slope
        |FROM r WHERE rn = (m + 1) // 2
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val daily = dailyMeans(spark, dir)
      val slopes = daily.select(col("t"), col("day").as("da"), col("m").as("ma"))
        .join(daily.select(col("t"), col("day").as("db"), col("m").as("mb")),
          Seq("t"))
        .filter(col("da") < col("db"))
        .select(col("t"),
          ((col("mb") - col("ma"))
            / (col("db") - col("da")).cast(DoubleType)).as("slope"))
      val byT = Window.partitionBy("t").orderBy("slope")
      slopes
        .withColumn("rn", row_number().over(byT))
        .withColumn("m", count(lit(1)).over(Window.partitionBy("t")))
        .filter(col("rn") === expr("(m + 1) div 2"))
        .select(col("t").as("event_type"), big(col("m")).as("n_pairs"),
          round(col("slope"), 9).as("sen_slope"))
        .orderBy("event_type")
    },

    // Two-proportion chi-square test (2×2 contingency): does the even-
    // user cohort convert (≥14 purchases) at a different rate than the
    // odd cohort — the A/B-test read-out next to q_wilson_rank's
    // interval ranking. χ² = n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) — the
    // sqrt-free 2×2 form, so the statistic is ONE double divide of two
    // exact integer products; the cross products run in
    // DECIMAL/HUGEINT, never Long (ad−bc squared reaches n⁴ — the same
    // silent-wrap hazard the drift queries guard). Shape: one user
    // hash agg, one 4-cell agg — nothing scales past the user axis.
    Q("q_chi_square",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS cohort,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           >= 14 AS success
        |  FROM events GROUP BY user_id),
        |cells AS (
        |  SELECT
        |    sum(CASE WHEN cohort = 0 AND success THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN cohort = 0 AND NOT success THEN 1 ELSE 0 END) AS b,
        |    sum(CASE WHEN cohort = 1 AND success THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN cohort = 1 AND NOT success THEN 1 ELSE 0 END) AS d
        |  FROM u),
        |w AS (
        |  SELECT a, b, c, d,
        |         CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS sel
        |  FROM cells)
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |       CAST(1000000 * a // (a + b) AS BIGINT) AS rate0_ppm,
        |       CAST(1000000 * c // (c + d) AS BIGINT) AS rate1_ppm,
        |       CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0
        |            THEN NULL
        |            ELSE round(
        |              CAST(CAST(a + b + c + d AS HUGEINT) * sel * sel AS DOUBLE)
        |              / CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c)
        |                     * (b + d) AS DOUBLE), 6) END AS chi2
        |FROM w ORDER BY a""".stripMargin) { (spark, dir) =>
      val cells = events(spark, dir)
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= 14).as("success"))
        .select((col("user_id") % 2).as("cohort"), col("success"))
        .agg(
          sum(when(col("cohort") === 0 && col("success"), 1L).otherwise(0L))
            .as("a"),
          sum(when(col("cohort") === 0 && !col("success"), 1L).otherwise(0L))
            .as("b"),
          sum(when(col("cohort") === 1 && col("success"), 1L).otherwise(0L))
            .as("c"),
          sum(when(col("cohort") === 1 && !col("success"), 1L).otherwise(0L))
            .as("d"))
      val sel = dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c"))
      cells
        .withColumn("sel", sel)
        .select(big(col("a")).as("a"), big(col("b")).as("b"),
          big(col("c")).as("c"), big(col("d")).as("d"),
          big(expr("1000000 * a div (a + b)")).as("rate0_ppm"),
          big(expr("1000000 * c div (c + d)")).as("rate1_ppm"),
          // NULL when any marginal is zero (chi2 undefined): the q_log_rank
          // stance, mirrored in the oracle's CASE — avoids relying on
          // engine-specific 0/0 handling (DuckDB >= 1.1 defaults to NaN).
          when(col("a") + col("b") === 0 || col("c") + col("d") === 0 ||
            col("a") + col("c") === 0 || col("b") + col("d") === 0,
            lit(null).cast(DoubleType))
            .otherwise(round((dec(col("a") + col("b") + col("c") + col("d"))
              * col("sel") * col("sel")).cast(DoubleType)
              / (dec(col("a") + col("b")) * dec(col("c") + col("d"))
                * dec(col("a") + col("c")) * dec(col("b") + col("d")))
                .cast(DoubleType), 6)).as("chi2"))
        .orderBy("a")
    },

    // Kaplan–Meier survival over customer ORDER lifetimes: duration =
    // days between a customer's first and last order, right-CENSORED
    // when the last order falls within 90 days of the dataset horizon
    // (the customer is plausibly still active — exactly the estimand
    // retention analyses get wrong by ignoring censoring, and the reason
    // KM exists). S(t) = Π_{dᵢ ≤ t} (1 − deathsᵢ/at_riskᵢ), one row per
    // death step. Shapes: the corpus reduces to per-customer (duration,
    // censored) then to the CALENDAR-BOUNDED duration axis (≤ days in
    // the data window); at_risk is a reverse cumulative sum over that
    // bounded axis (allowlisted global window — the q_revenue_growth
    // convention) and the product fold runs over ONE collected array of
    // the same bounded axis. Determinism: each factor is one double
    // divide of exact integers, the chain multiplies in ascending
    // duration order on both engines, deaths-free steps multiply by
    // nothing (skipped, not ×1.0).
    Q("q_kaplan_meier",
      """WITH RECURSIVE cust AS (
        |  SELECT o_custkey,
        |         date_diff('day', min(o_orderdate), max(o_orderdate)) AS dur,
        |         max(o_orderdate) AS last_o
        |  FROM orders GROUP BY 1),
        |horizon AS (SELECT max(o_orderdate) AS h FROM orders),
        |lab AS (
        |  SELECT dur, date_diff('day', last_o, horizon.h) < 90 AS censored
        |  FROM cust, horizon),
        |ends AS (
        |  SELECT dur, count(*) AS ending,
        |         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS deaths
        |  FROM lab GROUP BY dur),
        |axis AS (
        |  SELECT dur, ending, deaths,
        |         sum(ending) OVER (ORDER BY dur DESC) AS at_risk,
        |         row_number() OVER (ORDER BY dur) AS rn
        |  FROM ends),
        |r AS (
        |  SELECT dur, rn, deaths, at_risk,
        |         CASE WHEN deaths = 0 THEN CAST(1 AS DOUBLE)
        |              ELSE CAST(at_risk - deaths AS DOUBLE)
        |                   / CAST(at_risk AS DOUBLE) END AS s
        |  FROM axis WHERE rn = 1
        |  UNION ALL
        |  SELECT k.dur, k.rn, k.deaths, k.at_risk,
        |         CASE WHEN k.deaths = 0 THEN r.s
        |              ELSE r.s * (CAST(k.at_risk - k.deaths AS DOUBLE)
        |                          / CAST(k.at_risk AS DOUBLE)) END
        |  FROM r JOIN axis k ON k.rn = r.rn + 1)
        |SELECT CAST(dur AS BIGINT) AS duration_days,
        |       CAST(at_risk AS BIGINT) AS at_risk,
        |       CAST(deaths AS BIGINT) AS n_deaths,
        |       round(s, 9) AS km_survival
        |FROM r WHERE deaths > 0 ORDER BY duration_days""".stripMargin) {
      (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      val ends = o.groupBy("o_custkey")
        .agg(datediff(max("o_orderdate"), min("o_orderdate")).as("dur"),
          max("o_orderdate").as("last_o"))
        .crossJoin(broadcast(o.agg(max("o_orderdate").as("h"))))
        .select(col("dur"),
          (datediff(col("h"), col("last_o")) < 90).as("censored"))
        .groupBy("dur")
        .agg(count(lit(1)).as("ending"),
          sum(when(col("censored"), 0L).otherwise(1L)).as("deaths"))
      // bounded duration axis: both partition-less windows span ≤ the
      // calendar-day count (globalWindowAllowed)
      val atRisk = sum("ending").over(Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val axis = ends.withColumn("at_risk", atRisk)
      val elem = "struct<dur:int,at_risk:bigint,deaths:bigint,s:double>"
      val folded = axis
        .select(struct(col("dur"), col("at_risk"), col("deaths")).as("e"))
        .agg(sort_array(collect_list(col("e"))).as("es")) // bounded axis
        .select(explode(aggregate(col("es"),
          struct(lit(1.0).as("s"), array().cast(s"array<$elem>").as("out")),
          (acc, e) => {
            val f = when(e.getField("deaths") === 0L, acc.getField("s"))
              .otherwise(acc.getField("s") *
                ((e.getField("at_risk") - e.getField("deaths"))
                  .cast(DoubleType)
                  / e.getField("at_risk").cast(DoubleType)))
            struct(f.as("s"),
              concat(acc.getField("out"), array(struct(
                e.getField("dur").as("dur"),
                e.getField("at_risk").as("at_risk"),
                e.getField("deaths").as("deaths"), f.as("s")))).as("out"))
          },
          acc => acc.getField("out"))).as("row"))
      folded
        .filter(col("row.deaths") > 0L)
        .select(big(col("row.dur")).as("duration_days"),
          big(col("row.at_risk")).as("at_risk"),
          big(col("row.deaths")).as("n_deaths"),
          round(col("row.s"), 9).as("km_survival"))
        .orderBy("duration_days")
    },

    // Log-rank test: does the even-custkey cohort's survival curve (the
    // q_kaplan_meier estimand) differ from the odd cohort's — the
    // standard two-sample comparison OVER censored data, completing the
    // survival pair (KM estimates each curve; log-rank tests the
    // difference; q_chi_square is its uncensored 2×2 sibling). At each
    // death time: observed cohort-0 deaths vs the hypergeometric
    // expectation d·n₀/n and variance d(n−d)n₀(n−n₀)/(n²(n−1)); the
    // statistic is (ΣO − ΣE)²/ΣV. Determinism: every integer product is
    // DECIMAL/HUGEINT-wide (the n⁴ variance numerator wraps Long at
    // ~60k at-risk), each term is a fixed double-op sequence, and the
    // two fractional sums accumulate in DECIMAL(38,12). Shape: the same
    // calendar-bounded duration axis as q_kaplan_meier with per-cohort
    // reverse cumsums (allowlisted bounded global windows) — no
    // recursion, no fold.
    Q("q_log_rank",
      """WITH cust AS (
        |  SELECT o_custkey, o_custkey % 2 AS cohort,
        |         date_diff('day', min(o_orderdate), max(o_orderdate)) AS dur,
        |         max(o_orderdate) AS last_o
        |  FROM orders GROUP BY 1, 2),
        |horizon AS (SELECT max(o_orderdate) AS h FROM orders),
        |lab AS (
        |  SELECT dur, cohort,
        |         date_diff('day', last_o, horizon.h) < 90 AS censored
        |  FROM cust, horizon),
        |ends AS (
        |  SELECT dur,
        |         count(*) AS ending_all,
        |         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS deaths_all,
        |         sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS ending_c0,
        |         sum(CASE WHEN cohort = 0 AND NOT censored THEN 1 ELSE 0 END)
        |           AS deaths_c0
        |  FROM lab GROUP BY dur),
        |axis AS (
        |  SELECT dur, deaths_all, deaths_c0,
        |         sum(ending_all) OVER (ORDER BY dur DESC) AS ar,
        |         sum(ending_c0) OVER (ORDER BY dur DESC) AS ar0
        |  FROM ends),
        |terms AS (
        |  SELECT deaths_c0 AS o1,
        |         CAST(CAST(deaths_all AS HUGEINT) * ar0 AS DOUBLE)
        |           / CAST(ar AS DOUBLE) AS e1,
        |         CASE WHEN ar = 1 THEN CAST(0 AS DOUBLE)
        |              ELSE CAST(CAST(deaths_all AS HUGEINT) * (ar - deaths_all)
        |                        * ar0 * (ar - ar0) AS DOUBLE)
        |                   / CAST(CAST(ar AS HUGEINT) * ar * (ar - 1)
        |                          AS DOUBLE)
        |         END AS v
        |  FROM axis WHERE deaths_all > 0),
        |agg AS (
        |  SELECT CAST(sum(o1) AS BIGINT) AS o1,
        |         sum(CAST(e1 AS DECIMAL(38,12))) AS e1s,
        |         sum(CAST(v AS DECIMAL(38,12))) AS vs,
        |         CAST(count(*) AS BIGINT) AS n_death_times
        |  FROM terms)
        |SELECT n_death_times, o1, round(CAST(e1s AS DOUBLE), 6) AS e1,
        |       round(CAST(vs AS DOUBLE), 6) AS var_lr,
        |       CASE WHEN vs IS NULL OR vs = 0 THEN NULL
        |            ELSE round((CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
        |                       * (CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
        |                       / CAST(vs AS DOUBLE), 6) END AS logrank_chi2
        |FROM agg ORDER BY o1""".stripMargin) { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      val ends = o.groupBy("o_custkey")
        .agg(datediff(max("o_orderdate"), min("o_orderdate")).as("dur"),
          max("o_orderdate").as("last_o"))
        .crossJoin(broadcast(o.agg(max("o_orderdate").as("h"))))
        .select(col("dur"), (col("o_custkey") % 2).as("cohort"),
          (datediff(col("h"), col("last_o")) < 90).as("censored"))
        .groupBy("dur")
        .agg(count(lit(1)).as("ending_all"),
          sum(when(col("censored"), 0L).otherwise(1L)).as("deaths_all"),
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("ending_c0"),
          sum(when(col("cohort") === 0 && !col("censored"), 1L).otherwise(0L))
            .as("deaths_c0"))
      // bounded duration axis (globalWindowAllowed)
      val byDurDesc = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = ends
        .withColumn("ar", sum("ending_all").over(byDurDesc))
        .withColumn("ar0", sum("ending_c0").over(byDurDesc))
        .filter(col("deaths_all") > 0)
        .select(col("deaths_c0").as("o1"),
          ((dec(col("deaths_all")) * dec(col("ar0"))).cast(DoubleType)
            / col("ar").cast(DoubleType)).as("e1"),
          when(col("ar") === 1, lit(0.0)).otherwise(
            (dec(col("deaths_all")) * dec(col("ar") - col("deaths_all"))
              * dec(col("ar0")) * dec(col("ar") - col("ar0")))
              .cast(DoubleType)
              / (dec(col("ar")) * dec(col("ar")) * dec(col("ar") - 1))
                .cast(DoubleType)).as("v"))
      terms
        .agg(big(sum(col("o1"))).as("o1"),
          sum(col("e1").cast(DecimalType(38, 12))).as("e1s"),
          sum(col("v").cast(DecimalType(38, 12))).as("vs"),
          big(count(lit(1))).as("n_death_times"))
        .select(col("n_death_times"), col("o1"),
          round(col("e1s").cast(DoubleType), 6).as("e1"),
          round(col("vs").cast(DoubleType), 6).as("var_lr"),
          // guarded like the oracle: a fixture where every customer is
          // censored (empty terms → null sums) or every death time has
          // one cohort fully at risk (ΣV = 0) yields NULL, not NaN/inf
          when(col("vs").isNull || col("vs") === 0,
            lit(null).cast(DoubleType))
            .otherwise(
              round((col("o1").cast(DoubleType) - col("e1s").cast(DoubleType))
                * (col("o1").cast(DoubleType) - col("e1s").cast(DoubleType))
                / col("vs").cast(DoubleType), 6)).as("logrank_chi2"))
        .orderBy("o1")
    },

    // HyperLogLog distinct-count estimate, FULLY oracle-gated — the
    // replayable sibling of q_agg_approx_distinct (Spark's native HLL
    // registers are engine-private, so that one is the suite's lone
    // rows-only check; THIS sketch is built on the repo's linear FNV
    // fold, so DuckDB replays every register). The FNV fold alone is NOT
    // rank-grade: multiply-mod-2⁶⁴ propagates entropy strictly upward,
    // and an HLL rank reads bit PATTERNS from the weak low end — dense
    // integer keys overestimated by 20–45% when the rank was taken from
    // the raw fold (measured, 30 disjoint consecutive-key populations).
    // The fold therefore passes through [[graft.ops.expr.Mix64]] — an
    // fmix64-shaped xorshift-multiply finalizer whose constants keep the
    // oracle's HUGEINT replay products under 2¹²⁷ — after which the same
    // populations land within ±1σ (measured mean +0.8%). Layout on the
    // mixed value: bucket = h & 255, rank = trailing zeros of h >> 8
    // (+1, capped 57). Register sums are exact: each 2^(57−M) term is a
    // long, the Σ accumulates in DECIMAL (engine-independent), empty
    // registers contribute 2⁵⁷ each, and the α·m²/Σ estimate is ONE
    // double divide of exactly-representable operands. No small-range
    // correction (it needs ln(), which the determinism contract
    // forbids): the RAW estimate, the empty-register count, and err_ppm
    // against the exact count are emitted — the query is its own
    // accuracy audit (asymptotic σ = 1.04/√256 = 6.5%; raw-HLL bias
    // applies below n ≈ 2.5·m as usual). Scale: one distinct + one
    // 256-register agg per group — the sketch the KMV family
    // (q_kmv_distinct) complements from the order-statistics side.
    Q("q_hll_distinct",
      """WITH RECURSIVE inp AS (
        |  SELECT DISTINCT l_returnflag AS g,
        |         'hll:' || CAST(l_orderkey AS VARCHAR) AS str
        |  FROM lineitem),
        |f AS (
        |  SELECT g, str, 1 AS pos, CAST(14695981039346656037 AS HUGEINT) AS h
        |  FROM inp
        |  UNION ALL
        |  SELECT g, str, pos + 1,
        |         (xor(h, CAST(ascii(substr(str, pos, 1)) AS HUGEINT))
        |          * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
        |  FROM f WHERE pos <= length(str)),
        |raw AS (SELECT g, h FROM f WHERE pos = length(str) + 1),
        |m1 AS (SELECT g, xor(h, h // 8589934592) AS h FROM raw),
        |m2 AS (SELECT g, (h * CAST(9174307257865047245 AS HUGEINT))
        |                 % CAST(18446744073709551616 AS HUGEINT) AS h
        |       FROM m1),
        |m3 AS (SELECT g, xor(h, h // 8589934592) AS h FROM m2),
        |m4 AS (SELECT g, (h * CAST(4958104740799310931 AS HUGEINT))
        |                 % CAST(18446744073709551616 AS HUGEINT) AS h
        |       FROM m3),
        |mx AS (SELECT g, xor(h, h // 8589934592) AS h FROM m4),
        |hh AS (SELECT g, CAST(h % 256 AS BIGINT) AS bucket, h // 256 AS x
        |       FROM mx),
        |reg AS (
        |  SELECT g, bucket,
        |         max(CASE WHEN x = 0 THEN 57
        |                  ELSE length(bin(xor(x, x - 1))) END) AS m
        |  FROM hh GROUP BY 1, 2),
        |s AS (
        |  SELECT g,
        |         sum(CAST(CAST(1 AS BIGINT) << (57 - m) AS HUGEINT))
        |           + CAST(256 - count(*) AS HUGEINT)
        |             * (CAST(1 AS HUGEINT) << 57) AS s_all,
        |         256 - count(*) AS v_empty
        |  FROM reg GROUP BY 1),
        |ex AS (SELECT g, count(*) AS n_exact FROM inp GROUP BY 1),
        |est AS (
        |  SELECT s.g, ex.n_exact, s.v_empty,
        |         round((0.7213 / (1 + 1.079 / 256)) * 65536
        |               * CAST(CAST(1 AS HUGEINT) << 57 AS DOUBLE)
        |               / CAST(s.s_all AS DOUBLE), 4) AS hll_est
        |  FROM s JOIN ex ON ex.g = s.g)
        |SELECT g AS return_flag, CAST(n_exact AS BIGINT) AS n_exact,
        |       CAST(v_empty AS BIGINT) AS v_empty, hll_est,
        |       CAST(floor(1000000 * (hll_est - n_exact) / n_exact) AS BIGINT)
        |         AS err_ppm
        |FROM est ORDER BY return_flag""".stripMargin) { (spark, dir) =>
      // one distinct (g, key) pass hashed once; SessionCache: the
      // register agg and the exact count are two consumers
      val pairs = graft.util.SessionCache
        .getOrMaterialize(spark, s"hll_pairs:$dir") {
          tbl(spark, dir, "lineitem")
            .select(col("l_returnflag").as("g"), col("l_orderkey")).distinct()
            .select(col("g"), graft.ops.expr.Mix64.column(VectorOps.fnv1a64(
              concat(lit("hll:"), col("l_orderkey").cast("string")))).as("h"))
        }
      val x = shiftrightunsigned(col("h"), 8)
      val reg = pairs
        .select(col("g"), col("h").bitwiseAND(lit(255L)).as("bucket"),
          when(x === 0L, lit(57))
            .otherwise(length(bin(x.bitwiseXOR(x - 1)))).as("r"))
        .groupBy("g", "bucket").agg(max("r").as("m"))
      val dec38 = DecimalType(38, 0)
      val s = reg.groupBy("g").agg(
        (sum(expr("shiftleft(1L, cast(57 - m as int))").cast(dec38))
          + (lit(256L) - count(lit(1))).cast(dec38)
            * lit(1L << 57).cast(dec38)).as("s_all"),
        (lit(256L) - count(lit(1))).as("v_empty"))
      val ex = pairs.groupBy("g").agg(count(lit(1)).as("n_exact"))
      val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
      val nD = col("n_exact").cast(DoubleType)
      s.join(ex, Seq("g"))
        .withColumn("hll_est", round(
          alpha * lit(65536.0) * lit((1L << 57).toDouble)
            / col("s_all").cast(DoubleType), 4))
        .select(col("g").as("return_flag"), big(col("n_exact")).as("n_exact"),
          big(col("v_empty")).as("v_empty"), col("hll_est"),
          big(floor(lit(1000000.0) * (col("hll_est") - nD) / nD))
            .as("err_ppm"))
        .orderBy("return_flag")
    },

    // Bloom-filter false-positive audit — the measured-FPR report an
    // operator reads before sizing a bloom-pruned join (the runtime-
    // filter / Iceberg-bloom decision, completing the pruning family
    // next to q_zone_skipping's min-max report): build an m=2048-bit,
    // k=4 filter over the even-key member set, probe with the disjoint
    // odd-key set, report bits set and the exact false-positive rate.
    // Bit positions are pmod(fnv1a64("bf:i:" + key), m) — a LINEAR byte
    // fold with a leading salt, so DuckDB replays every position per
    // character in HUGEINT and the audit is hash-exact end to end (m
    // divides 2⁶⁴, so unsigned % = signed pmod). Scale shape: the bit
    // set is bounded (≤ m rows, broadcast); members/probes stream
    // through one explode + one hash agg each; the one-row stat frames
    // cross-join at the end (the q_bm25 scalar shape).
    Q("q_bloom_fpr",
      """WITH RECURSIVE inp AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS key, c_custkey % 2 = 0 AS member
        |  FROM customer),
        |st AS (
        |  SELECT key, member, 'bf:' || s || ':' || key AS str
        |  FROM inp, UNNEST(['0','1','2','3']) AS u(s)),
        |f AS (
        |  SELECT str, key, member, 1 AS pos,
        |         CAST(14695981039346656037 AS HUGEINT) AS h
        |  FROM st
        |  UNION ALL
        |  SELECT str, key, member, pos + 1,
        |         (xor(h, CAST(ascii(substr(str, pos, 1)) AS HUGEINT))
        |          * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
        |  FROM f WHERE pos <= length(str)),
        |pp AS (SELECT key, member, CAST(h % 2048 AS BIGINT) AS p
        |       FROM f WHERE pos = length(str) + 1),
        |bits AS (SELECT DISTINCT p FROM pp WHERE member),
        |pr AS (
        |  SELECT pp.key, count(DISTINCT pp.p) AS np, count(DISTINCT b.p) AS nh
        |  FROM pp LEFT JOIN bits b ON b.p = pp.p
        |  WHERE NOT pp.member GROUP BY pp.key)
        |SELECT CAST(2048 AS BIGINT) AS m_bits, CAST(4 AS BIGINT) AS k_hashes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM inp WHERE member)
        |         AS n_members,
        |       (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
        |       CAST(count(*) AS BIGINT) AS n_probes,
        |       CAST(sum(CASE WHEN nh = np THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_false_pos,
        |       CAST(1000000 * sum(CASE WHEN nh = np THEN 1 ELSE 0 END)
        |            // count(*) AS BIGINT) AS fpr_ppm
        |FROM pr
        |ORDER BY n_probes""".stripMargin) { (spark, dir) =>
      val mBits = 2048L
      // (key, member, position) — 4 salted FNV positions per key;
      // materialized (SessionCache, lineage intact): the bit set, the
      // probe side, and the member count are three different consumers
      val pp = graft.util.SessionCache
        .getOrMaterialize(spark, s"bloom_pp:$dir") {
          tbl(spark, dir, "customer")
            .select(col("c_custkey").cast("string").as("key"),
              (col("c_custkey") % 2 === 0).as("member"))
            .select(col("key"), col("member"), explode(array(
              (0 until 4).map(i => pmod(VectorOps.fnv1a64(
                concat(lit(s"bf:$i:"), col("key"))), lit(mBits))): _*)).as("p"))
        }
      val bits = pp.filter(col("member")).select("p").distinct() // ≤ m rows
      val pr = pp.filter(!col("member"))
        .join(broadcast(bits.withColumn("hit", lit(1))), Seq("p"), "left")
        .groupBy("key")
        .agg(countDistinct(col("p")).as("np"),
          countDistinct(when(col("hit").isNotNull, col("p"))).as("nh"))
      pr.agg(count(lit(1)).as("n_probes"),
          sum(when(col("nh") === col("np"), 1L).otherwise(0L))
            .as("n_false_pos"))
        .crossJoin(broadcast(pp.filter(col("member"))
          .agg(countDistinct(col("key")).as("n_members"))))
        .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
        .select(big(lit(mBits)).as("m_bits"), big(lit(4)).as("k_hashes"),
          big(col("n_members")).as("n_members"),
          big(col("n_bits_set")).as("n_bits_set"),
          big(col("n_probes")).as("n_probes"),
          big(col("n_false_pos")).as("n_false_pos"),
          big(expr("1000000 * n_false_pos div n_probes")).as("fpr_ppm"))
        .orderBy("n_probes")
    },

    // Mann–Whitney U (Wilcoxon rank-sum): do purchase values
    // stochastically dominate view values — the nonparametric two-sample
    // test practitioners run for A/B on skewed numeric metrics,
    // completing the toolkit (q_chi_square categorical, q_log_rank
    // censored, this one ordinal/numeric). All-integer via DOUBLED
    // tie-averaged ranks: a tie group of pooled size c ending at pooled
    // cumulative cum has 2·avgRank = 2·cum − c + 1 (integer), so
    // 2R₁ = Σ_v c₁(v)·(2·cum(v) − c(v) + 1) and 2U₁ = 2R₁ − n₁(n₁+1)
    // are exact; the reported effect size is the AUC
    // P(X₁>X₂) + ½P(=) = U₁/(n₁n₂) in ppm — ONE integer division.
    // Shape: the q_ks_drift grid scaffolding over the two-type slice
    // (per-type ranged windows + the ≤2-row per-value window deriving
    // pooled cumulatives — never a partition-less corpus window);
    // cross products DECIMAL/HUGEINT-wide.
    Q("q_mann_whitney",
      """WITH ev AS (
        |  SELECT event_type AS t, value AS v FROM events
        |  WHERE event_type IN ('purchase', 'view')),
        |cnt AS (SELECT t, v, count(*) AS c FROM ev GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM ev),
        |types AS (SELECT t, count(*) AS n_t FROM ev GROUP BY 1),
        |grid AS (
        |  SELECT ty.t, va.v, coalesce(c.c, 0) AS c
        |  FROM vals va CROSS JOIN types ty
        |  LEFT JOIN cnt c ON c.t = ty.t AND c.v = va.v),
        |cum AS (
        |  SELECT t, v, c, sum(c) OVER (PARTITION BY t ORDER BY v) AS cum_t
        |  FROM grid),
        |cum2 AS (
        |  SELECT t, c,
        |         sum(cum_t) OVER (PARTITION BY v) AS cum_all,
        |         sum(c) OVER (PARTITION BY v) AS c_all
        |  FROM cum),
        |r1 AS (
        |  SELECT sum(CAST(c AS HUGEINT) * (2 * cum_all - c_all + 1)) AS r1_x2
        |  FROM cum2 WHERE t = 'purchase'),
        |nn AS (
        |  SELECT max(CASE WHEN t = 'purchase' THEN n_t END) AS n1,
        |         max(CASE WHEN t = 'view' THEN n_t END) AS n2
        |  FROM types)
        |SELECT CAST(nn.n1 AS BIGINT) AS n1, CAST(nn.n2 AS BIGINT) AS n2,
        |       CAST(r1.r1_x2 - CAST(nn.n1 AS HUGEINT) * (nn.n1 + 1) AS BIGINT)
        |         AS u1_x2,
        |       CAST(1000000 * (r1.r1_x2 - CAST(nn.n1 AS HUGEINT) * (nn.n1 + 1))
        |            // (2 * CAST(nn.n1 AS HUGEINT) * nn.n2) AS BIGINT)
        |         AS auc_ppm
        |FROM r1, nn ORDER BY n1""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_type").as("t"), col("value").as("v"))
      val cnt = ev.groupBy("t", "v").agg(count(lit(1)).as("c"))
      val vals = ev.select("v").distinct()
      val types = ev.groupBy("t").agg(count(lit(1)).as("n_t"))
      val grid = vals.crossJoin(broadcast(types.select("t")))
        .join(cnt, Seq("t", "v"), "left")
        .na.fill(0L, Seq("c"))
      val byT = Window.partitionBy("t").orderBy("v")
      val byV = Window.partitionBy("v")
      val r1 = grid
        .withColumn("cum_t", sum("c").over(byT))
        .withColumn("cum_all", sum("cum_t").over(byV))
        .withColumn("c_all", sum("c").over(byV))
        .filter(col("t") === "purchase")
        .agg(sum(dec(col("c"))
          * dec(lit(2) * col("cum_all") - col("c_all") + 1)).as("r1_x2"))
      val nn = types.agg(
        max(when(col("t") === "purchase", col("n_t"))).as("n1"),
        max(when(col("t") === "view", col("n_t"))).as("n2"))
      r1.crossJoin(broadcast(nn))
        // integral `div` on decimals truncates like DuckDB `//`; a
        // decimal `/` would ROUND the quotient before the long cast and
        // could disagree by one ppm at a rounding boundary
        .withColumn("u1x2", col("r1_x2") - dec(col("n1")) * dec(col("n1") + 1))
        .select(big(col("n1")).as("n1"), big(col("n2")).as("n2"),
          big(col("u1x2")).as("u1_x2"),
          big(expr("(CAST(1000000 AS DECIMAL(19,0)) * u1x2) div " +
            "(CAST(2 AS DECIMAL(19,0)) * CAST(n1 AS DECIMAL(19,0)) " +
            "* CAST(n2 AS DECIMAL(19,0)))")).as("auc_ppm"))
        .orderBy("n1")
    },

    // Exact 1-Wasserstein (earth-mover) drift of each event type's value
    // distribution against the rest of the stream: W₁ = ∫|F_t − F_rest|,
    // evaluated exactly as Σ over consecutive pooled values of
    // gap × |F_t − F_rest| (both CDFs are step functions, so the
    // integral is this finite sum). Same scaffolding as q_ks_drift —
    // per-(type,value) counts, the distinct value axis crossed with the
    // BOUNDED type set, one ranged window per type, the per-value
    // ≤|types|-row window deriving the pooled CDF as Σ_t cum_t — with the
    // CDF gap carried as the integer cross-product
    // |cum_t·n_rest − cum_rest·n_t| and each trapezoid term
    // gap·|·| accumulated in DECIMAL(38,12) (order-independent), ONE
    // double divide at the end. The (t,v) count join is a SHUFFLE join,
    // not a broadcast: per-(type,value) counts grow with the corpus. At
    // corpus scale you'd pre-bin the value axis (compose q_quantile_bin)
    // for a bounded-error variant; the exact form is the oracle contract.
    Q("q_wasserstein_drift",
      """WITH ev AS (SELECT event_type AS t, value AS v FROM events),
        |cnt AS (SELECT t, v, count(*) AS c FROM ev GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM ev),
        |types AS (SELECT t, count(*) AS n_t FROM ev GROUP BY 1),
        |grid AS (
        |  SELECT ty.t, va.v, coalesce(c.c, 0) AS c
        |  FROM vals va CROSS JOIN types ty
        |  LEFT JOIN cnt c ON c.t = ty.t AND c.v = va.v),
        |cum AS (
        |  SELECT t, v, sum(c) OVER (PARTITION BY t ORDER BY v) AS cum_t
        |  FROM grid),
        |cum2 AS (
        |  SELECT t, v, cum_t, sum(cum_t) OVER (PARTITION BY v) AS cum_all,
        |         lead(v) OVER (PARTITION BY t ORDER BY v) AS vn
        |  FROM cum),
        |tot AS (SELECT t, n_t, sum(n_t) OVER () AS n FROM types)
        |SELECT c2.t AS event_type,
        |       CAST(tt.n_t AS BIGINT) AS n_t,
        |       CAST(tt.n - tt.n_t AS BIGINT) AS n_rest,
        |       round(CAST(sum(CAST((c2.vn - c2.v)
        |                 * abs(c2.cum_t * (tt.n - tt.n_t)
        |                       - (c2.cum_all - c2.cum_t) * tt.n_t)
        |                 AS DECIMAL(38, 12))) AS DOUBLE)
        |             / CAST(tt.n_t * (tt.n - tt.n_t) AS DOUBLE), 6) AS w1
        |FROM cum2 c2 JOIN tot tt USING (t)
        |WHERE c2.vn IS NOT NULL
        |GROUP BY c2.t, tt.n_t, tt.n
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val types = events(spark, dir)
        .groupBy(col("event_type").as("t")).agg(count(lit(1)).as("n_t"))
      val tot = types.crossJoin(broadcast(types.agg(sum("n_t").as("n"))))
      // the cross-products run in DECIMAL(19,0)→DECIMAL(38,0), never Long:
      // cum_t·n_rest reaches n² (~1e20 at trillion-row corpora), where a
      // Long product would wrap silently while the DuckDB side (HUGEINT
      // window sums) stays exact — decimal keeps both engines exact to
      // 38 digits, and decimal→double conversion is correctly rounded on
      // both, so the trapezoid multiply sees the identical IEEE value
      val gapInt = abs(dec(col("cum_t")) * dec(col("n") - col("n_t"))
        - dec(col("cum_all") - col("cum_t")) * dec(col("n_t")))
      // round 16: the (t, v, cum_t, cum_all, vn) CDF grid is the session
      // artifact GroupH.cdfGrid shared with q_ks_drift — identical
      // windows, identical values, built once
      GroupH.cdfGrid(spark, dir)
        .join(broadcast(tot), Seq("t"))
        .filter(col("vn").isNotNull)
        .groupBy("t", "n_t", "n")
        .agg(sum(((col("vn") - col("v")) * gapInt.cast(DoubleType))
          .cast(DecimalType(38, 12))).as("s"))
        .select(col("t").as("event_type"), big(col("n_t")).as("n_t"),
          big(col("n") - col("n_t")).as("n_rest"),
          round(col("s").cast(DoubleType)
            / (dec(col("n_t")) * dec(col("n") - col("n_t")))
              .cast(DoubleType), 6)
            .as("w1"))
        .orderBy("event_type")
    }
  )
}
