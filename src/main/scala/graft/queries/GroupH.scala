package graft.queries

import graft.queries.Q._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Group H — round-5 fourth wave: distribution-shift diagnostics and
  * storage-layout planning.
  *
  * `q_ks_drift` is the exact two-sample Kolmogorov–Smirnov statistic of
  * each event type's value distribution against the rest of the stream —
  * the classic "did this slice drift?" monitor, kept hash-exact by
  * working in cross-multiplied integer counts until one final divide.
  *
  * `q_zorder_layout` is the data-layout planner's core computation:
  * interleave the bits of two filter dimensions into a Z-value, assign
  * rows to fixed Z-range buckets (how Delta/Iceberg-style OPTIMIZE ZORDER
  * assigns files), and report each bucket's per-dimension min/max — the
  * exact metadata a scan would prune on. Pure map + one hash aggregation:
  * no sort, no shuffle beyond the final bounded agg.
  */
object GroupH {

  /** The per-(type, value) CDF grid both drift monitors read: every
    * distinct value crossed with the bounded type set, per-type cumulative
    * count, pooled cumulative (Σ_t cum_t via the per-value ≤|types|-row
    * window), and the next distinct value (for W₁'s trapezoid width).
    * Round 16: materialized ONCE per session (SessionCache) — q_ks_drift
    * and q_wasserstein_drift derived this identical table independently,
    * and a drift monitor computes its distribution index once per slice,
    * then evaluates whatever statistics it publishes over it. The count
    * join is a SHUFFLE join (the form q_wasserstein_drift always used):
    * per-(type,value) counts grow with the corpus, so the previous
    * broadcast(cnt) on the KS side was a growing broadcast — removed. */
  private[queries] def cdfGrid(spark: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame =
    graft.util.SessionCache.getOrMaterialize(spark, s"cdfgrid:$dir") {
      val ev = Q.events(spark, dir)
        .select(col("event_type").as("t"), col("value").as("v"))
      val cnt = ev.groupBy("t", "v").agg(count(lit(1)).as("c"))
      val vals = ev.select("v").distinct()
      val types = ev.groupBy("t").agg(count(lit(1)).as("n_t"))
      val byT = Window.partitionBy("t").orderBy("v")
      val byV = Window.partitionBy("v")
      vals.crossJoin(broadcast(types.select("t")))
        .join(cnt, Seq("t", "v"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("cum_t", sum("c").over(byT))
        .withColumn("cum_all", sum("cum_t").over(byV))
        .withColumn("vn", lead(col("v"), 1).over(byT))
        .select("t", "v", "cum_t", "cum_all", "vn")
    }

  /** Interleave the low 16 bits of `c` to even bit positions (the
    * standard mask-and-shift spread; all values < 2³², so ANSI-safe). */
  private def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  val all: Seq[Q] = Seq(

    // Exact two-sample Kolmogorov–Smirnov drift: for every event type t,
    // D = max over the pooled value axis of |F_t(v) − F_rest(v)|. The
    // supremum only moves at sample points, so evaluating every pooled
    // distinct value is exact. Shape: per-(type,value) counts, a distinct
    // value axis crossed with the BOUNDED type set (grid is O(distinct
    // values × types), i.e. O(n) for a bounded group vocabulary), one
    // ranged window per type for the type CDF, and a tiny per-value
    // window (≤ |types| rows) that derives the pooled CDF as Σ_t cum_t —
    // avoiding the single-partition global window a pooled cumsum would
    // need. Determinism: D is carried as the integer cross-product
    // |cum_t·n_rest − cum_rest·n_t| (no double CDFs), and the KS value is
    // ONE exactly-rounded divide of that integer. At corpus scale the
    // per-type window is the long pole — there you'd pre-bin values
    // (compose q_quantile_bin) and pay a bounded exactness loss; the
    // exact form here is the oracle contract.
    Q("q_ks_drift",
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
        |  SELECT t, v, cum_t,
        |         sum(cum_t) OVER (PARTITION BY v) AS cum_all
        |  FROM cum),
        |tot AS (SELECT t, n_t, sum(n_t) OVER () AS n FROM types),
        |d AS (
        |  SELECT c2.t, tt.n_t, tt.n,
        |         max(abs(c2.cum_t * (tt.n - tt.n_t)
        |                 - (c2.cum_all - c2.cum_t) * tt.n_t)) AS dmax
        |  FROM cum2 c2 JOIN tot tt USING (t)
        |  GROUP BY c2.t, tt.n_t, tt.n)
        |SELECT t AS event_type,
        |       CAST(n_t AS BIGINT) AS n_t,
        |       CAST(n - n_t AS BIGINT) AS n_rest,
        |       CAST(dmax AS BIGINT) AS d_num,
        |       CAST(dmax AS DOUBLE) / CAST(n_t * (n - n_t) AS DOUBLE) AS ks
        |FROM d
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val types = events(spark, dir)
        .groupBy(col("event_type").as("t")).agg(count(lit(1)).as("n_t"))
      // N as the ONE-ROW scalar cross join (the q_bm25 shape) — not a
      // partition-less window, which the plan guard rightly rejects
      val tot = types.crossJoin(broadcast(types.agg(sum("n_t").as("n"))))
      // cross-products in DECIMAL(19,0)→DECIMAL(38,0), never Long: cum_t
      // times n_rest reaches n² and a Long product wraps silently at
      // trillion-row corpora while the DuckDB side (HUGEINT window sums)
      // stays exact — the same treatment q_wasserstein_drift applies
      val dTerm = abs(dec(col("cum_t")) * dec(col("n") - col("n_t"))
        - dec(col("cum_all") - col("cum_t")) * dec(col("n_t")))
      cdfGrid(spark, dir)
        .join(broadcast(tot), Seq("t"))
        .groupBy("t", "n_t", "n")
        .agg(max(dTerm).as("dmax"))
        .select(col("t").as("event_type"), big(col("n_t")).as("n_t"),
          big(col("n") - col("n_t")).as("n_rest"),
          big(col("dmax")).as("d_num"),
          (col("dmax").cast(DoubleType)
            / (dec(col("n_t")) * dec(col("n") - col("n_t")))
              .cast(DoubleType))
            .as("ks"))
        .orderBy("event_type")
    },

    // Z-order layout assignment: spread the bits of two filter dimensions
    // (user and day — the fixture's two realistic predicate columns) and
    // interleave them into a Z-value, then assign rows to fixed Z-range
    // buckets (z >> 10: 64 buckets over the 16-bit Z space) and emit the
    // per-bucket min/max of BOTH dimensions plus cardinalities — exactly
    // the file-level metadata a Z-ordered table's scan pruning consults.
    // The point of the shape: bucket assignment is a pure per-row map
    // (no global sort — fixed Z ranges, not ntile), so at 100 TB it's a
    // single pass ending in a bounded (≤ 64-row) aggregate, and the
    // output demonstrates the layout property itself: every bucket spans
    // a narrow rectangle in (user, day) space, so a predicate on EITHER
    // dimension prunes most buckets. Fixture dims are small enough to use
    // directly (user_id < 256, day cycles a 32-day window); a production
    // layout would first quantize each dimension to equi-depth ranks
    // (compose q_quantile_bin) — the interleave is unchanged.
    Q("q_zorder_layout",
      """WITH e AS (
        |  SELECT user_id,
        |         epoch_us(ts) // 86400000000 AS day,
        |         user_id % 256 AS a0,
        |         (epoch_us(ts) // 86400000000) % 32 AS b0
        |  FROM events),
        |sa AS (
        |  SELECT user_id, day, b0,
        |         (a0 | (a0 << 8)) & 16711935 AS a1 FROM e),
        |sb AS (
        |  SELECT user_id, day, a1,
        |         (b0 | (b0 << 8)) & 16711935 AS b1 FROM sa),
        |s2 AS (
        |  SELECT user_id, day,
        |         ((a1 | (a1 << 4)) & 252645135) AS a2,
        |         ((b1 | (b1 << 4)) & 252645135) AS b2 FROM sb),
        |s3 AS (
        |  SELECT user_id, day,
        |         ((a2 | (a2 << 2)) & 858993459) AS a3,
        |         ((b2 | (b2 << 2)) & 858993459) AS b3 FROM s2),
        |s4 AS (
        |  SELECT user_id, day,
        |         ((a3 | (a3 << 1)) & 1431655765) AS a4,
        |         ((b3 | (b3 << 1)) & 1431655765) AS b4 FROM s3),
        |z AS (SELECT user_id, day, (a4 | (b4 << 1)) >> 10 AS bucket FROM s4)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(user_id) AS BIGINT) AS min_user,
        |       CAST(max(user_id) AS BIGINT) AS max_user,
        |       CAST(min(day) AS BIGINT) AS min_day,
        |       CAST(max(day) AS BIGINT) AS max_day,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin) { (spark, dir) =>
      val day = expr("unix_micros(ts) div 86400000000")
      val z = spread16(col("user_id") % 256)
        .bitwiseOR(shiftleft(spread16(day % 32), 1))
      events(spark, dir)
        .select(col("user_id"), day.as("day"),
          shiftright(z, 10).as("bucket"))
        .groupBy(big(col("bucket")).as("bucket"))
        .agg(big(count(lit(1))).as("n"),
          big(min("user_id")).as("min_user"),
          big(max("user_id")).as("max_user"),
          big(min("day")).as("min_day"),
          big(max("day")).as("max_day"),
          big(countDistinct("user_id")).as("n_users"))
        .orderBy("bucket")
    },

    // 2-D Pareto skyline (maximize price, maximize recency): the orders
    // no other order beats on both axes — the classic multi-criteria
    // "best offers" operator. Shape: dominance collapses onto the
    // BOUNDED per-date maximum table (an order is on the skyline iff it
    // carries its date's max price AND that max strictly exceeds every
    // later date's max), so the fact table is touched by exactly one
    // map-side-combining agg and one broadcast semi-join back — the
    // strictly-later comparison runs date-max × date-max (calendar² at
    // any data scale), never row × row. Duplicate (date, price) maxima
    // are mutually non-dominating and all kept.
    Q("q_skyline",
      """WITH pd AS (
        |  SELECT o_orderdate AS d, max(o_totalprice) AS pmax
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT a.d, a.pmax, max(b.pmax) AS later_max
        |  FROM pd a LEFT JOIN pd b ON b.d > a.d
        |  GROUP BY a.d, a.pmax),
        |sky AS (
        |  SELECT d, pmax FROM m
        |  WHERE later_max IS NULL OR pmax > later_max)
        |SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o.o_totalprice AS o_totalprice
        |FROM orders o
        |JOIN sky s ON o.o_orderdate = s.d AND o.o_totalprice = s.pmax
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val pd = o.groupBy(col("o_orderdate").as("d"))
        .agg(max("o_totalprice").as("pmax"))
      val m = pd.as("a")
        .join(broadcast(pd.select(col("d").as("d2"), col("pmax").as("p2"))),
          col("d2") > col("d"), "left")
        .groupBy("d", "pmax")
        .agg(max("p2").as("later_max"))
      val sky = m.filter(col("later_max").isNull
        || col("pmax") > col("later_max"))
      o.join(broadcast(sky),
          o("o_orderdate") === sky("d") && o("o_totalprice") === sky("pmax"))
        .select(big(col("o_orderkey")).as("o_orderkey"),
          dstr(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // Systematic PPS (probability-proportional-to-size) sampling: draw a
    // ~32-doc sample per language where selection probability is
    // proportional to document length — the corpus-downsampling step
    // that preserves token mass where uniform row sampling skews toward
    // short docs. Deterministic systematic rule: walk the per-language
    // cumulative n_chars axis in doc_id order and take every doc whose
    // weight interval (cum−w, cum] contains a multiple of
    // step = ⌈total/32⌉ — integer-exact, coordination-free (any engine
    // replays the same picks), and one partitioned window + a bounded
    // per-language totals broadcast is the whole plan. Docs longer than
    // the step are picked with certainty (possibly covering several
    // strides), exactly the PPS contract.
    Q("q_sample_pps",
      """WITH w AS (
        |  SELECT lang, doc_id, n_chars,
        |         sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
        |  FROM documents),
        |t AS (SELECT lang, (sum(n_chars) + 31) // 32 AS step
        |      FROM documents GROUP BY lang)
        |SELECT w.lang AS lang, CAST(w.doc_id AS BIGINT) AS doc_id,
        |       CAST(w.n_chars AS BIGINT) AS n_chars,
        |       CAST(w.cum // t.step - (w.cum - w.n_chars) // t.step
        |            AS BIGINT) AS n_strides
        |FROM w JOIN t USING (lang)
        |WHERE w.cum // t.step > (w.cum - w.n_chars) // t.step
        |ORDER BY lang, doc_id""".stripMargin) { (spark, dir) =>
      val byLang = Window.partitionBy("lang").orderBy("doc_id")
      val t = tbl(spark, dir, "documents").groupBy("lang")
        .agg(expr("(sum(n_chars) + 31) div 32").as("step"))
      tbl(spark, dir, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum("n_chars").over(byLang))
        .join(broadcast(t), Seq("lang"))
        .filter(expr("cum div step > (cum - n_chars) div step"))
        .select(col("lang"), big(col("doc_id")).as("doc_id"),
          big(col("n_chars")).as("n_chars"),
          big(expr("cum div step - (cum - n_chars) div step"))
            .as("n_strides"))
        .orderBy("lang", "doc_id")
    },

    // Per-language Gini coefficient of document token mass — the
    // "is this slice dominated by a few huge documents?" concentration
    // diagnostic a dataset card reports next to its Zipf profile. Exact
    // rank formulation G = (2·Σᵢ i·wᵢ − (n+1)·Σw) / (n·Σw) over the
    // ascending-weight sort: every term is an exact BIGINT sum (tie
    // order cannot change Σ i·wᵢ — tied weights contribute identically
    // under any permutation), with ONE final divide in double. Shape:
    // one lang-partitioned sort + one map-side-combining agg; output is
    // bounded by the language set. BIGINT bound: Σ i·wᵢ < 2⁶³ holds to
    // ~10⁸ docs × 10⁵ chars per language; past that, swap the
    // accumulators to DECIMAL(38,0) (the q_crosstab escape) — the
    // contract is unchanged.
    Q("q_gini_mass",
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars, doc_id) AS rn
        |  FROM documents)
        |SELECT lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS mass,
        |       CAST(2 * sum(rn * n_chars) - (count(*) + 1) * sum(n_chars)
        |            AS DOUBLE)
        |         / CAST(count(*) * sum(n_chars) AS DOUBLE) AS gini
        |FROM r GROUP BY lang
        |ORDER BY lang""".stripMargin) { (spark, dir) =>
      val byLang = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      tbl(spark, dir, "documents")
        .select(col("lang"), col("n_chars"), col("doc_id"))
        .withColumn("rn", row_number().over(byLang))
        .groupBy("lang")
        .agg(big(count(lit(1))).as("n_docs"),
          big(sum("n_chars")).as("mass"),
          ((lit(2) * sum(col("rn") * col("n_chars"))
            - (count(lit(1)) + lit(1)) * sum("n_chars")).cast(DoubleType)
            / (count(lit(1)) * sum("n_chars")).cast(DoubleType)).as("gini"))
        .orderBy("lang")
    }
  )
}
