package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Group S — round-5 eleventh wave: forecast backtesting and revenue
  * concentration — the evaluation loop around the time-series
  * diagnostics (q_autocorr/q_burst_detect/q_rolling_median) and the
  * whale-curve complement to the RFM/LTV customer analytics.
  */
object GroupS {

  val all: Seq[Q] = Seq(

    // Naive seasonal forecast backtest: predict each day's per-type total
    // as the SAME WEEKDAY LAST WEEK (the t−7 naive every real forecaster
    // must beat — q_dow_profile showed the weekday effect; this measures
    // how much of the variance it explains). Per event type: evaluable
    // days, MAE, and WAPE in ppm (Σ|err| / Σ|actual| — the
    // scale-independent form that doesn't blow up on near-zero days).
    // Daily totals are exact DECIMAL sums cast to double; |err| is one
    // IEEE subtract+abs; both sums re-enter DECIMAL accumulators, so the
    // only engine-shared float ops are replayed bit-for-bit. Shape: ONE
    // fact scan → (type, day) agg, one equi-join on (type, day−7).
    Q("q_forecast_eval",
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.day, a.v, f.v AS fc, abs(a.v - f.v) AS ae
        |  FROM d a JOIN d f
        |    ON a.event_type = f.event_type AND f.day = a.day - 7)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       round(CAST(sum(CAST(ae AS DECIMAL(25,6))) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS mae,
        |       CAST(floor(1000000.0 * CAST(sum(CAST(ae AS DECIMAL(25,6))) AS DOUBLE)
        |                  / CAST(sum(CAST(abs(v) AS DECIMAL(25,6))) AS DOUBLE))
        |            AS BIGINT) AS wape_ppm
        |FROM j GROUP BY 1
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val d = events(spark, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(Q.dsum(col("value")).as("v"))
        .localCheckpoint(true) // actuals and the t−7 forecast leg share it
      d.join(d.select(col("event_type"), (col("day") + 7).as("day"),
          col("v").as("fc")), Seq("event_type", "day"))
        .withColumn("ae", abs(col("v") - col("fc")))
        .groupBy("event_type")
        .agg(big(count(lit(1))).as("n_days"),
          round(sum(col("ae").cast(DecimalType(25, 6))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType), 6).as("mae"),
          floor(lit(1000000.0) *
            sum(col("ae").cast(DecimalType(25, 6))).cast(DoubleType) /
            sum(abs(col("v")).cast(DecimalType(25, 6))).cast(DoubleType))
            .cast("long").as("wape_ppm"))
        .orderBy("event_type")
    },

    // Revenue concentration (whale curve) per market segment: customers
    // ranked by exact revenue within their segment, split into deciles by
    // rank, each decile reporting customer count, revenue (integer
    // micros), and its ppm share of segment revenue — "the top 10% of
    // BUILDING customers carry how much?". The rank window partitions by
    // SEGMENT (the q_winsorize shape: one per-group sort, never a global
    // one); revenue is integer micros end-to-end, so shares are exact
    // integer division.
    Q("q_revenue_deciles",
      """WITH cr AS (
        |  SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
        |         CAST(sum(CAST(o.o_totalprice AS DECIMAL(25,6))) * 1000000
        |              AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT seg, rev,
        |         row_number() OVER (PARTITION BY seg
        |                            ORDER BY rev DESC, ck) AS rn,
        |         count(*) OVER (PARTITION BY seg) AS n,
        |         sum(rev) OVER (PARTITION BY seg) AS segrev
        |  FROM cr)
        |SELECT seg, CAST(least(9, (rn - 1) * 10 // n) AS BIGINT) AS decile,
        |       CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sum(rev) AS BIGINT) AS rev_micros,
        |       CAST(floor(1000000.0 * CAST(sum(rev) AS DOUBLE)
        |                  / CAST(max(segrev) AS DOUBLE)) AS BIGINT) AS share_ppm
        |FROM r GROUP BY 1, 2
        |ORDER BY seg, decile""".stripMargin) { (spark, dir) =>
      val cr = tbl(spark, dir, "orders")
        .join(tbl(spark, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg")),
          Seq("o_custkey"))
        .groupBy(col("seg"), col("o_custkey").as("ck"))
        .agg((sum(col("o_totalprice").cast(DecimalType(25, 6))) * 1000000)
          .cast("long").as("rev"))
      val byRev = Window.partitionBy("seg").orderBy(col("rev").desc, col("ck"))
      val bySeg = Window.partitionBy("seg")
      cr.withColumn("rn", row_number().over(byRev))
        .withColumn("n", count(lit(1)).over(bySeg))
        .withColumn("segrev", sum(col("rev")).over(bySeg))
        .groupBy(col("seg"),
          big(least(lit(9), expr("(rn - 1) * 10 div n"))).as("decile"))
        .agg(big(count(lit(1))).as("n_cust"), big(sum(col("rev"))).as("rev_micros"),
          // ppm share via one IEEE divide+floor of exact longs (identical
          // int→double conversion both engines) — the integer form
          // 10⁶·Σrev overflows int64 on micros-scale revenue
          big(floor(lit(1000000.0) * sum(col("rev")).cast(DoubleType) /
            max(col("segrev")).cast(DoubleType))).as("share_ppm"))
        .orderBy("seg", "decile")
    }
  )

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    Q.tbl(spark, dir, name)
  private def events(spark: SparkSession, dir: String): DataFrame =
    Q.events(spark, dir)
  private def big(c: Column): Column = Q.big(c)
}
