package graft.queries

import graft.cdc.Changelog
import graft.queries.Q._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Group C — temporal CDC surface and relational extensions (round 4).
  *
  * The reference replays a change log into the *current* state only
  * (internal/pipeline/pipeline.go:183-249 keeps nothing but the latest
  * tuple per key). A warehouse consumer of the same log also needs the
  * history-shaped views: SCD Type-2 validity intervals, point-in-time
  * snapshots, column-level diffs, and idempotent batch merge. All four are
  * single-shuffle plans (one hash partition by pk, one sort per partition)
  * so they scale like the latest-by-pk compaction they generalize.
  */
object GroupC {

  /** Rows with a sink effect on the mapped table — same filter as the
    * reference's pipeline (deletes, or upserts with a non-null After;
    * internal/pipeline/pipeline.go:117-120,198-201). */
  private def effective(changes: DataFrame): DataFrame =
    changes.filter(
      concat(col("schema"), lit("."), col("table")) === "public.documents" &&
        (col("op") === "d" || col("after").isNotNull))

  private def lsnL: Column = col("lsn").cast(LongType)

  /** DuckDB twin of [[effective]], as a CTE appended to Changelog.cte. */
  private val effCte: String =
    """eff AS (
      |  SELECT * FROM changes
      |  WHERE schema_name || '.' || table_name = 'public.documents'
      |    AND (op = 'd' OR has_after))""".stripMargin

  /** Replay cut point for the incremental queries: half the max LSN. A
    * 1-row aggregate broadcast into the plan — the Spark side is a
    * BroadcastNestedLoopJoin of one row, the scalar-subquery shape. */
  private def cutLsn(eff: DataFrame): DataFrame =
    eff.agg((max(lsnL) / lit(2)).cast(LongType).as("at_lsn"))

  private val cutCte: String =
    "cut AS (SELECT CAST(max(lsn) // 2 AS BIGINT) AS at_lsn FROM eff)"

  val all: Seq[Q] = Seq(

    // SCD Type-2: every upsert in the log becomes a version row with a
    // [valid_from, valid_to) LSN interval; the next change on the same pk
    // (update OR delete) closes the interval. ONE window over ONE shuffle
    // by pk — the history table is the same plan shape as latest-by-pk,
    // so at 100 TB it scales with the log, not with versions².
    Q("q_scd2",
      s"""${Changelog.cte},
         |$effCte
         |SELECT pk, valid_from, valid_to, is_current, title, content FROM (
         |  SELECT pk, op, lsn AS valid_from,
         |         lead(lsn) OVER (PARTITION BY pk ORDER BY lsn) AS valid_to,
         |         CAST(CASE WHEN lead(lsn) OVER (PARTITION BY pk ORDER BY lsn)
         |                   IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
         |         title, content
         |  FROM eff) v
         |WHERE op <> 'd'
         |ORDER BY valid_from""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("pk")).orderBy(col("valid_from"))
      effective(Changelog.changes(spark, dir))
        .select(col("primary_key").as("pk"), col("op"), lsnL.as("valid_from"),
          element_at(col("after"), "title").as("title"),
          element_at(col("after"), "content").as("content"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .filter(col("op") =!= "d")
        .select(col("pk"), col("valid_from"), col("valid_to"),
          big(when(col("valid_to").isNull, 1).otherwise(0)).as("is_current"),
          col("title"), col("content"))
        .orderBy("valid_from")
    },

    // Point-in-time snapshot: the table state as of LSN T (here T = half
    // the max LSN, computed from the log itself so the query is
    // scale-free). Same single-shuffle top-1-per-pk plan as
    // q_latest_by_pk; the cut is a broadcast scalar, and at scale it
    // would also prune log segments above T before the shuffle.
    Q("q_snapshot_at",
      s"""${Changelog.cte},
         |$effCte,
         |$cutCte
         |SELECT pk, lsn, title, content FROM (
         |  SELECT e.pk, e.lsn, e.op, e.title, e.content,
         |         row_number() OVER (PARTITION BY e.pk ORDER BY e.lsn DESC) AS rn
         |  FROM eff e, cut WHERE e.lsn <= cut.at_lsn) v
         |WHERE rn = 1 AND op <> 'd'
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      val eff = effective(Changelog.changes(spark, dir))
      val w = Window.partitionBy(col("primary_key")).orderBy(lsnL.desc)
      eff.crossJoin(broadcast(cutLsn(eff)))
        .filter(lsnL <= col("at_lsn"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "d")
        .select(col("primary_key").as("pk"), lsnL.as("lsn"),
          element_at(col("after"), "title").as("title"),
          element_at(col("after"), "content").as("content"))
        .orderBy("lsn")
    },

    // Column-level diff: for each non-initial version, which mapped
    // columns changed vs the previous version of the same pk. The log
    // carries Before only for deletes (REPLICA IDENTITY DEFAULT), so the
    // previous image comes from the window lag — one shuffle by pk, no
    // self-join. Null-safe comparison (IS DISTINCT FROM) matches the
    // oracle's; concat_ws drops the null (unchanged) slots on both engines.
    Q("q_column_diff",
      s"""${Changelog.cte},
         |$effCte
         |SELECT pk, lsn,
         |       coalesce(concat_ws(',',
         |         CASE WHEN title      IS DISTINCT FROM p_title   THEN 'title' END,
         |         CASE WHEN content    IS DISTINCT FROM p_content THEN 'content' END,
         |         CASE WHEN created_at IS DISTINCT FROM p_created THEN 'created_at' END,
         |         CASE WHEN author     IS DISTINCT FROM p_author  THEN 'author' END),
         |         '') AS changed
         |FROM (
         |  SELECT pk, lsn, title, content, created_at, author,
         |         lag(lsn)        OVER w AS p_lsn,
         |         lag(title)      OVER w AS p_title,
         |         lag(content)    OVER w AS p_content,
         |         lag(created_at) OVER w AS p_created,
         |         lag(author)     OVER w AS p_author
         |  FROM eff WHERE op <> 'd'
         |  WINDOW w AS (PARTITION BY pk ORDER BY lsn)) v
         |WHERE p_lsn IS NOT NULL
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("pk")).orderBy(col("lsn"))
      val cols = Seq("title", "content", "created_at", "author")
      val base = effective(Changelog.changes(spark, dir))
        .filter(col("op") =!= "d")
        .select(Seq(col("primary_key").as("pk"), lsnL.as("lsn")) ++
          cols.map(c => element_at(col("after"), c).as(c)): _*)
      val lagged = cols.foldLeft(base.withColumn("p_lsn", lag(col("lsn"), 1).over(w))) {
        (df, c) => df.withColumn(s"p_$c", lag(col(c), 1).over(w))
      }
      lagged.filter(col("p_lsn").isNotNull)
        .select(col("pk"), col("lsn"),
          concat_ws(",",
            cols.map(c => when(!(col(c) <=> col(s"p_$c")), lit(c))): _*).as("changed"))
        .orderBy("lsn")
    },

    // Idempotent batch merge (the foreachBatch sink contract): apply the
    // tail of the log (lsn > T) onto a base snapshot as one MERGE —
    // latest-change-per-pk wins, deletes drop the row, untouched rows pass
    // through. Plan: the batch side compacts with one pk-shuffle, then a
    // full outer hash join on pk against the snapshot. Re-running the
    // same batch is a no-op (upsert semantics), which is what makes the
    // streaming sink at-least-once-safe.
    Q("q_merge_upsert",
      s"""${Changelog.cte},
         |$effCte,
         |$cutCte,
         |latest AS (
         |  SELECT pk, op, content FROM (
         |    SELECT e.pk, e.op, e.content,
         |           row_number() OVER (PARTITION BY e.pk ORDER BY e.lsn DESC) AS rn
         |    FROM eff e, cut WHERE e.lsn > cut.at_lsn) t
         |  WHERE rn = 1),
         |snap AS (SELECT CAST(doc_id AS VARCHAR) AS pk, text AS content
         |         FROM documents)
         |SELECT coalesce(l.pk, s.pk) AS pk,
         |       CASE WHEN l.pk IS NOT NULL THEN l.content ELSE s.content END
         |         AS content,
         |       CASE WHEN l.pk IS NULL THEN 'unchanged'
         |            WHEN s.pk IS NULL THEN 'inserted'
         |            ELSE 'updated' END AS action
         |FROM snap s FULL JOIN latest l ON s.pk = l.pk
         |WHERE l.op IS NULL OR l.op <> 'd'
         |ORDER BY CAST(coalesce(l.pk, s.pk) AS BIGINT)""".stripMargin) { (spark, dir) =>
      val eff = effective(Changelog.changes(spark, dir))
      val w = Window.partitionBy(col("primary_key")).orderBy(lsnL.desc)
      val latest = eff.crossJoin(broadcast(cutLsn(eff)))
        .filter(lsnL > col("at_lsn"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("primary_key").as("l_pk"), col("op"),
          element_at(col("after"), "content").as("l_content"))
      val snap = tbl(spark, dir, "documents")
        .select(col("doc_id").cast("string").as("s_pk"), col("text").as("s_content"))
      snap.join(latest, col("s_pk") === col("l_pk"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "d")
        .select(
          coalesce(col("l_pk"), col("s_pk")).as("pk"),
          when(col("l_pk").isNotNull, col("l_content")).otherwise(col("s_content"))
            .as("content"),
          when(col("l_pk").isNull, lit("unchanged"))
            .when(col("s_pk").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("action"))
        .orderBy(col("pk").cast(LongType))
    },

    // Multi-granularity aggregation via GROUPING SETS — one shuffle
    // produces the per-status, per-priority, and grand-total rollups
    // (Spark expands the sets before the exchange; partial aggregation
    // still applies map-side). Labels are coalesced so the three sets are
    // disjoint and the output order is total.
    Q("q_grouping_sets",
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(big(count(lit(1))).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // Wide-to-long unpivot (melt): per-line measures become (measure, val)
    // rows. Narrow projection + pushed filter reach the scan; the explode
    // is per-row with no shuffle — output ordering is the only exchange.
    Q("q_unpivot",
      """SELECT l_orderkey, l_linenumber, measure, val
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |      FROM lineitem WHERE l_orderkey % 97 = 0) t
        |UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure", "val")
    },

    // Event-time RANGE frame: per-user trailing-1-hour sum at every event.
    // The frame bound is on epoch microseconds (exact integers on both
    // engines); the DECIMAL accumulator keeps the windowed double sum
    // order-independent. One shuffle by user, one sort — RangeFrame
    // evaluation is the streaming-friendly O(n) two-pointer pass, not a
    // per-row rescan.
    Q("q_window_range",
      """SELECT event_id,
        |       round(CAST(sum(CAST(value AS DECIMAL(25,6))) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |         AS DOUBLE), 6) AS hour_sum
        |FROM events
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      events(spark, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .select(col("event_id"),
          round(sum(col("value").cast(DecimalType(25, 6))).over(w)
            .cast(DoubleType), 6).as("hour_sum"))
        .orderBy("event_id")
    },

    // Robust outlier detection: median absolute deviation per event type,
    // outlier = |v − median| > 3·MAD. Two grouped exact-percentile passes
    // with the tiny per-type stats broadcast back — the fact stream is
    // scanned twice but never shuffled by anything wider than the 5-value
    // type key. The double expression 3 * mad mirrors the oracle exactly
    // so the comparison is bit-identical.
    Q("q_outlier_mad",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |        FROM dev GROUP BY 1)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(d.med, 6) AS med, round(m.mad, 6) AS mad,
        |       CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type, d.med, m.mad
        |ORDER BY d.event_type""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir).select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(big(count(lit(1))).as("n"),
          big(sum(when(col("adev") > lit(3) * col("mad"), 1).otherwise(0)))
            .as("n_outliers"))
        .select(col("event_type"), col("n"), round(col("med"), 6).as("med"),
          round(col("mad"), 6).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    },

    // Cohort retention: users grouped by first-activity date, counted per
    // trailing week-offset of later activity. Two hash aggs + one
    // broadcast join of the (small) per-user cohort table; day arithmetic
    // is pure integers.
    Q("q_retention",
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_date,
        |       CAST((a.d - f.cohort) // 7 AS BIGINT) AS week_offset,
        |       CAST(count(*) AS BIGINT) AS active_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
      val f = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort"))
      val a = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      a.join(broadcast(f), "user_id")
        .groupBy(dstr(col("cohort")).as("cohort_date"),
          expr("CAST(datediff(d, cohort) DIV 7 AS BIGINT)").as("week_offset"))
        .agg(big(count(lit(1))).as("active_users"))
        .orderBy("cohort_date", "week_offset")
    },

    // Ordered conversion funnel: users whose first view precedes their
    // first click precedes their first purchase. One hash agg builds the
    // per-user stage-min timestamps (conditional min — no per-stage scan),
    // one 1-row agg counts survivors. Stage times compare as epoch
    // microseconds so both engines see the same precision.
    Q("q_funnel",
      """WITH m AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |           AS t_view,
        |         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |           AS t_click,
        |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |           AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(CASE WHEN t_view IS NOT NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS s_view,
        |       CAST(sum(CASE WHEN t_click > t_view
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS s_click,
        |       CAST(sum(CASE WHEN t_click > t_view AND t_purchase > t_click
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS s_purchase
        |FROM m ORDER BY n_users""".stripMargin) { (spark, dir) =>
      def stageMin(t: String) =
        min(when(col("event_type") === t, unix_micros(col("ts"))))
      events(spark, dir)
        .groupBy("user_id")
        .agg(stageMin("view").as("t_view"), stageMin("click").as("t_click"),
          stageMin("purchase").as("t_purchase"))
        .agg(big(count(lit(1))).as("n_users"),
          big(sum(when(col("t_view").isNotNull, 1).otherwise(0))).as("s_view"),
          big(sum(when(col("t_click") > col("t_view"), 1).otherwise(0)))
            .as("s_click"),
          big(sum(when(col("t_click") > col("t_view") &&
            col("t_purchase") > col("t_click"), 1).otherwise(0)))
            .as("s_purchase"))
    },

    // Dead-letter routing: envelopes whose JSON is corrupt (here: every
    // lsn % 53 = 0 envelope loses its tail bytes) must not kill the
    // ingest — the permissive parse yields a null record and the row
    // routes to the DLQ with its raw payload preserved. The Spark side
    // routes on ACTUAL parse failure; the oracle counts from the
    // corruption rule — they only agree if the parser really rejects
    // exactly the corrupted envelopes and accepts everything else.
    Q("q_dlq_route",
      s"""${Changelog.cte}
         |SELECT CASE WHEN lsn % 53 = 0 THEN 'dlq' ELSE 'main' END AS route,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM changes GROUP BY 1 ORDER BY route""".stripMargin) { (spark, dir) =>
      val corrupted = Changelog.envelopes(spark, dir)
        .withColumn("value",
          when(get_json_object(col("value"), "$.lsn").cast(LongType) % 53 === 0,
            // chop the closing brace and quote: guaranteed-malformed JSON
            expr("substring(value, 1, length(value) - 2)"))
            .otherwise(col("value")))
      corrupted
        .select(from_json(col("value"), graft.model.Types.rowChangeSchema).as("c"))
        // permissive parse marks failure as an all-null record, not a null
        // struct — route on the lsn field, which every valid envelope carries
        .select(when(col("c.lsn").isNull, lit("dlq")).otherwise(lit("main")).as("route"))
        .groupBy("route")
        .agg(big(count(lit(1))).as("n"))
        .orderBy("route")
    },

    // ColBERT-style late-interaction retrieval (MaxSim): query and
    // candidate "documents" are groups of token vectors; score(q,c) =
    // Σ_{qt∈q} max_{ct∈c} cos(qt,ct). Per-vector exact norms are computed
    // ONCE; candidate token lists are grouped per doc so each (query
    // token × candidate doc) row evaluates the max over an in-row array —
    // no per-token-pair row explosion. The 20-row query-token side
    // broadcasts; candidates stream (the brute-force baseline;
    // q_maxsim_ann is the LSH-prefiltered scale path, and this exact form
    // is its recall reference). Per-token cosines run the quantized-integer
    // contract (Q.quantCosRaw — exact long dots, one deterministic double
    // divide); the per-query-doc sum goes through an exact DECIMAL
    // accumulator, so it is order-independent; max is order-free by nature.
    Q("q_maxsim",
      s"""WITH ${quantNormsCte()},
        |qt AS (SELECT vec_id // 4 AS qdoc, vec_id, q, n2
        |       FROM qn WHERE vec_id < 20),
        |cd AS (SELECT vec_id // 8 AS cdoc,
        |              list(struct_pack(v := q, n2 := n2)) AS toks
        |       FROM qn WHERE vec_id >= 40 GROUP BY 1),
        |pair AS (
        |  SELECT qt.qdoc, cd.cdoc,
        |         list_max(list_transform(cd.toks, t ->
        |           ${quantCosRawSql("qt.q", "qt.n2", "t.v", "t.n2")})) AS best
        |  FROM qt CROSS JOIN cd),
        |score AS (
        |  SELECT qdoc, cdoc,
        |         round(CAST(sum(CAST(best AS DECIMAL(38,15))) AS DOUBLE), 6) AS maxsim
        |  FROM pair GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qdoc, cdoc, maxsim,
        |         row_number() OVER (PARTITION BY qdoc
        |                            ORDER BY maxsim DESC, cdoc) AS rn
        |  FROM score)
        |SELECT qdoc, cdoc, maxsim, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 3
        |ORDER BY qdoc, rn""".stripMargin) { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), quantN2(col("embedding")).as("n2"))
      val qt = e.filter(col("vec_id") < 20)
        .select(expr("vec_id DIV 4").as("qdoc"), col("embedding").as("qv"),
          col("n2").as("qn2"))
      val cd = e.filter(col("vec_id") >= 40)
        .groupBy(expr("vec_id DIV 8").as("cdoc"))
        .agg(collect_list(struct(col("embedding").as("v"), col("n2").as("n2")))
          .as("toks"))
      val w = Window.partitionBy(col("qdoc"))
        .orderBy(col("maxsim").desc, col("cdoc"))
      broadcast(qt).crossJoin(cd)
        .withColumn("best", array_max(transform(col("toks"), t =>
          quantCosRaw(col("qv"), t.getField("v"), col("qn2"), t.getField("n2")))))
        .groupBy("qdoc", "cdoc")
        .agg(round(sum(col("best").cast(DecimalType(38, 15))).cast(DoubleType), 6)
          .as("maxsim"))
        .withColumn("rn", big(row_number().over(w)))
        .filter(col("rn") <= 3)
        .select("qdoc", "cdoc", "maxsim", "rn")
        .orderBy("qdoc", "rn")
    }
  )
}
