package graft.queries

import graft.cdc.Changelog
import graft.embed.Embedders
import graft.ops.{TextOps, VectorOps}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import Q.big

/** Group A — batch replay of the reference's CDC → embedding → vector-store
  * dataflow (SURVEY.md §2.3). Every query runs over the wire-envelope
  * roundtrip ([[Changelog.changes]]) so the JSON decode path S2-S4 is always
  * exercised; oracles run over the equivalent flat CTE.
  */
object GroupA {

  private val mappedTables = Seq("public.documents")

  /** Fully-qualified `schema.table`. */
  private def qualified: Column = concat(col("schema"), lit("."), col("table"))

  /** F1 table filter (reference: internal/pipeline/pipeline.go:117-120). */
  private def mapped(changes: DataFrame): DataFrame =
    changes.filter(qualified.isin(mappedTables: _*))

  /** Rows with a sink effect: deletes, or upserts with a non-null After
    * (null-After updates are skipped — reference: pipeline.go:198-201). */
  private def effective(changes: DataFrame): DataFrame =
    mapped(changes).filter(col("op") === "d" || col("after").isNotNull)

  private def lsnLong: Column = col("lsn").cast("long").as("lsn")

  val all: Seq[Q] = Seq(

    Q("q_cdc_parse",
      s"""${Changelog.cte}
         |SELECT op, table_name, pk, lsn, title, content
         |FROM changes ORDER BY lsn""".stripMargin) { (spark, dir) =>
      Changelog.changes(spark, dir).select(
        col("op"), col("table").as("table_name"), col("primary_key").as("pk"),
        lsnLong, element_at(col("after"), "title").as("title"),
        element_at(col("after"), "content").as("content"))
        .orderBy("lsn")
    },

    Q("q_table_filter",
      s"""${Changelog.cte}
         |SELECT op, table_name, pk, lsn FROM changes
         |WHERE schema_name || '.' || table_name IN ('public.documents')
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      mapped(Changelog.changes(spark, dir)).select(
        col("op"), col("table").as("table_name"), col("primary_key").as("pk"), lsnLong)
        .orderBy("lsn")
    },

    Q("q_op_route_upsert",
      s"""${Changelog.cte}
         |SELECT pk, lsn, title, content, author FROM changes
         |WHERE table_name = 'documents' AND op <> 'd' AND has_after
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      mapped(Changelog.changes(spark, dir))
        .filter(col("op") =!= "d" && col("after").isNotNull)
        .select(col("primary_key").as("pk"), lsnLong,
          element_at(col("after"), "title").as("title"),
          element_at(col("after"), "content").as("content"),
          element_at(col("after"), "author").as("author"))
        .orderBy("lsn")
    },

    Q("q_op_route_delete",
      s"""${Changelog.cte}
         |SELECT pk, lsn FROM changes
         |WHERE table_name = 'documents' AND op = 'd'
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      mapped(Changelog.changes(spark, dir))
        .filter(col("op") === "d")
        .select(col("primary_key").as("pk"), lsnLong)
        .orderBy("lsn")
    },

    Q("q_doc_id",
      s"""${Changelog.cte}
         |SELECT schema_name || '.' || table_name || ':' || pk AS doc_id, lsn
         |FROM changes
         |WHERE table_name = 'documents'
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      mapped(Changelog.changes(spark, dir))
        .select(TextOps.docId(col("schema"), col("table"), col("primary_key")).as("doc_id"),
          lsnLong)
        .orderBy("lsn")
    },

    Q("q_text_concat",
      s"""${Changelog.cte}
         |SELECT pk, lsn,
         |       coalesce(array_to_string(list_filter([title, content],
         |                x -> x IS NOT NULL AND x <> ''), ' '), '') AS text
         |FROM changes
         |WHERE table_name = 'documents' AND op <> 'd' AND has_after
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      mapped(Changelog.changes(spark, dir))
        .filter(col("op") =!= "d" && col("after").isNotNull)
        .select(col("primary_key").as("pk"), lsnLong,
          TextOps.textConcat(Seq(
            element_at(col("after"), "title"),
            element_at(col("after"), "content"))).as("text"))
        .orderBy("lsn")
    },

    Q("q_empty_text_skip",
      s"""${Changelog.cte}
         |SELECT pk, lsn, text FROM (
         |  SELECT pk, lsn,
         |         array_to_string(list_filter([title, content],
         |                                     x -> x IS NOT NULL AND x <> ''), ' ') AS text
         |  FROM changes
         |  WHERE table_name = 'documents' AND op <> 'd' AND has_after)
         |WHERE length(text) > 0
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      mapped(Changelog.changes(spark, dir))
        .filter(col("op") =!= "d" && col("after").isNotNull)
        .select(col("primary_key").as("pk"), lsnLong,
          TextOps.textConcat(Seq(
            element_at(col("after"), "title"),
            element_at(col("after"), "content"))).as("text"))
        .filter(length(col("text")) > 0)
        .orderBy("lsn")
    },

    Q("q_meta_project",
      s"""${Changelog.cte}
         |SELECT 'public.documents' AS meta_table, pk, lsn, created_at, author
         |FROM changes
         |WHERE table_name = 'documents' AND op <> 'd' AND has_after
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      val meta = TextOps.metaProject(col("schema"), col("table"), col("primary_key"),
        col("after"), Seq("created_at", "author"))
      mapped(Changelog.changes(spark, dir))
        .filter(col("op") =!= "d" && col("after").isNotNull)
        .withColumn("meta", meta)
        .select(element_at(col("meta"), "table").as("meta_table"),
          element_at(col("meta"), "pk").as("pk"), lsnLong,
          element_at(col("meta"), "created_at").as("created_at"),
          element_at(col("meta"), "author").as("author"))
        .orderBy("lsn")
    },

    Q("q_latest_by_pk",
      s"""${Changelog.cte}
         |SELECT pk, lsn, op, title, content FROM (
         |  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
         |  FROM changes
         |  WHERE table_name = 'documents' AND (op = 'd' OR has_after))
         |WHERE rn = 1 AND op <> 'd'
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("primary_key")).orderBy(col("lsn").cast("long").desc)
      effective(Changelog.changes(spark, dir))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "d")
        .select(col("primary_key").as("pk"), lsnLong, col("op"),
          element_at(col("after"), "title").as("title"),
          element_at(col("after"), "content").as("content"))
        .orderBy("lsn")
    },

    Q("q_kafka_envelope",
      s"""${Changelog.cte}
         |SELECT schema_name || '.' || table_name || ':' || pk AS id,
         |       CASE WHEN op = 'd' THEN 'delete' ELSE 'upsert' END AS sink_op,
         |       schema_name || '.' || table_name AS table_ref, pk, lsn
         |FROM changes
         |WHERE table_name = 'documents' AND (op = 'd' OR has_after)
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      effective(Changelog.changes(spark, dir))
        .select(
          TextOps.docId(col("schema"), col("table"), col("primary_key")).as("id"),
          when(col("op") === "d", lit("delete")).otherwise(lit("upsert")).as("sink_op"),
          qualified.as("table_ref"), col("primary_key").as("pk"), lsnLong)
        .orderBy("lsn")
    },

    Q("q_l2_normalize",
      """SELECT vec_id,
        |       round(CASE WHEN n = 0 THEN x1 ELSE x1/n END, 6) AS c1,
        |       round(CASE WHEN n = 0 THEN x2 ELSE x2/n END, 6) AS c2,
        |       round(CASE WHEN n = 0 THEN x3 ELSE x3/n END, 6) AS c3,
        |       round(CASE WHEN n = 0 THEN x4 ELSE x4/n END, 6) AS c4
        |FROM (
        |  SELECT vec_id,
        |         CAST(embedding[1] AS DOUBLE) AS x1, CAST(embedding[2] AS DOUBLE) AS x2,
        |         CAST(embedding[3] AS DOUBLE) AS x3, CAST(embedding[4] AS DOUBLE) AS x4,
        |         sqrt(CAST(list_sum(list_transform(embedding,
        |              x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(30,15))))
        |              AS DOUBLE)) AS n
        |  FROM embeddings)
        |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      val v = col("embedding")
      val n = VectorOps.l2normExact(v)
      def comp(i: Int): Column = {
        val x = element_at(v, i).cast(DoubleType)
        round(when(n === 0, x).otherwise(x / n), 6).as(s"c$i")
      }
      Q.tbl(spark, dir, "embeddings")
        .select(col("vec_id"), comp(1), comp(2), comp(3), comp(4))
        .orderBy("vec_id")
    },

    // FNV-1a 64 point-id hashing (K1). The oracle folds the hash per
    // character with a recursive CTE in HUGEINT arithmetic (wrapping mult
    // emulated by % 2^64, result mapped back to the signed 64-bit value the
    // Catalyst expression produces). Ids are ASCII by construction.
    Q("q_point_id_hash",
      s"""${Changelog.cte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |ids AS (
         |  SELECT schema_name || '.' || table_name || ':' || pk AS id, lsn
         |  FROM changes WHERE table_name = 'documents' AND (op = 'd' OR has_after)
         |),
         |fnv AS (
         |  SELECT id, lsn, 1 AS pos,
         |         CAST(14695981039346656037 AS HUGEINT) AS h FROM ids
         |  UNION ALL
         |  SELECT id, lsn, pos+1,
         |         (xor(h, CAST(ascii(substr(id, pos, 1)) AS HUGEINT))
         |          * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)
         |  FROM fnv WHERE pos <= length(id)
         |)
         |SELECT id, lsn,
         |       CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
         |                 THEN h - CAST(18446744073709551616 AS HUGEINT)
         |                 ELSE h END AS BIGINT) AS point_id
         |FROM fnv WHERE pos = length(id) + 1
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      effective(Changelog.changes(spark, dir))
        .select(
          TextOps.docId(col("schema"), col("table"), col("primary_key")).as("id"),
          lsnLong)
        .withColumn("point_id", VectorOps.fnv1a64(col("id")))
        .orderBy("lsn")
    },

    // Deterministic test featurizer (E1 stand-in), ORACLE-CHECKED end to
    // end: each embedding component is the exact rational bucket/2^19 - 1
    // with bucket = fnv1a64("#i#" + text) >> 44, so the oracle recomputes
    // every component from scratch — the FNV fold runs per character in
    // HUGEINT arithmetic, the bucket extraction is one integer division,
    // and the declared outputs (an exact-decimal L2 norm and an fnv1a64
    // digest of the comma-joined buckets) pin all 16 components of every
    // row. The embedding itself stays a UDF (it models an external model
    // server); only its verifiable projection reaches the driver.
    Q("q_embed_det",
      s"""${Changelog.cte},
         |txt AS (
         |  SELECT pk, lsn,
         |         coalesce(array_to_string(list_filter([title, content],
         |                  x -> x IS NOT NULL AND x <> ''), ' '), '') AS text
         |  FROM changes
         |  WHERE table_name = 'documents' AND op <> 'd' AND has_after),
         |b AS (
         |  SELECT pk, lsn,
         |    list_transform(range(0, 16), i ->
         |      CAST(list_reduce(
         |        list_prepend(CAST(14695981039346656037 AS HUGEINT),
         |          list_transform(
         |            list_filter(string_split('#' || CAST(i AS VARCHAR) || '#' || text,
         |                                     ''), c -> c <> ''),
         |            c -> CAST(ascii(c) AS HUGEINT))),
         |        (acc, x) -> (xor(acc, x) * 1099511628211)
         |                    % CAST(18446744073709551616 AS HUGEINT))
         |        // 17592186044416 AS BIGINT)) AS buckets
         |  FROM txt WHERE length(text) > 0),
         |d AS (
         |  SELECT pk, lsn, buckets,
         |    list_reduce(
         |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
         |        list_transform(
         |          list_filter(string_split(array_to_string(buckets, ','), ''),
         |                      c -> c <> ''),
         |          c -> CAST(ascii(c) AS HUGEINT))),
         |      (acc, x) -> (xor(acc, x) * 1099511628211)
         |                  % CAST(18446744073709551616 AS HUGEINT)) AS dg
         |  FROM b)
         |SELECT pk, lsn, CAST(16 AS BIGINT) AS dim,
         |       round(sqrt(CAST(list_sum(list_transform(buckets, bk ->
         |         CAST((CAST(bk AS DOUBLE)/524288.0 - 1.0)
         |              * (CAST(bk AS DOUBLE)/524288.0 - 1.0) AS DECIMAL(30,15))))
         |         AS DOUBLE)), 6) AS l2_norm,
         |       CAST(CASE WHEN dg >= CAST(9223372036854775808 AS HUGEINT)
         |                 THEN dg - CAST(18446744073709551616 AS HUGEINT)
         |                 ELSE dg END AS BIGINT) AS embed_digest
         |FROM d
         |ORDER BY lsn""".stripMargin) { (spark, dir) =>
      val embed = Embedders.embedColumn(Embedders.deterministic)
      mapped(Changelog.changes(spark, dir))
        .filter(col("op") =!= "d" && col("after").isNotNull)
        .select(col("primary_key").as("pk"), lsnLong,
          TextOps.textConcat(Seq(
            element_at(col("after"), "title"),
            element_at(col("after"), "content"))).as("text"))
        .filter(length(col("text")) > 0)
        .withColumn("embedding", embed(col("text")))
        // exact integer recovery: components are bucket/2^19 - 1 with the
        // bucket integral, so (x+1)*2^19 is an exact integral double
        .withColumn("buckets",
          transform(col("embedding"),
            x => ((x.cast(DoubleType) + 1.0d) * 524288.0d).cast("long")))
        .select(col("pk"), col("lsn"),
          big(size(col("embedding"))).as("dim"),
          round(VectorOps.l2normExact(col("embedding")), 6).as("l2_norm"),
          VectorOps.fnv1a64(
            array_join(transform(col("buckets"), _.cast("string")), ","))
            .as("embed_digest"))
        .orderBy("lsn")
    },

    // Index staleness audit: the vector index was built from the initial
    // snapshot load (the branch-1 inserts); the WAL has moved on. Per
    // status — fresh (index row at the pk's latest EFFECTIVE lsn), stale
    // (a later upsert the index hasn't applied), ghost (deleted upstream,
    // still indexed), missing / gone — how far has the index drifted?
    // This is the freshness SLO a cdc2vec operator alarms on, computed
    // from the changelog alone. Effective changes only (deletes or
    // non-null After): a skipped null-After update must NOT count as
    // staleness debt the index can never repay. Shapes: per-pk latest via
    // the standard pk-compaction window, ONE left join of two pk-keyed
    // sides, bounded status rollup.
    Q("q_index_staleness",
      s"""${Changelog.cte},
         |ch AS (
         |  SELECT pk, lsn, op FROM changes
         |  WHERE schema_name = 'public' AND table_name = 'documents'
         |    AND pk <> '' AND (op = 'd' OR has_after)),
         |cur AS (
         |  SELECT pk, lsn, op FROM (
         |    SELECT pk, lsn, op,
         |           row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
         |    FROM ch) WHERE rn = 1),
         |idx AS (SELECT pk, min(lsn) AS lsn FROM ch
         |        WHERE lsn % 10 = 1 GROUP BY pk)
         |SELECT status, CAST(count(*) AS BIGINT) AS n FROM (
         |  SELECT CASE
         |           WHEN cur.op <> 'd' AND idx.lsn IS NOT NULL
         |                AND cur.lsn = idx.lsn THEN 'fresh'
         |           WHEN cur.op <> 'd' AND idx.lsn IS NOT NULL THEN 'stale'
         |           WHEN cur.op <> 'd' THEN 'missing'
         |           WHEN idx.lsn IS NOT NULL THEN 'ghost'
         |           ELSE 'gone' END AS status
         |  FROM cur LEFT JOIN idx ON cur.pk = idx.pk)
         |GROUP BY status
         |ORDER BY status""".stripMargin) { (spark, dir) =>
      val ch = mapped(Changelog.changes(spark, dir))
        .filter(col("primary_key") =!= "" &&
          (col("op") === "d" || col("after").isNotNull))
        .select(col("primary_key").as("pk"), col("lsn").cast("long").as("lsn"),
          col("op"))
        .localCheckpoint(true) // latest-state and index-snapshot legs share it
      val byPk = Window.partitionBy("pk").orderBy(col("lsn").desc)
      val cur = ch.withColumn("rn", row_number().over(byPk))
        .filter(col("rn") === 1).select("pk", "lsn", "op")
      // index = FIRST snapshot-marked change per pk (deduped: a pk with
      // several marked changes must not fan out the left join below —
      // the streaming twin folds the same min, StalenessMonitor.step)
      val idx = ch.filter(col("lsn") % 10 === 1)
        .groupBy("pk").agg(min(col("lsn")).as("idx_lsn"))
      cur.join(idx, Seq("pk"), "left")
        .select(when(col("op") =!= "d" && col("idx_lsn").isNotNull &&
            col("lsn") === col("idx_lsn"), "fresh")
          .when(col("op") =!= "d" && col("idx_lsn").isNotNull, "stale")
          .when(col("op") =!= "d", "missing")
          .when(col("idx_lsn").isNotNull, "ghost")
          .otherwise("gone").as("status"))
        .groupBy("status").agg(big(count(lit(1))).as("n"))
        .orderBy("status")
    }
  )
}
