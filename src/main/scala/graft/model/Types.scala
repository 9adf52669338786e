package graft.model

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference's single core datatype `types.RowChange`
  * (reference: internal/types/types.go:3-12): an unbounded stream of
  * row-change records whose tuple payloads are untyped string-or-null maps
  * (pgoutput text mode, reference: internal/cdc/postgres/postgres.go:629-638).
  * Spark mapping per SURVEY.md §1.4: `MAP<STRING,STRING>` payloads preserve
  * the schema-on-read invariant; per-table mappings bind columns at query
  * time with `element_at`.
  */
object Types {

  /** Streaming/batch schema of one change record. */
  val rowChangeSchema: StructType = StructType(Seq(
    StructField("op", StringType),           // "c" insert | "u" update | "d" delete
    StructField("schema", StringType),       // pg namespace, e.g. "public"
    StructField("table", StringType),        // relation name
    StructField("primary_key", StringType),  // stringified id_column value
    StructField("before", MapType(StringType, StringType)), // old tuple (deletes)
    StructField("after", MapType(StringType, StringType)),  // new tuple (c/u)
    StructField("lsn", StringType)           // commit position, stamped at tx commit
  ))

  /** Vector-point sink contract (reference: internal/types/types.go:14-18):
    * `(id, vector, metadata)` with metadata always carrying table + pk
    * (reference: internal/pipeline/pipeline.go:234-241). */
  val vectorPointSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("metadata", MapType(StringType, StringType))
  ))
}

/** Per-table mapping config (reference: internal/config/config.go:61-66). */
final case class Mapping(
    table: String,                    // "schema.table"
    idColumn: String,
    textColumns: Seq[String],
    metadataColumns: Seq[String])

object Mapping {
  /** The reference's canonical demo mapping
    * (reference: configs/postgres-qdrant.yaml:27-31). */
  val documents: Mapping =
    Mapping("public.documents", "id", Seq("title", "content"), Seq("created_at", "author"))
}
