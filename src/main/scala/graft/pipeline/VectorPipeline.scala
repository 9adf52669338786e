package graft.pipeline

import graft.embed.{Embedder, Embedders}
import graft.model.Mapping
import graft.ops.{TextOps, VectorOps}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's whole processing path (reference:
  * internal/pipeline/pipeline.go:182-258) as one declarative DataFrame
  * transform: change records → current-state upserts + deletes → text concat
  * → embed → normalize → vector points. Works identically on a batch
  * DataFrame and inside a streaming `foreachBatch`.
  */
object VectorPipeline {

  /** Upsert-side output: `(id, vector, metadata)` per
    * (reference: internal/types/types.go:14-18). `changes` must be in
    * RowChange shape ([[graft.model.Types.rowChangeSchema]]). */
  def vectorPoints(changes: DataFrame, mapping: Mapping,
                   embedder: Embedder = Embedders.deterministic,
                   normalize: Boolean = true): DataFrame = {
    val latest = latestByPk(mappedOnly(changes, Seq(mapping.table)))
      .filter(col("op") =!= "d" && col("after").isNotNull)
    val textCols = mapping.textColumns.map(c => element_at(col("after"), c))
    val embed = Embedders.embedColumn(embedder)
    val withText = latest
      .withColumn("text", TextOps.textConcat(textCols))
      .filter(length(col("text")) > 0) // F3 empty-text skip (pipeline.go:204-207)
    val vec = embed(col("text"))
    withText
      .withColumn("vector",
        if (normalize) VectorOps.l2normalize(vec) else vec)
      .filter(size(col("vector")) > 0) // E2 empty-vector guard (pipeline.go:223-228)
      .select(
        TextOps.docId(col("schema"), col("table"), col("primary_key")).as("id"),
        col("vector"),
        TextOps.metaProject(col("schema"), col("table"), col("primary_key"),
          col("after"), mapping.metadataColumns).as("metadata"))
  }

  /** Delete-side output: external ids whose latest change is a delete. */
  def deletions(changes: DataFrame, mapping: Mapping): DataFrame =
    latestByPk(mappedOnly(changes, Seq(mapping.table)))
      .filter(col("op") === "d")
      .select(TextOps.docId(col("schema"), col("table"), col("primary_key")).as("id"))

  /** F1 mapped-table filter. */
  def mappedOnly(changes: DataFrame, tables: Seq[String]): DataFrame =
    changes.filter(concat(col("schema"), lit("."), col("table")).isin(tables: _*))

  /** Collapse an at-least-once change stream to current state per key —
    * idempotent-upsert semantics (K1) + commit ordering (S5). */
  def latestByPk(changes: DataFrame): DataFrame = {
    val effective = changes.filter(col("op") === "d" || col("after").isNotNull)
    val key: Seq[Column] = Seq(col("schema"), col("table"), col("primary_key"))
    val w = Window.partitionBy(key: _*).orderBy(col("lsn").cast("long").desc)
    effective.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}
