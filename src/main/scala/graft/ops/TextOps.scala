package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-level text/projection operators of the CDC→vector dataflow,
  * expressed as codegen-friendly built-in column expressions (no UDFs).
  */
object TextOps {

  /** Reference-exact text concatenation (reference: internal/util/text.go:10-35):
    * iterate columns **in mapping order**, keep values that are non-null and
    * non-empty, join with a single space. NOTE this is *not* `concat_ws`
    * (which skips nulls but keeps empty strings, producing double spaces);
    * the empty-string skip is pinned by the reference's own unit test
    * (reference: internal/util/text_test.go:5-11).
    */
  def textConcat(cols: Seq[Column]): Column =
    array_join(filter(array(cols: _*), c => c.isNotNull && c =!= lit("")), " ")

  /** Document id derivation `"<schema>.<table>:<pk>"`
    * (reference: internal/pipeline/pipeline.go:183-189). */
  def docId(schemaCol: Column, tableCol: Column, pkCol: Column): Column =
    concat(schemaCol, lit("."), tableCol, lit(":"), coalesce(pkCol, lit("")))

  /** Metadata projection: `{table: "<schema>.<table>", pk: <pk>}` plus mapped
    * metadata columns that are present and non-null; absent columns are
    * silently omitted (reference: internal/pipeline/pipeline.go:234-241). */
  def metaProject(schemaCol: Column, tableCol: Column, pkCol: Column,
                  afterMap: Column, metadataColumns: Seq[String]): Column = {
    // A metadata column literally named "table"/"pk" overwrites the base
    // entry (Go map assignment semantics in the reference); building the
    // base without shadowed keys avoids map_concat's duplicate-key error
    // under Spark's default mapKeyDedupPolicy=EXCEPTION.
    val baseEntries = Seq(
      "table" -> concat(schemaCol, lit("."), tableCol),
      "pk" -> coalesce(pkCol, lit("")))
      .filterNot { case (k, _) => metadataColumns.contains(k) }
      .flatMap { case (k, v) => Seq(lit(k), v) }
    val base = if (baseEntries.isEmpty) null else map(baseEntries: _*)
    if (metadataColumns.isEmpty) map(baseEntries: _*)
    else {
      val extras = metadataColumns.distinct
        .flatMap(c => Seq(lit(c), element_at(afterMap, c)))
      val extrasMap = map_filter(map(extras: _*), (_, v) => v.isNotNull)
      if (base == null) extrasMap else map_concat(base, extrasMap)
    }
  }

  /** Normalized text for exact deduplication: lowercase, trim, collapse
    * whitespace runs. */
  def normalizeText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")
}
