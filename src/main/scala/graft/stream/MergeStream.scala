package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** LSN-monotonic MERGE table store: the streaming realization of the
  * `q_merge_upsert` batch query. Holds the current relational state of the
  * mapped table (one row per pk, plus tombstones) as a parquet snapshot;
  * [[merge]] applies one micro-batch of change envelopes with
  * last-writer-wins-by-LSN semantics.
  *
  * Why LSN-monotonic rather than batch-ordered: under at-least-once
  * delivery a restarted stream may re-deliver any suffix of the log, and a
  * file source may interleave chunks out of order. A row only ever moves
  * to a HIGHER LSN, so re-applying any already-applied change is a no-op
  * and applying chunks in either order converges to the same state —
  * exactly-once effect without coordination (the same contract the
  * reference relies on for idempotent vector upserts,
  * internal/pipeline/pipeline.go:173-179).
  *
  * Tombstones are retained (with the delete's LSN) so a late re-delivered
  * upsert that PRECEDED the delete cannot resurrect the row. At scale a
  * periodic GC can drop tombstones older than the source's replay horizon.
  *
  * Scale shape: one within-batch pk-compaction window (shuffle sized by
  * the micro-batch) + one full outer hash join on pk against the
  * snapshot. On a real cluster both sides would be bucketed by pk so the
  * join is co-located; the snapshot rewrite is O(state), not O(history).
  */
final class ParquetTableStore(path: String,
                              table: String = "public.documents",
                              attrCols: Seq[String] =
                                Seq("title", "content", "created_at", "author"))
  extends Serializable {

  private val attrs = attrCols

  private def fs(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession): Boolean = {
    recover(spark)
    fs(spark).exists(new org.apache.hadoop.fs.Path(path))
  }

  /** Crash recovery for the write-then-swap install: a crash between
    * "move live aside" and "install new" leaves the only complete state
    * at `path + ".old"` — restore it BEFORE any read or the next merge
    * would silently rebuild from one micro-batch and the old-file cleanup
    * would then destroy the sole surviving copy. */
  private def recover(spark: SparkSession): Unit = {
    val f = fs(spark)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (!f.exists(dst) && f.exists(old) && !f.rename(old, dst))
      throw new java.io.IOException(s"merge: could not recover $old")
  }

  /** Full snapshot including tombstones: pk, lsn, deleted, attrs. */
  def snapshot(spark: SparkSession): DataFrame = {
    recover(spark)
    spark.read.parquet(path)
  }

  /** Live rows (tombstones filtered). */
  def current(spark: SparkSession): DataFrame =
    snapshot(spark).filter(!col("deleted")).drop("deleted")

  /** Collapse one micro-batch of raw change envelopes (RowChange columns)
    * to its effective latest-per-pk form: mapped table only, null-After
    * updates skipped, blind deletes (no REPLICA IDENTITY old tuple → empty
    * pk) dropped — they identify no row (reference:
    * internal/cdc/postgres/postgres.go:602-619). */
  private def compactBatch(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pk")).orderBy(col("lsn").desc)
    changes
      .filter(concat(col("schema"), lit("."), col("table")) === table &&
        (col("op") === "d" || col("after").isNotNull) &&
        col("primary_key") =!= "")
      .select(Seq(col("primary_key").as("pk"), col("lsn").cast("long").as("lsn"),
        (col("op") === "d").as("deleted")) ++
        attrs.map(c => element_at(col("after"), c).as(c)): _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Apply one micro-batch. Re-delivery-safe and order-safe: a stored row
    * is replaced only by a change with a strictly higher LSN. */
  def merge(changes: DataFrame): Unit = {
    val spark = changes.sparkSession
    val batch = compactBatch(changes).persist()
    try {
      // empty triggers (timer fired, no data) must not rewrite the snapshot
      if (batch.isEmpty) return
      mergeNonEmpty(spark, batch)
    } finally batch.unpersist()
  }

  private def mergeNonEmpty(spark: SparkSession, batch: DataFrame): Unit = {
    val next =
      if (!exists(spark)) batch
      else {
        val b = batch.select(
          col("pk") +: (Seq("lsn", "deleted") ++ attrs).map(c => col(c).as(s"b_$c")): _*)
        snapshot(spark).join(b, Seq("pk"), "full_outer")
          .select(col("pk") +: (Seq("lsn", "deleted") ++ attrs).map { c =>
            when(col("lsn").isNull || (col("b_lsn").isNotNull && col("b_lsn") > col("lsn")),
              col(s"b_$c")).otherwise(col(c)).as(c)
          }: _*)
      }
    // write-then-swap: the new snapshot materializes in full BEFORE the
    // live one moves aside, so a crash leaves a complete state either at
    // `path` (old, or already-installed new) or at `path + ".old"`.
    val tmp = path + ".merge"
    next.write.mode("overwrite").parquet(tmp)
    val f = fs(spark)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    f.delete(old, true)
    if (f.exists(dst) && !f.rename(dst, old))
      throw new java.io.IOException(s"merge: could not move $dst aside")
    if (!f.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      f.rename(old, dst)
      throw new java.io.IOException(s"merge: could not install $tmp")
    }
    f.delete(old, true)
  }
}

/** Structured-Streaming runner: change envelopes → [[ParquetTableStore]]
  * via foreachBatch, checkpointed. The relational-state sibling of
  * [[CdcStream.run]] (which maintains the vector store). */
object MergeStream {

  def run(spark: SparkSession, sourceDir: String, storeDir: String,
          checkpointDir: String, flushIntervalMs: Long = 500,
          table: String = "public.documents",
          attrCols: Seq[String] =
            Seq("title", "content", "created_at", "author")): StreamingQuery = {
    val store = new ParquetTableStore(storeDir, table, attrCols)
    CdcStream.readEnvelopes(spark, sourceDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(flushIntervalMs))
      .foreachBatch { (batch: DataFrame, _: Long) => store.merge(batch) }
      .start()
  }
}
