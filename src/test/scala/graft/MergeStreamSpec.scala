package graft

import graft.cdc.Changelog
import graft.stream.{MergeStream, ParquetTableStore}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The streaming MERGE sink must converge to the batch replay's state under
  * chunked, re-delivered, and out-of-order delivery — the LSN-monotonic
  * exactly-once-effect contract. */
class MergeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-merge").toString

  /** Batch twin: latest effective change per pk, deletes and blind deletes
    * excluded — what the store's `current` view must equal. */
  private def batchState(): Set[(String, String, String)] = {
    val w = Window.partitionBy(col("primary_key"))
      .orderBy(col("lsn").cast("long").desc)
    Changelog.changes(spark, sfDir)
      .filter(concat(col("schema"), lit("."), col("table")) === "public.documents" &&
        (col("op") === "d" || col("after").isNotNull) &&
        col("primary_key") =!= "")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("primary_key"),
        element_at(col("after"), "title"), element_at(col("after"), "content"))
      .as[(String, String, String)].collect().toSet
  }

  private def currentState(store: ParquetTableStore): Set[(String, String, String)] =
    store.current(spark).select("pk", "title", "content")
      .as[(String, String, String)].collect().toSet

  test("streamed chunks converge to batch state; re-delivery and " +
    "out-of-order application are no-ops") {
    val env = Changelog.envelopes(spark, sfDir).cache()
    val lsnOf = get_json_object($"value", "$.lsn").cast("long")
    val median = env.select(lsnOf.as("l")).stat.approxQuantile("l", Array(0.5), 0).head

    val src = tmp()
    env.filter(lsnOf <= median).coalesce(1).write.mode("overwrite").text(src)

    val store = tmp() + "/state"; val ckpt = tmp() + "/ckpt"
    val q1 = MergeStream.run(spark, src, store, ckpt)
    q1.processAllAvailable(); q1.stop()
    val mid = currentState(new ParquetTableStore(store))
    assert(mid.nonEmpty)

    // second chunk arrives; restart from checkpoint
    env.filter(lsnOf > median).coalesce(1).write.mode("append").text(src)
    val q2 = MergeStream.run(spark, src, store, ckpt)
    q2.processAllAvailable(); q2.stop()

    val expected = batchState()
    assert(currentState(new ParquetTableStore(store)) == expected)
    assert(mid != expected) // the second chunk actually changed state

    // full re-delivery from a FRESH checkpoint (at-least-once worst case):
    // every change replays, state must not move
    val q3 = MergeStream.run(spark, src, store, tmp() + "/ckpt2")
    q3.processAllAvailable(); q3.stop()
    assert(currentState(new ParquetTableStore(store)) == expected)

    // out-of-order: apply the chunks newest-first against a fresh store —
    // LSN monotonicity must converge to the same state
    val store2 = new ParquetTableStore(tmp() + "/state2")
    val parsed = Changelog.changes(spark, sfDir).withColumn("l", col("lsn").cast("long"))
    store2.merge(parsed.filter(col("l") > median).drop("l"))
    store2.merge(parsed.filter(col("l") <= median).drop("l"))
    assert(currentState(store2) == expected)
  }

  test("tombstones block late re-delivery of pre-delete upserts") {
    val store = new ParquetTableStore(tmp() + "/state")
    def change(op: String, pk: String, lsn: Long, content: String): DataFrame =
      Seq((op, "public", "documents", pk, lsn.toString, content)).toDF(
        "op", "schema", "table", "primary_key", "lsn", "c")
        .select(col("op"), col("schema"), col("table"), col("primary_key"),
          col("lsn"),
          when(col("op") =!= "d", map(lit("content"), col("c"))).as("after"))
    store.merge(change("c", "1", 10, "v1"))
    store.merge(change("d", "1", 30, null))
    // the upsert at lsn 20 was already superseded by the delete at 30:
    // re-delivering it must NOT resurrect the row
    store.merge(change("u", "1", 20, "v2"))
    assert(store.current(spark).count() == 0)
  }

  test("crash between install renames recovers from the .old copy") {
    // the write-then-swap install's worst window: live moved aside, new
    // copy not yet installed. A restart must restore the .old snapshot —
    // otherwise the next merge silently rebuilds from one micro-batch and
    // the cleanup deletes the only surviving state.
    val dir = tmp()
    val store = new ParquetTableStore(s"$dir/table")
    def change(op: String, pk: String, lsn: Long, c: String): DataFrame =
      Seq((op, "public", "documents", pk, lsn.toString, c)).toDF(
        "op", "schema", "table", "primary_key", "lsn", "c")
        .select(col("op"), col("schema"), col("table"), col("primary_key"),
          col("lsn"),
          when(col("op") =!= "d", map(lit("content"), col("c"))).as("after"))
    store.merge(change("c", "1", 10, "v1"))
    store.merge(change("c", "2", 20, "v2"))
    // simulate the crash window: dst moved aside, install never happened
    val fs = new org.apache.hadoop.fs.Path(s"$dir/table")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/table"),
      new org.apache.hadoop.fs.Path(s"$dir/table.old")))
    // reads and merges recover the full prior state first
    assert(store.current(spark).count() == 2, "snapshot not recovered from .old")
    store.merge(change("c", "3", 30, "v3"))
    assert(store.current(spark).select("pk").as[String].collect()
      .sorted.toSeq == Seq("1", "2", "3"),
      "post-recovery merge lost pre-crash rows")
  }
}
