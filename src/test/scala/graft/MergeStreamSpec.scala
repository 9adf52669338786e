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

  private def change(op: String, pk: String, lsn: Long, c: String): DataFrame =
    Seq((op, "public", "documents", pk, lsn.toString, c)).toDF(
      "op", "schema", "table", "primary_key", "lsn", "c")
      .select(col("op"), col("schema"), col("table"), col("primary_key"),
        col("lsn"),
        when(col("op") =!= "d", map(lit("content"), col("c"))).as("after"))

  /** (relative path → (length, md5)) for every data file under the store. */
  private def dataFiles(dir: String): Map[String, (Long, String)] = {
    val root = java.nio.file.Paths.get(dir, "data")
    if (!java.nio.file.Files.exists(root)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { p =>
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          root.relativize(p).toString -> (bytes.length.toLong, md5.map("%02x".format(_)).mkString)
        }.toMap
      finally walk.close()
    }
  }

  test("seeded random chunking + shuffled order + duplicated chunk still " +
    "converges to the batch state") {
    // beyond the two-chunk ordered/reversed scenarios: 6 hash-random
    // chunks applied in a seeded shuffle with one chunk delivered twice —
    // the LSN-monotonic contract must make ANY such schedule converge
    val store = new ParquetTableStore(tmp() + "/state")
    val parsed = Changelog.changes(spark, sfDir)
      .withColumn("chunk", pmod(xxhash64(lit("interleave"), col("lsn")), lit(6)))
    val order = new scala.util.Random(42).shuffle((0 until 6).toList) :+ 2
    order.foreach(c => store.merge(parsed.filter(col("chunk") === c).drop("chunk")))
    assert(currentState(store) == batchState(),
      s"random schedule $order diverged from the batch state")
  }

  test("a merge rewrites only touched buckets: untouched buckets' files " +
    "stay byte-identical") {
    val dir = tmp() + "/table"
    val store = new ParquetTableStore(dir, numBuckets = 4)
    // find two pks landing in different buckets under pmod(hash(pk), 4)
    val bucketOf = (1 to 16).map(_.toString).map { pk =>
      pk -> Seq(pk).toDF("pk")
        .select(pmod(hash(col("pk")), lit(4)).as("b")).head().getInt(0)
    }.toMap
    val (pkA, bA) = bucketOf.head
    val (pkB, bB) = bucketOf.find(_._2 != bA).get
    store.merge(change("c", pkA, 10, "a1"))
    store.merge(change("c", pkB, 20, "b1"))
    val before = dataFiles(dir)
    assert(before.keys.exists(_.contains(s"bucket=$bB")), "fixture broken")
    // touch ONLY pkA's bucket
    store.merge(change("u", pkA, 30, "a2"))
    val after = dataFiles(dir)
    // every pkB-bucket file survives the merge byte-for-byte — the O(state)
    // full-rewrite path would have rewritten (and re-encoded) all of them
    val untouched = before.filter(_._1.contains(s"bucket=$bB"))
    untouched.foreach { case (p, sig) =>
      assert(after.get(p).contains(sig),
        s"untouched-bucket file $p was rewritten or dropped by the merge")
    }
    assert(store.current(spark).select("pk", "content").as[(String, String)]
      .collect().toSet == Set((pkA, "a2"), (pkB, "b1")))
  }

  test("delta accumulation is bounded: per-bucket compaction + vacuum keep " +
    "file count flat over many merges") {
    val dir = tmp() + "/table"
    val store = new ParquetTableStore(dir, numBuckets = 1,
      maxDeltasPerBucket = 2, keepManifests = 2)
    (1 to 12).foreach(i => store.merge(change("c", i.toString, i * 10L, s"v$i")))
    assert(store.current(spark).count() == 12)
    // the manifest-level stats view agrees with the compaction bound
    val st = store.stats(spark).as[(Int, Boolean, Int)].collect()
    assert(st.length == 1 && st.head._2 && st.head._3 <= 2,
      s"stats diverged from the compaction contract: ${st.toSeq}")
    // live dirs for the single bucket: one base + ≤ maxDeltas deltas; plus
    // at most one manifest-retention generation of superseded dirs
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "data"))
    val n = try dirs.count() finally dirs.close()
    assert(n <= 8, s"vacuum/compaction failed to bound data dirs: $n on disk")
    val manifests = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val mN = try manifests.filter(_.getFileName.toString.startsWith("manifest-")).count()
    finally manifests.close()
    assert(mN <= 2, s"manifest retention failed: $mN manifests on disk")
  }

  test("GC drops tombstones at the replay horizon; a pre-horizon " +
    "re-delivered upsert still cannot resurrect") {
    val dir = tmp() + "/table"
    val store = new ParquetTableStore(dir)
    store.merge(change("c", "1", 10, "v1"))
    store.merge(change("d", "1", 30, null))
    assert(store.snapshot(spark).count() == 1) // the tombstone row
    // the source guarantees nothing at or below 50 will be re-delivered
    store.gc(spark, 50)
    assert(store.gcHorizon(spark) == 50)
    assert(store.snapshot(spark).count() == 0, "tombstone not GC'd")
    // contract-violating re-delivery of the pre-delete upsert: the horizon
    // filter must refuse it — without the filter, the dropped tombstone
    // would let it resurrect the deleted row
    store.merge(change("u", "1", 20, "v2"))
    assert(store.current(spark).count() == 0, "GC'd delete was resurrected")
    // post-horizon changes flow normally
    store.merge(change("c", "1", 60, "v3"))
    assert(store.current(spark).select("content").as[String].collect().toSeq
      == Seq("v3"))
    // a lower horizon later must not regress the recorded one
    store.gc(spark, 40)
    assert(store.gcHorizon(spark) == 50)
  }

  test("orphan delta dir from a crash before manifest commit is " +
    "overwritten by the replayed batch") {
    val dir = tmp() + "/table"
    val store = new ParquetTableStore(dir)
    store.merge(change("c", "1", 10, "v1")) // commits manifest seq 1
    // crash window: the NEXT merge wrote its delta dir but died before the
    // manifest commit — fabricate the orphan with junk content
    val orphan = java.nio.file.Paths.get(dir, "data", "delta-00000002")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk"), "not parquet".getBytes)
    // the streaming checkpoint replays that batch: same seq, overwrite wins
    store.merge(change("c", "2", 20, "v2"))
    assert(store.current(spark).select("pk", "content").as[(String, String)]
      .collect().toSet == Set(("1", "v1"), ("2", "v2")),
      "orphan delta corrupted the replayed merge")
    assert(!java.nio.file.Files.exists(orphan.resolve("junk")),
      "junk file survived the overwrite")
  }

  test("retention window: a reader that resolved an older manifest still " +
    "finds every dir it references after later merges") {
    val dir = tmp() + "/table"
    val store = new ParquetTableStore(dir, numBuckets = 2,
      maxDeltasPerBucket = 2, keepManifests = 3)
    store.merge(change("c", "1", 10, "v1"))
    store.merge(change("c", "2", 20, "v2"))
    // a slow reader resolves NOW (manifest seq 2) ...
    val resolvedDirs = {
      val m = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      val latest = try m.filter(_.getFileName.toString.startsWith("manifest-"))
        .sorted(java.util.Comparator.naturalOrder()).reduce((_, b) => b).get()
      finally m.close()
      new String(java.nio.file.Files.readAllBytes(latest)).split('\n')
        .filter(_.startsWith("bucket ")).flatMap { l =>
          val p = l.split(' ')
          (Seq(p(2)) ++ p(3).split(',')).filter(_ != "-")
        }.toSet
    }
    assert(resolvedDirs.nonEmpty)
    // ... while the writer commits two more generations (within the
    // retention window of 3 manifests)
    store.merge(change("c", "3", 30, "v3"))
    store.merge(change("c", "4", 40, "v4"))
    resolvedDirs.foreach { d =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "data", d)),
        s"dir $d referenced by a retained manifest was vacuumed early")
    }
    assert(store.current(spark).count() == 4)
  }

  test("operated GC: the runner GCs up to the acked-horizon provider and " +
    "the state still converges across chunks") {
    val env = Changelog.envelopes(spark, sfDir).cache()
    val lsnOf = get_json_object($"value", "$.lsn").cast("long")
    val median = env.select(lsnOf.as("l")).stat.approxQuantile("l", Array(0.5), 0).head
    val src = tmp()
    env.filter(lsnOf <= median).coalesce(1).write.mode("overwrite").text(src)

    val storeDir = tmp() + "/state"; val ckpt = tmp() + "/ckpt"
    // the provider models the receive loop's flushedLsn: chunk 1 is acked
    val q1 = MergeStream.run(spark, src, storeDir, ckpt,
      gcHorizon = Some(() => median.toLong), gcEveryBatches = 1)
    q1.processAllAvailable(); q1.stop()
    val store = new ParquetTableStore(storeDir)
    assert(store.gcHorizon(spark) == median.toLong, "GC did not run")
    assert(store.snapshot(spark)
      .filter(col("deleted") && col("lsn") <= median.toLong).count() == 0,
      "pre-horizon tombstones survived the operated GC")

    // chunk 2 (> horizon) arrives after the GC: state must still converge
    env.filter(lsnOf > median).coalesce(1).write.mode("append").text(src)
    val q2 = MergeStream.run(spark, src, storeDir, ckpt,
      gcHorizon = Some(() => median.toLong), gcEveryBatches = 1)
    q2.processAllAvailable(); q2.stop()
    assert(currentState(new ParquetTableStore(storeDir)) == batchState(),
      "operated GC broke cross-chunk convergence")
  }

  test("bucket-count drift under an existing store is refused") {
    val dir = tmp() + "/table"
    new ParquetTableStore(dir, numBuckets = 4).merge(change("c", "1", 10, "v"))
    val err = intercept[IllegalArgumentException] {
      new ParquetTableStore(dir, numBuckets = 8).current(spark).count()
    }
    assert(err.getMessage.contains("bucket"), err.getMessage)
  }
}
