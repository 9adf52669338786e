package graft

import graft.ops.{IndexStore, Ivf}
import graft.stream.{IvfIndexMaintainer, PkChange, StalenessMonitor, StatusChange}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The streaming IVF index maintainer must converge to the batch
  * q_ann_ivf assignment regardless of micro-batch splits, stay idempotent
  * under re-delivery, tombstone deletes, and its retrain advisor must
  * agree with the batch q_index_staleness twin. */
class IndexMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-ivfm").toString

  test("streamed split assignments equal the batch cell assignment; " +
    "re-delivery is a no-op; a delete tombstones; GC'd horizon holds") {
    val e = graft.queries.Q.tbl(spark, sfDir, "embeddings")
    val centroids = Ivf.train(e, "vec_id", "embedding", k = 16, exact = true)
    val cpath = tmp() + "/ivf_centroids"
    IndexStore.saveIvf(spark, cpath, centroids)

    val m = new IvfIndexMaintainer(cpath, tmp() + "/assign")
    val vecs = e.select(col("vec_id").cast("string").as("id"),
      col("embedding").as("vec"),
      (col("vec_id") + 100L).cast("long").as("lsn"),
      lit(false).as("deleted"))
    val mid = e.agg(expr("percentile_approx(vec_id, 0.5)")).head().get(0)
      .toString.toDouble
    val first = vecs.filter(col("id").cast("long") <= mid)
    m.applyBatch(first)
    m.applyBatch(vecs.filter(col("id").cast("long") > mid))

    def state(): Set[(String, Int)] = m.assignments(spark)
      .select($"id", $"cluster").as[(String, Int)].collect().toSet
    // batch twin: the q_ann_ivf assignment path over the same vectors
    val want = Ivf.index(e, "vec_id", "embedding", centroids, exact = true)
      .select(col("vec_id").cast("string"), col("cluster"))
      .as[(String, Int)].collect().toSet
    assert(want.nonEmpty && state() == want,
      "streamed assignments diverge from the batch q_ann_ivf cells")

    // at-least-once worst case: the whole first chunk re-delivers
    m.applyBatch(first)
    assert(state() == want, "re-delivery moved the assignment state")

    // a delete at a HIGHER lsn tombstones its vector...
    val victim = want.head._1
    m.applyBatch(Seq((victim, 1000000L)).toDF("id", "lsn")
      .select($"id", lit(null).cast("array<double>").as("vec"), $"lsn",
        lit(true).as("deleted")))
    assert(state() == want.filterNot(_._1 == victim), "delete did not land")
    // ...and the re-delivered ORIGINAL upsert cannot resurrect it
    m.applyBatch(first)
    assert(state() == want.filterNot(_._1 == victim),
      "pre-delete upsert resurrected a deleted vector")
  }

  test("the quantizer is generation-stable: a mid-stream artifact swap is " +
    "picked up only after an explicit reload") {
    val e = graft.queries.Q.tbl(spark, sfDir, "embeddings")
    val centroids = Ivf.train(e, "vec_id", "embedding", k = 16, exact = true)
    val cpath = tmp() + "/ivf_centroids"
    IndexStore.saveIvf(spark, cpath, centroids)
    val m = new IvfIndexMaintainer(cpath, tmp() + "/assign")
    def batchOf(ids: Seq[Long], lsnBase: Long) =
      e.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").cast("string").as("id"), col("embedding").as("vec"),
          (col("vec_id") + lsnBase).cast("long").as("lsn"), lit(false).as("deleted"))
    m.applyBatch(batchOf(Seq(0L, 1L, 2L, 3L), 100L))
    assert(m.assignments(spark).select("cluster").distinct().count() >= 1)
    // offline retrain installs a DEGENERATE single-cell artifact...
    IndexStore.saveIvf(spark, cpath, Seq(0 -> centroids.head._2))
    // ...but the running maintainer keeps its generation until reload
    m.applyBatch(batchOf(Seq(4L, 5L), 200L))
    val beforeReload = m.assignments(spark)
      .filter(col("id").isin("4", "5")).select("cluster")
      .as[Int].collect().toSet
    val want45 = Ivf.index(e.filter(col("vec_id").isin(4L, 5L)),
      "vec_id", "embedding", centroids, exact = true)
      .select("cluster").as[Int].collect().toSet
    assert(beforeReload == want45,
      "maintainer silently adopted a mid-stream artifact swap")
    m.reloadCentroids()
    m.applyBatch(batchOf(Seq(6L, 7L), 300L))
    val after = m.assignments(spark)
      .filter(col("id").isin("6", "7")).select("cluster")
      .as[Int].collect().toSet
    assert(after == Set(0), s"post-reload batch ignored the new artifact: $after")
  }

  test("retrain advice over streamed transitions equals the batch twin") {
    val arrivals: Seq[PkChange] =
      graft.cdc.Changelog.changes(spark, sfDir)
        .filter(concat($"schema", lit("."), $"table") === "public.documents")
        .filter($"primary_key" =!= "" && ($"op" === "d" || $"after".isNotNull))
        .select($"primary_key", $"lsn".cast("long"), $"op")
        .collect()
        .map(r => PkChange(r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(_.lsn)
    val (a, b) = arrivals.splitAt(arrivals.size / 2)
    val mem = MemoryStream[PkChange](spark)
    val q = StalenessMonitor.monitor(mem.toDS())
      .writeStream.format("memory").queryName("ivfm_stale")
      .outputMode("append").start()
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    val streamed = spark.table("ivfm_stale").as[StatusChange]
    val gotAdvice = IvfIndexMaintainer.retrainAdvice(streamed)
      .as[(Long, Long, Long, Boolean)].head()
    q.stop()
    val batchAdvice = IvfIndexMaintainer.retrainAdvice(
      StalenessMonitor.monitorBatch(arrivals.toDS()))
      .as[(Long, Long, Long, Boolean)].head()
    assert(gotAdvice == batchAdvice,
      s"streamed advice $gotAdvice != batch advice $batchAdvice")
    assert(gotAdvice._1 > 0, "advisor saw no pks")
  }

  test("one streaming query: envelopes → embed → assign → store matches " +
    "the batch replay of the same loop") {
    val src = tmp()
    graft.cdc.Changelog.envelopes(spark, sfDir)
      .coalesce(1).write.mode("overwrite").text(src)
    val e = graft.queries.Q.tbl(spark, sfDir, "embeddings")
    val centroids = Ivf.train(e, "vec_id", "embedding", k = 16, exact = true)
    val cpath = tmp() + "/ivf_centroids"
    IndexStore.saveIvf(spark, cpath, centroids)

    val storeDir = tmp() + "/assign"
    val mapping = graft.model.Mapping(table = "public.documents",
      idColumn = "id", textColumns = Seq("title", "content"),
      metadataColumns = Nil)
    val q = IvfIndexMaintainer.run(spark, src, cpath, storeDir,
      tmp() + "/ckpt", mapping)
    try q.processAllAvailable() finally q.stop()

    val m = new IvfIndexMaintainer(cpath, storeDir)
    val got = m.assignments(spark)
      .select($"id", $"cluster").as[(String, Int)].collect().toSet

    // batch replay of the identical loop. The store's writers are deletes
    // and NON-empty-text upserts — an empty-text change writes nothing
    // (F3 skip), so the previous vector stays indexed (exactly the
    // reference's behavior: a skipped embed never overwrites the sink).
    // The batch twin therefore filters to writers FIRST, then takes the
    // latest per pk.
    val embed = graft.embed.Embedders.embedColumn(graft.embed.Embedders.deterministic)
    val text = graft.ops.TextOps.textConcat(
      Seq(element_at($"after", "title"), element_at($"after", "content")))
    val writers = graft.pipeline.VectorPipeline.mappedOnly(
        graft.cdc.Changelog.changes(spark, sfDir), Seq("public.documents"))
      .filter($"primary_key" =!= "" &&
        ($"op" === "d" || ($"after".isNotNull && length(text) > 0)))
    val ups = graft.pipeline.VectorPipeline.latestByPk(writers)
      .filter($"op" =!= "d")
      .withColumn("text", text)
      .select($"primary_key".as("id"),
        graft.ops.VectorOps.l2normalize(embed($"text"))
          .cast("array<double>").as("vec"))
    val want = Ivf.assignByJoin(ups, "id", "vec",
      IndexStore.loadIvfDf(spark, cpath), exact = true)
      .select($"id", $"cluster").as[(String, Int)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"stream loop diverges from batch loop: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
  }
}
