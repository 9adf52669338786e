package graft

import graft.stream.{CentroidMonitor, CentroidUpdate, LabeledVec}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming centroid-drift monitor: batch-boundary independence of the
  * running centroid (integer sums are associative), agreement with the
  * batch q_embedding_drift centroid formula, and drift semantics across
  * micro-batches. */
class CentroidMonitorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs =
    CentroidMonitor.labeledVecs(spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .collect().toSeq

  test("final streamed centroids == batch twin regardless of the split") {
    val (first, second) = vecs.partition(_.q.headOption.exists(_ % 2 == 0))
    val mem = MemoryStream[LabeledVec](spark)
    val q = CentroidMonitor.monitor(mem.toDS())
      .writeStream.format("memory").queryName("cmon_out")
      .outputMode("append").start()
    mem.addData(first); q.processAllAvailable()
    mem.addData(second); q.processAllAvailable()
    val streamed = spark.table("cmon_out").as[CentroidUpdate].collect()
    q.stop()
    // last update per label carries the final running centroid
    val finals = streamed.groupBy(_.label).map { case (l, us) =>
      l -> us.maxBy(_.n)
    }
    val batch = CentroidMonitor
      .monitorBatch(CentroidMonitor.labeledVecs(
        spark.read.parquet(s"$sfDir/embeddings.parquet")))
      .collect().map(u => u.label -> u).toMap
    assert(finals.keySet == batch.keySet)
    finals.foreach { case (l, u) =>
      assert(u.n == batch(l).n, s"label $l count diverged")
      assert(u.centroid == batch(l).centroid,
        s"label $l centroid depends on batch boundaries")
    }
  }

  test("batch centroid matches the q_embedding_drift integer formula") {
    // floor(Σ floor(x·2²⁴) / n) per component — the same arithmetic the
    // oracle-checked drift matrix and IVF training replay
    val direct = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("label").cast("int").as("label"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        floor(col("x").cast("double") * lit(graft.ops.expr.VecQuant.Scale))
          .cast("long").as("qx"))
      .groupBy("label", "d")
      .agg(floor(sum($"qx").cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    val batch = CentroidMonitor.monitorBatch(CentroidMonitor.labeledVecs(
      spark.read.parquet(s"$sfDir/embeddings.parquet")))
      .collect().map(u => u.label -> u.centroid).toMap
    assert(batch == direct)
  }

  test("drift is 10^6 on first sight and reacts to a shifted second batch") {
    val a = LabeledVec(1, Seq(100L, 0L, 0L, 0L))
    val b = LabeledVec(1, Seq(0L, 100L, 0L, 0L)) // orthogonal arrival
    val mem = MemoryStream[LabeledVec](spark)
    val q = CentroidMonitor.monitor(mem.toDS())
      .writeStream.format("memory").queryName("cmon_drift")
      .outputMode("append").start()
    mem.addData(Seq(a)); q.processAllAvailable()
    mem.addData(Seq(b)); q.processAllAvailable()
    val updates = spark.table("cmon_drift").as[CentroidUpdate].collect()
      .sortBy(_.n)
    q.stop()
    assert(updates.length == 2)
    assert(updates(0).drift_e6 == 1000000L, "first batch has nothing to drift from")
    // running centroid moves from (100,0,..) to (50,50,..): cos = 1/√2
    assert(updates(1).drift_e6 == math.floor(1.0 / math.sqrt(2.0) * 1e6).toLong,
      s"expected 45-degree drift, got ${updates(1).drift_e6}")
  }
}
