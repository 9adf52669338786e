package graft

import graft.ops.{IndexStore, Ivf, Pq}

/** Train-once / load-many lifecycle: persisted quantizer artifacts must
  * round-trip EXACTLY (a one-bit drift in a centroid silently shifts
  * bucket/code assignments between runs and corrupts an incremental
  * index), loads must validate geometry, installs must be atomic
  * (old-or-new, never partial), and the loaded artifact must drive the
  * encoders to byte-identical results vs the freshly-trained one.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("PQ codebooks round-trip exactly and re-encode identically") {
    val trained = Pq.train(e, "vec_id", "embedding", subspaces = 4, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_store").toString + "/pq"
    IndexStore.savePq(spark, dir, trained)
    val loaded = IndexStore.loadPq(spark, dir, expectSubspaces = 4, expectK = 8)
    assert(loaded == trained.sortBy(c => (c.s, c.c)), "cells drifted through parquet")
    val dim = 64
    val a = Pq.encode(e, "vec_id", "embedding", trained, 4, dim / 4)
      .orderBy("vec_id", "s").as[(Long, Int, Int)].collect().toSeq
    val b = Pq.encode(e, "vec_id", "embedding", loaded, 4, dim / 4)
      .orderBy("vec_id", "s").as[(Long, Int, Int)].collect().toSeq
    assert(a == b, "loaded codebook encodes differently")
    // geometry validation trips on mismatch
    assert(intercept[IllegalArgumentException](
      IndexStore.loadPq(spark, dir, expectSubspaces = 8))
      .getMessage.contains("subspaces"))
  }

  test("IVF centroids round-trip exactly and re-assign identically") {
    val trained = Ivf.train(e, "vec_id", "embedding", k = 8, exact = true)
    val dir = java.nio.file.Files.createTempDirectory("ivf_store").toString + "/ivf"
    IndexStore.saveIvf(spark, dir, trained)
    val loaded = IndexStore.loadIvf(spark, dir, expectK = 8)
    assert(loaded == trained.sortBy(_._1), "centroids drifted through parquet")
    val a = Ivf.index(e, "vec_id", "embedding", trained, exact = true)
      .select($"vec_id", $"cluster").orderBy("vec_id")
      .as[(Long, Int)].collect().toSeq
    val b = Ivf.index(e, "vec_id", "embedding", loaded, exact = true)
      .select($"vec_id", $"cluster").orderBy("vec_id")
      .as[(Long, Int)].collect().toSeq
    assert(a == b, "loaded centroids assign differently")
    assert(intercept[IllegalArgumentException](
      IndexStore.loadIvf(spark, dir, expectK = 16)).getMessage.contains("16"))
  }

  test("re-install replaces atomically; DataFrame loaders feed the join paths") {
    val dir = java.nio.file.Files.createTempDirectory("swap_store").toString + "/pq"
    val v1 = Pq.train(e, "vec_id", "embedding", subspaces = 4, k = 4)
    IndexStore.savePq(spark, dir, v1)
    val v2 = Pq.train(e, "vec_id", "embedding", subspaces = 4, k = 8)
    IndexStore.savePq(spark, dir, v2) // overwrite-install over a live artifact
    assert(IndexStore.loadPq(spark, dir).map(_.c).distinct.size == 8,
      "re-install did not replace the artifact")
    // the DataFrame loader drives the literal-free encoder to the same
    // codes as the collected path
    val dim = 64
    val viaDf = Pq.encodeByJoin(e, "vec_id", "embedding",
      IndexStore.loadPqDf(spark, dir), 4, dim / 4)
      .orderBy("vec_id", "s").as[(Long, Int, Int)].collect().toSeq
    val viaSeq = Pq.encode(e, "vec_id", "embedding",
      IndexStore.loadPq(spark, dir), 4, dim / 4)
      .orderBy("vec_id", "s").as[(Long, Int, Int)].collect().toSeq
    assert(viaDf == viaSeq, "DataFrame-loaded codebook diverged from Seq path")
  }
}
