package graft

import graft.multimodal.Multimodal
import graft.ops.{DedupOps, Lsh}

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("jaccard on known token sets") {
    val df = Seq(("a b c d", "c d e f")).toDF("x", "y")
    val j = df.select(DedupOps.jaccard(
      DedupOps.tokenSet($"x"), DedupOps.tokenSet($"y")).as("j"))
      .as[Double].head()
    assert(math.abs(j - 2.0 / 6.0) < 1e-12)
  }

  test("minhash: identical texts give identical signatures, bands collide") {
    val df = Seq((1L, "spark dedup at scale"), (2L, "spark dedup at scale"),
      (3L, "utterly different words entirely")).toDF("id", "t")
    val sigs = df.select($"id",
        DedupOps.minhashSignature(DedupOps.tokenSet($"t"), 16).as("sig"))
      .withColumn("bands", DedupOps.bandKeys($"sig", 4, 4))
      .collect().sortBy(_.getLong(0))
    assert(sigs(0).getSeq[Long](1) == sigs(1).getSeq[Long](1))
    assert(sigs(0).getSeq[String](2) == sigs(1).getSeq[String](2))
    assert(sigs(0).getSeq[Long](1) != sigs(2).getSeq[Long](1))
  }

  test("simhash: identical → hamming 0; one-token change → small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"))
      .toDF("id", "t")
    val sims = df.select($"id", DedupOps.simhash(DedupOps.tokens($"t")).as("s"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    assert(sims(0) == sims(1))
    val hamming = java.lang.Long.bitCount(sims(0) ^ sims(2))
    assert(hamming > 0 && hamming <= 16, s"hamming was $hamming")
  }

  test("LSH bucket is deterministic; probe set contains the exact bucket") {
    val planes = Lsh.hyperplanes(4, 8)
    assert(planes == Lsh.hyperplanes(4, 8)) // seeded → reproducible
    val df = Seq(Tuple1(Array(0.1f, -0.2f, 0.3f, 0.5f, -0.5f, 0.2f, 0.0f, 0.9f)))
      .toDF("v")
    val r = df.select(Lsh.bucket($"v", planes).as("b"),
      Lsh.probeBuckets($"v", planes).as("p")).head()
    val bucket = r.getString(0)
    val probes = r.getSeq[String](1)
    assert(bucket.length == 4 && bucket.forall(c => c == '0' || c == '1'))
    assert(probes.head == bucket && probes.size == 5)
    // each non-exact probe differs in exactly one bit
    probes.tail.foreach { p =>
      assert(p.zip(bucket).count { case (a, b) => a != b } == 1)
    }
  }

  test("multimodal stub extraction is deterministic and partition-agnostic") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val once = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val again = Multimodal.extractFeatures(media.repartition(7)).collect()
      .sortBy(_.doc_id)
    assert(once.length == media.count())
    assert(once.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(once.forall(f => f.features.length == 8))
    assert(once.forall(f => f.modality != "video" || f.n_frames >= 1))
  }
}
