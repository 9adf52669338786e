package graft

import graft.ops.Ivf
import graft.queries.Q

import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  lazy val e = Q.tbl(spark, sfDir, "embeddings").cache()

  test("IVF: every vector lands in exactly one of k cells; cells cover data") {
    val centroids = Ivf.train(e, "vec_id", "embedding", k = 8)
    assert(centroids.size == 8)
    assert(centroids.forall(_._2.size == 64))
    val idx = Ivf.index(e, "vec_id", "embedding", centroids)
    assert(idx.count() == e.count())
    val cells = idx.groupBy("cluster").count().count()
    assert(cells > 1, "all vectors in one cell — training degenerated")
  }

  test("IVF probes: nprobe cells per query, nearest cell first") {
    val centroids = Ivf.train(e, "vec_id", "embedding", k = 8)
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val p = Ivf.probes(q, "query_id", "qv", centroids, nprobe = 3)
    val perQuery = p.groupBy("query_id").count().select("count")
      .as[Long].collect()
    assert(perQuery.forall(_ == 3))
    // a query's own indexed cell must be among its probes (recall sanity)
    val own = Ivf.index(e.filter($"vec_id" < 5), "vec_id", "embedding", centroids)
      .select($"vec_id".as("query_id"), $"cluster".as("own_cluster"))
    val joined = p.join(own, "query_id")
      .filter($"cluster" === $"own_cluster").select("query_id").distinct().count()
    assert(joined == 5)
  }

  test("large-k training: DataFrame path equals the literal path, no k-literal plans") {
    // synthetic corpus big enough for k=256 (the fixture has too few rows):
    // 600 16-dim vectors with a fixed seed
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 600).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f).toSeq))
      .toDF("vec_id", "embedding")
      .localCheckpoint(true)
    // equivalence at a k both paths handle, in exact-decimal mode so the
    // comparison is bit-for-bit (double aggregation order differs between
    // the two pipelines otherwise)
    val viaLiteral = Ivf.train(vecs, "vec_id", "embedding", k = 32,
      iterations = 2, exact = true)
    val viaDf = Ivf.trainDf(vecs, "vec_id", "embedding", k = 32,
      iterations = 2, exact = true)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    assert(viaDf == viaLiteral)
    // k=256 > MaxLiteralK: train() must route through the DataFrame path
    // and still produce a complete, covering quantizer
    assert(256 > Ivf.MaxLiteralK)
    val big = Ivf.train(vecs, "vec_id", "embedding", k = 256, exact = true)
    assert(big.size == 256 && big.forall(_._2.size == 16))
    val idx = Ivf.assignByJoin(vecs, "vec_id", "embedding",
      Ivf.trainDf(vecs, "vec_id", "embedding", k = 256, exact = true),
      exact = true)
    assert(idx.count() == 600)
    assert(idx.groupBy("cluster").count().count() > 32,
      "large-k quantizer degenerated")
  }

  test("IVF ANN recall vs brute force on the probed queries") {
    import graft.ops.VectorOps
    val ann = SparkEntry.queries("q_ann_ivf")(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = SparkEntry.queries("q_cosine_topk")(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      ann.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.2, s"mean IVF recall $mean — probing is broken")
  }
}
