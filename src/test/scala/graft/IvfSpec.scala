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
