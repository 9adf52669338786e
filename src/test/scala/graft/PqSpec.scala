package graft

import graft.ops.Pq

import org.apache.spark.sql.functions._

/** Product-quantization guards: codebook shape, code-table invariants, and
  * the two-stage search recall against the exact L2 baseline — a wrong
  * subspace slice or a broken centroid update silently degrades recall
  * long before it breaks row counts.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val cells = Pq.train(e, "vec_id", "embedding", subspaces = 8, k = 16)

  test("codebooks: 8 subspaces × 16 codes × 8 components, quantized range") {
    assert(cells.size == 128)
    assert(cells.map(c => (c.s, c.c)).distinct.size == 128)
    assert(cells.forall(_.centroid.size == 8))
    // components are quantized means of floor(x·2²⁴) values, so they stay
    // inside the quantization range of the raw data
    val bound = 4L << 24
    assert(cells.forall(_.centroid.forall(m => math.abs(m) < bound)))
  }

  test("codes: one row per (vector, subspace), ids inside the codebook") {
    val codes = Pq.encode(e, "vec_id", "embedding", cells,
      subspaces = 8, subDim = 8)
    val n = e.count()
    assert(codes.count() == n * 8)
    assert(codes.groupBy("vec_id").count().filter($"count" =!= 8).isEmpty)
    assert(codes.filter($"code" < 0 || $"code" >= 16).isEmpty)
    // codes actually discriminate: every subspace uses >1 centroid
    val used = codes.groupBy("s").agg(countDistinct("code").as("k")).collect()
    assert(used.forall(_.getLong(1) > 1))
  }

  test("ADC top-5 recall vs exact L2 stays above floor") {
    // ADC approximates SQUARED L2, so the truth set is the exact L2 top-5
    // (cosine and L2 rankings legitimately differ on unnormalized vectors) —
    // brute-forced here over the fixture in the same quantized arithmetic
    val vecs = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (id, v) =>
        id -> v.map(x => graft.ops.expr.VecQuant.q(x.toDouble)).toArray
      }
    val exact: Map[Long, Set[Long]] = vecs.filter(_._1 < 10).map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) =>
          val d2 = qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, c)
        }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    val adc = SparkEntry.queries("q_pq_adc")(spark, sfDir)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val hits = exact.map { case (q, truth) =>
      adc.getOrElse(q, Set.empty).count(truth) / truth.size.toDouble
    }
    val recall = hits.sum / hits.size
    info(f"pq-adc recall@5 vs exact L2: $recall%.2f")
    // the query emits the exact-L2 re-ranking of the ADC top-20 shortlist,
    // so recall here IS shortlist coverage: measured 0.66 with 8×16
    // codebooks on the fixture (production uses k=256 and a larger
    // shortlist; the floor pins slicing/training/code-join plumbing)
    assert(recall >= 0.5, f"ADC shortlist recall collapsed: $recall%.2f")
  }

  test("join-based trainer matches the literal path cell-for-cell at k=256") {
    // k=256 is the production codebook size and is above MaxLiteralK, so
    // Pq.train takes the trainDf route; the literal path is forced via
    // trainLiteral. Equality must be exact — same seeds (first k by id),
    // same quantized assignment tie-breaks, same floor'd update — on every
    // (subspace, code) centroid, including empty cells keeping seeds.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = 256
    val viaDf = graft.ops.Pq.train(e, "vec_id", "embedding",
      subspaces = 4, k = k).sortBy(c => (c.s, c.c))
    val viaLiteral = graft.ops.Pq.trainLiteral(e, "vec_id", "embedding",
      subspaces = 4, k = k).sortBy(c => (c.s, c.c))
    assert(k > graft.ops.Pq.MaxLiteralK, "k must exercise the trainDf route")
    assert(viaDf.size == viaLiteral.size)
    viaDf.zip(viaLiteral).foreach { case (a, b) =>
      assert(a.s == b.s && a.c == b.c, s"cell order diverged: $a vs $b")
      assert(a.centroid == b.centroid,
        s"centroid mismatch at (s=${a.s}, c=${a.c})")
    }
    // and the join-based encoder agrees with the literal encoder on the
    // trained codebook
    import org.apache.spark.sql.functions.col
    val dim = e.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val cellsDf = graft.ops.Pq.trainDf(e, "vec_id", "embedding",
      subspaces = 4, k = k)
    val encJoin = graft.ops.Pq.encodeByJoin(e, "vec_id", "embedding",
      cellsDf, subspaces = 4, subDim = dim / 4)
      .orderBy("vec_id", "s")
      .as[(Long, Int, Int)].collect().toSeq
    val encLit = graft.ops.Pq.encode(e, "vec_id", "embedding",
      viaLiteral, subspaces = 4, subDim = dim / 4)
      .orderBy("vec_id", "s")
      .as[(Long, Int, Int)].collect().toSeq
    assert(encJoin == encLit, "join-based encode diverged from literal encode")
  }
}
