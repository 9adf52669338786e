package graft

/** ANN quality guard: the LSH- and IVF-bucketed paths trade exactness for
  * scale, but a bucketing bug (wrong probe set, broken centroid assignment)
  * silently collapses recall long before it breaks row counts. Pin
  * recall@5 against the brute-force cosine baseline — everything is
  * seeded/deterministic, so measured recall is stable run to run.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sfDir)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }

  private def recallAt5(approx: Map[Long, Set[Long]],
                        exact: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth) / truth.size.toDouble
    }
    hits.sum / hits.size
  }

  test("LSH and IVF ANN recall@5 vs brute force stays above floor") {
    val exact = topk("q_cosine_topk")
    assert(exact.size == 10 && exact.forall(_._2.size == 5))
    val lsh = recallAt5(topk("q_ann_lsh"), exact)
    val ivf = recallAt5(topk("q_ann_ivf"), exact)
    info(f"recall@5: lsh=$lsh%.2f ivf=$ivf%.2f")
    // measured on the fixtures: lsh ≈ 0.68 (8 tables × 4 FNV-integer
    // planes; the Gaussian planes they replaced measured 0.72-0.78),
    // ivf ≈ 0.96 (16 cells, 4 probed); floors leave headroom for noise
    assert(lsh >= 0.6, f"LSH recall collapsed: $lsh%.2f")
    assert(ivf >= 0.8, f"IVF recall collapsed: $ivf%.2f")
  }

  test("IVF-PQ and binary-Hamming recall@5 vs brute force stays above floor") {
    val exact = topk("q_cosine_topk")
    // q_ivf_pq ranks by quantized L2, the baseline by cosine — on these
    // non-normalized fixtures the metrics disagree on some neighbors, so
    // the floor accounts for metric mismatch plus ADC approximation
    // (measured 0.74 on the fixtures)
    val ivfPq = recallAt5(topk("q_ivf_pq"), exact)
    val binary = recallAt5(topk("q_binary_ann"), exact)
    info(f"recall@5: ivf_pq=$ivfPq%.2f binary=$binary%.2f")
    assert(ivfPq >= 0.4, f"IVF-PQ recall collapsed: $ivfPq%.2f")
    // 64 sign bits keep only coarse directional information — the binary
    // stage is a shortlist generator, not a ranker; guard against total
    // collapse (measured 0.16; random top-5 of ~4000 would recall ≈ 0.006)
    assert(binary >= 0.1, f"binary recall collapsed: $binary%.2f")
  }

  test("ANN-prefiltered MaxSim recalls the exact top-3 docs") {
    def top3(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir)
        .select($"qdoc".cast("long"), $"cdoc".cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val exact = top3("q_maxsim")
    val ann = top3("q_maxsim_ann")
    val recall = recallAt5(ann, exact)
    info(f"maxsim recall@3: $recall%.2f")
    // a doc pair survives the prefilter iff ≥1 of its token pairs collides
    // in ≥1 of 8 tables — with 4-8 tokens per side the per-pair collision
    // probability compounds, so recall is far higher than single-vector
    // LSH at the same table count (measured 1.00 on the fixtures)
    assert(recall >= 0.8, f"MaxSim ANN recall collapsed: $recall%.2f")
  }

  test("NN-descent refined graph recall@3 vs exact stays above floor") {
    // sf0.01, not the default sf0.001: the 8×6-plane buckets are sized for
    // ≥~8 vectors per bucket — at 50 vectors the seed graph is so sparse
    // (64 buckets/table, mostly singletons) that one NoN round has nothing
    // to propagate (measured 0.37 there vs the design-density figure below)
    val dir = "/root/testdata/sf0.01"
    // exact ground truth recomputed in-process with the SAME quantized
    // arithmetic the engine uses (floor(x·2²⁴) longs, exact integer dot)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 16777216.0).toLong).toArray)
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val exact = vecs.keys.filter(_ % 10 == 0).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (-cos(vecs(q), vecs(c)), c)).take(3).toSet
    }.toMap
    val refined = SparkEntry.queries("q_nn_descent")(spark, dir)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val r = recallAt5(refined, exact)
    info(f"nn-descent recall@3: $r%.2f")
    // the fixture embeddings are ISOTROPIC noise (measured same-label vs
    // diff-label mean cosine 0.004 vs −0.002): neighbor-of-neighbor
    // propagation has no manifold to descend, so recall plateaus
    // (measured 0.54 at 2 rounds, 0.57 at 4 — real embedding corpora
    // cluster, which is the regime the operator is built for). The floor
    // guards the construction against collapse (a broken wedge join or
    // bucket seed measures ~0.1), not against the fixture's geometry.
    assert(r >= 0.45, f"NN-descent recall collapsed: $r%.2f")
  }

  test("graph beam search recall@3 vs exact cosine stays above floor") {
    // q_ann_graph walks the NN-descent graph from one entry point with an
    // 8-wide beam for 3 rounds; on isotropic fixture embeddings the graph
    // itself plateaus (see above), so the floor guards the SEARCH
    // construction (frontier expansion, beam truncation, rescoring)
    // against collapse, not the fixture's geometry. A broken expansion
    // (e.g. frontier never leaves the entry point) measures ~0.0 because
    // the entry's neighborhood is unrelated to most queries.
    val exact = topk("q_cosine_topk").map { case (q, s) => q -> s.take(5) }
    val beam = SparkEntry.queries("q_ann_graph")(spark, sfDir)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    assert(beam.nonEmpty && beam.forall(_._2.size == 3))
    // recall of the beam's top-3 against the exact top-5
    val hits = exact.map { case (q, truth) =>
      beam.getOrElse(q, Set.empty).count(truth) / 3.0
    }
    val r = hits.sum / hits.size
    info(f"graph beam search recall(top3 in exact top5): $r%.2f")
    assert(r >= 0.2, f"graph search collapsed: $r%.2f")
  }
}
