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
}
