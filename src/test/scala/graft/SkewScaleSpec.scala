package graft

import graft.tools.SkewBench

/** The growth law behind the hub-cap and compaction claims, asserted on
  * deterministic volumes (row counts through the joins — wall-clock on a
  * shared box is noise; volume is the quantity the plans bound): as the
  * corpus scales ×4 with a hub/clone cluster growing alongside it, the
  * capped/compacted plans' work grows ~linearly while the uncapped/naive
  * plans' grows ~quadratically. `tools/SkewBench.main` runs the same
  * measurement at multi-million-edge scale and records wall-clock too
  * (committed as tools/skewbench_r7.json). */
class SkewScaleSpec extends SparkSpec {

  test("hub-capped wedge volume grows ~linearly in |E|; uncapped grows " +
    "~quadratically (hub scales with the corpus)") {
    val eBase = 20000L
    val hubBase = 500L
    val cap = 64
    val vols = Seq(1, 4).map { s =>
      val h1 = SkewBench.hubGraph(spark, s, eBase, hubBase).persist()
      h1.count()
      val capped = SkewBench.wedgeVolume(h1, Some(cap))
      val uncapped = SkewBench.wedgeVolume(h1, None)
      h1.unpersist()
      (capped, uncapped)
    }
    val (c1, u1) = vols(0)
    val (c4, u4) = vols(1)
    assert(c1 > 0 && u1 > c1, s"fixture degenerate: c1=$c1 u1=$u1")
    // capped: background wedges only — ×4 edges at constant avg degree
    // means ≤ ~6× wedge volume (linear with slack for degree variance)
    assert(c4 <= c1 * 6, s"capped volume super-linear: $c1 -> $c4")
    // uncapped: the hub alone contributes ≥ (hub·s choose 2) wedges —
    // ×4 scale must show ≥ 10× volume (quadratic ≈ 16×, slack for the
    // linear background share)
    assert(u4 >= u1 * 10, s"uncapped volume not super-linear: $u1 -> $u4")
    // and the cap must actually bite at every scale
    assert(u4 / math.max(c4, 1L) > u1 / math.max(c1, 1L),
      "cap advantage must WIDEN with scale")
  }

  test("identical-signature compaction keeps banding candidates ~linear " +
    "while the naive per-bucket pair count grows ~quadratically") {
    val (c1, n1) = SkewBench.bandVolumes(spark, 1, 20000L, 500L)
    val (c4, n4) = SkewBench.bandVolumes(spark, 4, 20000L, 500L)
    assert(c1 > 0 && n1 > 0)
    assert(c4 <= c1 * 6, s"compacted volume super-linear: $c1 -> $c4")
    assert(n4 >= n1 * 10, s"naive volume not super-linear: $n1 -> $n4")
  }
}
