package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Hub-shaped saturation guards for the wedge-join family (the
  * PlanGuardSpec SimHash pattern applied to graphs): near-dup graphs at
  * 100 TB contain template clusters whose members are pairwise similar —
  * a single vertex with 10⁴–10⁵ neighbors. Each test builds that shape
  * small (a star hub), measures the wedge/candidate volume the capped or
  * degree-oriented plan generates vs the naive plan, and asserts the
  * ≥20× drop — plus exactness where the bound is lossless.
  */
class GraphSaturationSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical star: hub 0 joined to leaves 1..n (a_id < b_id). */
  private def star(n: Int): DataFrame =
    (1 to n).map(i => (0L, i.toLong)).toDF("a_id", "b_id")

  private def symmetric(pairs: DataFrame): DataFrame =
    pairs.select($"a_id".as("src"), $"b_id".as("dst"))
      .unionByName(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
      .distinct()

  test("degree orientation collapses star-hub wedge volume >=20x") {
    val n = 2000
    val pairs = star(n)
    // id-oriented plan (the round-5 formulation): hub 0 has the minimum
    // id, so every edge points away from it and the wedge join puts
    // C(n,2) rows on the hub key.
    val idWedges = pairs.select($"a_id".as("x"), $"b_id".as("y"))
      .join(pairs.select($"a_id".as("y"), $"b_id".as("z")), Seq("y"))
      .unionByName( // x<y<z canonical wedges also pivot at the hub via x
        pairs.select($"b_id".as("x"), $"a_id".as("y"))
          .join(pairs.select($"a_id".as("y"), $"b_id".as("z")), Seq("y"))
          .filter($"x" < $"z"))
      .count()
    // degree-oriented: leaves (degree 1) point at the hub (degree n),
    // every vertex has out-degree <= 1 -> zero wedges.
    val o = GraphOps.orientByDegree(pairs)
    val orientedWedges = o.select($"src", $"dst".as("v"))
      .join(o.select($"src", $"dst".as("w")), Seq("src"))
      .filter($"v" < $"w")
      .count()
    info(s"star n=$n wedges: id-oriented=$idWedges degree-oriented=$orientedWedges")
    assert(idWedges >= (n.toLong * (n - 1)) / 2,
      s"fixture not saturation-shaped: $idWedges")
    assert(orientedWedges <= idWedges / 20,
      s"degree orientation lost its bound: $orientedWedges vs $idWedges")
  }

  test("degree-oriented triangles match brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(100) < 12
    } yield (a.toLong, b.toLong))
    val pairs = edges.toDF("a_id", "b_id")
    val got = GraphOps.triangles(pairs)
      .select(array_sort(array($"x", $"y", $"z")).as("t"))
      .as[Seq[Long]].collect()
      .map { case Seq(a, b, c) => (a, b, c) }.sorted.toList
    val eset = edges.toSet
    val want = (for {
      x <- 0L until n; y <- (x + 1) until n; z <- (y + 1) until n
      if eset((x, y)) && eset((y, z)) && eset((x, z))
    } yield (x, y, z)).sorted.toList
    assert(got == want, s"triangle sets differ: got ${got.size}, want ${want.size}")
    assert(got.size == got.distinct.size, "a triangle was enumerated twice")
  }

  test("hub cap collapses common-neighbor wedge volume >=20x and is exact below the cap") {
    val n = 2000
    val h1 = symmetric(star(n)).localCheckpoint(true)
    // uncapped: every leaf pair shares the hub -> C(n,2) candidates
    val uncapped = GraphOps.commonNeighbors(h1, cap = Int.MaxValue).count()
    val capped = GraphOps.commonNeighbors(h1, cap = GraphOps.HubCap).count()
    info(s"star n=$n CN candidates: uncapped=$uncapped capped=$capped")
    assert(uncapped >= (n.toLong * (n - 1)) / 2, s"fixture not hub-shaped: $uncapped")
    assert(capped <= uncapped / 20,
      s"hub cap lost its selectivity: $capped vs $uncapped")
    // below the cap the operator is exact: a small clique's CN counts are
    // unchanged by capping
    val clique = (for (a <- 1 to 6; b <- (a + 1) to 6) yield (a.toLong, b.toLong))
      .toDF("a_id", "b_id")
    val ch1 = symmetric(clique)
    val exact = GraphOps.commonNeighbors(ch1, cap = Int.MaxValue)
      .orderBy("a_id", "b_id").as[(Long, Long, Long)].collect().toSeq
    val withCap = GraphOps.commonNeighbors(ch1, cap = GraphOps.HubCap)
      .orderBy("a_id", "b_id").as[(Long, Long, Long)].collect().toSeq
    assert(exact == withCap, "cap altered sub-cap common-neighbor counts")
  }

  test("hub cap bounds khop2 and keeps hop-1 edges intact") {
    val n = 2000
    val h1 = symmetric(star(n)).localCheckpoint(true)
    val capped = GraphOps.khop2(h1, cap = GraphOps.HubCap)
    // hop-1 edges survive even when the hub is capped
    assert(capped.count() == h1.count(),
      "capped khop2 on a star should reduce to exactly the hop-1 edges")
    val uncapped = GraphOps.khop2(h1, cap = Int.MaxValue).count()
    info(s"star n=$n khop2 rows: uncapped=$uncapped capped=${h1.count()}")
    assert(uncapped >= n.toLong * (n - 1) / 2,
      s"fixture not hub-shaped: $uncapped")
    // sub-cap exactness on a path graph 1-2-3-4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val ph1 = symmetric(path)
    val exact = GraphOps.khop2(ph1, cap = Int.MaxValue)
      .orderBy("src", "dst").as[(Long, Long)].collect().toSeq
    val withCap = GraphOps.khop2(ph1, cap = GraphOps.HubCap)
      .orderBy("src", "dst").as[(Long, Long)].collect().toSeq
    assert(exact == withCap, "cap altered sub-cap 2-hop closure")
  }
}
