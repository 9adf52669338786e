package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wedge-join primitives for graphs derived from near-duplicate pair
  * artifacts, shaped for the degree distributions those graphs actually
  * have at 100 TB: boilerplate/template clusters produce hub vertices with
  * 10⁴–10⁵ neighbors, and a naive mid-keyed self-join materializes
  * deg(hub)² wedges on a single key. Two standard bounds are applied:
  *
  *   - '''Degree orientation''' (exact): for triangle enumeration, direct
  *     each undirected edge from its lower-(degree, id) endpoint; every
  *     triangle is then enumerated exactly once from its minimum-degree
  *     vertex, and wedge volume drops from Σ deg(v)² to O(arboricity·|E|)
  *     (Chiba–Nishizeki; the Cohen MapReduce triangle plan). No semantic
  *     change — the triangle set is orientation-invariant.
  *
  *   - '''Hub cap''' (declared semantics): for common-neighbor and k-hop
  *     queries the quadratic blow-up is inherent to the ANSWER (a
  *     10⁵-degree hub genuinely implies 10¹⁰ co-neighbor pairs), so the
  *     operator's contract caps the mid-vertex degree at [[HubCap]]:
  *     wedges are generated only through vertices with degree ≤ cap.
  *     A template hub's neighborhood carries no linkage signal (every
  *     member trivially co-occurs), so this is the df-cap treatment the
  *     inverted-index family applies to stop-words — and it is written
  *     into BOTH the Spark plan and the DuckDB oracle SQL, so the gate
  *     hash-checks the capped semantics, not an approximation of the
  *     uncapped ones.
  *
  * Input contract: `pairs` is the canonical near-dup pair artifact with
  * columns `a_id < b_id` (one row per undirected edge); `h1` is the
  * symmetric closure `(src, dst)` with both directions present, distinct.
  */
object GraphOps {

  /** Mid-vertex degree bound for wedge generation in common-neighbor and
    * k-hop plans. Far above every real near-dup degree in the fixtures
    * (max 317 at sf0.1) — the cap only bites on template hubs, which is
    * the point. */
  val HubCap = 1024

  /** Undirected degree table `(node, deg)` from canonical pairs. */
  def degrees(pairs: DataFrame): DataFrame =
    pairs.select(col("a_id").as("node"))
      .unionByName(pairs.select(col("b_id").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Degree-oriented edge list `(src, dst)` from canonical pairs: each
    * edge directed from the endpoint with the smaller (degree, id) key.
    * Exact — a pure re-orientation of the same undirected edge set. The
    * degree table is node-sized (broadcastable); both attach joins are
    * key-equi joins on the edge's own endpoints. */
  def orientByDegree(pairs: DataFrame): DataFrame = {
    val deg = degrees(pairs)
    pairs
      .join(deg.select(col("node").as("a_id"), col("deg").as("dega")), "a_id")
      .join(deg.select(col("node").as("b_id"), col("deg").as("degb")), "b_id")
      .select(
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a_id") < col("b_id")),
          col("a_id")).otherwise(col("b_id")).as("src"),
        when(col("dega") < col("degb") ||
          (col("dega") === col("degb") && col("a_id") < col("b_id")),
          col("b_id")).otherwise(col("a_id")).as("dst"))
  }

  /** All triangles `(x, y, z)` of the undirected graph, each exactly once:
    * wedges are generated from the degree-oriented pivot (`src`), the two
    * away-endpoints ordered by id (`y < z`), and closed by a LEFT SEMI
    * against the canonical pair list on `(y, z)`. The pivot column `x` is
    * the minimum-(degree, id) vertex of its triangle, NOT the minimum id —
    * callers that aggregate per-vertex membership (union of x/y/z) are
    * unaffected. */
  def triangles(pairs: DataFrame, cacheKey: Option[String] = None): DataFrame = {
    // eager materialization: the wedge self-join reads the oriented list
    // TWICE (both sides) — without it the orientation's two degree joins
    // run twice, and the measured cost doubles at sf0.1. With a cacheKey
    // the artifact goes through SessionCache (persist, lineage intact —
    // an executor loss recomputes the partitions); the localCheckpoint
    // fallback for anonymous inputs truncates lineage and would fail the
    // job on a lost executor, acceptable only off the production paths.
    val o = cacheKey match {
      case Some(k) => graft.util.SessionCache
        .getOrMaterialize(pairs.sparkSession, k)(orientByDegree(pairs))
      case None => orientByDegree(pairs).localCheckpoint(true)
    }
    o.select(col("src"), col("dst").as("v"))
      .join(o.select(col("src"), col("dst").as("w")), Seq("src"))
      .filter(col("v") < col("w"))
      .join(pairs.select(col("a_id").as("v"), col("b_id").as("w")),
        Seq("v", "w"), "left_semi")
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
  }

  /** Common-neighbor pairs `(a_id, b_id, common)` with `a_id < b_id`,
    * counting only neighbors whose degree ≤ `cap` (see [[HubCap]]). `h1`
    * is the symmetric closure; the mid filter is a node-sized semi-join
    * applied before the wedge self-join, so a hub contributes zero wedges
    * instead of deg(hub)². */
  def commonNeighbors(h1: DataFrame, cap: Int = HubCap): DataFrame = {
    val wedgeIn = capMids(h1, cap)
    wedgeIn.select(col("src").as("a_id"), col("mid"))
      .join(wedgeIn.select(col("src").as("b_id"), col("mid")), Seq("mid"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("common"))
  }

  /** Two-hop closure `(src, dst)` distinct, where the intermediate hop
    * runs only through vertices with degree ≤ `cap`; hop-1 edges are
    * always included (a direct neighbor needs no intermediate). */
  def khop2(h1: DataFrame, cap: Int = HubCap): DataFrame =
    capMids(h1, cap)
      .join(h1.select(col("src").as("mid"), col("dst")), Seq("mid"))
      .filter(col("dst") =!= col("src"))
      .select("src", "dst")
      .unionByName(h1.select("src", "dst"))
      .distinct()

  /** Shared mid-cap subplan: `(src, mid)` edges whose mid vertex has
    * degree ≤ cap — a node-sized semi-join applied BEFORE any wedge
    * self-join, so capped hubs contribute zero wedges. One definition so
    * the common-neighbor and k-hop operators cannot drift on the cap's
    * semantics. */
  private def capMids(h1: DataFrame, cap: Int): DataFrame = {
    val mids = h1.groupBy(col("src").as("mid")).agg(count(lit(1)).as("mdeg"))
      .filter(col("mdeg") <= cap).select("mid")
    h1.select(col("src"), col("dst").as("mid"))
      .join(mids, Seq("mid"), "left_semi")
  }
}
