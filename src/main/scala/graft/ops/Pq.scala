package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization: split each d-dim vector into `subspaces` contiguous
  * sub-vectors, train an independent codebook of `k` centroids per subspace
  * (one Lloyd iteration, deterministic seeds), and encode every vector as
  * `subspaces` small code ids. Search runs ADC (asymmetric distance
  * computation): a query precomputes its distance to every (subspace,
  * centroid) cell — `subspaces·k` longs — and a candidate's approximate
  * distance is a table lookup-and-sum over its codes, never an O(d) dot.
  *
  * This is the memory half of the IVF-PQ stack every billion-vector ANN
  * deployment runs: codes are `subspaces·log2(k)` bits per vector (4 bytes
  * at the queries' 8×16 configuration vs 256 for the raw floats), so the
  * candidate stream the ADC join
  * scans is ~30× smaller than the embedding column itself. Arithmetic is
  * the [[graft.ops.expr.VecQuant]] quantized-integer contract throughout —
  * components quantize to floor(x·2²⁴), distances and centroid updates are
  * exact long folds — so training, codes, and rankings replay in any engine.
  *
  * Scale notes: codebooks are `subspaces·k·(d/subspaces)` longs — at
  * production size (8×256×128 over dim 1024) that is 256 KB, always
  * broadcastable; only codebooks ever reach the driver. Encoding and ADC
  * are single-pass map-side plans; the only shuffle in search is the final
  * per-query top-k aggregation.
  */
object Pq {

  /** One codebook cell: subspace, code id, quantized centroid. */
  final case class Cell(s: Int, c: Int, centroid: Seq[Long])

  private def subvec(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Nearest code in subspace `s` (ties → lowest code id), as an
    * `array_min` over (d2, code) structs — linear expression size in k. */
  private def nearestCode(v: Column, cells: Seq[Cell], s: Int, subDim: Int): Column =
    array_min(array(cells.filter(_.s == s).map { cell =>
      struct(
        graft.ops.expr.VecQuant.dist2Column(subvec(v, s, subDim), typedLit(cell.centroid))
          .as("d2"),
        lit(cell.c).as("code"))
    }: _*)).getField("code")

  /** Train per-subspace codebooks: seeds are the first `k` vectors by id
    * (their quantized sub-vectors), refined by one Lloyd iteration whose
    * centroid update re-quantizes floor(Σqx/count) — the same
    * engine-replayable step [[Ivf.train]]'s exact mode uses. Empty cells
    * keep their seed. Returns `subspaces·k` cells (tiny; broadcast-safe). */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
            subspaces: Int, k: Int): Seq[Cell] = {
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val subDim = dim / subspaces
    val seeds: Seq[Cell] = vectors.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().zipWithIndex.flatMap { case (r, c) =>
        val q = r.getSeq[Float](0).map(x => graft.ops.expr.VecQuant.q(x.toDouble))
        (0 until subspaces).map(s => Cell(s, c, q.slice(s * subDim, (s + 1) * subDim)))
      }.toSeq
    // one pass computes every subspace's assignment; the update is a single
    // hash agg over (s, code, component) — no per-subspace jobs
    val assigned = vectors.select(
      explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("s"),
          nearestCode(col(vecCol), seeds, s, subDim).as("code"),
          subvec(col(vecCol), s, subDim).as("sv"))
      }: _*)).as("a"))
    val updated = assigned
      .select(col("a.s").as("s"), col("a.code").as("code"),
        posexplode(col("a.sv")).as(Seq("i", "x")))
      .groupBy("s", "code", "i")
      .agg(floor(sum(floor(col("x").cast("double") * graft.ops.expr.VecQuant.Scale))
        .cast("double") / count(lit(1)).cast("double")).as("m"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case ((s, c), rows) =>
        (s, c) -> rows.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq
      }
    seeds.map(cell =>
      cell.copy(centroid = updated.getOrElse((cell.s, cell.c), cell.centroid)))
  }

  /** Encode: one row per (id, subspace) with the nearest code id — the
    * long-format code table an ADC join consumes (8 rows/vector here; a
    * production sink would pack them into one long). */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
             cells: Seq[Cell], subspaces: Int, subDim: Int): DataFrame =
    vectors.select(col(idCol),
      explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("s"), nearestCode(col(vecCol), cells, s, subDim).as("code"))
      }: _*)).as("sc"))
      .select(col(idCol), col("sc.s").as("s"), col("sc.code").as("code"))

  /** Per-query ADC lookup table: distance from the query's sub-vector to
    * every (subspace, code) centroid — `subspaces·k` rows per query, the
    * small side of the search join. */
  def adcTable(queries: DataFrame, idCol: String, vecCol: String,
               cells: Seq[Cell], subDim: Int): DataFrame =
    queries.select(col(idCol),
      explode(array(cells.map { cell =>
        struct(lit(cell.s).as("s"), lit(cell.c).as("code"),
          graft.ops.expr.VecQuant.dist2Column(subvec(col(vecCol), cell.s, subDim),
            typedLit(cell.centroid)).as("d2"))
      }: _*)).as("t"))
      .select(col(idCol), col("t.s").as("s"), col("t.code").as("code"),
        col("t.d2").as("d2"))
}
