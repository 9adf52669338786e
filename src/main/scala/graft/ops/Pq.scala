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

  /** Above this codebook size, [[train]] switches to the join-based
    * [[trainDf]] pipeline — the [[Ivf.MaxLiteralK]] treatment: a literal
    * argmin embeds k structs per (row, subspace) in the expression tree
    * and the update collects subspaces·k·subDim rows to the driver; both
    * are fine at the queries' 8×16 codebooks and wrong at k in the
    * thousands. PqSpec pins the two paths cell-for-cell at k=256. */
  val MaxLiteralK = 64

  /** Train per-subspace codebooks: seeds are the first `k` vectors by id
    * (their quantized sub-vectors), refined by one Lloyd iteration whose
    * centroid update re-quantizes floor(Σqx/count) — the same
    * engine-replayable step [[Ivf.train]]'s exact mode uses. Empty cells
    * keep their seed. Returns `subspaces·k` cells (tiny; broadcast-safe).
    * Above [[MaxLiteralK]] the work runs through [[trainDf]] (one bounded
    * subspaces·k·subDim collect at the end to honor this signature;
    * callers at extreme k should consume [[trainDf]] + [[encodeByJoin]]
    * and keep codebooks off the driver entirely). */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
            subspaces: Int, k: Int): Seq[Cell] = {
    if (k > MaxLiteralK) {
      // dim probing + divisibility check happen inside trainDf
      return trainDf(vectors, idCol, vecCol, subspaces, k)
        .collect()
        .map(r => Cell(r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
        .sortBy(c => (c.s, c.c)).toSeq
    }
    trainLiteral(vectors, idCol, vecCol, subspaces, k)
  }

  private[graft] def trainLiteral(vectors: DataFrame, idCol: String, vecCol: String,
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

  /** The large-k trainer: codebooks stay a (s, code, centroid) DataFrame
    * end to end — nothing subspaces·k·subDim-sized reaches the driver and
    * no expression embeds k literals. Assignment streams the exploded
    * (id, s, sv) sub-vectors past the broadcast cell table joined on s,
    * arg-min in one hash agg (ties → lowest code, the [[trainLiteral]]
    * contract); the update re-quantizes floor(Σqx/count) per component;
    * empty cells keep their seed via the left join. Arithmetic is
    * identical to the literal path — PqSpec proves cell-for-cell equality
    * at k=256. */
  def trainDf(vectors: DataFrame, idCol: String, vecCol: String,
              subspaces: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val subDim = dim / subspaces
    // seeds: first k by id, exploded per subspace, quantized to longs; the
    // row_number window spans only the k-row limit result
    val seeds = vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("__sid"), col(vecCol))
      .withColumn("code", row_number().over(Window.orderBy(col("__sid"))) - 1)
      .select(explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("s"), col("code"),
          transform(subvec(col(vecCol), s, subDim),
            x => floor(x.cast("double") * graft.ops.expr.VecQuant.Scale)
              .cast("long")).as("centroid"))
      }: _*)).as("c"))
      .select(col("c.s"), col("c.code"), col("c.centroid"))
      .localCheckpoint(true)
    // one Lloyd step: explode (id, s, sv) once, broadcast-join the cell
    // table on s, argmin per (id, s), then one hash agg per (s, code, i)
    val sv = vectors.select(col(idCol),
      explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("s"), subvec(col(vecCol), s, subDim).as("sv"))
      }: _*)).as("v"))
      .select(col(idCol), col("v.s").as("s"), col("v.sv").as("sv"))
    val assigned = sv.join(broadcast(seeds), Seq("s"))
      .select(col(idCol), col("s"), col("sv"),
        struct(graft.ops.expr.VecQuant.dist2Column(col("sv"), col("centroid"))
          .as("d2"), col("code")).as("__dc"))
      .groupBy(col(idCol), col("s"))
      .agg(first(col("sv")).as("sv"),
        min(col("__dc")).getField("code").as("code"))
    val updated = assigned
      .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy("s", "code", "i")
      .agg(floor(sum(floor(col("x").cast("double") * graft.ops.expr.VecQuant.Scale))
        .cast("double") / count(lit(1)).cast("double")).cast("long").as("m"))
      .groupBy("s", "code")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        e => e.getField("m")).as("upd"))
    seeds.join(updated, Seq("s", "code"), "left")
      .select(col("s"), col("code"),
        coalesce(col("upd"), col("centroid")).as("centroid"))
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

  /** Encode against a (s, code, centroid) DataFrame codebook — the
    * large-k companion of [[encode]]: sub-vectors stream past the
    * broadcast cell table, argmin in one hash agg, no literal expressions.
    * Same tie-break (lowest code) as [[encode]]. */
  def encodeByJoin(vectors: DataFrame, idCol: String, vecCol: String,
                   cells: DataFrame, subspaces: Int, subDim: Int): DataFrame =
    vectors.select(col(idCol),
      explode(array((0 until subspaces).map { s =>
        struct(lit(s).as("s"), subvec(col(vecCol), s, subDim).as("sv"))
      }: _*)).as("v"))
      .select(col(idCol), col("v.s").as("s"), col("v.sv").as("sv"))
      .join(broadcast(cells), Seq("s"))
      .select(col(idCol), col("s"),
        struct(graft.ops.expr.VecQuant.dist2Column(col("sv"), col("centroid"))
          .as("d2"), col("code")).as("__dc"))
      .groupBy(col(idCol), col("s"))
      .agg(min(col("__dc")).getField("code").as("code"))

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
