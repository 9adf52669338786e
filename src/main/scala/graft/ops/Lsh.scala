package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine similarity over embedding columns — the
  * scale path for ANN / embedding near-dup: bucket by sign pattern, equi-join
  * buckets, verify candidates with true cosine. Brute force is O(n²·d)
  * all-pairs; this shuffles on bucket keys only.
  */
object Lsh {

  /** Deterministic hyperplanes (fixed seed → identical on every executor
    * and every run; java.util.Random's algorithm is part of its spec). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern bucket id, e.g. "10110010" for 8 planes. Each plane's
    * projection is a native dot kernel (graft.ops.expr.VecMath) against the
    * literal plane array — no per-plane intermediate arrays. */
  def bucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { p =>
      val dotp = graft.ops.expr.VecMath.dotColumn(vec, typedLit(p))
      when(dotp >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Multi-probe buckets: the exact bucket plus all buckets at hamming
    * distance 1 (flipping each plane's bit), improving recall for vectors
    * near a hyperplane. */
  def probeBuckets(vec: Column, planes: Seq[Seq[Double]]): Column =
    probesFromBucket(bucket(vec, planes), planes.size)

  /** [[probeBuckets]] from an already-computed bucket string — callers that
    * project the bucket column first evaluate the plane dots once per row
    * instead of once per probe. */
  def probesFromBucket(exact: Column, numPlanes: Int): Column = {
    val flipped = (0 until numPlanes).map { i =>
      val pre = substring(exact, 1, i)
      val bit = substring(exact, i + 1, 1)
      val post = substring(exact, i + 2, numPlanes - i - 1)
      concat(pre, when(bit === "1", lit("0")).otherwise(lit("1")), post)
    }
    array(exact +: flipped: _*)
  }

  // ---- quantized-integer variants (oracle-checked queries) ---------------
  // Same bucket semantics, but each plane projection is the exact integer
  // Σ wᵢ·floor(xᵢ·2²⁴) ([[graft.ops.expr.VecQuant]]): the quantization is one
  // deterministic IEEE op per element and the weighted sum is exact long
  // arithmetic, so the SIGN — hence the bucket id, hence the candidate set
  // of an LSH query — is identical in any engine that replays the same
  // integer fold. Buckets are BIGINTs (bit p of the bucket = plane p's
  // sign), not strings: cheaper to shuffle, join, and probe (bit-flip =
  // XOR). The double-accumulator forms above stay the non-oracle hot path.

  /** Cross-engine-replayable integer hyperplanes: component (p,d) is
    * `fnv1a64("pl:salt:p:d") mod 15 − 7` — an integer in [−7, 7]. An
    * external SQL engine recomputes the planes from the same ASCII strings
    * (FNV is a linear fold), so bucket assignment — and therefore the whole
    * candidate set of an LSH query — becomes oracle-checkable, where a
    * JVM-seeded Gaussian is not. 15-level quantization preserves the
    * random-direction property LSH needs; recall on the fixture embeddings
    * stays near the Gaussian planes' (floor pinned by AnnRecallSpec). */
  def fnvPlanesL(numPlanes: Int, dim: Int, salt: String): Seq[Seq[Long]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { d =>
        val h = graft.ops.expr.Fnv1a64.hash(s"pl:$salt:$p:$d")
        java.lang.Long.remainderUnsigned(h, 15L) - 7L
      }
    }

  /** Bucket id as a BIGINT: bit p is set iff plane p's quantized projection
    * is ≥ 0. */
  def bucketQ(vec: Column, planes: Seq[Seq[Long]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(graft.ops.expr.VecQuant.wdotColumn(vec, typedLit(p)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe buckets from a BIGINT bucket: the exact bucket plus each
    * single-bit flip (XOR with 2ᵖ). */
  def probesQ(bucket: Column, numPlanes: Int): Column =
    array(bucket +: (0 until numPlanes).map(i =>
      bucket.bitwiseXOR(lit(1L << i))): _*)

  /** Multi-table BIGINT bucket keys (OR-construction): `tables` independent
    * hash tables of `planesPerTable` hyperplanes each; two vectors are
    * candidates iff they collide in ≥1 table — the standard recall lever
    * for high-dimensional data, where single-table multi-probe recall
    * collapses (collision probability for a pair at angle θ is
    * 1-(1-(1-θ/π)^k)^L instead of one table's (1-θ/π)^k). Table t's key is
    * `t·2^planesPerTable + bits(t)` — the table index lives in the high
    * bits, so buckets of different tables never join. */
  def tableKeysQ(vec: Column, planes: Seq[Seq[Long]],
                 tables: Int, planesPerTable: Int): Column = {
    require(planes.size >= tables * planesPerTable,
      s"need ${tables * planesPerTable} planes, got ${planes.size}")
    array((0 until tables).map { t =>
      val slice = planes.slice(t * planesPerTable, (t + 1) * planesPerTable)
      slice.zipWithIndex.map { case (p, i) =>
        when(graft.ops.expr.VecQuant.wdotColumn(vec, typedLit(p)) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _) + lit(t.toLong << planesPerTable)
    }: _*)
  }
}
