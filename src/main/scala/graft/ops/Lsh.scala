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
  def probeBuckets(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val exact = bucket(vec, planes)
    val flipped = planes.indices.map { i =>
      val pre = substring(exact, 1, i)
      val bit = substring(exact, i + 1, 1)
      val post = substring(exact, i + 2, planes.size - i - 1)
      concat(pre, when(bit === "1", lit("0")).otherwise(lit("1")), post)
    }
    array(exact +: flipped: _*)
  }
}
