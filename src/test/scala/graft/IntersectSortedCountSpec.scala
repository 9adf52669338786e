package graft

import graft.ops.expr.IntersectSortedCount

import org.apache.spark.sql.functions._

/** IntersectSortedCount must equal size(array_intersect(a, b)) on every
  * sorted-distinct input — it replaces that form inside
  * q_minhash_calibration's oracle-gated exact-Jaccard join-back. */
class IntersectSortedCountSpec extends SparkSpec {

  test("merge count equals size(array_intersect) on randomized sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 40).map(i => s"tok$i")
    val rows = Seq.fill(3000) {
      def set() = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .sorted.toArray
      (set(), set())
    }
    val df = rows.toDF("a", "b")
    val diff = df
      .withColumn("builtin", size(array_intersect($"a", $"b")))
      .withColumn("merge", IntersectSortedCount.column($"a", $"b"))
      .filter($"builtin" =!= $"merge")
      .count()
    assert(diff == 0L)
  }

  test("edges: empty sides, identical sets, disjoint sets") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[String], Array("a", "b")),
      (Array("a", "b"), Array.empty[String]),
      (Array("a", "b", "c"), Array("a", "b", "c")),
      (Array("a", "b"), Array("c", "d"))
    ).toDF("a", "b")
    val got = df.select(IntersectSortedCount.column($"a", $"b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 3, 0))
  }
}
