package graft

import graft.ops.DedupOps
import graft.ops.expr.WeightedExpand

import org.apache.spark.sql.functions._

/** The weighted_expand native kernel must equal the HOF formulation it
  * replaced in q_minhash_weighted — capped occurrence indexing over the
  * sorted token stream, output in array_sort (binary) order — on
  * multiplicity edge cases, multi-byte text, and the real fixture corpus. */
class WeightedExpandSpec extends SparkSpec {
  import spark.implicits._

  /** The original HOF form: sort tokens, occurrence = position − first
    * occurrence + 1, keep ≤ cap, tag `tok~occ`, sort the expansion. */
  private def hofExpand(t: org.apache.spark.sql.Column, cap: Int) = {
    val s = array_sort(t)
    // the empty guard replicates the production query's size(t) > 0
    // prefilter (sequence(1, 0) yields a DESCENDING [1, 0] in Spark, and
    // element_at on the empty array throws under ANSI)
    when(size(s) === 0, array().cast("array<string>")).otherwise(
      array_sort(filter(
        transform(sequence(lit(1), size(s)), i => {
          val occ = i.cast("long") - array_position(s, element_at(s, i)) + 1L
          when(occ <= cap.toLong,
            concat(element_at(s, i), lit("~"), occ.cast("string")))
        }),
        e => e.isNotNull)))
  }

  test("kernel equals the HOF formulation on crafted edge cases") {
    val rows = Seq(
      Seq("a", "b", "a", "a", "b", "c"),             // mixed multiplicities
      Seq("x", "x", "x", "x", "x", "x"),             // over the cap
      Seq("solo"),                                   // single token
      Seq.empty[String],                             // empty doc
      Seq("naïve", "naïve", "命", "命", "命", "naïve"), // multi-byte UTF-8
      Seq("t", "t~1", "t~1", "t~"),                  // separator collisions
      (1 to 50).map(i => s"w${i % 7}")               // dense repeats
    ).toDF("t")
    val diverged = rows.select(
      WeightedExpand.column(col("t"), 4).as("k"),
      hofExpand(col("t"), 4).as("h"))
      .filter(not(col("k") === col("h")))
      .collect()
    assert(diverged.isEmpty, diverged.take(2).map(r =>
      s"kernel=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}").mkString("; "))
  }

  test("kernel equals the HOF formulation across the fixture corpus") {
    val docs = graft.queries.Q.tbl(spark, sfDir, "documents")
      .select(DedupOps.tokens(col("text")).as("t"))
    val diverged = docs.select(
      WeightedExpand.column(col("t"), 4).as("k"),
      hofExpand(col("t"), 4).as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(diverged == 0, s"$diverged fixture docs diverged")
  }

  test("cap must stay single-digit (lexicographic = (token, occ) order)") {
    intercept[IllegalArgumentException](
      WeightedExpand.column(col("t"), 10))
  }
}
