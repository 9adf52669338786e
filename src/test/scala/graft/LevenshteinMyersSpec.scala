package graft

import graft.ops.expr.LevenshteinMyers

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** LevenshteinMyers must equal Spark's built-in levenshtein BIT-FOR-BIT on
  * every input — it replaces the built-in inside q_edit_verify's oracle-
  * gated plan, so any divergence is an oracle failure. Pinned three ways:
  * a brute-force reference DP on randomized unicode strings spanning the
  * 64/128-bit block boundaries, the built-in expression itself via a Spark
  * query over the same pairs, and real fixture text pairs.
  */
class LevenshteinMyersSpec extends SparkSpec {

  /** Textbook two-row DP over code points — the reference semantics. */
  private def reference(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    var prev = Array.tabulate(y.length + 1)(identity)
    val cur = new Array[Int](y.length + 1)
    for (i <- 1 to x.length) {
      cur(0) = i
      for (j <- 1 to y.length) {
        val sub = prev(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(y.length)
  }

  private def myers(a: String, b: String): Int =
    LevenshteinMyers.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel equals the reference DP on randomized strings across block boundaries") {
    val rnd = new scala.util.Random(7)
    // alphabets: tiny (many matches), ASCII, multibyte + astral (code-point
    // semantics — a surrogate pair is ONE edit unit)
    val alphabets = Seq("ab", "abcdefgh XYZ",
      "aé中😀 ") // é, 中, 😀(astral), space
    for (alpha <- alphabets; trial <- 0 until 400) {
      val cps = alpha.codePoints().toArray
      def mk(n: Int) = {
        val sb = new java.lang.StringBuilder
        (0 until n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
        sb.toString
      }
      // lengths clustered on the word boundaries 0,1,63,64,65,127,128,129
      val interesting = Array(0, 1, 2, 5, 63, 64, 65, 127, 128, 129, 200)
      val la = interesting(rnd.nextInt(interesting.length))
      val lb = interesting(rnd.nextInt(interesting.length))
      val (a, b) = (mk(la), mk(lb))
      assert(myers(a, b) == reference(a, b),
        s"mismatch len=($la,$lb) alpha='$alpha' trial=$trial")
      val _ = trial
    }
  }

  test("kernel equals the built-in levenshtein expression on fixture text pairs") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(40)
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select($"a.text".as("t1"), $"b.text".as("t2"))
    val diff = pairs
      .withColumn("builtin", levenshtein($"t1", $"t2"))
      .withColumn("myers", LevenshteinMyers.column($"t1", $"t2"))
      .filter($"builtin" =!= $"myers")
      .count()
    assert(diff == 0L, s"$diff fixture pairs diverge from the built-in")
  }

  test("degenerate edges: empties, equals, one-sided") {
    assert(myers("", "") == 0)
    assert(myers("", "abc") == 3)
    assert(myers("abc", "") == 3)
    assert(myers("same text", "same text") == 0)
    assert(myers("a" * 300, "a" * 300 + "b") == 1)
    assert(myers("a" * 64, "a" * 65) == 1)
    assert(myers("a" * 128, "b" * 128) == 128)
  }
}
