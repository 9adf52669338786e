package graft

import graft.ops.Skew
import graft.queries.Q
import graft.sink.ParquetVectorStore

import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fnv1a64 is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv1a64('foobar') AS h").as[Long].head()
    assert(got == 0x85944171f73967e8L)
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Q.events(spark, sfDir).select("event_type", "value")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n")).orderBy("event_type")
      .as[(String, Long)].collect().toSeq
    val salted = Skew.saltedCount(ev, Seq("event_type"), saltFactor = 8)
      .orderBy("event_type").as[(String, Long)].collect().toSeq
    assert(salted == direct)

    val directSum = ev.groupBy("event_type")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
        .cast("double").as("total"))
      .orderBy("event_type").as[(String, Double)].collect().toSeq
    val saltedSum = Skew.saltedSum(ev, "value", Seq("event_type"), 8)
      .orderBy("event_type").as[(String, Double)].collect().toSeq
    assert(saltedSum == directSum) // decimal partials → exact, order-free
  }

  test("open-vocabulary near-dup path: fallback selected, pairs match mask path") {
    import graft.ops.DedupOps
    // synthetic corpus whose vocabulary EXCEEDS the 256-token mask cap, so
    // the production entry point must select the merge-Jaccard fallback —
    // the path the ASCII fixtures (≤256 distinct tokens) never exercise.
    // Structure: 150 base docs of 30 tokens from a 400-token vocabulary,
    // each followed by a clone missing one token (jaccard 29/30 ≈ 0.967).
    val rnd = new scala.util.Random(5)
    val vocab = (0 until 400).map(i => s"tok$i")
    val docs = (0 until 150).flatMap { i =>
      val toks = rnd.shuffle(vocab).take(30).sorted
      Seq((i.toLong * 2, "en", toks), (i.toLong * 2 + 1, "en", toks.tail))
    }.toDF("doc_id", "lang", "toks")
    assert(DedupOps.closedVocab(docs, "toks").isEmpty,
      "corpus fits the mask cap — not an open-vocabulary fixture")
    val got = DedupOps.nearDupPairs(docs)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // independent all-pairs oracle over the same corpus
    val all = docs.as[(Long, String, Seq[String])].collect()
    val expected = all.combinations(2).collect {
      case Array((ia, _, ta), (ib, _, tb)) =>
        val inter = ta.toSet.intersect(tb.toSet).size
        val jac = inter.toDouble / (ta.size + tb.size - inter)
        (math.min(ia, ib), math.max(ia, ib)) ->
          BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter(_._2 >= 0.95).toMap
    assert(expected.nonEmpty && got == expected,
      s"open-vocab pairs diverged: got ${got.size}, expected ${expected.size}")
    // path equivalence on a shared ≤256-vocab sub-corpus: the mask path
    // (natural selection) and the forced open path must emit identical
    // integers — the "results don't depend on which path ran" contract
    val small = (0 until 60).flatMap { i =>
      val toks = rnd.shuffle(vocab.take(200)).take(25).sorted
      Seq((i.toLong * 2, "en", toks), (i.toLong * 2 + 1, "en", toks.tail))
    }.toDF("doc_id", "lang", "toks")
    assert(DedupOps.closedVocab(small, "toks").isDefined)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    val viaMask = pairSet(DedupOps.nearDupPairs(small))
    val viaMerge = pairSet(DedupOps.nearDupPairs(small, forceOpenVocab = true))
    assert(viaMask.nonEmpty && viaMask == viaMerge)
  }

  test("vector-store compaction preserves current state, shrinks the log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val store = new ParquetVectorStore(dir)
    def points(ids: Seq[String]) = ids.toDF("id")
      .withColumn("vector", array(lit(1.0f)))
      .withColumn("metadata", map(lit("pk"), col("id")))
    store.write(points(Seq("a", "b", "c")), Seq.empty[String].toDF("id"), 0L)
    store.write(points(Seq("b")), Seq("c").toDF("id"), 1L) // update b, delete c
    val before = store.current(spark).select("id").as[String].collect().sorted
    assert(before.toSeq == Seq("a", "b"))
    val logRows = spark.read.parquet(dir).count()
    assert(logRows == 5) // 3 upserts + 1 upsert + 1 delete
    store.compact(spark, batchId = 2L)
    val after = store.current(spark).select("id").as[String].collect().sorted
    assert(after.toSeq == Seq("a", "b"))
    assert(spark.read.parquet(dir).count() == 2) // current state only
  }
}
