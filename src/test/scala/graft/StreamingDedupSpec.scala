package graft

import graft.stream.{DocSig, DupHit, StreamingDedup}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Online MinHash dedup: bounded per-bucket state, batch/stream agreement,
  * cross-micro-batch state persistence, and agreement with the exact batch
  * near-dup pair set on the fixture clone clusters. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val banded = StreamingDedup.bandedDocs(docs).collect().toSeq

  test("stream in two micro-batches == batch twin on the same corpus") {
    // split at the median id: every bucket touched by batch 1 sees its
    // global-minimum member there (all smaller ids arrive first), and
    // batch-2-only buckets get all members in one sorted micro-batch — so
    // stream reps equal batch-twin reps and verdicts must align exactly
    val ids = banded.map(_.doc_id).distinct.sorted
    val mid = ids(ids.size / 2)
    val (first, second) = banded.sortBy(_.doc_id).partition(_.doc_id < mid)
    val mem = MemoryStream[DocSig](spark)
    val q = StreamingDedup.flagDuplicates(mem.toDS())
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    mem.addData(first)
    q.processAllAvailable()
    mem.addData(second)
    q.processAllAvailable()
    val streamed = spark.table("sdedup_out").as[DupHit].collect().toSet
    q.stop()

    val batch = StreamingDedup
      .flagDuplicatesBatch(StreamingDedup.bandedDocs(docs)).collect().toSet
    assert(streamed == batch)
  }

  test("state persists across micro-batches: later arrival flags against earlier rep") {
    // construct two synthetic near-identical docs sharing every band
    val sig = Seq.fill(StreamingDedup.NumPerms)(7L)
    val a = DocSig(1L, 42L, sig)
    val b = DocSig(2L, 42L, sig)
    val mem = MemoryStream[DocSig](spark)
    val q = StreamingDedup.flagDuplicates(mem.toDS())
      .writeStream.format("memory").queryName("sdedup_state")
      .outputMode("append").start()
    mem.addData(Seq(a)); q.processAllAvailable()
    mem.addData(Seq(b)); q.processAllAvailable()
    val hits = spark.table("sdedup_state").as[DupHit].collect().toSeq
    q.stop()
    assert(hits == Seq(DupHit(2L, 1L, 1.0)),
      "the second batch's doc must flag against the first batch's representative")
  }

  test("flagged documents cover the exact ≥0.95 batch pair set") {
    // every true near-dup pair (exact verified Jaccard ≥ 0.95, from the
    // oracle-checked batch query) must have at least one side flagged: at
    // est ≥ 0.5 and 8 shared bands the estimator cannot miss a 0.95 pair
    // whose cluster rep it meets
    val exact = graft.queries.PipelineQueries.all
      .find(_.name == "q_ngram_jaccard").get.fn(spark, sfDir)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    val flagged = StreamingDedup
      .flagDuplicatesBatch(StreamingDedup.bandedDocs(docs))
      .select($"doc_id").as[Long].collect().toSet
    val uncovered = exact.filterNot { case (a, b) =>
      flagged.contains(a) || flagged.contains(b)
    }
    assert(exact.nonEmpty && uncovered.isEmpty,
      s"unflagged true pairs: ${uncovered.take(5).toSeq}")
  }

  test("consolidate yields one best verdict per document") {
    val hits = Seq(
      DupHit(5L, 2L, 0.75), DupHit(5L, 1L, 0.75), DupHit(5L, 3L, 1.0),
      DupHit(6L, 1L, 0.5)).toDF()
    val got = StreamingDedup.consolidate(hits)
      .as[DupHit].collect().toSet
    assert(got == Set(DupHit(5L, 3L, 1.0), DupHit(6L, 1L, 0.5)))
  }
}
