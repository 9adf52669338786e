package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo of fixture TABLE READERS (the analyzed `spark.read
  * .parquet(path)` frame) — METADATA caching only, no persist(), no rows:
  * every action over the returned frame still scans the parquet input.
  *
  * Why (round 15, guide §6 "file listing"): every query invocation paid
  * file listing + footer schema inference for each table it touches, a
  * fixed ~tens-of-ms driver-side cost per (query × table) that the 293-
  * query bench pays hundreds of times per pass over an immutable fixture
  * directory. Spark caches the listing per DataFrameReader, not across
  * reads; memoizing the DataFrame itself (immutable, freely reusable
  * within its session) removes the repeat. Keyed by session IDENTITY
  * (the SessionCache convention — a frame must never outlive or cross
  * sessions) and by path; entries die with the process, so every fresh
  * JVM still derives everything from the parquet inputs.
  */
object TableCache {

  private val perSession =
    new java.util.IdentityHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def parquet(spark: SparkSession, path: String): DataFrame = {
    val m = perSession.synchronized {
      var x = perSession.get(spark)
      if (x == null) {
        x = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        perSession.put(spark, x)
      }
      x
    }
    m.computeIfAbsent(path, p => spark.read.parquet(p))
  }
}
