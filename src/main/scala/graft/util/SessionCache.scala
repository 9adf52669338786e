package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session materialization cache for derived artifacts that several
  * queries legitimately share — a real pipeline computes the decoded change
  * log or the verified near-dup pair table once and feeds every downstream
  * consumer from that materialization, rather than re-deriving it per
  * query.
  *
  * Contract:
  *  - sessions are keyed by IDENTITY (two live sessions can never alias);
  *  - entries live until [[invalidate]] or process exit — a cached
  *    DataFrame strongly references its session, so weak keying could not
  *    actually make entries collectable and is not pretended here;
  *  - the artifact's inputs are assumed immutable for the session: callers
  *    that rewrite a source directory in place must [[invalidate]] first
  *    or they read the stale materialization;
  *  - `build` runs at most once per (session, key), synchronized per ENTRY
  *    — a slow materialization job never blocks other sessions or keys.
  */
object SessionCache {

  /** Memoizes one artifact; synchronizes on this instance only, so
    * materialization jobs don't serialize across entries. [[kill]] takes the
    * same lock as [[get]]: an invalidate that races an in-flight build waits
    * for it and then unpersists, and a build that starts after the kill
    * returns a correct-but-uncached frame — either way nothing stays
    * persisted past invalidation. */
  private final class Memo(build: () => DataFrame) {
    private var df: DataFrame = _
    private var dead = false
    def get: DataFrame = synchronized {
      if (dead) build() // invalidated mid-race: correct result, never cached
      else {
        if (df == null) {
          df = build().persist()
          // EAGER materialization: a bare persist() is lazy, and a consumer
          // whose first action reads the cached subtree through a broadcast
          // build can compute it without storing the buffers — every later
          // consumer then silently recomputes the whole artifact. One
          // count() on the cached frame itself stores all partitions before
          // any consumer plan runs.
          df.count()
        }
        df
      }
    }
    def kill(): Unit = synchronized {
      dead = true
      if (df != null) {
        try df.unpersist()
        catch { case _: Exception => () } // session may already be stopped
        df = null
      }
    }
  }

  private val cache =
    new java.util.IdentityHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Memo]]()

  /** The artifact for `key`, materialized (persisted) on first request per
    * session. */
  def getOrMaterialize(spark: SparkSession, key: String)
                      (build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Memo]()
        cache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => new Memo(() => build)).get
  }

  /** Drop (and unpersist) everything cached for `spark` — call when a
    * session ends or its source data is rewritten in place. */
  def invalidate(spark: SparkSession): Unit = {
    val removed = cache.synchronized(cache.remove(spark))
    if (removed != null) removed.values().forEach(_.kill())
  }
}
