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

  /** Per-session memo map plus a retirement flag: an invalidate() that
    * races a concurrent getOrMaterialize could otherwise sweep the map
    * while the get installs a FRESH memo into it — that materialization
    * would stay persisted forever (no later invalidate can reach the
    * orphaned map). The getter re-checks `retired` AFTER its memo call
    * and kills the late install itself. */
  private final class Holder {
    val memos = new java.util.concurrent.ConcurrentHashMap[String, Memo]()
    // access-ordered view for the optional LRU bound; guarded by `this`
    val lru = new java.util.LinkedHashMap[String, Memo](16, 0.75f, true)
    @volatile var retired = false
  }

  /** Optional LRU bound on live (persisted) artifacts per session —
    * `-Dgraft.sessionCache.maxEntries=N` or GRAFT_SESSION_CACHE_MAX.
    * Unbounded by default (a cluster deployment sizes executors for its
    * artifact set); the bound exists for memory-constrained single-JVM
    * suite runs (the sf1 bench keeps every artifact of 260+ queries in
    * ONE driver heap). Eviction unpersists the least-recently-USED
    * artifact; its lineage survives, so a later consumer transparently
    * rebuilds — correctness is unaffected, only recompute cost. */
  private def maxEntries: Int = // re-read per get: cheap, and testable
    sys.props.get("graft.sessionCache.maxEntries")
      .orElse(sys.env.get("GRAFT_SESSION_CACHE_MAX"))
      .map { raw =>
        // a malformed knob must not fail queries AFTER their artifact was
        // already built (a bare .toInt would throw from inside the get):
        // warn once per distinct bad value and fall back to unbounded
        scala.util.Try(raw.trim.toInt).filter(_ > 0).getOrElse {
          if (warnedBadBound.add(raw))
            System.err.println(s"[graft] ignoring invalid session-cache " +
              s"bound '$raw' (set -Dgraft.sessionCache.maxEntries / " +
              s"GRAFT_SESSION_CACHE_MAX to a positive integer); " +
              s"cache stays unbounded")
          Int.MaxValue
        }
      }.getOrElse(Int.MaxValue)

  private val warnedBadBound =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val cache = new java.util.IdentityHashMap[SparkSession, Holder]()

  /** The artifact for `key`, materialized (persisted) on first request per
    * session. */
  def getOrMaterialize(spark: SparkSession, key: String)
                      (build: => DataFrame): DataFrame = {
    val holder = cache.synchronized {
      var h = cache.get(spark)
      if (h == null) { h = new Holder; cache.put(spark, h) }
      h
    }
    val memo = holder.memos.computeIfAbsent(key, _ => new Memo(() => build))
    val df = memo.get
    // late install into a map invalidate() already retired: unpersist it
    // ourselves (kill is idempotent; the returned frame stays valid,
    // merely uncached — the same contract as building after a kill)
    if (holder.retired) memo.kill()
    else holder.synchronized {
      holder.lru.put(key, memo) // marks `key` most-recently-used
      val it = holder.lru.entrySet().iterator()
      while (holder.lru.size > maxEntries && it.hasNext) {
        val eldest = it.next()
        if (eldest.getKey != key) { // never evict the entry just served
          eldest.getValue.kill()
          holder.memos.remove(eldest.getKey)
          it.remove()
        }
      }
    }
    df
  }

  /** Drop (and unpersist) everything cached for `spark` — call when a
    * session ends or its source data is rewritten in place. */
  def invalidate(spark: SparkSession): Unit = {
    val removed = cache.synchronized(cache.remove(spark))
    if (removed != null) {
      removed.retired = true // installs from here on self-kill in the getter
      removed.memos.values().forEach(_.kill())
      removed.synchronized(removed.lru.clear())
    }
  }
}
