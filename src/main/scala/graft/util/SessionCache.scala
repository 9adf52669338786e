package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Per-session materialization cache for derived artifacts that several
  * queries legitimately share — a real pipeline computes the decoded change
  * log or the verified near-dup pair table once and feeds every downstream
  * consumer from that materialization, rather than re-deriving it per
  * query. Weak session keys: entries (and their pinned persisted blocks)
  * become collectable with the session, and identity keying cannot alias
  * two live sessions. */
object SessionCache {

  private val cache =
    new java.util.WeakHashMap[SparkSession, mutable.Map[String, DataFrame]]()

  /** The artifact for `key`, materialized (persisted) on first request per
    * session; `build` runs at most once per (session, key). */
  def getOrMaterialize(spark: SparkSession, key: String)
                      (build: => DataFrame): DataFrame =
    cache.synchronized {
      val perSession = {
        val existing = cache.get(spark)
        if (existing != null) existing
        else {
          val m = mutable.Map.empty[String, DataFrame]
          cache.put(spark, m)
          m
        }
      }
      perSession.getOrElseUpdate(key, build.persist())
    }
}
