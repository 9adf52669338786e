package graft

import graft.util.SessionCache

import org.apache.spark.storage.StorageLevel

import java.util.concurrent.CountDownLatch

/** Lifecycle contract of the per-session artifact cache: one build per key,
  * invalidate unpersists, and an invalidate racing an in-flight build never
  * leaks a persisted frame (the per-Memo lock serializes the two). */
class SessionCacheSpec extends SparkSpec {

  test("getOrMaterialize builds once and persists; invalidate unpersists") {
    var builds = 0
    def get() = SessionCache.getOrMaterialize(spark, "scs-basic") {
      builds += 1
      spark.range(10).toDF("n")
    }
    val df = get()
    assert(get() eq df)
    assert(builds == 1)
    assert(df.storageLevel != StorageLevel.NONE)
    SessionCache.invalidate(spark)
    assert(df.storageLevel == StorageLevel.NONE)
    // a fresh request after invalidation builds (and caches) anew
    assert(get() ne df)
    assert(builds == 2)
    SessionCache.invalidate(spark)
  }

  test("the optional LRU bound evicts the least-recently-USED artifact; " +
    "an evicted key rebuilds transparently on its next request") {
    val builds = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    // distinct row counts per key: identical plans would ALIAS in Spark's
    // CacheManager (unpersisting one clears the shared buffers of all)
    val rows = Map("a" -> 5, "b" -> 6, "c" -> 7)
    def get(k: String) = SessionCache.getOrMaterialize(spark, s"scs-lru-$k") {
      builds(k) += 1
      spark.range(rows(k).toLong).toDF("n")
    }
    sys.props("graft.sessionCache.maxEntries") = "2"
    try {
      val a = get("a"); get("b")
      get("a") // touch a: b becomes the LRU entry
      val c = get("c") // over the bound: evicts b, keeps a and c
      assert(a.storageLevel != StorageLevel.NONE, "recently-used a evicted")
      assert(c.storageLevel != StorageLevel.NONE)
      assert(builds("a") == 1 && builds("b") == 1 && builds("c") == 1)
      get("b") // evicted: rebuilds (and evicts a, the new LRU)
      assert(builds("b") == 2, "evicted key did not rebuild")
      get("a")
      assert(builds("a") == 2, "a should have been evicted by b's return")
    } finally {
      sys.props.remove("graft.sessionCache.maxEntries")
      SessionCache.invalidate(spark)
    }
  }

  test("first get() stores the cache buffers eagerly, before any consumer") {
    // Regression: a bare persist() is lazy — a consumer whose first action
    // reads the cached subtree through a broadcast build computes it
    // WITHOUT storing the buffers, and every later consumer silently
    // recomputes the artifact. getOrMaterialize must store all partitions
    // up front.
    val df = SessionCache.getOrMaterialize(spark, "scs-eager") {
      spark.range(1000).toDF("n")
    }
    val cached = spark.sparkContext.getRDDStorageInfo
      .filter(_.numCachedPartitions > 0)
    assert(cached.nonEmpty,
      "cache buffers must be stored by getOrMaterialize itself, not lazily")
    SessionCache.invalidate(spark)
  }

  test("a storage-level drop of the cached artifact is survivable: " +
    "consumers recompute through the intact lineage") {
    // The failure mode this cache exists to avoid: the hot-path artifacts
    // (near-dup pair tables, the weighted expansion, oriented edge lists)
    // were previously localCheckpoint(true)'d — lineage TRUNCATED — so
    // losing an executor's storage mid-query failed the job
    // unrecoverably. SessionCache persists with lineage intact: simulate
    // total loss of the cached blocks and assert a consumer still
    // produces the artifact (recomputed, not errored).
    val df = SessionCache.getOrMaterialize(spark, "scs-drop") {
      spark.range(100).toDF("n").withColumn("sq", org.apache.spark.sql.functions.expr("n * n"))
    }
    assert(df.storageLevel != StorageLevel.NONE)
    // simulated storage-level drop: every cached block of the artifact
    // vanishes (the strongest form of executor-storage loss)
    df.unpersist(blocking = true)
    assert(df.storageLevel == StorageLevel.NONE)
    val sum = df.agg(org.apache.spark.sql.functions.sum("sq")).head().getLong(0)
    assert(sum == (0 until 100).map(i => i.toLong * i).sum,
      "consumer failed to recompute the dropped artifact")
    SessionCache.invalidate(spark)
  }

  test("invalidate racing an in-flight build waits and unpersists it") {
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var built: org.apache.spark.sql.DataFrame = null
    val builder = new Thread(() => {
      built = SessionCache.getOrMaterialize(spark, "scs-race") {
        started.countDown()
        release.await() // hold the build mid-flight
        spark.range(5).toDF("n")
      }
    })
    builder.start()
    started.await()
    // invalidate while the build holds the Memo lock: it must block until
    // the build completes, then unpersist — not skip a "not yet built" entry
    val invalidator = new Thread(() => SessionCache.invalidate(spark))
    invalidator.start()
    Thread.sleep(100) // give invalidate time to reach the Memo lock
    release.countDown()
    builder.join(30000); invalidator.join(30000)
    assert(!builder.isAlive && !invalidator.isAlive)
    assert(built != null)
    assert(built.storageLevel == StorageLevel.NONE,
      "the raced build's frame must not stay persisted")
  }
}
