package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType,
  StringType, StructField, StructType}

import java.nio.charset.StandardCharsets.UTF_8

/** LSN-monotonic MERGE table store: the streaming realization of the
  * `q_merge_upsert` batch query. Holds the current relational state of the
  * mapped table (one row per pk, plus tombstones); [[merge]] applies one
  * micro-batch of change envelopes with last-writer-wins-by-LSN semantics.
  *
  * Why LSN-monotonic rather than batch-ordered: under at-least-once
  * delivery a restarted stream may re-deliver any suffix of the log, and a
  * file source may interleave chunks out of order. A row only ever moves
  * to a HIGHER LSN, so re-applying any already-applied change is a no-op
  * and applying chunks in either order converges to the same state —
  * exactly-once effect without coordination (the same contract the
  * reference relies on for idempotent vector upserts,
  * internal/pipeline/pipeline.go:173-179).
  *
  * == Storage layout: bucketed deltas under an atomic manifest ==
  *
  * The earlier design rewrote the full snapshot every micro-batch — at
  * 100 TB table state with a 500 ms trigger that is O(state)/trigger write
  * amplification, the classic streaming-sink scale killer. This store
  * writes O(micro-batch) per trigger instead:
  *
  *   path/manifest-SEQ.txt     commit log head (atomic rename install)
  *   path/data/delta-SEQ/      one per merge: the compacted batch,
  *                             partitionBy(bucket = pmod(hash(pk), B))
  *   path/data/base-SEQ/       per-bucket compactions (also bucket-
  *                             partitioned); a bucket's state = its base
  *                             file (if any) + its live deltas, collapsed
  *                             last-writer-wins at read time (merge-on-read)
  *
  * A merge (1) writes the batch as one new bucket-partitioned delta dir,
  * (2) compacts any bucket whose live-delta count exceeds
  * `maxDeltasPerBucket` (bounding read fan-in AND the small-file count),
  * (3) commits by atomically renaming the next manifest into place, then
  * (4) vacuums dirs no retained manifest references. Crash at any point
  * leaves either the old manifest (orphan delta dir, overwritten by the
  * replayed batch) or the new one (vacuum backlog, cleared next merge) —
  * never a torn state; readers resolve exactly one manifest. Untouched
  * buckets' files are never rewritten (MergeStreamSpec pins this
  * byte-for-byte).
  *
  * == Tombstones and GC ==
  *
  * Tombstones are retained (with the delete's LSN) so a late re-delivered
  * upsert that PRECEDED the delete cannot resurrect the row. [[gc]] takes
  * the source's replay horizon — the slot's confirmed_flush, below which
  * the server never re-delivers — records it in the manifest, and drops
  * tombstones at or below it during a full compaction. Safety is enforced
  * belt-and-braces: [[merge]] also FILTERS OUT any arriving change with
  * lsn ≤ the recorded horizon, so even a contract-violating re-delivery of
  * a pre-horizon upsert cannot resurrect a GC'd delete (spec-pinned).
  *
  * Scale shape: per trigger one shuffle sized by the micro-batch (the
  * within-batch pk compaction) and one bucket-partitioned O(batch) write;
  * compaction touches single buckets, amortized O(bucket/maxDeltas) per
  * merge. Reads prune to live dirs via the manifest and to bucket
  * partitions via partition pruning, then collapse with one window keyed
  * by pk — the merge-on-read half of the standard LSM trade.
  */
final class ParquetTableStore(path: String,
                              table: String = "public.documents",
                              attrCols: Seq[String] =
                                Seq("title", "content", "created_at", "author"),
                              numBuckets: Int = 32,
                              maxDeltasPerBucket: Int = 4,
                              keepManifests: Int = 4)
  extends Serializable {

  require(numBuckets > 0 && maxDeltasPerBucket > 0 && keepManifests > 0)

  private val attrs = attrCols
  private def dataDir = s"$path/data"

  /** On-disk row schema (explicit everywhere: schema inference dies on
    * empty compaction outputs, and partition-column types must not drift). */
  private def rowSchema: StructType = StructType(
    Seq(StructField("pk", StringType), StructField("lsn", LongType),
      StructField("deleted", BooleanType)) ++
      attrs.map(StructField(_, StringType)) :+
      StructField("bucket", IntegerType))

  private def fs(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- manifest: the store's atomically-installed commit head ----------

  /** `base`/`deltas` name dirs under `data/`; a bucket's live state is
    * base (oldest) then deltas in commit order. `gc` is the replay
    * horizon: changes at or below it are refused, tombstones at or below
    * it are dropped at compaction. */
  private case class Manifest(seq: Int, gc: Long,
                              base: Map[Int, String],
                              deltas: Map[Int, List[String]]) {
    def liveDirs: Set[String] = base.values.toSet ++ deltas.values.flatten
  }

  private def manifestPath(seq: Int) =
    new org.apache.hadoop.fs.Path(f"$path/manifest-$seq%08d.txt")

  private val ManifestName = raw"manifest-(\d{8})\.txt".r

  private def listManifestSeqs(f: org.apache.hadoop.fs.FileSystem): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(s) => Some(s.toInt)
      case _ => None
    }).sorted
  }

  private def render(m: Manifest): String = {
    val sb = new StringBuilder
    sb.append(s"buckets $numBuckets\n")
    sb.append(s"gc ${m.gc}\n")
    val ks = (m.base.keySet ++ m.deltas.keySet).toSeq.sorted
    ks.foreach { k =>
      val b = m.base.getOrElse(k, "-")
      val d = m.deltas.getOrElse(k, Nil) match {
        case Nil => "-"; case ds => ds.mkString(",")
      }
      sb.append(s"bucket $k $b $d\n")
    }
    sb.toString
  }

  private def parse(seq: Int, text: String): Manifest = {
    var gc = -1L
    var base = Map.empty[Int, String]
    var deltas = Map.empty[Int, List[String]]
    text.split('\n').map(_.trim).filter(_.nonEmpty).foreach { line =>
      line.split(' ') match {
        case Array("buckets", b) =>
          require(b.toInt == numBuckets,
            s"store at $path was written with ${b.toInt} buckets; " +
              s"this instance is configured with $numBuckets — the bucket " +
              "function must not change under an existing store")
        case Array("gc", g) => gc = g.toLong
        case Array("bucket", k, b, d) =>
          val kk = k.toInt
          if (b != "-") base += kk -> b
          if (d != "-") deltas += kk -> d.split(',').toList
        case other => sys.error(s"bad manifest line: ${other.mkString(" ")}")
      }
    }
    Manifest(seq, gc, base, deltas)
  }

  private def loadManifest(spark: SparkSession): Option[Manifest] = {
    val f = fs(spark)
    listManifestSeqs(f).lastOption.map { seq =>
      val in = f.open(manifestPath(seq))
      val text = try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
        new String(bytes.toByteArray, UTF_8)
      } finally in.close()
      parse(seq, text)
    }
  }

  /** Atomic commit: write `.tmp`, rename into place. A reader lists
    * committed manifests only, so it never observes the torn write. */
  private def commitManifest(spark: SparkSession, m: Manifest): Unit = {
    val f = fs(spark)
    val tmp = new org.apache.hadoop.fs.Path(f"$path/manifest-${m.seq}%08d.txt.tmp")
    val out = f.create(tmp, true)
    try out.write(render(m).getBytes(UTF_8)) finally out.close()
    f.delete(manifestPath(m.seq), false) // orphan from a crashed commit
    if (!f.rename(tmp, manifestPath(m.seq)))
      throw new java.io.IOException(s"merge: could not commit manifest ${m.seq}")
  }

  /** Drop manifests beyond the retention window, then every data dir no
    * retained manifest references — covers crash-orphaned deltas and
    * superseded bases alike. Retention exists for concurrent readers: a
    * snapshot resolved against any retained manifest stays readable. */
  private def vacuum(spark: SparkSession): Unit = {
    val f = fs(spark)
    val seqs = listManifestSeqs(f)
    seqs.dropRight(keepManifests).foreach(s => f.delete(manifestPath(s), false))
    val kept = listManifestSeqs(f)
    val referenced = kept.flatMap { seq =>
      val in = f.open(manifestPath(seq))
      val text = try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
        new String(bytes.toByteArray, UTF_8)
      } finally in.close()
      parse(seq, text).liveDirs
    }.toSet
    val dd = new org.apache.hadoop.fs.Path(dataDir)
    if (f.exists(dd))
      f.listStatus(dd).foreach { st =>
        if (!referenced.contains(st.getPath.getName))
          f.delete(st.getPath, true)
      }
  }

  // ---- read path --------------------------------------------------------

  def exists(spark: SparkSession): Boolean =
    listManifestSeqs(fs(spark)).nonEmpty

  /** Union of every live dir, pruned to the buckets each dir is live FOR
    * (a delta stays on disk until all its buckets compact away; partition
    * pruning keeps dead bucket partitions unread). */
  private def unionLive(spark: SparkSession, m: Manifest): DataFrame = {
    val byDir = scala.collection.mutable.Map.empty[String, Set[Int]]
    m.base.foreach { case (k, d) => byDir(d) = byDir.getOrElse(d, Set.empty) + k }
    m.deltas.foreach { case (k, ds) =>
      ds.foreach(d => byDir(d) = byDir.getOrElse(d, Set.empty) + k) }
    val parts = byDir.toSeq.sortBy(_._1).map { case (d, ks) =>
      spark.read.schema(rowSchema).parquet(s"$dataDir/$d")
        .filter(col("bucket").isInCollection(ks))
    }
    parts.reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowSchema))
  }

  /** Merge-on-read collapse: latest change per pk wins. Ties (the same
    * (pk,lsn) re-delivered into two deltas) carry identical content, so
    * any winner is the same row. */
  private def collapse(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pk")).orderBy(col("lsn").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "bucket")
  }

  /** Full snapshot including tombstones: pk, lsn, deleted, attrs. */
  def snapshot(spark: SparkSession): DataFrame =
    loadManifest(spark) match {
      case Some(m) => collapse(unionLive(spark, m))
      case None => collapse(unionLive(spark, Manifest(0, -1L, Map.empty, Map.empty)))
    }

  /** Live rows (tombstones filtered). */
  def current(spark: SparkSession): DataFrame =
    snapshot(spark).filter(!col("deleted")).drop("deleted")

  /** The recorded replay horizon (−1 before any [[gc]]). */
  def gcHorizon(spark: SparkSession): Long =
    loadManifest(spark).map(_.gc).getOrElse(-1L)

  /** Operational stats from the manifest alone (no data reads): one row
    * per bucket with data — (bucket, has_base, n_deltas) — the numbers an
    * operator watches for compaction pressure and read fan-in. */
  def stats(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = loadManifest(spark).getOrElse(Manifest(0, -1L, Map.empty, Map.empty))
    (m.base.keySet ++ m.deltas.keySet).toSeq.sorted
      .map(k => (k, m.base.contains(k), m.deltas.getOrElse(k, Nil).size))
      .toDF("bucket", "has_base", "n_deltas")
  }

  // ---- write path -------------------------------------------------------

  /** Collapse one micro-batch of raw change envelopes (RowChange columns)
    * to its effective latest-per-pk form: mapped table only, null-After
    * updates skipped, blind deletes (no REPLICA IDENTITY old tuple → empty
    * pk) dropped — they identify no row (reference:
    * internal/cdc/postgres/postgres.go:602-619). */
  private def compactBatch(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pk")).orderBy(col("lsn").desc)
    changes
      .filter(concat(col("schema"), lit("."), col("table")) === table &&
        (col("op") === "d" || col("after").isNotNull) &&
        col("primary_key") =!= "")
      .select(Seq(col("primary_key").as("pk"), col("lsn").cast("long").as("lsn"),
        (col("op") === "d").as("deleted")) ++
        attrs.map(c => element_at(col("after"), c).cast("string").as(c)): _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Apply one micro-batch. Re-delivery-safe and order-safe: a stored row
    * is replaced only by a change with a strictly higher LSN, and changes
    * at or below the GC horizon are refused outright. */
  def merge(changes: DataFrame): Unit = {
    val spark = changes.sparkSession
    val m = loadManifest(spark).getOrElse(Manifest(0, -1L, Map.empty, Map.empty))
    val batch = compactBatch(changes)
      .filter(col("lsn") > lit(m.gc))
      .withColumn("bucket", pmod(hash(col("pk")), lit(numBuckets)))
      .persist()
    try {
      // empty triggers (timer fired, no data) must not commit a manifest
      if (batch.isEmpty) return
      val seq = m.seq + 1
      val deltaName = f"delta-$seq%08d"
      // mode=overwrite clobbers an orphan of the same seq left by a crash
      // between delta write and manifest commit (that batch is replaying
      // through this very call). repartition co-locates each bucket into
      // one task first: a dynamic-partition write otherwise emits a file
      // per (task × bucket) — the small-file explosion — where this emits
      // exactly one file per touched bucket per delta.
      batch.repartition(col("bucket"))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$dataDir/$deltaName")
      val touched = batch.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet // ≤ numBuckets values
      var next = m.copy(seq = seq,
        deltas = touched.foldLeft(m.deltas)((d, k) =>
          d.updated(k, d.getOrElse(k, Nil) :+ deltaName)))
      val over = touched.filter(k =>
        next.deltas.getOrElse(k, Nil).size > maxDeltasPerBucket)
      if (over.nonEmpty) next = compactBuckets(spark, next, over)
      commitManifest(spark, next)
      vacuum(spark)
    } finally batch.unpersist()
  }

  /** Rewrite `buckets` as one base dir: their live dirs collapsed LWW,
    * tombstones at or below the GC horizon dropped (no pre-horizon change
    * can arrive to need blocking — [[merge]] refuses them). Other
    * buckets' files are untouched by construction. */
  private def compactBuckets(spark: SparkSession, m: Manifest,
                             buckets: Set[Int]): Manifest = {
    val scoped = Manifest(m.seq, m.gc,
      m.base.filter(kv => buckets(kv._1)), m.deltas.filter(kv => buckets(kv._1)))
    val baseName = f"base-${m.seq}%08d"
    collapse(unionLive(spark, scoped))
      .filter(!col("deleted") || col("lsn") > lit(m.gc))
      .withColumn("bucket", pmod(hash(col("pk")), lit(numBuckets)))
      .repartition(col("bucket")) // one file per compacted bucket
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dataDir/$baseName")
    Manifest(m.seq, m.gc,
      buckets.foldLeft(m.base)((b, k) => b.updated(k, baseName)),
      m.deltas -- buckets)
  }

  /** Record the source's replay horizon (slot confirmed_flush: nothing at
    * or below it will ever be delivered again) and compact EVERY bucket,
    * dropping tombstones at or below it — the periodic maintenance pass.
    * Monotonic: a lower horizon than the recorded one is a no-op raise. */
  def gc(spark: SparkSession, horizon: Long): Unit = {
    val m = loadManifest(spark).getOrElse(Manifest(0, -1L, Map.empty, Map.empty))
    val h = math.max(m.gc, horizon)
    val all = m.base.keySet ++ m.deltas.keySet
    var next = m.copy(seq = m.seq + 1, gc = h)
    if (all.nonEmpty) next = compactBuckets(spark, next, all)
    commitManifest(spark, next)
    vacuum(spark)
  }
}

/** Structured-Streaming runner: change envelopes → [[ParquetTableStore]]
  * via foreachBatch, checkpointed. The relational-state sibling of
  * [[CdcStream.run]] (which maintains the vector store). */
object MergeStream {

  /** `gcHorizon`, when given, turns tombstone GC into an operated loop:
    * every `gcEveryBatches` micro-batches the store GCs up to the
    * provider's current value — for the live topology that is the receive
    * loop's durably-acked position (`WalReceiveLoop.flushedLsn`), below
    * which the slot never re-delivers. The provider may regress or lag
    * freely: [[ParquetTableStore.gc]] is monotonic. */
  def run(spark: SparkSession, sourceDir: String, storeDir: String,
          checkpointDir: String, flushIntervalMs: Long = 500,
          table: String = "public.documents",
          attrCols: Seq[String] =
            Seq("title", "content", "created_at", "author"),
          gcHorizon: Option[() => Long] = None,
          gcEveryBatches: Int = 64): StreamingQuery = {
    require(gcEveryBatches > 0)
    val store = new ParquetTableStore(storeDir, table, attrCols)
    var sinceGc = 0
    CdcStream.readEnvelopes(spark, sourceDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(flushIntervalMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.merge(batch)
        gcHorizon.foreach { h =>
          sinceGc += 1
          if (sinceGc >= gcEveryBatches) {
            sinceGc = 0
            val horizon = h()
            if (horizon > store.gcHorizon(spark)) store.gc(spark, horizon)
          }
        }
      }
      .start()
  }
}
