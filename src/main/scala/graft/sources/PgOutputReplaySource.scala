package graft.sources

import graft.model.Types

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.collection.mutable

/** DataSourceV2 seam for the reference's pgoutput replication source (S1
  * option A — reference: internal/cdc/postgres/postgres.go:95-221). This
  * implementation replays committed change envelopes (JSON lines in
  * [[Types.rowChangeSchema]] shape) from files *as if from a replication
  * slot*: files are WAL-segment-like units consumed in name order, the
  * stream offset is the count of consumed segments (the `statusLSN`
  * analogue, tracked by Spark's checkpoint instead of a standby status
  * update — postgres.go:181), `start_lsn` skips rows at or below a resume
  * position (postgres.go:152-158), and `max_files_per_trigger` bounds a
  * micro-batch (the size half of the reference's hybrid batching, B1).
  *
  * A live wire implementation drops into this seam by replacing
  * [[PgOutputReplayStream]]'s directory listing with a replication-socket
  * receive loop and the per-file reader with a pgoutput message decoder —
  * the Table/Scan/Offset plumbing, schema, and restart semantics stay.
  * For exact cross-restart replay, envelope file names must be
  * monotonically increasing (like WAL segment names).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-pgoutput")
  *     .option("path", dir).option("start_lsn", 0).load()
  * }}}
  */
class PgOutputReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pgoutput"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Types.rowChangeSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PgOutputReplayTable(new CaseInsensitiveStringMap(properties))
}

final class PgOutputReplayTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String =
    s"graft-pgoutput(${options.get("path")})"

  override def schema(): StructType = Types.rowChangeSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = Types.rowChangeSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PgOutputReplayStream(
          Option(opts.get("path")).getOrElse(
            throw new IllegalArgumentException("graft-pgoutput requires 'path'")),
          opts.getLong("start_lsn", 0L),
          opts.getInt("max_files_per_trigger", 16),
          // "json" envelope lines (default) or "pgoutput" binary frames —
          // the latter decodes the real replication wire format
          opts.getOrDefault("wire_format", "json"))
    }
}

/** Offset = number of envelope segments consumed, serialized as its decimal
  * string (the slot-position analogue). */
final case class SegmentOffset(segments: Int) extends Offset {
  override def json(): String = segments.toString
}

final class PgOutputReplayStream(dir: String, startLsn: Long,
                                 maxFilesPerTrigger: Int,
                                 wireFormat: String = "json")
  extends MicroBatchStream with SupportsAdmissionControl {

  /** Segments in consumption order; grows monotonically as the directory
    * fills (the listing is re-taken per latestOffset call, new names
    * appended in sorted order — a replication socket would push instead). */
  private val seen = mutable.LinkedHashSet[String]()

  /** Retirement state from the directory's `_retired.txt` marker
    * ([[graft.stream.SegmentRetention]]): `retired` segments — a strict
    * NAME-ORDER PREFIX of everything ever created — have been deleted
    * after the merge store's live GC horizon passed them. The offset
    * domain stays "count of segments ever created": a retired index plans
    * NO partition (an empty replay — exact, because every retired change
    * is at or below the refusal horizon), and live files take virtual
    * index `retired + position`. */
  private var retired: Long = 0L
  private var highestRetired: String = ""

  /** Session Hadoop conf captured as serializable entries — executors'
    * readers rebuild it so fs.* settings (credentials, endpoints) reach
    * object-store paths; a bare `new Configuration()` would drop them. */
  private val hadoopConfEntries: Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      .asScala.map(e => (e.getKey, e.getValue)).toArray
  }

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    PgOutputReplayStream.buildConf(hadoopConfEntries)

  private def refresh(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    if (fs.exists(p)) {
      val files = fs.listStatus(p).filter(_.isFile)
        // hidden-file convention applies to the file NAME only (a parent
        // directory like /root/.cache must not blank the whole source)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .map(_.getPath.toString)
        .sorted
      // Marker read AFTER the listing: a file deleted before we listed was
      // covered by a marker written before the deletion, so reading the
      // marker second can only see a count ≥ the listing's gap — never a
      // listing missing files the marker hasn't counted yet.
      val (r, h) = graft.stream.SegmentRetention.readMarker(fs, dir)
      if (r > retired) { retired = r; highestRetired = h }
      if (highestRetired.nonEmpty) {
        // drop retired names from both the fresh listing and the in-memory
        // prefix — the marker now accounts for them in the offset domain
        seen.filterInPlace(f => nameOf(f) > highestRetired)
        files.foreach(f => if (nameOf(f) > highestRetired) seen += f)
      } else files.foreach(seen += _)
    }
  }

  private def nameOf(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  /** Offset-domain size: segments ever created = retired prefix + live. */
  private def total: Long = retired + seen.size

  override def initialOffset(): Offset = SegmentOffset(0)

  /** Rate limiting goes through [[SupportsAdmissionControl]]: the engine
    * passes the RESTORED start offset, so a restarted query can never see a
    * rate-limited latest offset below what its checkpoint already committed
    * (a plain latestOffset() is called before the offset log is
    * deserialized — an in-memory floor cannot protect the first
    * post-restart trigger). */
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(math.max(maxFilesPerTrigger, 1))

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    refresh()
    val start = startOffset.asInstanceOf[SegmentOffset].segments
    val cap = limit match {
      case f: ReadMaxFiles => f.maxFiles()
      case _ => Int.MaxValue
    }
    // Long arithmetic: under ReadLimit.allAvailable (Trigger.Once/
    // AvailableNow) cap is Int.MaxValue, and `start + cap` in Int overflows
    // negative for any start > 0 — the min would collapse to `start` and the
    // stream would silently stop advancing past the restored offset.
    SegmentOffset(
      math.max(math.min(total, start.toLong + cap), start.toLong).toInt)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def reportLatestOffset(): Offset = SegmentOffset(total.toInt)

  override def deserializeOffset(json: String): Offset =
    SegmentOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SegmentOffset].segments
    val until = end.asInstanceOf[SegmentOffset].segments
    if (until > total) refresh()
    // indices below `retired` plan nothing: those segments were deleted
    // below the merge store's refusal horizon, so their replay is an
    // empty batch by construction (a restored checkpoint replaying a
    // retired range converges without the files)
    val f = math.max(from - retired, 0L).toInt
    val u = math.max(until - retired, 0L).toInt
    seen.slice(f, u).toArray
      .map(p => EnvelopeSegment(p, startLsn, wireFormat): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    EnvelopeReaderFactory(hadoopConfEntries)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

object PgOutputReplayStream {
  def buildConf(entries: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

final case class EnvelopeSegment(path: String, startLsn: Long,
                                 wireFormat: String = "json")
  extends InputPartition

final case class EnvelopeReaderFactory(hadoopConfEntries: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val seg = partition.asInstanceOf[EnvelopeSegment]
    val conf = PgOutputReplayStream.buildConf(hadoopConfEntries)
    if (seg.wireFormat == "pgoutput")
      new BinarySegmentReader(seg.path, seg.startLsn, conf)
    else
      new EnvelopeSegmentReader(seg.path, seg.startLsn, conf)
  }
}

/** Decodes one BINARY pgoutput segment ([[PgOutputWire]] framing) into
  * [[Types.rowChangeSchema]] rows, applying the same `start_lsn` resume
  * filter as the JSON path. Commit-time emission happens inside the wire
  * decoder, so only committed changes ever reach Spark. */
final class BinarySegmentReader(path: String, startLsn: Long,
                                conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private val changes: Iterator[PgOutputWire.Change] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val bytes =
      try {
        // one segment is buffered per partition; past 2 GiB the Int cast
        // would overflow (truncated read) — fail with the remedy instead
        val len = fs.getFileStatus(p).getLen
        require(len <= Int.MaxValue,
          s"segment $path is $len bytes; split segments above 2 GiB — " +
            "the replay reader buffers one whole segment per partition")
        val buf = new Array[Byte](len.toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
    PgOutputWire.decodeSegment(bytes).iterator.filter(_.lsn > startLsn)
  }

  private var row: InternalRow = _

  override def next(): Boolean =
    if (changes.hasNext) { row = toRow(changes.next()); true } else false

  private def utf8Map(m: Option[Map[String, String]]): ArrayBasedMapData =
    m.map { kv =>
      val keys = kv.keys.toArray[Any].map(k => UTF8String.fromString(k.asInstanceOf[String]))
      val vals = kv.values.toArray.map(v =>
        if (v == null) null else UTF8String.fromString(v))
      new ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray[Any]),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray[Any]))
    }.orNull

  private def toRow(c: PgOutputWire.Change): InternalRow =
    InternalRow(
      UTF8String.fromString(c.op), UTF8String.fromString(c.schema),
      UTF8String.fromString(c.table), UTF8String.fromString(c.primaryKey),
      utf8Map(c.before), utf8Map(c.after),
      UTF8String.fromString(c.lsn.toString))

  override def get(): InternalRow = row

  override def close(): Unit = ()
}

/** Decodes one envelope segment: JSON lines → [[Types.rowChangeSchema]]
  * rows, skipping rows at or below `startLsn` (resume semantics,
  * reference: postgres.go:152-158). The decode mirrors the reference's
  * tuple rules (S3): absent/null map values stay null, all values are
  * strings. */
final class EnvelopeSegmentReader(path: String, startLsn: Long,
                                  conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val p = new org.apache.hadoop.fs.Path(path)
  private val in = p.getFileSystem(conf).open(p)
  private val lines = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) {
        val node = mapper.readTree(line)
        val lsn = node.path("lsn").asText("0")
        if (lsn.isEmpty || java.lang.Long.parseLong(lsn) > startLsn) {
          row = decode(node)
          return true
        }
      }
      line = lines.readLine()
    }
    false
  }

  private def utf8(node: com.fasterxml.jackson.databind.JsonNode,
                   field: String): UTF8String = {
    val v = node.path(field)
    if (v.isMissingNode || v.isNull) null else UTF8String.fromString(v.asText)
  }

  private def mapOf(node: com.fasterxml.jackson.databind.JsonNode,
                    field: String): ArrayBasedMapData = {
    val v = node.path(field)
    if (!v.isObject) return null
    val keys = mutable.ArrayBuffer[UTF8String]()
    val vals = mutable.ArrayBuffer[UTF8String]()
    v.fields().forEachRemaining { e =>
      keys += UTF8String.fromString(e.getKey)
      vals += (if (e.getValue.isNull) null else UTF8String.fromString(e.getValue.asText))
    }
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray[Any]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray[Any]))
  }

  private def decode(node: com.fasterxml.jackson.databind.JsonNode): InternalRow =
    InternalRow(
      utf8(node, "op"), utf8(node, "schema"), utf8(node, "table"),
      utf8(node, "primary_key"), mapOf(node, "before"), mapOf(node, "after"),
      utf8(node, "lsn"))

  override def get(): InternalRow = row

  override def close(): Unit = lines.close()
}
