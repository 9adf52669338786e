package graft.sources

import graft.model.Types

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
          opts.getInt("max_files_per_trigger", 16))
    }
}

/** Offset = number of envelope segments consumed, serialized as its decimal
  * string (the slot-position analogue). */
final case class SegmentOffset(segments: Int) extends Offset {
  override def json(): String = segments.toString
}

final class PgOutputReplayStream(dir: String, startLsn: Long,
                                 maxFilesPerTrigger: Int)
  extends MicroBatchStream {

  /** Segments in consumption order; grows monotonically as the directory
    * fills (the listing is re-taken per latestOffset call, new names
    * appended in sorted order — a replication socket would push instead). */
  private val seen = mutable.LinkedHashSet[String]()

  /** Highest segment count planned or committed so far — the floor for the
    * next trigger's rate-limited latest offset (so a batch already logged by
    * a previous run is never re-bounded below its recorded end). */
  @volatile private var position = 0

  private def refresh(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (fs.exists(p)) {
      val files = fs.listStatus(p).filter(_.isFile)
        .map(_.getPath.toString)
        .filterNot(f => f.contains("/_") || f.contains("/."))
        .sorted
      files.foreach(seen += _)
    }
  }

  override def initialOffset(): Offset = SegmentOffset(0)

  override def latestOffset(): Offset = {
    refresh()
    // advance at most maxFilesPerTrigger segments per trigger (hybrid
    // batching's size half, B1); never retreat below an already planned or
    // committed end
    val target = math.min(seen.size, position + math.max(maxFilesPerTrigger, 1))
    SegmentOffset(math.max(target, position))
  }

  override def deserializeOffset(json: String): Offset =
    SegmentOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SegmentOffset].segments
    val until = end.asInstanceOf[SegmentOffset].segments
    if (until > seen.size) refresh()
    position = math.max(position, until)
    seen.slice(from, until).toArray
      .map(f => EnvelopeSegment(f, startLsn): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val seg = partition.asInstanceOf[EnvelopeSegment]
      new EnvelopeSegmentReader(seg.path, seg.startLsn)
    }

  override def commit(end: Offset): Unit =
    position = math.max(position, end.asInstanceOf[SegmentOffset].segments)

  override def stop(): Unit = ()
}

final case class EnvelopeSegment(path: String, startLsn: Long)
  extends InputPartition

/** Decodes one envelope segment: JSON lines → [[Types.rowChangeSchema]]
  * rows, skipping rows at or below `startLsn` (resume semantics,
  * reference: postgres.go:152-158). The decode mirrors the reference's
  * tuple rules (S3): absent/null map values stay null, all values are
  * strings. */
final class EnvelopeSegmentReader(path: String, startLsn: Long)
  extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val p = new org.apache.hadoop.fs.Path(path)
  private val in = p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
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
