package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: an opaque binary payload plus typed metadata — the
  * engine's representation for image/audio/video columns at scale. */
final case class MediaRow(
    doc_id: Long,
    modality: String,      // "image" | "audio" | "video"
    payload: Array[Byte],  // opaque bytes (decode happens executor-side)
    n_bytes: Long)

/** Extracted per-media features (decoder output). */
final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    checksum: Long,
    features: Array[Float])

/** Multimodal column handling: binary payloads flow through ordinary
  * DataFrame plans (partitioned, spillable, column-pruned); decode /
  * feature-extraction runs as a `mapPartitions` with one decoder instance
  * per partition — the same shape a real libjpeg/ffmpeg/torchvision binding
  * would use on a 1000-executor cluster.
  */
object Multimodal {

  /** Synthesize a media table from the documents fixture: the UTF-8 bytes of
    * `text` stand in for an encoded media payload. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.util.TableCache.parquet(spark, s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** Decode + feature-extract. Distribution contract: one [[StubDecoder]]
    * per partition (amortized init, like loading a codec/model once per
    * executor core), rows streamed through it — never collected. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = StubDecoder.open()
      rows.map(decoder.decode)
    }
  }
}

/** STUB decoder — image/audio/video libraries are not available in this
  * container, so `decode` produces a deterministic fake from the payload
  * bytes. The Spark-side plumbing (schema, per-partition lifecycle, batch
  * shape) is real and tested; swap [[StubDecoder.decode]] for a JNI/FFI
  * binding to get a production decoder.
  *
  * Contract note: the checksum folds payload BYTES — the right semantic
  * for binary media (there are no "characters" in pixel data) — while the
  * SQL oracles of q_media_meta / q_multimodal_extract / q_frame_dedup
  * refold the fixture's text per CHARACTER. The two coincide exactly when
  * the fixture corpus is pure ASCII, which DedupSpec guards as an explicit
  * precondition (the text kernels, by contrast, fold codepoints and hold
  * for arbitrary text).
  */
final class StubDecoder private () extends Serializable {
  def decode(r: MediaRow): MediaFeatures = {
    // Deterministic fake: FNV over the payload stands in for pixel decode.
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < r.payload.length) {
      h ^= (r.payload(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    val dim = 8
    val feats = new Array[Float](dim)
    var k = 0
    var g = h
    while (k < dim) {
      g = g * 6364136223846793005L + 1442695040888963407L // LCG walk
      feats(k) = ((g >>> 40).toInt / 8388608.0f) - 1.0f
      k += 1
    }
    // Unsigned bit-slices of the hash (logical shifts, nonneg remainders):
    // each derived field is reproducible in any engine with 128-bit
    // integer arithmetic on the wrapped unsigned hash value.
    MediaFeatures(
      r.doc_id, r.modality, r.n_bytes,
      width = 64 + ((h & 15L) * 32).toInt,
      height = 64 + (((h >>> 8) % 9L) * 32).toInt,
      n_frames = if (r.modality == "video") 1 + ((h >>> 16) % 240L).toInt else 1,
      checksum = h,
      features = feats)
  }
}

object StubDecoder {
  /** Per-partition open (would acquire native codec handles in production). */
  def open(): StubDecoder = new StubDecoder()
}
