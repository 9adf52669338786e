package graft

import graft.cdc.Changelog
import graft.model.Types
import graft.stream.CdcStream

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** S1 option A seam: the DataSourceV2 replay source must serve the same
  * committed envelopes as the option-B file source, through slot-like
  * segment offsets, honoring `start_lsn` resume (reference:
  * internal/cdc/postgres/postgres.go:152-158) and per-trigger size caps. */
class PgOutputSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeSegments(dir: String, lines: Seq[String], segments: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    val per = math.max(1, math.ceil(lines.size / segments.toDouble).toInt)
    lines.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(f"$dir/seg-$i%05d.jsonl"),
        chunk.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
  }

  test("v2 source replays every envelope with the RowChange schema") {
    val dir = Files.createTempDirectory("graft-v2src").toString
    val lines = Changelog.envelopes(spark, sfDir).as[String].collect().toSeq
    writeSegments(dir, lines, segments = 4)

    val q = CdcStream.readEnvelopesV2(spark, dir, maxFilesPerTrigger = 2)
      .writeStream.format("memory").queryName("v2_all")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("v2_all")
    assert(got.schema == Types.rowChangeSchema)
    assert(got.count() == lines.size)
    // field-level parity with the from_json decode path (S2)
    val viaV2 = got.select($"op", $"primary_key", $"lsn".cast("long"))
      .as[(String, String, Long)].collect().toSet
    val viaJson = Changelog.changes(spark, sfDir)
      .select($"op", $"primary_key", $"lsn".cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(viaV2 == viaJson)
    // tuple rules survive: null-After deletes, populated After upserts
    assert(got.filter($"op" === "d" && $"after".isNull).count() > 0)
    assert(got.filter($"op" =!= "d" && $"after".isNotNull).count() > 0)
  }

  test("start_lsn resumes past already-applied changes") {
    val dir = Files.createTempDirectory("graft-v2lsn").toString
    val lines = Changelog.envelopes(spark, sfDir).as[String].collect().toSeq
    writeSegments(dir, lines, segments = 2)
    val lsns = Changelog.changes(spark, sfDir)
      .select($"lsn".cast("long")).as[Long].collect().sorted
    val cut = lsns(lsns.length / 2)

    val q = CdcStream.readEnvelopesV2(spark, dir, startLsn = cut)
      .writeStream.format("memory").queryName("v2_resume")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("v2_resume").select($"lsn".cast("long")).as[Long].collect()
    assert(got.length == lsns.count(_ > cut))
    assert(got.forall(_ > cut))
  }

  test("checkpoint restart with rate limiting neither regresses nor re-delivers") {
    // 6 segments, 2 per trigger; a fresh stream instance restarted from the
    // checkpoint starts with no in-memory floor — deserializeOffset must
    // raise it, or the rate-limited latestOffset regresses below the
    // committed offset and re-delivers earlier segments
    val dir = Files.createTempDirectory("graft-v2rst").toString
    val ckpt = Files.createTempDirectory("graft-v2rst-ckpt").toString
    val out = Files.createTempDirectory("graft-v2rst-out").toString
    val lines = Changelog.envelopes(spark, sfDir).as[String].collect().toSeq
    writeSegments(dir, lines, segments = 6)

    def run(): Unit = {
      val q = CdcStream.readEnvelopesV2(spark, dir, maxFilesPerTrigger = 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == lines.size)
    run() // fresh PgOutputReplayStream, same checkpoint: nothing new
    assert(spark.read.parquet(out).count() == afterFirst)
  }

  test("allAvailable limit with a restored offset does not overflow and stall") {
    // Trigger.Once/AvailableNow pass ReadLimit.allAvailable (cap
    // Int.MaxValue); with a restored start > 0 the old Int `start + cap`
    // overflowed negative and latestOffset collapsed to `start` — the
    // stream silently stopped advancing past the checkpoint.
    import graft.sources.{PgOutputReplayStream, SegmentOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("graft-v2ovf").toString
    val lines = Changelog.envelopes(spark, sfDir).as[String].collect().toSeq
    writeSegments(dir, lines, segments = 6)

    val stream = new PgOutputReplayStream(dir, 0L, maxFilesPerTrigger = 2)
    val latest = stream.latestOffset(SegmentOffset(3), ReadLimit.allAvailable())
    assert(latest.asInstanceOf[SegmentOffset].segments == 6)
    // and a capped limit still caps relative to the restored start
    val capped = stream.latestOffset(SegmentOffset(3), ReadLimit.maxFiles(2))
    assert(capped.asInstanceOf[SegmentOffset].segments == 5)
  }

  test("segments appended after the stream starts are picked up in later triggers") {
    val dir = Files.createTempDirectory("graft-v2inc").toString
    val lines = Changelog.envelopes(spark, sfDir).as[String].collect().toSeq
    val (first, second) = lines.splitAt(lines.size / 2)
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/seg-00000.jsonl"),
      first.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val q = CdcStream.readEnvelopesV2(spark, dir)
      .writeStream.format("memory").queryName("v2_inc")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("v2_inc").count() == first.size)

    Files.write(Paths.get(s"$dir/seg-00001.jsonl"),
      second.mkString("\n").getBytes(StandardCharsets.UTF_8))
    q.processAllAvailable(); q.stop()
    assert(spark.table("v2_inc").count() == lines.size)
  }
}
