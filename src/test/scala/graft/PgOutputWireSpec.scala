package graft

import graft.sources.PgOutputWire
import graft.sources.PgOutputWire._

/** Binary pgoutput decode: tuple tags, op mapping, commit-time emission,
  * blind deletes, TOAST collapse, and the DataSourceV2 end-to-end path. */
class PgOutputWireSpec extends SparkSpec {

  private val REL = 16385
  private val cols = Seq("id", "title", "content", "created_at", "author")

  private def rel = relation(REL, "public", "documents", cols)

  private def row(id: String, title: Option[String], content: Option[String])
    : Array[Byte] =
    tupleData(Seq(Some(id), title, content, Some("2025-01-15"), Some("ada")))

  test("insert/update/delete map to c/u/d with commit-LSN stamping") {
    val seg = frame(Seq(
      1L -> begin(100L, 7),
      2L -> rel,
      3L -> insert(REL, row("1", Some("Hello"), Some("World"))),
      4L -> update(REL, row("1", Some("Hello2"), Some("World")),
        oldTuple = Some(row("1", Some("Hello"), Some("World")))),
      5L -> delete(REL, Some(tupleData(Seq(Some("1"), None, None, None, None)))),
      6L -> commit(100L)))
    val out = PgOutputWire.decodeSegment(seg)
    assert(out.map(_.op) == Seq("c", "u", "d"))
    assert(out.forall(_.lsn == 100L), "every change carries the COMMIT lsn")
    assert(out.forall(c => c.schema == "public" && c.table == "documents"))
    assert(out.forall(_.primaryKey == "1"))
    val u = out(1)
    assert(u.before.isEmpty, "update discards the old tuple (S4)")
    assert(u.after.get("title") == "Hello2")
    val d = out(2)
    assert(d.after.isEmpty && d.before.nonEmpty)
  }

  test("no commit, no visibility: uncommitted tail emits nothing") {
    val seg = frame(Seq(
      1L -> begin(50L, 8),
      2L -> rel,
      3L -> insert(REL, row("9", Some("x"), None))))
    assert(PgOutputWire.decodeSegment(seg).isEmpty)
  }

  test("null and unchanged-TOAST columns both collapse to map nulls") {
    val t = tupleData(
      Seq(Some("2"), None, Some("body"), None, Some("bob")),
      toastMarkers = Set(1)) // title arrives as 'u' (TOAST), created_at 'n'
    val seg = frame(Seq(
      1L -> begin(60L, 9), 2L -> rel,
      3L -> insert(REL, t), 4L -> commit(60L)))
    val c = PgOutputWire.decodeSegment(seg).head
    assert(c.after.get.contains("title") && c.after.get("title") == null,
      "'u' TOAST marker decodes to null (S3 lossy collapse)")
    assert(c.after.get("created_at") == null)
    assert(c.after.get("content") == "body")
  }

  test("blind delete (no identity tuple) yields empty primary key") {
    val seg = frame(Seq(
      1L -> begin(70L, 10), 2L -> rel,
      3L -> delete(REL, None), 4L -> commit(70L)))
    val d = PgOutputWire.decodeSegment(seg).head
    assert(d.op == "d" && d.primaryKey == "" && d.before.isEmpty)
  }

  test("two transactions in one segment stamp their own commit LSNs") {
    val seg = frame(Seq(
      1L -> begin(80L, 11), 2L -> rel,
      3L -> insert(REL, row("5", Some("a"), None)), 4L -> commit(80L),
      5L -> begin(90L, 12),
      6L -> insert(REL, row("6", Some("b"), None)), 7L -> commit(90L)))
    val out = PgOutputWire.decodeSegment(seg)
    assert(out.map(_.lsn) == Seq(80L, 90L))
    assert(out.map(_.primaryKey) == Seq("5", "6"))
  }

  test("DataSourceV2 reads binary segments end to end with start_lsn resume") {
    val dir = java.nio.file.Files.createTempDirectory("pgo-bin").toString
    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    write("000001.pgo", frame(Seq(
      1L -> begin(100L, 1), 2L -> rel,
      3L -> insert(REL, row("1", Some("t1"), Some("c1"))), 4L -> commit(100L))))
    write("000002.pgo", frame(Seq(
      5L -> begin(200L, 2), 6L -> rel,
      7L -> update(REL, row("1", Some("t2"), Some("c2"))),
      8L -> insert(REL, row("2", Some("t3"), None)), 9L -> commit(200L))))

    val ckpt = java.nio.file.Files.createTempDirectory("pgo-ckpt").toString
    val q = spark.readStream.format("graft-pgoutput")
      .option("path", dir).option("wire_format", "pgoutput")
      .option("start_lsn", 100L) // resume PAST the first commit
      .load()
      .writeStream.format("memory").queryName("pgo_bin_out")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table("pgo_bin_out")
      .selectExpr("op", "primary_key", "lsn", "after['title']")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(_._4)
    assert(rows.toSeq == Seq(
      ("u", "1", "200", "t2"), ("c", "2", "200", "t3")),
      s"start_lsn must skip the first committed txn; got ${rows.toSeq}")
  }
}
