package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.{LiveWal, LiveWalRunner, PgOutputWire, WalSegmentTap}
import graft.stream.ParquetTableStore

import org.apache.spark.sql.functions._

/** End-to-end live-topology integration: a mock walsender serves the
  * ENTIRE sf0.001 fixture changelog as pgoutput wire transactions over a
  * real socket, and the full production chain consumes it —
  * `LiveWal.connect` (handshake incl. publication + slot bootstrap) →
  * `LiveWalRunner`/`WalSegmentTap` (commit-aligned self-contained
  * segments) → `graft-pgoutput` readStream (`wire_format=pgoutput`) →
  * foreachBatch MERGE into [[ParquetTableStore]]. The final table state
  * must equal the REGISTERED oracle-gated batch query `q_latest_by_pk`
  * (latest effective non-delete per pk) — the composition the reference
  * runs as one process (cmd/cdc2vec/main.go:33-200), here asserted
  * across every layer seam at once. Each layer is additionally unit-spec'd
  * in HandshakeSpec / WalSocketSpec / PgOutputWireSpec / MergeStreamSpec.
  *
  * Wire-expressible changes only: null-After updates (has_after = false,
  * op = 'u') exist in the synthetic changelog as DECODE outcomes, not
  * wire messages — pgoutput always ships a new tuple on Update — so the
  * mock does not emit them; they are non-effective and both sides of the
  * comparison skip them by the same (op = 'd' OR has_after) rule.
  */
class LiveTopologySpec extends SparkSpec {

  private def msg(tag: Char, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + body.length)
    b.put(tag.toByte).putInt(4 + body.length).put(body)
    b.array()
  }
  private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
  private def authOk = msg('R', ByteBuffer.allocate(4).putInt(0).array())
  private def readyForQuery = msg('Z', Array('I'.toByte))
  private def commandComplete(t: String) = msg('C', cstr(t))
  private def dataRow(cols: String*): Array[Byte] = {
    val body = ByteBuffer.allocate(2 + cols.map(c => 4 + c.length).sum)
    body.putShort(cols.size.toShort)
    cols.foreach { c => body.putInt(c.length).put(c.getBytes(UTF_8)) }
    msg('D', body.array())
  }
  private def copyBoth = msg('W',
    ByteBuffer.allocate(3).put(0.toByte).putShort(0.toShort).array())
  private def xlog(lsn: Long, m: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(25 + m.length)
    b.put('w'.toByte).putLong(lsn).putLong(lsn + 1).putLong(0L).put(m)
    msg('d', b.array())
  }

  /** One fixture change, pre-collected so the server thread touches no
    * Spark objects. */
  private case class Chg(op: String, table: String, pk: String, lsn: Long,
                         title: Option[String], content: Option[String],
                         created: Option[String], author: Option[String],
                         hasAfter: Boolean)

  /** Fixture changelog in commit order, wire-expressible rows only. */
  private lazy val fullLog: Seq[Chg] = {
    import org.apache.spark.sql.functions.col
    graft.cdc.Changelog.flat(spark, sfDir)
      .filter(col("op") === "d" || col("has_after"))
      .orderBy("lsn")
      .select("op", "table_name", "pk", "lsn", "title", "content",
        "created_at", "author", "has_after")
      .collect().toSeq
      .map(r => Chg(r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), Option(r.getString(4)), Option(r.getString(5)),
        Option(r.getString(6)), Option(r.getString(7)), r.getBoolean(8)))
  }

  /** One mock-walsender session: trust handshake + replication-command
    * loop, then `log` streamed as one transaction per change (relations
    * sent once at stream start — real pgoutput behavior), then CopyDone. */
  private def walsender(server: ServerSocket, log: Seq[Chg],
                        failure: java.util.concurrent.atomic.AtomicReference[String],
                        tls: Boolean = false)
  : Thread = {
    val t = new Thread(() => {
      val raw = server.accept()
      try {
        // TLS variant: SSLRequest preamble + upgrade, then the identical
        // walsender protocol rides the encrypted channel
        val s = if (tls) TlsTestMaterial.acceptTls(raw) else raw
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        // startup (untagged) → trust ok
        val slen = sin.readInt() - 4
        sin.readFully(new Array[Byte](slen))
        sout.write(authOk); sout.write(readyForQuery); sout.flush()
        // command loop: IDENTIFY_SYSTEM, CREATE PUBLICATION,
        // CREATE_REPLICATION_SLOT, START_REPLICATION
        var streaming = false
        while (!streaming) {
          val tag = sin.readByte().toChar
          val len = sin.readInt() - 4
          val payload = new Array[Byte](len)
          sin.readFully(payload)
          assert(tag == 'Q', s"unexpected frontend tag $tag")
          val sql = new String(payload.dropRight(1), UTF_8)
          if (sql == "IDENTIFY_SYSTEM") {
            sout.write(dataRow("7357001", "1", "0/10", "postgres"))
            sout.write(commandComplete("IDENTIFY_SYSTEM"))
            sout.write(readyForQuery)
          } else if (sql.startsWith("CREATE PUBLICATION")) {
            sout.write(commandComplete("CREATE PUBLICATION"))
            sout.write(readyForQuery)
          } else if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
            sout.write(dataRow("graft_e2e", "0/10", "", "pgoutput"))
            sout.write(commandComplete("CREATE_REPLICATION_SLOT"))
            sout.write(readyForQuery)
          } else if (sql.startsWith("START_REPLICATION")) {
            sout.write(copyBoth); streaming = true
          } else failure.set(s"unexpected SQL: $sql")
          sout.flush()
        }
        // stream the changelog: relations once, one tx per change
        import PgOutputWire._
        val DOCS = 1; val OTHER = 2
        sout.write(xlog(1L,
          relation(DOCS, "public", "documents",
            Seq("id", "title", "content", "created_at", "author"))))
        sout.write(xlog(2L,
          relation(OTHER, "public", "other", Seq("id", "title", "content"))))
        log.foreach { c =>
          val relId = if (c.table == "documents") DOCS else OTHER
          val body: Array[Byte] = c.op match {
            case "c" | "u" =>
              val tuple =
                if (relId == DOCS)
                  tupleData(Seq(Some(c.pk), c.title, c.content, c.created, c.author))
                else tupleData(Seq(Some(c.pk), c.title, c.content))
              if (c.op == "c") insert(relId, tuple) else update(relId, tuple)
            case "d" =>
              if (c.pk.nonEmpty)
                delete(relId, Some(tupleData(
                  Some(c.pk) +: Seq.fill(if (relId == DOCS) 4 else 2)(None))))
              else delete(relId, None) // blind delete: no REPLICA IDENTITY
          }
          sout.write(xlog(c.lsn, begin(c.lsn, (c.lsn % 100000).toInt)))
          sout.write(xlog(c.lsn, body))
          sout.write(xlog(c.lsn, commit(c.lsn)))
        }
        sout.write(Array[Byte]('c'.toByte, 0, 0, 0, 4)) // CopyDone
        sout.flush()
      } catch { case e: Throwable => failure.set(s"mock walsender: $e") }
      finally raw.close()
    })
    t.start()
    t
  }

  test("socket → handshake → runner → segments → readStream → merged table == q_latest_by_pk") {
    import spark.implicits._
    val log = fullLog

    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val serverFailure = new java.util.concurrent.atomic.AtomicReference[String]()
    val serverThread = walsender(server, log, serverFailure)

    // --- the production chain ------------------------------------------
    val (sock, loop) = LiveWal.connect(
      InetAddress.getLoopbackAddress.getHostAddress, server.getLocalPort,
      "rep", "postgres", "graft_e2e", "graft_pub")
    val segDir = java.nio.file.Files.createTempDirectory("e2e_segs")
    try {
      val segs = new LiveWalRunner(loop, new WalSegmentTap(segDir),
        minFramesPerSegment = 64).run()
      assert(segs.size > 1, s"expected multiple segments, got ${segs.size}")
    } finally sock.close()
    serverThread.join(10000)
    assert(serverFailure.get() == null, s"server saw: ${serverFailure.get()}")

    val storeDir = java.nio.file.Files.createTempDirectory("e2e_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("e2e_ckpt").toString
    val store = new ParquetTableStore(s"$storeDir/table")
    val q = spark.readStream.format("graft-pgoutput")
      .option("path", segDir.toString).option("wire_format", "pgoutput")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store.merge(batch)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // --- final state vs the registered oracle-gated batch answer -------
    val got = store.current(spark)
      .select($"pk", $"lsn", $"title", $"content")
      .as[(String, Long, Option[String], Option[String])].collect().toSet
    val want = SparkEntry.queries("q_latest_by_pk")(spark, sfDir)
      .select($"pk", $"lsn", $"title", $"content")
      .as[(String, Long, Option[String], Option[String])].collect().toSet
    assert(want.nonEmpty, "batch reference answer is empty")
    assert(got == want,
      s"merged table diverges from q_latest_by_pk: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("TLS dial: handshake + runner + segments carry the identical change " +
    "stream over sslmode=require") {
    // the full-chain content assertion lives in the plaintext test above;
    // this variant proves the SAME protocol stack — SSLRequest upgrade,
    // SCRAM-capable startup, runner, commit-aligned segments — over an
    // encrypted channel, byte-identical at the decoded-change level
    val log = fullLog.take(200)
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()
    val t = walsender(server, log, failure, tls = true)
    val (sock, loop) = LiveWal.connect(
      "localhost", server.getLocalPort,
      "rep", "postgres", "graft_e2e", "graft_pub",
      sslMode = graft.sources.PgTls.ModeRequire)
    val segDir = java.nio.file.Files.createTempDirectory("tls_segs")
    try {
      val segs = new LiveWalRunner(loop, new WalSegmentTap(segDir),
        minFramesPerSegment = 32).run()
      assert(segs.nonEmpty)
      val decoded = segs.flatMap(p => PgOutputWire.decodeSegment(
        java.nio.file.Files.readAllBytes(p), _ => "id"))
      assert(decoded.map(c => (c.op, c.lsn)) == log.map(c => (c.op, c.lsn)),
        "decoded changes over TLS diverge from the served log")
    } finally { sock.close(); t.join(10000); server.close() }
    assert(failure.get() == null, s"server saw: ${failure.get()}")
  }

  test("GATED live server: real PostgreSQL → runner segments → " +
    "graft-pgoutput readStream → merge store equals the server's table") {
    // the full production composition against a REAL wal_level=logical
    // server (tools/live_pg.sh): dial (TLS/SCRAM per env) → slot →
    // receive loop → commit-aligned segments → Spark readStream →
    // LSN-monotonic merge — asserted against the server's OWN final
    // table state, across a mid-stream disconnect + slot resume
    assume(LivePgEnv.host.isDefined,
      "GRAFT_PG_HOST not set — live topology test skipped " +
        "(mock-walsender coverage above stands)")
    import graft.sources.PgReplicationHandshake
    import spark.implicits._

    val (sqlSock, ddl) = LivePgEnv.sqlSession()
    try {
      def tolerant(sql: String): Unit =
        try { ddl.exec(sql); () }
        catch { case _: PgReplicationHandshake.BackendError => () }
      tolerant("SELECT pg_drop_replication_slot('graft_live_slot')")
      ddl.exec("DROP TABLE IF EXISTS graft_live")
      ddl.exec("DROP PUBLICATION IF EXISTS graft_live_pub")
      ddl.exec("CREATE TABLE graft_live(id int primary key, title text, " +
        "content text)")
      ddl.exec("CREATE PUBLICATION graft_live_pub FOR TABLE graft_live")

      val segDir = java.nio.file.Files.createTempDirectory("live_topo_segs")
      val tap = new WalSegmentTap(segDir)
      // one receive session: step until `expect` NEW changes (lsn beyond
      // the previous session's flush-acked position — an unpersisted ack
      // may re-deliver a tail, which must not count) are decoded, tap one
      // commit-aligned segment (the session's Relation frame leads it),
      // flush-ack, disconnect; returns the acked position
      def session(expect: Int, afterLsn: Long)(dml: => Unit): Long = {
        val (sock, loop) =
          LivePgEnv.connectWal("graft_live_slot", "graft_live_pub")
        try {
          sock.setSoTimeout(20000)
          dml
          def fresh = loop.changes().count(_.lsn > afterLsn)
          val deadline = System.nanoTime() + 60L * 1000000000L
          while (fresh < expect && System.nanoTime() < deadline)
            loop.step()
          assert(fresh == expect, s"decoded $fresh/$expect live changes")
          val flushTo = loop.walEnd
          assert(tap.tap(loop).isDefined, "live segment not written")
          loop.markFlushed(flushTo)
          loop.sendStatusUpdate(); Thread.sleep(300)
          loop.sendStatusUpdate(); Thread.sleep(300)
          flushTo
        } finally sock.close()
      }
      // session 1: 150 inserts (3 tx) + 30 updates (1 tx)
      val flush1 = session(180, -1L) {
        (0 until 3).foreach(b => ddl.exec(
          s"INSERT INTO graft_live SELECT g, 't'||g, 'c'||g FROM " +
            s"generate_series(${b * 50 + 1}, ${b * 50 + 50}) g"))
        ddl.exec("UPDATE graft_live SET title = 'U'||id WHERE id <= 30")
      }
      // outage, then session 2 resumes the SAME slot: 100 inserts + 20
      // deletes (a re-delivered session-1 tail is tolerated by the
      // LSN-monotonic merge and excluded from the count by flush1)
      session(120, flush1) {
        (3 until 5).foreach(b => ddl.exec(
          s"INSERT INTO graft_live SELECT g, 't'||g, 'c'||g FROM " +
            s"generate_series(${b * 50 + 1}, ${b * 50 + 50}) g"))
        ddl.exec("DELETE FROM graft_live WHERE id BETWEEN 31 AND 50")
      }

      // the Spark half: stream the tapped segments into the merge store
      val storeDir = java.nio.file.Files.createTempDirectory("live_topo_store")
      val ckpt = java.nio.file.Files.createTempDirectory("live_topo_ckpt")
      val store = new ParquetTableStore(s"$storeDir/table",
        table = "public.graft_live", attrCols = Seq("title", "content"))
      val q = spark.readStream.format("graft-pgoutput")
        .option("path", segDir.toString).option("wire_format", "pgoutput")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          store.merge(batch)
        }
        .start()
      try q.processAllAvailable() finally q.stop()

      // final state equals the live server's own table
      val got = store.current(spark)
        .select($"pk", $"title", $"content")
        .as[(String, String, String)].collect().toSet
      val want = ddl.exec(
        "SELECT id::text, title, content FROM graft_live ORDER BY id")
        .map(r => (r(0), r(1), r(2))).toSet
      assert(want.size == 230, s"server fixture broken: ${want.size} rows")
      assert(got == want,
        s"merged table diverges from the live server: " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")

      tolerant("SELECT pg_drop_replication_slot('graft_live_slot')")
      ddl.exec("DROP TABLE IF EXISTS graft_live")
      ddl.exec("DROP PUBLICATION IF EXISTS graft_live_pub")
    } finally sqlSock.close()
  }

  test("outage + overlapping re-delivery + checkpoint restart converges to the same table") {
    import spark.implicits._
    // Crash-and-reconnect shape: session 1 delivers the first 60% of the
    // log; the connection dies; the slot re-delivers an OVERLAPPING
    // suffix (the last ~10% of session 1 was received but its flush was
    // never acked — the WalReceiveLoop.markFlushed contract) plus the
    // rest. The streaming query is stopped between sessions and restarted
    // from its checkpoint (new segments only), so every layer's recovery
    // story runs at once: tap numbering resume, source offset restore,
    // duplicate envelopes across segments, LSN-monotonic merge.
    val log = fullLog
    val cut = (log.size * 6) / 10
    val overlap = log.size / 10
    val session1 = log.take(cut)
    val session2 = log.slice(cut - overlap, log.size) // re-delivered overlap

    val segDir = java.nio.file.Files.createTempDirectory("rr_segs")
    val storeDir = java.nio.file.Files.createTempDirectory("rr_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rr_ckpt").toString
    val store = new ParquetTableStore(s"$storeDir/table")
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()

    def receive(part: Seq[Chg]): Unit = {
      val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
      val t = walsender(server, part, failure)
      val (sock, loop) = LiveWal.connect(
        InetAddress.getLoopbackAddress.getHostAddress, server.getLocalPort,
        "rep", "postgres", "graft_e2e", "graft_pub")
      try new LiveWalRunner(loop, new WalSegmentTap(segDir),
        minFramesPerSegment = 32).run()
      finally { sock.close(); t.join(10000); server.close() }
      assert(failure.get() == null, s"server saw: ${failure.get()}")
    }
    def drainStream(): Unit = {
      val q = spark.readStream.format("graft-pgoutput")
        .option("path", segDir.toString).option("wire_format", "pgoutput")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          store.merge(batch)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    receive(session1)
    drainStream() // session-1 state merged, checkpoint records the offset
    val segsAfter1 = java.nio.file.Files.list(segDir).count()
    receive(session2) // NEW runner on the same dir: numbering must resume
    assert(java.nio.file.Files.list(segDir).count() > segsAfter1,
      "re-delivery session appended no segments")
    drainStream() // restart from checkpoint: reads only the new segments

    val got = store.current(spark)
      .select($"pk", $"lsn", $"title", $"content")
      .as[(String, Long, Option[String], Option[String])].collect().toSeq
    assert(got.map(_._1).distinct.size == got.size,
      "duplicate pks after overlapping re-delivery")
    val want = SparkEntry.queries("q_latest_by_pk")(spark, sfDir)
      .select($"pk", $"lsn", $"title", $"content")
      .as[(String, Long, Option[String], Option[String])].collect().toSeq
    assert(got.toSet == want.toSet,
      s"restart+re-delivery diverged: missing=${(want.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- want.toSet).take(3)}")
  }
}
