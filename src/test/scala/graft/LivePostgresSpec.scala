package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream}
import java.net.Socket

import graft.sources.{LiveWal, PgOutputWire, PgReplicationHandshake, PgTls,
  WalSegmentTap}
import org.scalatest.funsuite.AnyFunSuite

/** GATED live-server smoke: runs the real topology — SQL session for DDL +
  * seed data, replication session for slot streaming, segment tap, decode —
  * against an actual PostgreSQL `wal_level=logical` instance WHEN the
  * environment provides one, and skips cleanly otherwise. Everything this
  * exercises is byte-verified offline by HandshakeSpec / WalSocketSpec /
  * LiveTopologySpec against in-process mock walsenders; this closes the
  * one remaining gap (a genuine server) the day the environment allows it.
  *
  * Enable with:
  *   GRAFT_PG_HOST=…        (required — absence skips the suite)
  *   GRAFT_PG_PORT=5432  GRAFT_PG_USER=postgres  GRAFT_PG_DB=postgres
  *   GRAFT_PG_PASSWORD=…    (optional; SCRAM when the server demands it)
  *   GRAFT_PG_SSLMODE=disable|require|verify-full
  *
  * The role needs CREATE TABLE/PUBLICATION and REPLICATION privileges.
  */
/** Shared env contract + session scaffolding for the gated live-server
  * specs (this suite and LiveTopologySpec's gated test) — ONE copy of the
  * dial/auth wiring so a protocol or env change lands everywhere at once.
  *
  * `GRAFT_PG_SSLROOTCERT` (optional) names a PEM trust anchor, exactly
  * libpq's `sslrootcert` — required for `verify-full` against a
  * private-CA/self-signed server. */
object LivePgEnv {
  val host: Option[String] = sys.env.get("GRAFT_PG_HOST")
  def port: Int = sys.env.getOrElse("GRAFT_PG_PORT", "5432").toInt
  def user: String = sys.env.getOrElse("GRAFT_PG_USER", "postgres")
  def db: String = sys.env.getOrElse("GRAFT_PG_DB", "postgres")
  def password: Option[String] = sys.env.get("GRAFT_PG_PASSWORD")
  def sslMode: String = sys.env.getOrElse("GRAFT_PG_SSLMODE", PgTls.ModeDisable)

  def sslContext: Option[javax.net.ssl.SSLContext] =
    sys.env.get("GRAFT_PG_SSLROOTCERT").map { pem =>
      val cf = java.security.cert.CertificateFactory.getInstance("X.509")
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(pem))
      val cert = try cf.generateCertificate(in) finally in.close()
      val ks = java.security.KeyStore
        .getInstance(java.security.KeyStore.getDefaultType)
      ks.load(null, null)
      ks.setCertificateEntry("root", cert)
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)
      ctx
    }

  /** Plain-SQL session over the replication wire (replication=database
    * connections accept simple queries). */
  def sqlSession(): (Socket, PgReplicationHandshake) = {
    val raw = new Socket(host.get, port)
    val sock = PgTls.negotiate(raw, host.get, sslMode, sslContext)
    val hs = new PgReplicationHandshake(
      new DataInputStream(new BufferedInputStream(sock.getInputStream)),
      new DataOutputStream(new BufferedOutputStream(sock.getOutputStream)),
      password)
    hs.startup(user, db)
    (sock, hs)
  }

  /** The production replication dial with the env's transport settings. */
  def connectWal(slot: String, publication: String)
  : (Socket, graft.sources.WalReceiveLoop) =
    LiveWal.connect(host.get, port, user, db, slot, publication,
      password = password, createPublication = false, createSlot = true,
      sslMode = sslMode, sslContext = sslContext)
}

class LivePostgresSpec extends AnyFunSuite {

  import LivePgEnv.{host, sqlSession}

  test("live wal_level=logical server: DDL → seed → slot stream → decode") {
    assume(host.isDefined,
      "GRAFT_PG_HOST not set — live-server smoke skipped (mock-verified " +
        "coverage in HandshakeSpec/WalSocketSpec/LiveTopologySpec stands)")

    val (ddlSock, ddl) = sqlSession()
    try {
      def tolerant(sql: String): Unit =
        try { ddl.exec(sql); () }
        catch { case _: PgReplicationHandshake.BackendError => () }
      tolerant("SELECT pg_drop_replication_slot('graft_smoke_slot')")
      ddl.exec("DROP TABLE IF EXISTS graft_smoke")
      ddl.exec("DROP PUBLICATION IF EXISTS graft_smoke_pub")
      ddl.exec("CREATE TABLE graft_smoke(" +
        "id int primary key, title text, content text)")
      ddl.exec("CREATE PUBLICATION graft_smoke_pub FOR TABLE graft_smoke")

      // replication session: the production dial (TLS + SCRAM as required)
      val (repSock, loop) =
        LivePgEnv.connectWal("graft_smoke_slot", "graft_smoke_pub")
      try {
        repSock.setSoTimeout(20000)
        ddl.exec("INSERT INTO graft_smoke VALUES " +
          "(1, 'a', 'alpha'), (2, 'b', 'beta'), (3, 'c', 'gamma')")
        ddl.exec("UPDATE graft_smoke SET content = 'ALPHA' WHERE id = 1")
        ddl.exec("DELETE FROM graft_smoke WHERE id = 2")

        // drive the receive loop until the three transactions' committed
        // changes are decodable (keepalives keep arriving between them)
        val deadline = System.nanoTime() + 30L * 1000000000L
        def decoded = loop.changes()
        while (decoded.size < 5 && System.nanoTime() < deadline) loop.step()
        val changes = decoded
        assert(changes.size >= 5,
          s"expected 5 committed changes, got ${changes.size}: $changes")
        val byOp = changes.groupBy(_.op).view.mapValues(_.size).toMap
        assert(byOp.getOrElse("c", 0) == 3 && byOp.getOrElse("u", 0) == 1 &&
          byOp.getOrElse("d", 0) == 1, s"op mix diverged: $byOp")
        assert(changes.filter(_.op == "u").head.primaryKey == "1")

        // tap contract: the drained frames land as a decodable segment
        val dir = java.nio.file.Files.createTempDirectory("live_smoke")
        val tap = new WalSegmentTap(dir)
        val seg = tap.tap(loop)
        assert(seg.isDefined, "no segment written from live frames")
        val replayed = PgOutputWire.decodeSegment(
          java.nio.file.Files.readAllBytes(seg.get), _ => "id")
        assert(replayed.map(c => (c.op, c.primaryKey)) ==
          changes.map(c => (c.op, c.primaryKey)))
      } finally repSock.close()

      // cleanup (new SQL session — the first one stays usable, but a
      // fresh one also proves reconnect against the live server)
      val (s2, ddl2) = sqlSession()
      try {
        def tolerant2(sql: String): Unit =
          try { ddl2.exec(sql); () }
          catch { case _: PgReplicationHandshake.BackendError => () }
        tolerant2("SELECT pg_drop_replication_slot('graft_smoke_slot')")
        ddl2.exec("DROP TABLE IF EXISTS graft_smoke")
        ddl2.exec("DROP PUBLICATION IF EXISTS graft_smoke_pub")
      } finally s2.close()
    } finally ddlSock.close()
  }

  test("live server soak: 1,150 changes across 22 transactions, a " +
    "flush-acked outage, reconnect resume from confirmed_flush — no row " +
    "lost, no flushed transaction re-delivered, segments replay exactly") {
    assume(host.isDefined,
      "GRAFT_PG_HOST not set — live-server soak skipped (mock-verified " +
        "coverage in HandshakeSpec/WalSocketSpec/LiveTopologySpec stands)")

    val (ddlSock, ddl) = sqlSession()
    try {
      def tolerant(sql: String): Unit =
        try { ddl.exec(sql); () }
        catch { case _: PgReplicationHandshake.BackendError => () }
      tolerant("SELECT pg_drop_replication_slot('graft_soak_slot')")
      ddl.exec("DROP TABLE IF EXISTS graft_soak")
      ddl.exec("DROP PUBLICATION IF EXISTS graft_soak_pub")
      ddl.exec("CREATE TABLE graft_soak(id int primary key, v text)")
      ddl.exec("CREATE PUBLICATION graft_soak_pub FOR TABLE graft_soak")

      val segDir = java.nio.file.Files.createTempDirectory("live_soak")
      val tap = new WalSegmentTap(segDir)
      def insertBatch(h: PgReplicationHandshake, b: Int): Unit =
        h.exec(s"INSERT INTO graft_soak SELECT g, 'v'||g FROM " +
          s"generate_series(${b * 50 + 1}, ${b * 50 + 50}) g")

      // ---- phase 1: 10 transactions × 50 rows, streamed + flush-acked
      val (rep1, loop1) =
        LivePgEnv.connectWal("graft_soak_slot", "graft_soak_pub")
      val phase1 = try {
        rep1.setSoTimeout(20000)
        (0 until 10).foreach(insertBatch(ddl, _))
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (loop1.changes().size < 500 && System.nanoTime() < deadline)
          loop1.step()
        val decoded = loop1.changes()
        assert(decoded.size == 500, s"phase 1 decoded ${decoded.size}/500")
        // durable tap, then report the drained position as FLUSHED — the
        // slot's confirmed_flush must now cover all of phase 1, so none
        // of it may ever be re-delivered
        val flushTo = loop1.walEnd
        assert(tap.tap(loop1).isDefined, "phase-1 segment not written")
        loop1.markFlushed(flushTo)
        loop1.sendStatusUpdate()
        Thread.sleep(300)
        loop1.sendStatusUpdate() // let the walsender absorb the ack
        Thread.sleep(300)
        decoded
      } finally rep1.close() // ---- the outage begins here

      // ---- phase 2 (during the outage): 10 more transactions, then an
      // update wave and a delete wave — 650 committed changes the slot
      // must retain for the reconnect
      (10 until 20).foreach(insertBatch(ddl, _))
      ddl.exec("UPDATE graft_soak SET v = 'U'||id WHERE id <= 100")
      ddl.exec("DELETE FROM graft_soak WHERE id BETWEEN 101 AND 150")

      // ---- phase 3: reconnect the SAME slot; startLsn 0 is clamped UP
      // to confirmed_flush, so the stream resumes exactly at the outage
      val (rep2, loop2) =
        LivePgEnv.connectWal("graft_soak_slot", "graft_soak_pub")
      val phase3 = try {
        rep2.setSoTimeout(20000)
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (loop2.changes().size < 650 && System.nanoTime() < deadline)
          loop2.step()
        val decoded = loop2.changes()
        assert(decoded.size == 650, s"phase 3 decoded ${decoded.size}/650")
        assert(tap.tap(loop2).isDefined, "phase-3 segment not written")
        decoded
      } finally rep2.close()

      // no flushed transaction re-delivered: every phase-3 LSN is beyond
      // the acked phase-1 stream (at-least-once collapses to exactly-once
      // when the ack covers everything durably written)
      val maxP1 = phase1.map(_.lsn).max
      assert(phase3.map(_.lsn).min > maxP1,
        s"flushed transactions re-delivered: phase-3 min LSN " +
          s"${phase3.map(_.lsn).min} <= phase-1 max $maxP1")
      // op mix of the outage window
      val mix = phase3.groupBy(_.op).view.mapValues(_.size).toMap
      assert(mix == Map("c" -> 500, "u" -> 100, "d" -> 50),
        s"phase-3 op mix diverged: $mix")
      // last-writer-wins over the full decoded history equals the
      // server's own table state (count checked via SQL)
      val latest = (phase1 ++ phase3).groupBy(_.primaryKey)
        .view.mapValues(_.maxBy(_.lsn)).toMap
      val live = latest.collect { case (pk, c) if c.op != "d" => pk.toInt }.toSet
      val expected = (1 to 1000).toSet -- (101 to 150)
      assert(live == expected,
        s"replayed state diverged: missing=${(expected -- live).take(5)} " +
          s"extra=${(live -- expected).take(5)}")
      val serverCount = ddl.exec("SELECT count(*) FROM graft_soak")
        .head.head.toInt
      assert(serverCount == expected.size,
        s"server table has $serverCount rows, replay says ${expected.size}")
      // the tapped segment files replay the exact decoded history — the
      // graft-pgoutput source would stream precisely these changes
      val segs = {
        import scala.jdk.CollectionConverters._
        val l = java.nio.file.Files.list(segDir)
        try l.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
        finally l.close()
      }
      val replayed = segs.flatMap(p => PgOutputWire.decodeSegment(
        java.nio.file.Files.readAllBytes(p), _ => "id"))
      assert(replayed.map(c => (c.op, c.primaryKey, c.lsn)) ==
        (phase1 ++ phase3).map(c => (c.op, c.primaryKey, c.lsn)),
        "segment replay diverged from the live decode")

      // cleanup
      tolerant("SELECT pg_drop_replication_slot('graft_soak_slot')")
      ddl.exec("DROP TABLE IF EXISTS graft_soak")
      ddl.exec("DROP PUBLICATION IF EXISTS graft_soak_pub")
    } finally ddlSock.close()
  }
}
