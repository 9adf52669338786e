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
class LivePostgresSpec extends AnyFunSuite {

  private val host = sys.env.get("GRAFT_PG_HOST")
  private def port = sys.env.getOrElse("GRAFT_PG_PORT", "5432").toInt
  private def user = sys.env.getOrElse("GRAFT_PG_USER", "postgres")
  private def db = sys.env.getOrElse("GRAFT_PG_DB", "postgres")
  private def password = sys.env.get("GRAFT_PG_PASSWORD")
  private def sslMode = sys.env.getOrElse("GRAFT_PG_SSLMODE", PgTls.ModeDisable)

  /** Plain-SQL session over the replication wire (replication=database
    * connections accept simple queries). */
  private def sqlSession(): (Socket, PgReplicationHandshake) = {
    val raw = new Socket(host.get, port)
    val sock = PgTls.negotiate(raw, host.get, sslMode)
    val hs = new PgReplicationHandshake(
      new DataInputStream(new BufferedInputStream(sock.getInputStream)),
      new DataOutputStream(new BufferedOutputStream(sock.getOutputStream)),
      password)
    hs.startup(user, db)
    (sock, hs)
  }

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
      val (repSock, loop) = LiveWal.connect(host.get, port, user, db,
        "graft_smoke_slot", "graft_smoke_pub", password = password,
        createPublication = false, createSlot = true, sslMode = sslMode)
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
}
