package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** PostgreSQL replication-connection handshake — the frontend protocol
  * between the TCP dial and the CopyBoth stream [[WalReceiveLoop]] drains
  * (reference: internal/cdc/postgres/postgres.go:95-175 — connect with
  * `replication=database`, create the slot, `START_REPLICATION` with
  * proto_version '1' and publication_names).
  *
  * Implements the wire messages a logical-replication client exchanges:
  * StartupMessage (protocol 3.0, `replication=database`), the
  * Authentication/ParameterStatus/BackendKeyData/ReadyForQuery drain,
  * simple Query for the replication-command mini-language
  * (`IDENTIFY_SYSTEM`, `CREATE_REPLICATION_SLOT ... LOGICAL pgoutput`,
  * `START_REPLICATION SLOT ...`), and the CopyBothResponse cutover.
  * Trust auth only: an offline build cannot negotiate SCRAM, so any
  * other Authentication subtype fails with a descriptive error — the
  * ONLY parts of S1 still needing a live server are the dial itself and
  * password auth. Byte framing is spec-verified against an in-process
  * mock server (`HandshakeSpec`), the WalSocketSpec pattern one layer
  * earlier in the connection's life.
  */
final class PgReplicationHandshake(in: DataInputStream, out: DataOutputStream) {

  import PgReplicationHandshake._

  /** `IDENTIFY_SYSTEM` row: system identifier, timeline, current WAL
    * flush LSN, connected database. */
  final case class SystemIdent(systemId: String, timeline: Long, xlogPos: Long,
                               dbName: String)

  private var ready = false

  /** Send StartupMessage(user, database, replication=database) and drain
    * backend responses to the first ReadyForQuery. Trust auth only. */
  def startup(user: String, database: String): Unit = {
    val params = Seq("user" -> user, "database" -> database,
      "replication" -> "database")
    val body = params.flatMap { case (k, v) => cstr(k) ++ cstr(v) } :+ 0.toByte
    val b = ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).putInt(196608) // protocol 3.0
    b.put(body.toArray)
    out.write(b.array()); out.flush()
    drainToReady()
  }

  /** `IDENTIFY_SYSTEM` — the first command the reference issues on a
    * replication connection (postgres.go:159-163 goes straight to
    * StartReplication; pglogrepl's StartReplication calls this to learn
    * the server LSN). */
  def identifySystem(): SystemIdent = {
    require(ready, "startup() first")
    query("IDENTIFY_SYSTEM")
    val rows = drainRows()
    val r = rows.headOption.getOrElse(
      throw new IllegalStateException("IDENTIFY_SYSTEM returned no row"))
    SystemIdent(r(0), r(1).toLong, parseLsn(r(2)), r(3))
  }

  /** `CREATE_REPLICATION_SLOT slot LOGICAL pgoutput` — true if created,
    * false if it already existed (SQLSTATE 42710, which the reference
    * treats as success: postgres.go:141-150). Any other error rethrows. */
  def createReplicationSlot(slot: String): Boolean = {
    require(ready, "startup() first")
    query(s"CREATE_REPLICATION_SLOT $slot LOGICAL pgoutput")
    try { drainRows(); true }
    catch {
      case e: BackendError if e.sqlState == "42710" => false
    }
  }

  /** `START_REPLICATION SLOT ... LOGICAL lsn (proto_version '1',
    * publication_names '...')` — returns once the backend answers
    * CopyBothResponse; the streams then belong to [[WalReceiveLoop]]
    * (reference command text: postgres.go:164-175). */
  def startReplication(slot: String, startLsn: Long, publication: String): Unit = {
    require(ready, "startup() first")
    query(s"START_REPLICATION SLOT $slot LOGICAL ${lsnString(startLsn)} " +
      s"(proto_version '1', publication_names '$publication')")
    var going = true
    while (going) {
      val (tag, payload) = readMessage()
      tag match {
        case 'W' => going = false // CopyBothResponse — streaming begins
        case 'E' => throw backendError(payload)
        case _ => // ParameterStatus / notices before the cutover
      }
    }
  }

  // ---- frontend messages -------------------------------------------------

  private def query(sql: String): Unit = {
    val s = cstr(sql)
    val b = ByteBuffer.allocate(5 + s.length)
    b.put('Q'.toByte).putInt(4 + s.length).put(s.toArray)
    out.write(b.array()); out.flush()
  }

  // ---- backend drain -----------------------------------------------------

  private def readMessage(): (Char, Array[Byte]) = {
    val tag = in.readByte().toChar
    val len = in.readInt() - 4
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (tag, payload)
  }

  private def drainToReady(): Unit = {
    var going = true
    while (going) {
      val (tag, payload) = readMessage()
      tag match {
        case 'R' =>
          val authType = ByteBuffer.wrap(payload).getInt
          if (authType != 0)
            throw new IllegalStateException(
              s"unsupported Authentication subtype $authType — this offline " +
                "build speaks trust auth only (SCRAM needs a live server)")
        case 'Z' => ready = true; going = false
        case 'E' => throw backendError(payload)
        case _ => // ParameterStatus / BackendKeyData / NoticeResponse
      }
    }
  }

  /** Rows of a simple-query result (text format), draining to
    * ReadyForQuery; a BackendError still drains before throwing so the
    * connection stays usable (the 42710 slot-exists path). */
  private def drainRows(): Seq[IndexedSeq[String]] = {
    val rows = Seq.newBuilder[IndexedSeq[String]]
    var err: BackendError = null
    var going = true
    while (going) {
      val (tag, payload) = readMessage()
      tag match {
        case 'D' =>
          val b = ByteBuffer.wrap(payload)
          val n = b.getShort.toInt
          rows += IndexedSeq.fill(n) {
            val l = b.getInt
            if (l < 0) null
            else { val v = new Array[Byte](l); b.get(v); new String(v, UTF_8) }
          }
        case 'E' => err = backendError(payload)
        case 'Z' => going = false
        case _ => // RowDescription / CommandComplete / notices
      }
    }
    if (err != null) throw err
    rows.result()
  }

  private def backendError(payload: Array[Byte]): BackendError = {
    // ErrorResponse: (fieldType byte, cstring)* terminated by 0
    var code = ""; var msg = ""
    val b = ByteBuffer.wrap(payload)
    var t = b.get()
    while (t != 0) {
      val sb = new StringBuilder
      var c = b.get()
      while (c != 0) { sb.append(c.toChar); c = b.get() }
      t match {
        case 'C' => code = sb.toString
        case 'M' => msg = sb.toString
        case _ =>
      }
      t = if (b.hasRemaining) b.get() else 0
    }
    BackendError(code, msg)
  }
}

object PgReplicationHandshake {

  /** Backend ErrorResponse with its SQLSTATE, e.g. 42710 duplicate_object. */
  final case class BackendError(sqlState: String, message: String)
    extends RuntimeException(s"$sqlState: $message")

  private def cstr(s: String): Seq[Byte] =
    s.getBytes(UTF_8).toSeq :+ 0.toByte

  /** LSN rendered the way the wire protocol prints it: `XXXXXXXX/YYYYYYYY`. */
  def lsnString(lsn: Long): String =
    f"${lsn >>> 32}%X/${lsn & 0xffffffffL}%X"

  /** Parse `X/Y` hex LSN text into the 64-bit LSN. */
  def parseLsn(s: String): Long = {
    val i = s.indexOf('/')
    require(i > 0, s"bad LSN: $s")
    (java.lang.Long.parseLong(s.substring(0, i), 16) << 32) |
      java.lang.Long.parseLong(s.substring(i + 1), 16)
  }
}
