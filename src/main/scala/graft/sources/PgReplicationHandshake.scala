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
  * Authentication/ParameterStatus/BackendKeyData/ReadyForQuery drain
  * with trust AND SCRAM-SHA-256 auth (the [[ScramClient]] SASL exchange
  * wrapped in AuthenticationSASL/SASLInitialResponse/SASLContinue/
  * SASLFinal — what any real-world server demands; the reference gets it
  * from its driver's DSN, postgres.go:97-113), simple Query for the
  * replication-command mini-language (`IDENTIFY_SYSTEM`,
  * `CREATE_REPLICATION_SLOT ... LOGICAL pgoutput`,
  * `START_REPLICATION SLOT ...`) plus the `CREATE PUBLICATION` bootstrap
  * (postgres.go:124-140), and the CopyBothResponse cutover. Identifiers
  * are double-quote-escaped and the publication_names literal
  * single-quote-escaped, so names survive quotes/spaces/commas intact.
  * Byte framing is spec-verified against an in-process mock server
  * (`HandshakeSpec`), the WalSocketSpec pattern one layer earlier in the
  * connection's life; the SCRAM math is pinned to the RFC 7677 test
  * vector in `ScramSpec`.
  *
  * @param password  credential for SCRAM; None = trust-auth-only (a SASL
  *                  challenge then fails with a descriptive error)
  * @param nonceGen  client-nonce source — injectable so specs drive the
  *                  exchange deterministically; defaults to SecureRandom
  * @param channelBinding  the TLS channel's `tls-server-end-point` data
  *                  ([[ScramAuth.tlsServerEndPoint]] of the peer
  *                  certificate); when present AND the server offers
  *                  SCRAM-SHA-256-PLUS, the bound variant runs — a
  *                  TLS-terminating MITM then corrupts the binding and
  *                  authentication fails
  */
final class PgReplicationHandshake(in: DataInputStream, out: DataOutputStream,
                                   password: Option[String] = None,
                                   nonceGen: () => String = ScramAuth.randomNonce,
                                   channelBinding: Option[Array[Byte]] = None) {

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
    query(s"CREATE_REPLICATION_SLOT ${quoteIdent(slot)} LOGICAL pgoutput")
    try { drainRows(); true }
    catch {
      case e: BackendError if e.sqlState == "42710" => false
    }
  }

  /** `CREATE PUBLICATION name FOR ALL TABLES` over the simple-query
    * protocol (a `replication=database` connection accepts plain SQL) —
    * the optional bootstrap the reference performs before the slot
    * (postgres.go:124-140). Returns true if created, false if it already
    * existed (42710 duplicate_object, tolerated exactly like the slot). */
  def createPublication(name: String): Boolean = {
    require(ready, "startup() first")
    query(s"CREATE PUBLICATION ${quoteIdent(name)} FOR ALL TABLES")
    try { drainRows(); true }
    catch {
      case e: BackendError if e.sqlState == "42710" => false
    }
  }

  /** Execute one simple-query command and return its text-format rows —
    * a `replication=database` session accepts plain SQL, which the gated
    * live-server smoke harness (`LivePostgresSpec`) uses for DDL and seed
    * data. Throws [[BackendError]] on any server error. */
  def exec(sql: String): Seq[IndexedSeq[String]] = {
    require(ready, "startup() first")
    query(sql)
    drainRows()
  }

  /** `START_REPLICATION SLOT ... LOGICAL lsn (proto_version '1',
    * publication_names '...')` — returns once the backend answers
    * CopyBothResponse; the streams then belong to [[WalReceiveLoop]]
    * (reference command text: postgres.go:164-175). */
  def startReplication(slot: String, startLsn: Long, publication: String): Unit = {
    require(ready, "startup() first")
    // publication_names is a single-quoted LITERAL whose content pgoutput
    // splits as an identifier list — so the name is double-quote-escaped
    // inside the literal, and the literal itself single-quote-escaped
    // (the pglogrepl treatment; a quote/space/comma in the name survives)
    val pubLiteral = quoteLiteral(quoteIdent(publication))
    query(s"START_REPLICATION SLOT ${quoteIdent(slot)} LOGICAL " +
      s"${lsnString(startLsn)} (proto_version '1', " +
      s"publication_names $pubLiteral)")
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
    var scram: ScramClient = null
    var going = true
    while (going) {
      val (tag, payload) = readMessage()
      tag match {
        case 'R' =>
          val b = ByteBuffer.wrap(payload)
          b.getInt match {
            case 0 => // AuthenticationOk
            case 10 => // AuthenticationSASL: cstring mechanism list
              val mechanisms = Iterator
                .continually(readCString(b)).takeWhile(_.nonEmpty).toSeq
              // prefer the channel-bound variant whenever both sides can:
              // binding data exists (TLS dial) and the server offers -PLUS
              val usePlus = channelBinding.isDefined &&
                mechanisms.contains(ScramAuth.MechanismPlus)
              val mech =
                if (usePlus) ScramAuth.MechanismPlus
                else if (mechanisms.contains(ScramAuth.Mechanism))
                  ScramAuth.Mechanism
                else throw new IllegalStateException(
                  s"server offers ${mechanisms.mkString(",")}; only " +
                    s"${ScramAuth.Mechanism} (and ${ScramAuth.MechanismPlus} " +
                    "over TLS) are supported")
              val pw = password.getOrElse(throw new IllegalStateException(
                "server demands SCRAM authentication but no password was " +
                  "configured — pass one to PgReplicationHandshake"))
              scram = new ScramClient(pw, nonceGen(),
                if (usePlus) channelBinding else None)
              val first = scram.clientFirstMessage().getBytes(UTF_8)
              // SASLInitialResponse: cstr(mechanism), int32 len, response
              val body = cstr(mech) ++
                intBytes(first.length) ++ first.toSeq
              send('p', body)
            case 11 => // AuthenticationSASLContinue: server-first-message
              require(scram != null, "SASLContinue before SASL start")
              val serverFirst = new String(payload, 4, payload.length - 4, UTF_8)
              send('p', scram.clientFinalMessage(serverFirst)
                .getBytes(UTF_8).toSeq)
            case 12 => // AuthenticationSASLFinal: server-final-message
              require(scram != null, "SASLFinal before SASL start")
              scram.verifyServerFinal(
                new String(payload, 4, payload.length - 4, UTF_8))
            case other =>
              throw new IllegalStateException(
                s"unsupported Authentication subtype $other — trust and " +
                  s"${ScramAuth.Mechanism} are implemented (md5 and cleartext " +
                  "are legacy; prefer a SCRAM-enabled server)")
          }
        case 'Z' => ready = true; going = false
        case 'E' => throw backendError(payload)
        case _ => // ParameterStatus / BackendKeyData / NoticeResponse
      }
    }
  }

  private def send(tag: Char, body: Seq[Byte]): Unit = {
    val b = ByteBuffer.allocate(5 + body.length)
    b.put(tag.toByte).putInt(4 + body.length).put(body.toArray)
    out.write(b.array()); out.flush()
  }

  private def intBytes(v: Int): Seq[Byte] =
    ByteBuffer.allocate(4).putInt(v).array().toSeq

  private def readCString(b: ByteBuffer): String = {
    val sb = new StringBuilder
    var c = if (b.hasRemaining) b.get() else 0
    while (c != 0) { sb.append(c.toChar); c = if (b.hasRemaining) b.get() else 0 }
    sb.toString
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

  /** Double-quoted identifier with internal quotes doubled — the exact
    * name is used verbatim (no lower-case folding), and quotes, spaces,
    * and commas cannot break or inject into the command text. */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Single-quoted SQL string literal with internal quotes doubled. */
  def quoteLiteral(value: String): String =
    "'" + value.replace("'", "''") + "'"

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
