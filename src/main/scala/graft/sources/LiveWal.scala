package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.file.{Files, Path, StandardCopyOption}

/** The live half of the S1 CDC source, composed from the spec-verified
  * layers: dial → [[PgReplicationHandshake]] (startup, slot,
  * START_REPLICATION) → [[WalReceiveLoop]] (CopyBoth drain + keepalive
  * acks) → [[WalSegmentTap]] (slot-ordered segment files) → the
  * `graft-pgoutput` DataSourceV2 (`PgOutputReplaySource`), which streams
  * the segments into DataFrames with Spark-checkpointed offsets. This is
  * the reference's full topology (postgres.go:95-221 feeding the
  * pipeline) mapped onto Spark's source seam.
  *
  * Only [[connect]]'s `new Socket(host, port)` line needs a live server;
  * every protocol byte above it is asserted offline by `HandshakeSpec` /
  * `WalSocketSpec`, and the tap's file contract by `HandshakeSpec`'s
  * roundtrip (the segment bytes re-decode to the received transactions).
  */
object LiveWal {

  /** Dial and run the replication handshake to the CopyBoth cutover.
    * Returns the socket (caller closes) and the connected receive loop.
    *
    * `startLsn` 0 requests position 0/0, which the server clamps UP to
    * the slot's confirmed_flush — so a reconnect resumes exactly where
    * the acked stream left off. (Requesting the server's CURRENT
    * `ident.xlogPos` here would silently skip every transaction
    * committed during an outage: PostgreSQL starts logical streaming at
    * max(confirmed_flush, requested). For a freshly created slot,
    * confirmed_flush is the creation point, so 0/0 matches the
    * reference's fresh-slot behavior too, postgres.go:152-158.)
    *
    * A `password` enables SCRAM-SHA-256 when the server demands it. The
    * publication (when `createPublication`) is created `FOR ALL TABLES`
    * if missing, then the slot — both 42710-tolerant, the reference's
    * bootstrap order (postgres.go:124-150). `CREATE PUBLICATION FOR ALL
    * TABLES` needs superuser, and PostgreSQL checks privilege BEFORE the
    * duplicate-name check, so a hardened replication role gets 42501
    * even when a DBA pre-created the publication — that case warns and
    * proceeds (a genuinely missing publication still fails loudly at
    * START_REPLICATION). */
  def connect(host: String, port: Int, user: String, database: String,
              slot: String, publication: String,
              startLsn: Long = 0L,
              password: Option[String] = None,
              createPublication: Boolean = true,
              createSlot: Boolean = true,
              sslMode: String = PgTls.ModeDisable,
              sslContext: Option[javax.net.ssl.SSLContext] = None)
    : (Socket, WalReceiveLoop) = {
    val raw = new Socket(host, port)
    // TLS upgrade happens BEFORE the StartupMessage (SSLRequest preamble);
    // everything after — SCRAM included — rides the negotiated streams
    val sock = PgTls.negotiate(raw, host, sslMode, sslContext)
    // channel binding from the negotiated session: enables the
    // SCRAM-SHA-256-PLUS variant when the server offers it (a MITM that
    // terminated TLS with its own certificate then fails authentication)
    val binding = sock match {
      case ssl: javax.net.ssl.SSLSocket =>
        try ssl.getSession.getPeerCertificates.headOption.collect {
          case c: java.security.cert.X509Certificate =>
            ScramAuth.tlsServerEndPoint(c)
        }
        catch { case _: javax.net.ssl.SSLPeerUnverifiedException => None }
      case _ => None
    }
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    val hs = new PgReplicationHandshake(in, out, password,
      channelBinding = binding)
    hs.startup(user, database)
    hs.identifySystem() // walsender sanity + timeline visibility
    if (createPublication)
      try hs.createPublication(publication) // false (already exists) is fine
      catch {
        case e: PgReplicationHandshake.BackendError if e.sqlState == "42501" =>
          System.err.println(s"[graft] CREATE PUBLICATION denied (42501) — " +
            "assuming a pre-created publication; START_REPLICATION will " +
            "fail if it is actually missing")
      }
    if (createSlot)
      hs.createReplicationSlot(slot) // false (already exists) is fine
    hs.startReplication(slot, math.max(startLsn, 0L), publication)
    (sock, new WalReceiveLoop(in, out))
  }
}

/** Writes drained WAL frames as slot-ordered binary segment files in the
  * exact framing `PgOutputWire.decodeSegment` / the `graft-pgoutput`
  * source's `wire_format=pgoutput` reader consume. Files appear
  * atomically (tmp + move) so a concurrently-polling streaming source
  * never reads a half-written segment, and names are zero-padded so the
  * source's name-ordered consumption matches arrival order. */
class WalSegmentTap(dir: Path) {
  Files.createDirectories(dir)
  // resume numbering after existing segments: a restarted process must
  // APPEND to the store, not overwrite segment-00000000.bin (the
  // streaming source's checkpointed offset counts files ever seen)
  private var n = {
    val listing = Files.list(dir)
    try {
      val it = listing.iterator()
      var max = -1
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        // only OUR zero-padded names count — an operator's stray copy
        // (segment-backup.bin) must be skipped, not crash the constructor
        if (name.matches("segment-\\d{1,9}\\.bin"))
          max = math.max(max, name.stripPrefix("segment-")
            .stripSuffix(".bin").toInt)
      }
      max + 1
    } finally listing.close()
  }

  /** Write one segment if there is anything to write; returns its path.
    *
    * Durability contract: the flush-aware ack ([[LiveWalRunner]]) reports
    * this segment's LSNs as flushed, after which the slot will never
    * re-deliver them — so the bytes must survive an OS/power crash, not
    * just a process crash. Hence force(true) on the file channel before
    * the atomic rename, and an fsync of the directory after it (a rename
    * is only durable once the directory entry is). */
  def write(frames: Seq[(Long, Array[Byte])]): Option[Path] =
    if (frames.isEmpty) None
    else {
      val name = f"segment-$n%08d.bin"
      val tmp = dir.resolve(s".$name.tmp")
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val buf = java.nio.ByteBuffer.wrap(PgOutputWire.frame(frames))
        while (buf.hasRemaining) ch.write(buf)
        ch.force(true)
      } finally ch.close()
      val p = dir.resolve(name)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      fsyncDir()
      n += 1
      Some(p)
    }

  /** The directory-entry force itself — overridable in specs to model a
    * filesystem that refuses read-channel force on directories. */
  protected def forceDir(): Unit = {
    val dch = java.nio.channels.FileChannel.open(dir,
      java.nio.file.StandardOpenOption.READ)
    try dch.force(true) finally dch.close()
  }

  /** The degraded-durability operator warning (single emission point so
    * specs can observe it). */
  protected def warnRenameOnly(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)

  @volatile private var warnedFsyncDir = false

  /** fsync the segment directory so the rename's entry is durable; some
    * filesystems refuse read-channel force on directories — then the move
    * itself is the best available barrier, so a refusal is tolerated. It
    * is WARNED once (not silent): on such a filesystem segment-ack
    * durability is rename-only, and the operator deciding whether that is
    * acceptable needs to know it happened. */
  private def fsyncDir(): Unit =
    try forceDir()
    catch {
      case e: java.io.IOException =>
        if (!warnedFsyncDir) {
          warnedFsyncDir = true
          warnRenameOnly(s"directory fsync refused on $dir " +
            s"(${e.getMessage}): segment-ack durability is rename-only on " +
            "this filesystem — an OS crash between rename and ack may lose " +
            "the segment's directory entry while the slot no longer " +
            "re-delivers it")
        }
    }

  /** Drain the loop's buffer into the next segment file. */
  def tap(loop: WalReceiveLoop): Option[Path] = write(loop.drainFrames())
}

/** Incremental ingest driver: steps the receive loop message by message
  * and cuts a segment whenever ≥ `minFramesPerSegment` frames are
  * buffered AND the newest frame is a Commit — so a segment never splits
  * a transaction (commit-time emission, S5, holds per segment file), and
  * every segment is SELF-CONTAINED: Relation messages pgoutput sends only
  * once per connection are cached by the runner and re-emitted at the
  * head of every later segment, so the `graft-pgoutput` reader's
  * self-contained-segment contract (`PgOutputWire.decodeSegment`'s
  * documented precondition) holds for every file independently. The final
  * drain on CopyDone/disconnect flushes the tail; an uncommitted trailing
  * transaction decodes to nothing there — correct, because an
  * uncommitted transaction will be re-delivered by the slot on
  * reconnect. */
final class LiveWalRunner(loop: WalReceiveLoop, tap: WalSegmentTap,
                          minFramesPerSegment: Int = 64) {

  // Activate flush-aware acking: status updates must report as flushed
  // only what tap.write has durably persisted — NOT the received
  // position — or a crash between receive and cut() would lose the
  // buffered frames forever (the slot never re-delivers at or below
  // confirmed_flush). Unflushed-but-received frames re-deliver on
  // reconnect; the downstream merge is LSN-monotonic idempotent.
  loop.markFlushed(0L)

  // relId → latest Relation frame seen (insertion-ordered for stable output)
  private val relCache =
    scala.collection.mutable.LinkedHashMap[Int, (Long, Array[Byte])]()

  /** Consume the stream to its end, cutting segments as transactions
    * commit; returns the segment paths written. */
  def run(): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    var go = true
    while (go) {
      go = loop.step()
      if (loop.pendingFrames >= minFramesPerSegment &&
          loop.lastFrameTag == 'C') cut().foreach(out += _)
    }
    cut().foreach(out += _) // tail flush (uncommitted tail decodes empty)
    out.result()
  }

  private def cut(): Option[Path] = {
    val drained = loop.drainFrames()
    if (drained.isEmpty) None
    else {
      // A relation counts as carried only if its Relation frame PRECEDES
      // that relation's first data frame in this batch — pgoutput may
      // re-send a Relation mid-segment after a schema change, and rows
      // before the re-send still need the cached frame prepended (those
      // rows were encoded under the cached schema, which decodeSegment
      // replays in order: cached R → old rows → new R → new rows).
      val seenRel = scala.collection.mutable.Set[Int]()
      val needCached = scala.collection.mutable.LinkedHashSet[Int]()
      drained.foreach { case (_, p) =>
        p.headOption.map(_.toChar) match {
          case Some('R') =>
            seenRel += java.nio.ByteBuffer.wrap(p).getInt(1)
          case Some('I') | Some('U') | Some('D') =>
            val relId = java.nio.ByteBuffer.wrap(p).getInt(1)
            if (!seenRel(relId)) needCached += relId
          case _ =>
        }
      }
      val prefix = relCache.collect {
        case (relId, frame) if needCached(relId) => frame
      }.toSeq
      drained.foreach {
        case (lsn, p) if p.headOption.contains('R'.toByte) =>
          relCache.update(java.nio.ByteBuffer.wrap(p).getInt(1), (lsn, p))
        case _ =>
      }
      val written = tap.write(prefix ++ drained)
      // the segment is durably on disk — only NOW may acks advance the
      // slot's confirmed_flush past these frames
      loop.markFlushed(drained.iterator.map(_._1).max)
      written
    }
  }
}
