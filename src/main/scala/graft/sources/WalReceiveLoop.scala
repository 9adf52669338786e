package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.ByteBuffer

/** Replication-stream receive loop — the live-socket half of the S1 CDC
  * source (reference: internal/cdc/postgres/postgres.go:180-221). Consumes
  * an ESTABLISHED CopyBoth byte stream (the post-handshake state of a
  * `START_REPLICATION ... (proto_version '1', publication_names ...)`
  * session): 'w' XLogData frames accumulate into exactly the segment
  * framing [[PgOutputWire.decodeSegment]] replays, and a 'k' keepalive
  * with reply-requested is answered immediately with a StandbyStatusUpdate
  * acknowledging the last received walEnd — the liveness contract that
  * keeps a walsender from disconnecting the client
  * (reference: postgres.go:198-218).
  *
  * The connection handshake itself (startup packet with
  * `replication=database`, auth, slot/publication DDL) needs a live
  * PostgreSQL server and deliberately stays out of scope in this offline
  * build (SURVEY.md §7.3); everything downstream of it — CopyBoth message
  * framing, XLogData/keepalive dispatch, status updates, pgoutput decode —
  * is implemented here and spec-verified against an in-process mock
  * walsender socket (WalSocketSpec).
  */
final class WalReceiveLoop(in: DataInputStream, out: DataOutputStream,
                           clockMicros: () => Long = WalReceiveLoop.pgClockMicros) {

  private val frames = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
  private var lastWalEnd = 0L
  // -1 = no durability tracking installed → acks report the received
  // position as flushed (the reference's behavior, postgres.go:207-216 —
  // safe only when the consumer is the in-process decode). A persistent
  // consumer (LiveWalRunner) calls markFlushed to switch the flush/apply
  // fields to the PERSISTED position: acking received-but-unwritten
  // frames advances the slot's confirmed_flush past data that exists
  // only in this process's memory, and a crash then loses it forever —
  // the slot will not re-deliver at or below confirmed_flush.
  @volatile private var flushedWal = -1L

  /** Record that everything up to `lsn` is durably persisted; from the
    * first call on, status updates ack only this position as
    * flushed/applied (monotone — stale calls cannot regress it). */
  def markFlushed(lsn: Long): Unit =
    flushedWal = math.max(math.max(flushedWal, 0L), lsn)

  /** The durably-acked position (0 before any [[markFlushed]]): everything
    * at or below it has been reported flushed to the server, which will
    * therefore never re-deliver it — the replay horizon a downstream
    * store's tombstone GC may safely use. */
  def flushedLsn: Long = math.max(flushedWal, 0L)

  /** Consume protocol messages until CopyDone / error / EOF. */
  def run(): Unit = {
    var go = true
    while (go) go = step()
  }

  /** One frontend-protocol message (tag byte + self-inclusive int32
    * length); false ends the loop. */
  def step(): Boolean =
    try {
      val tag = in.readByte()
      val len = in.readInt() - 4
      val payload = new Array[Byte](len)
      in.readFully(payload)
      tag match {
        case 'd' => copyData(payload); true
        case 'c' => false // CopyDone — server finished the stream
        case 'E' => false // ErrorResponse — stop; decoded tail stays valid
        case _ => true // NoticeResponse / ParameterStatus — ignored
      }
    } catch { case _: EOFException => false }

  private def copyData(payload: Array[Byte]): Unit = {
    val b = ByteBuffer.wrap(payload)
    b.get() match {
      case 'w' => // XLogData: walStart(8) walEnd(8) sendTime(8) message
        val walStart = b.getLong()
        lastWalEnd = math.max(lastWalEnd, b.getLong())
        b.getLong() // server send time
        val msg = new Array[Byte](b.remaining())
        b.get(msg)
        frames += ((walStart, msg))
      case 'k' => // keepalive: walEnd(8) serverTime(8) replyRequested(1)
        lastWalEnd = math.max(lastWalEnd, b.getLong())
        b.getLong()
        if (b.get() == 1) sendStatusUpdate()
      case _ => // unknown CopyData subtype — ignored
    }
  }

  /** StandbyStatusUpdate ('r' in CopyData): write LSN = last received
    * walEnd; flush/apply LSN = the durably-persisted position when
    * [[markFlushed]] tracking is active, else the received position
    * (the reference's ack, postgres.go:207-216); clock is µs since the
    * PostgreSQL epoch. */
  def sendStatusUpdate(): Unit = {
    val flushPos = if (flushedWal >= 0L) flushedWal else lastWalEnd
    val b = ByteBuffer.allocate(1 + 4 + 34)
    b.put('d'.toByte).putInt(4 + 34)
    b.put('r'.toByte)
      .putLong(lastWalEnd).putLong(flushPos).putLong(flushPos)
      .putLong(clockMicros()).put(0.toByte)
    out.write(b.array())
    out.flush()
  }

  /** Everything received so far, decoded to committed changes (the
    * accumulated frames are one self-contained logical segment, so the
    * session-long relation cache semantics of a live connection hold). */
  def changes(idColumn: String => String = _ => "id"): Seq[PgOutputWire.Change] =
    PgOutputWire.decodeSegment(PgOutputWire.frame(frames.toSeq), idColumn)

  /** Highest walEnd observed (what the next status update acks). */
  def walEnd: Long = lastWalEnd

  /** Remove and return everything received since the last drain — the
    * [[WalSegmentTap]] consumes these into slot-ordered segment files for
    * the `graft-pgoutput` DataSourceV2 to stream. `changes()` reads the
    * buffer non-destructively; a caller uses one style or the other. */
  def drainFrames(): Seq[(Long, Array[Byte])] = {
    val out = frames.toSeq
    frames.clear()
    out
  }

  /** Frames buffered since the last drain. */
  def pendingFrames: Int = frames.size

  /** pgoutput tag of the newest buffered frame (0 if none) — the
    * [[LiveWalRunner]] cuts segments only when this is 'C' (Commit), so
    * no segment ever splits a transaction. */
  def lastFrameTag: Byte =
    if (frames.isEmpty) 0 else frames.last._2.headOption.getOrElse(0)
}

object WalReceiveLoop {
  /** Microseconds since the PostgreSQL epoch (2000-01-01 UTC) — the
    * protocol's timestamp basis. */
  def pgClockMicros(): Long =
    (System.currentTimeMillis() - 946684800000L) * 1000L
}
