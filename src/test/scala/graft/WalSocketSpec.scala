package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import graft.sources.{PgOutputWire, WalReceiveLoop}
import org.scalatest.funsuite.AnyFunSuite

/** S1 socket seam: an in-process mock walsender speaks the CopyBoth side
  * of the replication protocol ('w' XLogData wrapping pgoutput messages,
  * 'k' keepalive with reply-requested, CopyDone), and the receive loop
  * must drain it into committed changes while acking keepalives with
  * StandbyStatusUpdate — byte-asserted here, the same mock-server pattern
  * SinkSpec uses for the HTTP sinks. Everything short of the TCP dial to
  * a real PostgreSQL (startup/auth handshake) is covered.
  */
class WalSocketSpec extends AnyFunSuite {

  private def copyData(sub: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 4 + sub.length)
    b.put('d'.toByte).putInt(4 + sub.length).put(sub)
    b.array()
  }

  private def xlog(walStart: Long, walEnd: Long, msg: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 24 + msg.length)
    b.put('w'.toByte).putLong(walStart).putLong(walEnd).putLong(777L).put(msg)
    copyData(b.array())
  }

  private def keepalive(walEnd: Long, replyRequested: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 17)
    b.put('k'.toByte).putLong(walEnd).putLong(777L)
      .put(if (replyRequested) 1.toByte else 0.toByte)
    copyData(b.array())
  }

  test("receive loop drains XLogData, acks keepalives, decodes commits") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val statusUpdates = new LinkedBlockingQueue[Array[Byte]]()
    val serverThread = new Thread(() => {
      val s = server.accept()
      try {
        val sout = new DataOutputStream(s.getOutputStream)
        val sin = new DataInputStream(s.getInputStream)
        import PgOutputWire._
        // one committed transaction: insert + TOASTed update + delete
        sout.write(xlog(100, 110, begin(190, 7)))
        sout.write(xlog(110, 120,
          relation(1, "public", "documents", Seq("id", "title", "content"))))
        sout.write(xlog(120, 130, insert(1,
          tupleData(Seq(Some("1"), Some("hello"), Some("body"))))))
        sout.write(xlog(130, 140, update(1,
          tupleData(Seq(Some("1"), Some("hello2"), None), toastMarkers = Set(2)))))
        sout.write(xlog(140, 150, delete(1,
          Some(tupleData(Seq(Some("1"), None, None))))))
        sout.write(xlog(150, 160, commit(190)))
        // an uncommitted tail that must NOT surface
        sout.write(xlog(200, 210, begin(290, 8)))
        sout.write(xlog(210, 220, insert(1,
          tupleData(Seq(Some("2"), Some("phantom"), None)))))
        // keepalive demanding a reply — read back the StandbyStatusUpdate
        sout.write(keepalive(300, replyRequested = true))
        sout.flush()
        val tag = sin.readByte()
        val len = sin.readInt() - 4
        val payload = new Array[Byte](len)
        sin.readFully(payload)
        statusUpdates.put(Array(tag) ++ payload)
        // CopyDone ends the stream
        sout.write(Array[Byte]('c'.toByte, 0, 0, 0, 4))
        sout.flush()
      } finally s.close()
    })
    serverThread.start()

    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val loop = new WalReceiveLoop(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream),
        clockMicros = () => 123456L)
      loop.run()

      // decoded changes: exactly the committed transaction, in order, with
      // the TOAST collapse and the commit-LSN stamp; the uncommitted tail
      // emits nothing (S5)
      val changes = loop.changes()
      assert(changes.map(_.op) == Seq("c", "u", "d"))
      assert(changes.forall(_.lsn == 190L))
      assert(changes.forall(c => c.schema == "public" && c.table == "documents"))
      assert(changes.map(_.primaryKey) == Seq("1", "1", "1"))
      assert(changes(0).after.exists(_("title") == "hello"))
      assert(changes(1).after.exists(_("title") == "hello2"))
      assert(changes(1).after.exists(_("content") == null)) // unchanged TOAST → null
      assert(loop.walEnd == 300L)

      // the StandbyStatusUpdate the mock walsender received, byte by byte:
      // CopyData('d') wrapping 'r', three LSNs at the acked walEnd (the
      // keepalive's 300), the injected clock, replyRequested 0
      val su = statusUpdates.poll(5, TimeUnit.SECONDS)
      assert(su != null, "no StandbyStatusUpdate arrived")
      val b = ByteBuffer.wrap(su)
      assert(b.get() == 'd'.toByte)
      assert(b.get() == 'r'.toByte)
      assert(b.getLong() == 300L) // write LSN
      assert(b.getLong() == 300L) // flush LSN
      assert(b.getLong() == 300L) // apply LSN
      assert(b.getLong() == 123456L) // client clock (injected)
      assert(b.get() == 0.toByte) // no reply requested back
      assert(!b.hasRemaining)
    } finally {
      sock.close()
      serverThread.join(5000)
      server.close()
    }
  }

  test("flush-tracked acks report only the PERSISTED position, not the received one") {
    // Acking received-but-unwritten frames advances the slot's
    // confirmed_flush past data that exists only in process memory — a
    // crash then loses it forever. With markFlushed tracking active (the
    // LiveWalRunner contract), the flush/apply fields must lag at the
    // durably-persisted LSN while the write field reports receipt.
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val statusUpdates = new LinkedBlockingQueue[Array[Byte]]()
    val serverThread = new Thread(() => {
      val s = server.accept()
      try {
        val sout = new DataOutputStream(s.getOutputStream)
        val sin = new DataInputStream(s.getInputStream)
        import PgOutputWire._
        def readStatus(): Unit = {
          val tag = sin.readByte()
          val len = sin.readInt() - 4
          val payload = new Array[Byte](len)
          sin.readFully(payload)
          statusUpdates.put(Array(tag) ++ payload)
        }
        sout.write(xlog(100, 110, begin(190, 7)))
        sout.write(xlog(110, 120, insert(1,
          tupleData(Seq(Some("1"), Some("x"), None)))))
        sout.write(keepalive(200, replyRequested = true)); sout.flush()
        readStatus() // ack #1: nothing persisted yet
        sout.write(keepalive(210, replyRequested = true)); sout.flush()
        readStatus() // ack #2: client marked 110 flushed in between
        sout.write(Array[Byte]('c'.toByte, 0, 0, 0, 4)); sout.flush()
      } finally s.close()
    })
    serverThread.start()

    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val loop = new WalReceiveLoop(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream),
        clockMicros = () => 1L)
      loop.markFlushed(0L) // activate durability tracking (runner contract)
      // exactly three messages: begin, insert, keepalive #1 (forces ack
      // #1). Stepping further would race ahead and consume keepalive #2
      // before markFlushed below.
      (1 to 3).foreach(_ => loop.step())
      val ack1 = ByteBuffer.wrap(statusUpdates.poll(5, TimeUnit.SECONDS))
      ack1.get(); ack1.get()
      assert(ack1.getLong() == 200L, "write LSN must report receipt")
      assert(ack1.getLong() == 0L, "flush LSN must NOT report unpersisted frames")
      assert(ack1.getLong() == 0L, "apply LSN must NOT report unpersisted frames")
      // persist through 110, then the next keepalive acks it
      loop.markFlushed(110L)
      loop.run() // drains keepalive #2 + CopyDone
      val ack2 = ByteBuffer.wrap(statusUpdates.poll(5, TimeUnit.SECONDS))
      ack2.get(); ack2.get()
      assert(ack2.getLong() == 210L) // write: received through 210
      assert(ack2.getLong() == 110L, "flush LSN must advance to the persisted position")
      assert(ack2.getLong() == 110L)
      // monotonicity: a stale markFlushed cannot regress the ack
      loop.markFlushed(50L)
      assert(loop.walEnd == 210L)
    } finally {
      sock.close()
      serverThread.join(5000)
      server.close()
    }
  }
}
