package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import graft.sources.{PgOutputWire, PgReplicationHandshake, WalReceiveLoop}
import org.scalatest.funsuite.AnyFunSuite

/** S1 front door: the replication-connection handshake against an
  * in-process mock PostgreSQL backend — StartupMessage bytes
  * (protocol 3.0, replication=database), trust-auth drain,
  * IDENTIFY_SYSTEM over the simple-query protocol, slot-exists (42710)
  * tolerated like the reference, START_REPLICATION → CopyBothResponse,
  * then the SAME streams handed to WalReceiveLoop for an end-to-end
  * handshake→stream→decode pass. With WalSocketSpec this covers every
  * byte of S1 short of the dial to a live server and non-trust auth.
  */
class HandshakeSpec extends AnyFunSuite {

  // ---- backend message builders -----------------------------------------

  private def msg(tag: Char, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + body.length)
    b.put(tag.toByte).putInt(4 + body.length).put(body)
    b.array()
  }
  private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
  private def authOk = msg('R', ByteBuffer.allocate(4).putInt(0).array())
  private def paramStatus(k: String, v: String) = msg('S', cstr(k) ++ cstr(v))
  private def keyData = msg('K', ByteBuffer.allocate(8).putInt(42).putInt(7).array())
  private def readyForQuery = msg('Z', Array('I'.toByte))
  private def commandComplete(t: String) = msg('C', cstr(t))
  private def dataRow(cols: String*): Array[Byte] = {
    val body = ByteBuffer.allocate(2 + cols.map(c => 4 + c.length).sum)
    body.putShort(cols.size.toShort)
    cols.foreach { c => body.putInt(c.length).put(c.getBytes(UTF_8)) }
    msg('D', body.array())
  }
  private def rowDescription(names: String*): Array[Byte] = {
    val body = ByteBuffer.allocate(2 + names.map(n => n.length + 1 + 18).sum)
    body.putShort(names.size.toShort)
    names.foreach { n =>
      body.put(cstr(n)).putInt(0).putShort(0.toShort).putInt(25)
        .putShort((-1).toShort).putInt(-1).putShort(0.toShort)
    }
    msg('T', body.array())
  }
  private def errorResponse(state: String, m: String) =
    msg('E', Array('S'.toByte) ++ cstr("ERROR") ++ Array('C'.toByte) ++
      cstr(state) ++ Array('M'.toByte) ++ cstr(m) :+ 0.toByte)
  private def copyBoth = msg('W',
    ByteBuffer.allocate(3).put(0.toByte).putShort(0.toShort).array())
  private def copyData(sub: Array[Byte]) = msg('d', sub)
  private def xlog(walStart: Long, walEnd: Long, m: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(25 + m.length)
    b.put('w'.toByte).putLong(walStart).putLong(walEnd).putLong(777L).put(m)
    copyData(b.array())
  }

  private def readFrontend(in: DataInputStream, tagged: Boolean): (Char, Array[Byte]) = {
    val tag = if (tagged) in.readByte().toChar else ' '
    val len = in.readInt() - 4
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (tag, payload)
  }

  test("startup → identify → slot-exists → start replication → decode") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val seen = new LinkedBlockingQueue[(Char, Array[Byte])]()
    val serverThread = new Thread(() => {
      val s = server.accept()
      try {
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        // 1. StartupMessage (untagged)
        seen.put(readFrontend(sin, tagged = false))
        sout.write(authOk); sout.write(paramStatus("server_version", "16.0"))
        sout.write(keyData); sout.write(readyForQuery); sout.flush()
        // 2. IDENTIFY_SYSTEM
        seen.put(readFrontend(sin, tagged = true))
        sout.write(rowDescription("systemid", "timeline", "xlogpos", "dbname"))
        sout.write(dataRow("7357000", "1", "0/1A2B3C4D", "postgres"))
        sout.write(commandComplete("IDENTIFY_SYSTEM"))
        sout.write(readyForQuery); sout.flush()
        // 3. CREATE_REPLICATION_SLOT — already exists
        seen.put(readFrontend(sin, tagged = true))
        sout.write(errorResponse("42710", "replication slot \"graft\" already exists"))
        sout.write(readyForQuery); sout.flush()
        // 4. START_REPLICATION → CopyBoth → one committed tx → CopyDone
        seen.put(readFrontend(sin, tagged = true))
        sout.write(copyBoth)
        import PgOutputWire._
        sout.write(xlog(100, 110, begin(190, 7)))
        sout.write(xlog(110, 120,
          relation(1, "public", "documents", Seq("id", "title", "content"))))
        sout.write(xlog(120, 130, insert(1,
          tupleData(Seq(Some("9"), Some("hello"), Some("body"))))))
        sout.write(xlog(150, 160, commit(190)))
        sout.write(Array[Byte]('c'.toByte, 0, 0, 0, 4))
        sout.flush()
      } finally s.close()
    })
    serverThread.start()

    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val hs = new PgReplicationHandshake(in, out)
      hs.startup("rep", "postgres")
      val ident = hs.identifySystem()
      assert(ident.systemId == "7357000" && ident.timeline == 1L)
      assert(ident.xlogPos == PgReplicationHandshake.parseLsn("0/1A2B3C4D"))
      assert(ident.dbName == "postgres")
      assert(!hs.createReplicationSlot("graft"), "slot-exists must map to false")
      hs.startReplication("graft", ident.xlogPos, "graft_pub")

      // the streams now carry CopyBoth — the WalSocketSpec layer takes over
      val loop = new WalReceiveLoop(in, out, clockMicros = () => 1L)
      loop.run()
      val changes = loop.changes()
      assert(changes.map(_.op) == Seq("c"))
      assert(changes.head.primaryKey == "9")
      assert(changes.head.lsn == 190L)

      // segment tap: the drained frames land as an atomically-named
      // segment file whose bytes re-decode to the same committed changes —
      // the contract that feeds the graft-pgoutput DataSourceV2
      val tapDir = java.nio.file.Files.createTempDirectory("wal_tap")
      val tap = new graft.sources.WalSegmentTap(tapDir)
      val seg = tap.tap(loop)
      assert(seg.exists(_.getFileName.toString == "segment-00000000.bin"))
      val replayed = PgOutputWire.decodeSegment(
        java.nio.file.Files.readAllBytes(seg.get), _ => "id")
      assert(replayed.map(c => (c.op, c.primaryKey, c.lsn)) ==
        changes.map(c => (c.op, c.primaryKey, c.lsn)))
      assert(tap.tap(loop).isEmpty, "second drain must be empty")
      val listed = java.nio.file.Files.list(tapDir).toArray.toSeq
        .map(_.toString.split('/').last)
      assert(listed == Seq("segment-00000000.bin"),
        s"expected exactly the one visible segment, got $listed")

      // ---- frontend bytes the mock backend observed ----------------------
      val (_, startup) = seen.poll(5, TimeUnit.SECONDS)
      val sb = ByteBuffer.wrap(startup)
      assert(sb.getInt == 196608, "protocol must be 3.0")
      val params = new String(startup, 4, startup.length - 5, UTF_8)
        .split('\u0000').grouped(2).collect { case Array(k, v) => k -> v }.toMap
      assert(params("user") == "rep")
      assert(params("database") == "postgres")
      assert(params("replication") == "database",
        "replication=database is what makes this a walsender session")
      def sql(p: (Char, Array[Byte])): String = {
        assert(p._1 == 'Q'); new String(p._2.dropRight(1), UTF_8)
      }
      assert(sql(seen.poll(5, TimeUnit.SECONDS)) == "IDENTIFY_SYSTEM")
      assert(sql(seen.poll(5, TimeUnit.SECONDS)) ==
        "CREATE_REPLICATION_SLOT \"graft\" LOGICAL pgoutput")
      assert(sql(seen.poll(5, TimeUnit.SECONDS)) ==
        "START_REPLICATION SLOT \"graft\" LOGICAL 0/1A2B3C4D " +
          "(proto_version '1', publication_names '\"graft_pub\"')")
    } finally {
      sock.close()
      serverThread.join(5000)
      server.close()
    }
  }

  test("live runner cuts self-contained segments at commit boundaries") {
    import graft.sources.{LiveWalRunner, WalSegmentTap, PgOutputWire}
    import PgOutputWire._
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val sout = new DataOutputStream(s.getOutputStream)
        // tx1: relation sent ONCE for the whole connection (real pgoutput)
        sout.write(xlog(10, 11, begin(100, 1)))
        sout.write(xlog(11, 12,
          relation(1, "public", "documents", Seq("id", "title", "content"))))
        sout.write(xlog(12, 13, insert(1,
          tupleData(Seq(Some("1"), Some("a"), Some("x"))))))
        sout.write(xlog(13, 14, commit(100)))
        // tx2 + tx3: no relation re-send
        sout.write(xlog(20, 21, begin(200, 2)))
        sout.write(xlog(21, 22, insert(1,
          tupleData(Seq(Some("2"), Some("b"), Some("y"))))))
        sout.write(xlog(22, 23, commit(200)))
        sout.write(xlog(30, 31, begin(300, 3)))
        sout.write(xlog(31, 32, insert(1,
          tupleData(Seq(Some("3"), Some("c"), Some("z"))))))
        sout.write(xlog(32, 33, commit(300)))
        // uncommitted tail — must decode to nothing wherever it lands
        sout.write(xlog(40, 41, begin(400, 4)))
        sout.write(xlog(41, 42, insert(1,
          tupleData(Seq(Some("4"), Some("phantom"), None)))))
        sout.write(Array[Byte]('c'.toByte, 0, 0, 0, 4))
        sout.flush()
      } finally s.close()
    })
    t.start()
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val loop = new WalReceiveLoop(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream), clockMicros = () => 1L)
      val dir = java.nio.file.Files.createTempDirectory("wal_runner")
      val segs = new LiveWalRunner(loop, new WalSegmentTap(dir),
        minFramesPerSegment = 4).run()
      assert(segs.size >= 2, s"expected multiple segments, got ${segs.size}")
      // EVERY segment must decode standalone — the relation cache frame is
      // re-emitted into segments whose transactions didn't carry it
      val perSeg = segs.map(p => PgOutputWire.decodeSegment(
        java.nio.file.Files.readAllBytes(p), _ => "id"))
      val all = perSeg.flatten
      assert(all.map(_.primaryKey) == Seq("1", "2", "3"),
        s"committed rows diverged: ${all.map(_.primaryKey)}")
      assert(all.map(_.lsn) == Seq(100L, 200L, 300L))
      // no segment splits a transaction: each decodes ≥0 WHOLE commits and
      // the phantom row appears nowhere
      assert(!all.exists(_.primaryKey == "4"))
    } finally { sock.close(); t.join(5000); server.close() }
  }

  test("LSN text round-trips and passwordless SCRAM fails with a clear error") {
    import PgReplicationHandshake._
    assert(lsnString(parseLsn("1A/2B3C4D5E")) == "1A/2B3C4D5E")
    assert(parseLsn("0/0") == 0L)
    assert(lsnString((5L << 32) | 0x10L) == "5/10")
    assert(quoteIdent("a\"b c,d") == "\"a\"\"b c,d\"")
    assert(quoteLiteral("it's") == "'it''s'")

    // SCRAM demanded but no password configured → descriptive failure
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val sin = new DataInputStream(s.getInputStream)
        readFrontend(sin, tagged = false)
        val sout = new DataOutputStream(s.getOutputStream)
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(10).array()
          ++ cstr("SCRAM-SHA-256") :+ 0.toByte))
        sout.flush()
      } finally s.close()
    })
    t.start()
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream))
      val e = intercept[IllegalStateException](hs.startup("rep", "postgres"))
      assert(e.getMessage.contains("no password was configured"))
    } finally { sock.close(); t.join(5000); server.close() }
  }

  test("SCRAM-SHA-256 handshake authenticates against a verifying mock backend") {
    import java.util.Base64
    import graft.sources.ScramAuth
    val password = "wal+s3cret"
    val salt = "sixteen-byte-salt".getBytes(UTF_8)
    val iterations = 4096
    val serverNonceExt = "SrVn0nce"
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()

    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val serverThread = new Thread(() => {
      val s = server.accept()
      try {
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        readFrontend(sin, tagged = false) // StartupMessage
        // AuthenticationSASL with the mechanism list
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(10).array()
          ++ cstr("SCRAM-SHA-256") :+ 0.toByte)); sout.flush()
        // SASLInitialResponse: cstr mechanism + int32 + client-first
        val (tag1, p1) = readFrontend(sin, tagged = true)
        if (tag1 != 'p') failure.set(s"expected SASLInitialResponse, got $tag1")
        val b1 = ByteBuffer.wrap(p1)
        val mech = new StringBuilder
        var c = b1.get(); while (c != 0) { mech.append(c.toChar); c = b1.get() }
        if (mech.toString != "SCRAM-SHA-256")
          failure.set(s"wrong mechanism ${mech.toString}")
        val len = b1.getInt
        val firstBytes = new Array[Byte](len); b1.get(firstBytes)
        val clientFirst = new String(firstBytes, UTF_8)
        if (!clientFirst.startsWith("n,,"))
          failure.set(s"client-first missing gs2 header: $clientFirst")
        val bare = clientFirst.drop(3)
        val clientNonce = ScramAuth.parseAttrs(bare)("r")
        // AuthenticationSASLContinue: server-first-message
        val combined = clientNonce + serverNonceExt
        val serverFirst = s"r=$combined," +
          s"s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(11).array()
          ++ serverFirst.getBytes(UTF_8))); sout.flush()
        // SASLResponse: client-final-message — verify the proof for real
        val (tag2, p2) = readFrontend(sin, tagged = true)
        if (tag2 != 'p') failure.set(s"expected SASLResponse, got $tag2")
        val clientFinal = new String(p2, UTF_8)
        val attrs = ScramAuth.parseAttrs(clientFinal)
        if (attrs("r") != combined) failure.set("nonce not echoed")
        val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
        val authMessage = s"$bare,$serverFirst,$withoutProof"
        val salted = ScramAuth.hi(password, salt, iterations)
        val clientKey = ScramAuth.hmac(salted, "Client Key")
        val wantProof = Base64.getEncoder.encodeToString(ScramAuth.xor(
          clientKey, ScramAuth.hmac(ScramAuth.h(clientKey), authMessage)))
        if (attrs("p") != wantProof) failure.set("client proof REJECTED")
        // AuthenticationSASLFinal (v=) + AuthenticationOk + ReadyForQuery
        val serverSig = Base64.getEncoder.encodeToString(ScramAuth.hmac(
          ScramAuth.hmac(salted, "Server Key"), authMessage))
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(12).array()
          ++ s"v=$serverSig".getBytes(UTF_8)))
        sout.write(authOk); sout.write(readyForQuery); sout.flush()
        // CREATE PUBLICATION bootstrap: already exists → 42710 tolerated
        val (qt, qp) = readFrontend(sin, tagged = true)
        if (qt != 'Q') failure.set(s"expected Query, got $qt")
        val pubSql = new String(qp.dropRight(1), UTF_8)
        if (pubSql != "CREATE PUBLICATION \"graft_pub\" FOR ALL TABLES")
          failure.set(s"unexpected publication SQL: $pubSql")
        sout.write(errorResponse("42710", "publication already exists"))
        sout.write(readyForQuery); sout.flush()
      } catch { case e: Throwable => failure.set(s"mock backend: $e") }
      finally s.close()
    })
    serverThread.start()

    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream),
        password = Some(password))
      hs.startup("rep", "postgres") // throws on any SCRAM failure
      assert(!hs.createPublication("graft_pub"),
        "publication-exists must map to false")
      serverThread.join(5000)
      assert(failure.get() == null, s"backend saw: ${failure.get()}")
    } finally { sock.close(); serverThread.join(5000); server.close() }
  }

  test("SCRAM rejects a server that cannot prove it knows the password") {
    import java.util.Base64
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        readFrontend(sin, tagged = false)
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(10).array()
          ++ cstr("SCRAM-SHA-256") :+ 0.toByte)); sout.flush()
        val (_, p1) = readFrontend(sin, tagged = true)
        val b1 = ByteBuffer.wrap(p1)
        var c = b1.get(); while (c != 0) c = b1.get()
        val len = b1.getInt; val fb = new Array[Byte](len); b1.get(fb)
        val nonce = graft.sources.ScramAuth
          .parseAttrs(new String(fb, UTF_8).drop(3))("r")
        val sf = s"r=${nonce}EXT,s=${Base64.getEncoder
          .encodeToString("salt".getBytes(UTF_8))},i=4096"
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(11).array()
          ++ sf.getBytes(UTF_8))); sout.flush()
        readFrontend(sin, tagged = true) // client-final (proof ignored)
        // forged v= — a server that skipped proof verification and does
        // not actually hold the credentials
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(12).array()
          ++ "v=Zm9yZ2Vkc2ln".getBytes(UTF_8))); sout.flush()
      } finally s.close()
    })
    t.start()
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream),
        password = Some("pw"))
      val e = intercept[SecurityException](hs.startup("rep", "postgres"))
      assert(e.getMessage.contains("signature"))
    } finally { sock.close(); t.join(5000); server.close() }
  }
}
