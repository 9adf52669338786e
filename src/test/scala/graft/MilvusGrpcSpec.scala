package graft

import graft.sink.MilvusSink
import graft.sink.grpc.{H2, MilvusProto, ProtoWire}

import org.scalatest.funsuite.AnyFunSuite

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

/** The Milvus gRPC transport pinned at the WIRE level against a mock h2c
  * gRPC server: real HTTP/2 frames, real HPACK header blocks, real
  * protobuf request decoding — no client stubbing. Asserts the same
  * bootstrap call sequence the REST spec pins (has→create→index→load on
  * missing; has→describe→load on existing; dim conflict hard error), the
  * upsert/delete message contents, the two-layer error contract
  * (grpc-status vs in-body Status), and the already-exists race
  * tolerance over the new wire. */
class MilvusGrpcSpec extends AnyFunSuite {

  /** One mock MilvusService over h2c. Dispatch gets (method, request
    * message) and returns the response message (or throws GrpcFail to
    * send a non-zero grpc-status).
    *
    * `huffman` switches every response header block to HUFFMAN-coded
    * literals (grpc-go's encoder path). `streamWindow`/`maxFrame` are
    * advertised in the server SETTINGS and ENFORCED the way grpc-go
    * does: an oversized frame, a DATA byte beyond the granted window, or
    * a client that keeps sending while its window is exhausted all land
    * in `violations`. */
  private final class MockMilvus(
      dispatch: (String, Array[Byte]) => Array[Byte],
      huffman: Boolean = false,
      streamWindow: Int = 65535,
      maxFrame: Int = 16384,
      // split every trailer block across HEADERS+CONTINUATION (RFC 7540
      // §6.10 — what a peer does when the block exceeds ITS max frame size)
      splitTrailers: Boolean = false,
      // instead of granting window credit on exhaustion, end the stream
      // with a trailers-only error response (grpc-status, END_STREAM, no
      // RST, no WINDOW_UPDATE) — grpc-go's shape for an early
      // RESOURCE_EXHAUSTED rejection of a too-large request
      earlyTrailerStatus: Option[(String, String)] = None) extends AutoCloseable {
    val calls = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val violations = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val server = new ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => serve(sock)).start()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true); acceptor.start()

    private def serve(sock: java.net.Socket): Unit = try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      val preface = new Array[Byte](H2.Preface.length)
      in.readFully(preface)
      assert(preface.sameElements(H2.Preface), "bad h2c preface")
      // initial SETTINGS advertises this test's window/frame limits
      val sb = java.nio.ByteBuffer.allocate(12)
      sb.putShort(H2.SettingsInitialWindowSize.toShort).putInt(streamWindow)
      sb.putShort(H2.SettingsMaxFrameSize.toShort).putInt(maxFrame)
      H2.writeFrame(out, H2.Frame(H2.Settings, 0, 0, sb.array()))
      def encode(hs: Seq[(String, String)]): Array[Byte] =
        if (huffman) H2.encodeHeadersHuffman(hs) else H2.encodeHeaders(hs)
      val hpack = new H2.HpackDecoder
      // per-stream state: path from HEADERS, body from DATA
      val paths = scala.collection.mutable.Map[Int, String]()
      val bodies = scala.collection.mutable.Map[Int, java.io.ByteArrayOutputStream]()
      // send-side flow-control enforcement (per connection; the client
      // runs one stream at a time)
      var granted = streamWindow.toLong
      var received = 0L
      while (true) {
        val f = H2.readFrame(in)
        if (f.payload.length > maxFrame)
          violations.add(s"${f.payload.length}-byte frame exceeds " +
            s"advertised SETTINGS_MAX_FRAME_SIZE $maxFrame")
        f.tpe match {
          case H2.Settings if (f.flags & H2.Ack) == 0 =>
            H2.writeFrame(out, H2.Frame(H2.Settings, H2.Ack, 0, Array.emptyByteArray))
          case H2.Headers =>
            val hs = hpack.decode(f.payload).toMap
            paths(f.streamId) = hs(":path")
            assert(hs(":method") == "POST" &&
              hs("content-type") == "application/grpc" &&
              hs("te") == "trailers", s"bad grpc request headers: $hs")
          case H2.Data =>
            received += f.payload.length
            if (received > granted)
              violations.add(s"DATA beyond the granted window " +
                s"($received > $granted)")
            bodies.getOrElseUpdate(f.streamId,
              new java.io.ByteArrayOutputStream()).write(f.payload)
            if ((f.flags & H2.EndStream) == 0 && received >= granted) {
              // the window is exhausted mid-request: a compliant client is
              // now BLOCKED — loopback delivers violating bytes well
              // within the grace, so a quiet socket proves the block
              Thread.sleep(150)
              if (in.available() > 0)
                violations.add("client kept sending on an exhausted window")
              earlyTrailerStatus match {
                case Some((status, msg)) =>
                  // reject early: trailers-only response, never any credit
                  writeTrailers(out, encode, f.streamId,
                    Seq(":status" -> "200",
                      "content-type" -> "application/grpc",
                      "grpc-status" -> status, "grpc-message" -> msg))
                case None =>
                  val inc = java.nio.ByteBuffer.allocate(4).putInt(1 << 20).array()
                  H2.writeFrame(out, H2.Frame(H2.WindowUpdate, 0, f.streamId, inc))
                  H2.writeFrame(out, H2.Frame(H2.WindowUpdate, 0, 0, inc))
                  granted += (1L << 20)
              }
            }
            if ((f.flags & H2.EndStream) != 0) {
              val path = paths(f.streamId)
              val method = path.stripPrefix(MilvusProto.ServicePrefix)
              calls.add(method)
              val raw = bodies(f.streamId).toByteArray
              val b = java.nio.ByteBuffer.wrap(raw)
              b.get(); val len = b.getInt()
              val req = new Array[Byte](len); b.get(req)
              val (status, msg, resp) =
                try ("0", "", dispatch(method, req))
                catch { case GrpcFail(s, m) => (s, m, Array.emptyByteArray) }
              H2.writeFrame(out, H2.Frame(H2.Headers, H2.EndHeaders, f.streamId,
                encode(Seq(":status" -> "200",
                  "content-type" -> "application/grpc"))))
              val framed = java.nio.ByteBuffer.allocate(5 + resp.length)
              framed.put(0.toByte).putInt(resp.length).put(resp)
              H2.writeFrame(out, H2.Frame(H2.Data, 0, f.streamId, framed.array()))
              writeTrailers(out, encode, f.streamId,
                Seq("grpc-status" -> status) ++
                  (if (msg.nonEmpty) Seq("grpc-message" -> msg) else Nil))
            }
          case _ => () // SETTINGS ack, WINDOW_UPDATE, PING — ignored
        }
      }
    } catch { case _: Exception => () } finally sock.close()

    /** Trailer block, optionally split HEADERS+CONTINUATION: END_STREAM
      * rides the initial HEADERS frame; END_HEADERS only on the final
      * fragment (RFC 7540 §6.10). The cut lands mid-block — a partial
      * fragment is not independently HPACK-decodable, so a client that
      * decodes per-frame mis-parses here. */
    private def writeTrailers(out: DataOutputStream,
        encode: Seq[(String, String)] => Array[Byte], sid: Int,
        hs: Seq[(String, String)]): Unit = {
      val block = encode(hs)
      if (splitTrailers && block.length >= 2) {
        val cut = block.length / 2
        H2.writeFrame(out, H2.Frame(H2.Headers, H2.EndStream, sid,
          java.util.Arrays.copyOfRange(block, 0, cut)))
        H2.writeFrame(out, H2.Frame(H2.Continuation, H2.EndHeaders, sid,
          java.util.Arrays.copyOfRange(block, cut, block.length)))
      } else
        H2.writeFrame(out,
          H2.Frame(H2.Headers, H2.EndHeaders | H2.EndStream, sid, block))
    }

    override def close(): Unit = { running = false; server.close() }
  }

  private case class GrpcFail(status: String, message: String)
    extends RuntimeException(message)

  /** Standard dispatch: `exists` steers HasCollection; Describe reports
    * dim=64; everything else returns an empty (OK) message. */
  private def standardDispatch(exists: () => Boolean)
    : (String, Array[Byte]) => Array[Byte] = (m, _) => m match {
    case "HasCollection" =>
      new graft.sink.grpc.ProtoWriter().bool(2, exists()).toBytes
    case "DescribeCollection" =>
      new graft.sink.grpc.ProtoWriter().message(2) { schema =>
        schema.string(1, "c")
        schema.message(4) { f =>
          f.string(2, "vector").int(5, 101L)
          f.message(6)(kv => { kv.string(1, "dim").string(2, "64"); () })
          ()
        }
        ()
      }.toBytes
    case _ => Array.emptyByteArray
  }

  test("bootstrap call sequence over gRPC: create+index+load when " +
    "missing, describe+load when present, dim conflict is a hard error") {
    var exists = false
    val reqs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val mock = new MockMilvus((m, req) => {
      reqs.put(m, req); standardDispatch(() => exists)(m, req)
    })
    try {
      val base = s"grpc://127.0.0.1:${mock.port}"
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(64)
      assert(mock.calls.toArray.toSeq == Seq("HasCollection",
        "CreateCollection", "CreateIndex", "LoadCollection"))
      // the CreateCollection protobuf carries the reference schema
      val cc = ProtoWire.parse(reqs.get("CreateCollection"))
      assert(cc.string(3).contains("c"))
      val schema = cc.msg(4).get
      val fields = schema.msgs(4)
      assert(fields.flatMap(_.string(2)) == Seq("id", "vector", "payload"))
      assert(fields.head.int(3).contains(1L)) // id is primary
      assert(fields.map(_.int(5).get) == Seq(21L, 101L, 23L))
      val dimParam = fields(1).msgs(6).find(_.string(1).contains("dim")).get
      assert(dimParam.string(2).contains("64"))
      // the CreateIndex protobuf carries HNSW params on `vector`
      val ci = ProtoWire.parse(reqs.get("CreateIndex"))
      assert(ci.string(4).contains("vector"))
      val params = ci.msgs(5).map(p => p.string(1).get -> p.string(2).get).toMap
      assert(params("index_type") == "HNSW" && params("metric_type") == "IP")

      mock.calls.clear(); exists = true
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(64)
      assert(mock.calls.toArray.toSeq == Seq("HasCollection",
        "DescribeCollection", "LoadCollection"))
      val e = intercept[IllegalStateException] {
        new MilvusSink(base, "c", transport = "grpc").ensureCollection(128)
      }
      assert(e.getMessage.contains("dim=64") && e.getMessage.contains("dim=128"))
    } finally mock.close()
  }

  test("upsert and delete protobufs carry the row data exactly; the " +
    "delete expr escapes ids like the REST path") {
    val reqs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val mock = new MockMilvus((m, req) => {
      reqs.put(m, req); standardDispatch(() => true)(m, req)
    })
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", mock.port)
      try {
        t.upsert("c", Seq(
          ("a:1", Seq(1.0f, 2.5f), Map("pk" -> "1", "t" -> "x")),
          ("b:2", Seq(-3.0f, 4.0f), Map("pk" -> "2"))))
        val up = ProtoWire.parse(reqs.get("Upsert"))
        assert(up.string(3).contains("c"))
        assert(up.int(7).contains(2L)) // num_rows
        val cols = up.msgs(5)
        val idCol = cols.find(_.string(2).contains("id")).get
        assert(idCol.msg(3).get.msg(6).get.lensOf(1)
          .map(new String(_, UTF_8)) == Seq("a:1", "b:2"))
        val vecCol = cols.find(_.string(2).contains("vector")).get
        val vf = vecCol.msg(4).get
        assert(vf.int(1).contains(2L)) // dim
        assert(ProtoWire.floats(vf.msg(2).get.len(1).get) ==
          Seq(1.0f, 2.5f, -3.0f, 4.0f))
        val payCol = cols.find(_.string(2).contains("payload")).get
        val docs = payCol.msg(3).get.msg(9).get.lensOf(1)
          .map(new String(_, UTF_8))
        assert(docs.head == """{"pk":"1","t":"x"}""")

        t.delete("c", Seq("a:1", """x" or 1=1"""))
        val del = ProtoWire.parse(reqs.get("Delete"))
        assert(del.string(5).contains(
          """id in ["a:1","x\" or 1=1"]"""))
      } finally t.close()
    } finally mock.close()
  }

  test("two-layer errors: non-zero grpc-status raises; in-body Status " +
    "'already exist' is tolerated mid-bootstrap (the race contract)") {
    var exists = false
    val mock = new MockMilvus((m, _) => m match {
      case "HasCollection" =>
        new graft.sink.grpc.ProtoWriter().bool(2, exists).toBytes
      case "CreateCollection" =>
        // the losing racer: server says it already exists (in-body
        // Status under an OK grpc-status)
        new graft.sink.grpc.ProtoWriter().message(1) { st =>
          st.int(1, 1L).string(2, "collection already exists"); ()
        }.toBytes
      case "Delete" => throw GrpcFail("7", "PERMISSION_DENIED")
      case _ => Array.emptyByteArray
    })
    try {
      val base = s"grpc://127.0.0.1:${mock.port}"
      // bootstrap proceeds through the tolerated already-exists
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(8)
      assert(mock.calls.toArray.toSeq == Seq("HasCollection",
        "CreateCollection", "CreateIndex", "LoadCollection"))
      // a genuine grpc-status failure surfaces as IOException
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", mock.port)
      try {
        val e = intercept[java.io.IOException] { t.delete("c", Seq("x")) }
        assert(e.getMessage.contains("status 7") &&
          e.getMessage.contains("PERMISSION_DENIED"))
      } finally t.close()
    } finally mock.close()
  }

  test("huffman-coded response headers and trailers decode (grpc-go " +
    "huffman-compresses literals; grpc-status is not in the static table)") {
    var exists = false
    val mock = new MockMilvus((m, req) => m match {
      case "Delete" => throw GrpcFail("7", "PERMISSION_DENIED")
      case _ => standardDispatch(() => exists)(m, req)
    }, huffman = true)
    try {
      // full bootstrap through huffman-coded responses
      val base = s"grpc://127.0.0.1:${mock.port}"
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(64)
      assert(mock.calls.toArray.toSeq == Seq("HasCollection",
        "CreateCollection", "CreateIndex", "LoadCollection"))
      exists = true
      // and the huffman-coded error trailer surfaces with its message
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", mock.port)
      try {
        val e = intercept[java.io.IOException] { t.delete("c", Seq("x")) }
        assert(e.getMessage.contains("status 7") &&
          e.getMessage.contains("PERMISSION_DENIED"))
      } finally t.close()
    } finally mock.close()
  }

  test("trailer block split across HEADERS+CONTINUATION decodes (a peer " +
    "whose block exceeds its own max frame size must split; END_HEADERS " +
    "gates the HPACK decode)") {
    var exists = false
    val mock = new MockMilvus((m, req) => m match {
      case "Delete" => throw GrpcFail("7", "PERMISSION_DENIED")
      case _ => standardDispatch(() => exists)(m, req)
    }, huffman = true, splitTrailers = true)
    try {
      // full bootstrap through split (and huffman-coded) trailer blocks
      val base = s"grpc://127.0.0.1:${mock.port}"
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(64)
      assert(mock.calls.toArray.toSeq == Seq("HasCollection",
        "CreateCollection", "CreateIndex", "LoadCollection"))
      exists = true
      // the split error trailer reassembles with its full message intact
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", mock.port)
      try {
        val e = intercept[java.io.IOException] { t.delete("c", Seq("x")) }
        assert(e.getMessage.contains("status 7") &&
          e.getMessage.contains("PERMISSION_DENIED"))
      } finally t.close()
    } finally mock.close()
  }

  test("early trailers-only error while the send is flow-control-blocked " +
    "surfaces the grpc-status instead of hanging (no RST, no credit ever)") {
    // 1 KiB window + a ~40 KiB upsert: the client WILL block for credit;
    // the server answers with a trailers-only RESOURCE_EXHAUSTED and
    // never grants another byte — the pre-fix client waits forever here
    val mock = new MockMilvus(standardDispatch(() => true),
      streamWindow = 1024, maxFrame = 2048,
      earlyTrailerStatus = Some(("8", "RESOURCE_EXHAUSTED: request too large")))
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", mock.port)
      try {
        val points = (0 until 300).map(i =>
          (s"pk:$i", (0 until 32).map(d => (i * 32 + d).toFloat),
            Map("pk" -> i.toString)))
        val done = new java.util.concurrent.CountDownLatch(1)
        @volatile var thrown: Throwable = null
        val worker = new Thread(() => {
          try t.upsert("c", points)
          catch { case e: Throwable => thrown = e }
          finally done.countDown()
        })
        worker.setDaemon(true); worker.start()
        // generous bound: the call must FAIL promptly, not block forever
        assert(done.await(20, java.util.concurrent.TimeUnit.SECONDS),
          "upsert hung while flow-control-blocked on an early-ended stream")
        assert(thrown.isInstanceOf[java.io.IOException] &&
          thrown.getMessage.contains("status 8") &&
          thrown.getMessage.contains("RESOURCE_EXHAUSTED"), s"got: $thrown")
      } finally t.close()
    } finally mock.close()
  }

  test("request DATA splits at SETTINGS_MAX_FRAME_SIZE and blocks on the " +
    "flow-control window (the limits a real grpc-go server enforces)") {
    val reqs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    // a 1 KiB stream window and 2 KiB frames force the client to chunk
    // and to block for WINDOW_UPDATE several times on a ~50 KiB upsert
    val mock = new MockMilvus((m, req) => {
      reqs.put(m, req); standardDispatch(() => true)(m, req)
    }, streamWindow = 1024, maxFrame = 2048)
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", mock.port)
      try {
        val points = (0 until 300).map(i =>
          (s"pk:$i", (0 until 32).map(d => (i * 32 + d).toFloat),
            Map("pk" -> i.toString)))
        t.upsert("c", points)
        val up = ProtoWire.parse(reqs.get("Upsert"))
        assert(up.int(7).contains(300L), "upsert did not round-trip intact")
        assert(mock.violations.isEmpty,
          s"wire violations: ${mock.violations.toArray.mkString("; ")}")
      } finally t.close()
    } finally mock.close()
  }
}
