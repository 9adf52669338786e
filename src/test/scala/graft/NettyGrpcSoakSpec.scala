package graft

import graft.sink.MilvusSink
import graft.sink.grpc.{MilvusProto, ProtoWire}

import org.scalatest.funsuite.AnyFunSuite

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{ChannelHandlerContext, ChannelInboundHandlerAdapter,
  ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame,
  DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2WindowUpdateFrame,
  Http2DataFrame, Http2FrameCodecBuilder, Http2FrameStream, Http2HeadersFrame,
  Http2Settings}
import io.netty.util.ReferenceCountUtil

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** The live-soak analog of `tools/live_pg.sh` for the SINK side: the
  * hand-rolled h2c gRPC client driven against a REAL, independent HTTP/2
  * implementation — Netty's `netty-codec-http2`, the exact codec stack
  * grpc-java builds on (and ships in this Spark distribution, so the
  * soak runs unconditionally, no external server needed).
  *
  * What "real" buys over the repo's own mock (`MilvusGrpcSpec`):
  *  - a real SETTINGS handshake (Netty's, not frames we authored);
  *  - real HPACK: Netty's HpackEncoder huffman-compresses literals
  *    whenever shorter and uses static/dynamic table indexing — the
  *    client decoder sees a production encoder's output, not our own
  *    `encodeHeadersHuffman`;
  *  - real flow control: Netty's DefaultHttp2LocalFlowController grants
  *    WINDOW_UPDATE credit on its own consume/threshold schedule, and
  *    ENFORCES the advertised limits — an oversized frame or a DATA byte
  *    beyond the granted window from our client is a connection error
  *    (GOAWAY) that fails these tests;
  *  - real CONTINUATION: Netty's frame writer splits a header block
  *    larger than the peer's SETTINGS_MAX_FRAME_SIZE across
  *    HEADERS+CONTINUATION — exercising the client's buffered decode
  *    against a real peer's split, not a hand-placed cut;
  *  - real early rejection: a trailers-only error response on a stream
  *    whose flow-control window is exhausted and never re-credited —
  *    the exact hang scenario the send-loop abort exists for.
  *
  * The reference's Milvus leg runs milvus-sdk-go over grpc-go
  * (`/root/reference/internal/sink/milvus/milvus.go:29-37`); Milvus
  * itself is not installable in this sandbox, so the MilvusService
  * behavior is scripted per test while the WIRE below it is Netty's.
  */
class NettyGrpcSoakSpec extends AnyFunSuite {

  /** A real Netty h2c server speaking gRPC framing for MilvusService.
    *
    * `initialWindow` is advertised in the server's own SETTINGS and
    * enforced by Netty's local flow controller. `rejectEarly = Some(
    * (method, status, message))` answers that method with a trailers-only
    * error on HEADERS and never grants window credit for its DATA.
    * `trailerPadding` appends that many 'x' bytes to grpc-message, which
    * past ~19k forces Netty to split the trailer block across
    * HEADERS+CONTINUATION (the client advertises no SETTINGS_MAX_FRAME_SIZE,
    * so Netty splits at the 16384 default). */
  private final class NettyGrpcServer(
      dispatch: (String, Array[Byte]) => Array[Byte],
      initialWindow: Int = 65535,
      rejectEarly: Option[(String, String, String)] = None,
      trailerPadding: Int = 0) extends AutoCloseable {

    val calls = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val reqs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

    private val group = new MultiThreadIoEventLoopGroup(2, NioIoHandler.newFactory())
    private val settings = new Http2Settings().initialWindowSize(initialWindow)

    private final class GrpcHandler extends ChannelInboundHandlerAdapter {
      private val paths = scala.collection.mutable.Map[Int, String]()
      private val bodies =
        scala.collection.mutable.Map[Int, java.io.ByteArrayOutputStream]()

      private def rejected(path: String): Option[(String, String, String)] =
        rejectEarly.filter { case (m, _, _) => path.endsWith("/" + m) }

      override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
        msg match {
          case h: Http2HeadersFrame =>
            val sid = h.stream().id()
            val path = h.headers().path().toString
            paths(sid) = path
            // the request headers our client encodes (raw literals) must
            // decode on a production HPACK decoder with these values
            assert(h.headers().method().toString == "POST")
            assert(h.headers().get("content-type").toString == "application/grpc")
            rejected(path) match {
              case Some((_, status, message)) =>
                writeTrailersOnly(ctx, h.stream(), status, message)
              case None if h.isEndStream => respond(ctx, h.stream())
              case _ => ()
            }
          case d: Http2DataFrame =>
            val sid = d.stream().id()
            val buf = d.content()
            val chunk = new Array[Byte](buf.readableBytes())
            buf.readBytes(chunk)
            bodies.getOrElseUpdate(sid,
              new java.io.ByteArrayOutputStream()).write(chunk)
            val consumed = d.initialFlowControlledBytes()
            val end = d.isEndStream
            val stream = d.stream()
            d.release()
            // grant credit through Netty's flow controller — EXCEPT for a
            // rejected stream, which must starve (the hang scenario)
            if (rejected(paths(sid)).isEmpty) {
              if (consumed > 0)
                ctx.write(new DefaultHttp2WindowUpdateFrame(consumed)
                  .stream(stream))
              if (end) respond(ctx, stream)
              ctx.flush()
            }
          case other => ReferenceCountUtil.release(other)
        }

      private def respond(ctx: ChannelHandlerContext,
                          stream: Http2FrameStream): Unit = {
        val path = paths(stream.id())
        val method = path.substring(path.lastIndexOf('/') + 1)
        calls.add(method)
        val raw = bodies.getOrElse(stream.id(),
          new java.io.ByteArrayOutputStream()).toByteArray
        val req =
          if (raw.length >= 5) {
            val b = java.nio.ByteBuffer.wrap(raw)
            b.get(); val len = b.getInt()
            val m = new Array[Byte](len); b.get(m); m
          } else Array.emptyByteArray
        reqs.put(method, req)
        val (status, message, resp) =
          try ("0", "", dispatch(method, req))
          catch { case GrpcFail(s, m) => (s, m, Array.emptyByteArray) }
        val headers = new DefaultHttp2Headers().status("200")
        headers.set("content-type", "application/grpc")
        ctx.write(new DefaultHttp2HeadersFrame(headers).stream(stream))
        val framed = java.nio.ByteBuffer.allocate(5 + resp.length)
          .put(0.toByte).putInt(resp.length).put(resp).array()
        ctx.write(new DefaultHttp2DataFrame(
          Unpooled.wrappedBuffer(framed)).stream(stream))
        writeTrailers(ctx, stream, status, message)
        ctx.flush()
      }

      private def writeTrailersOnly(ctx: ChannelHandlerContext,
          stream: Http2FrameStream, status: String, message: String): Unit = {
        calls.add("EARLY:" + paths(stream.id())
          .substring(paths(stream.id()).lastIndexOf('/') + 1))
        val headers = new DefaultHttp2Headers().status("200")
        headers.set("content-type", "application/grpc")
        headers.set("grpc-status", status)
        headers.set("grpc-message", message)
        ctx.writeAndFlush(
          new DefaultHttp2HeadersFrame(headers, true).stream(stream))
      }

      private def writeTrailers(ctx: ChannelHandlerContext,
          stream: Http2FrameStream, status: String, message: String): Unit = {
        val trailers = new DefaultHttp2Headers()
        trailers.set("grpc-status", status)
        val msg =
          if (trailerPadding > 0) message + ("x" * trailerPadding)
          else message
        if (msg.nonEmpty) trailers.set("grpc-message", msg)
        ctx.write(new DefaultHttp2HeadersFrame(trailers, true).stream(stream))
      }
    }

    private val channel = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forServer().initialSettings(settings).build(),
            new GrpcHandler)
          ()
        }
      })
      .bind("127.0.0.1", 0).sync().channel()

    def port: Int =
      channel.localAddress().asInstanceOf[InetSocketAddress].getPort

    override def close(): Unit = {
      channel.close().sync()
      group.shutdownGracefully(0, 500, java.util.concurrent.TimeUnit.MILLISECONDS)
      ()
    }
  }

  private case class GrpcFail(status: String, message: String)
    extends RuntimeException(message)

  /** Same scripted MilvusService behavior as MilvusGrpcSpec's mock. */
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

  test("bootstrap + upsert + delete against a real Netty HTTP/2 peer: " +
    "its SETTINGS handshake, its HPACK encoder (huffman + indexing), " +
    "its flow-control grants") {
    var exists = false
    val server = new NettyGrpcServer(standardDispatch(() => exists))
    try {
      val base = s"grpc://127.0.0.1:${server.port}"
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(64)
      assert(server.calls.toArray.toSeq == Seq("HasCollection",
        "CreateCollection", "CreateIndex", "LoadCollection"))
      val cc = ProtoWire.parse(server.reqs.get("CreateCollection"))
      assert(cc.string(3).contains("c"))

      exists = true
      server.calls.clear()
      new MilvusSink(base, "c", transport = "grpc").ensureCollection(64)
      assert(server.calls.toArray.toSeq == Seq("HasCollection",
        "DescribeCollection", "LoadCollection"))

      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", server.port)
      try {
        t.upsert("c", Seq(("a:1", Seq(1.0f, 2.5f), Map("pk" -> "1"))))
        val up = ProtoWire.parse(server.reqs.get("Upsert"))
        assert(up.int(7).contains(1L))
        t.delete("c", Seq("a:1"))
        val del = ProtoWire.parse(server.reqs.get("Delete"))
        assert(del.string(5).contains("""id in ["a:1"]"""))
      } finally t.close()
    } finally server.close()
  }

  test("large upsert through a 1 KiB window: the client blocks on Netty's " +
    "real flow controller and the request round-trips intact (any frame " +
    "or window violation would be a Netty connection error)") {
    val server = new NettyGrpcServer(standardDispatch(() => true),
      initialWindow = 1024)
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", server.port)
      try {
        val points = (0 until 300).map(i =>
          (s"pk:$i", (0 until 32).map(d => (i * 32 + d).toFloat),
            Map("pk" -> i.toString)))
        t.upsert("c", points)
        val up = ProtoWire.parse(server.reqs.get("Upsert"))
        assert(up.int(7).contains(300L), "upsert did not round-trip intact")
        val cols = up.msgs(5)
        val vecCol = cols.find(_.string(2).contains("vector")).get
        val vf = vecCol.msg(4).get
        assert(vf.int(1).contains(32L))
        val floats = ProtoWire.floats(vf.msg(2).get.len(1).get)
        assert(floats.size == 300 * 32 && floats.head == 0.0f &&
          floats.last == (299 * 32 + 31).toFloat)
      } finally t.close()
    } finally server.close()
  }

  test("oversized error trailer: Netty splits the block across real " +
    "HEADERS+CONTINUATION frames and the client reassembles the full " +
    "huffman-coded message") {
    val sentinel = "END-OF-TRAILER-MARKER"
    val server = new NettyGrpcServer((m, _) => m match {
      case "Delete" => throw GrpcFail("13", "INTERNAL: padded ")
      case _ => standardDispatch(() => true)(m, Array.emptyByteArray)
    }, trailerPadding = 25000) // ~21.9 KiB huffman-coded > 16384 split point
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", server.port)
      try {
        val e = intercept[java.io.IOException] { t.delete("c", Seq("x")) }
        assert(e.getMessage.contains("status 13"))
        assert(e.getMessage.contains("INTERNAL: padded "))
        // the tail of the padded message survives the split — a client
        // that decoded the first HEADERS fragment alone could not carry it
        assert(e.getMessage.count(_ == 'x') == 25000,
          "padded trailer did not reassemble byte-for-byte")
      } finally t.close()
    } finally server.close()
  }

  test("early trailers-only rejection on a starved window from a real " +
    "peer: the blocked send aborts and surfaces grpc-status promptly") {
    val server = new NettyGrpcServer(standardDispatch(() => true),
      initialWindow = 1024,
      rejectEarly = Some(("Upsert", "8", "RESOURCE_EXHAUSTED: too large")))
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", server.port)
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
        assert(done.await(20, java.util.concurrent.TimeUnit.SECONDS),
          "upsert hung against the real peer's early-ended stream")
        assert(thrown.isInstanceOf[java.io.IOException] &&
          thrown.getMessage.contains("status 8") &&
          thrown.getMessage.contains("RESOURCE_EXHAUSTED"), s"got: $thrown")
      } finally t.close()
    } finally server.close()
  }

  test("sequential call soak on one connection: 200 mixed RPCs reuse the " +
    "connection's HPACK dynamic table and stream-id space against the " +
    "real peer") {
    var exists = true
    val server = new NettyGrpcServer(standardDispatch(() => exists))
    try {
      val t = new graft.sink.MilvusGrpcTransport("127.0.0.1", server.port)
      try {
        (0 until 100).foreach { i =>
          t.upsert("c", Seq((s"k:$i", Seq(i.toFloat, -i.toFloat),
            Map("pk" -> i.toString))))
          t.delete("c", Seq(s"k:$i"))
        }
        val counts = server.calls.toArray.groupBy(identity)
          .map { case (k, v) => (k, v.length) }
        assert(counts == Map("Upsert" -> 100, "Delete" -> 100))
      } finally t.close()
    } finally server.close()
  }
}
