package graft.sink.grpc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** HTTP/2 frame + HPACK primitives shared by the gRPC client and the
  * in-test mock server. Cleartext h2c with prior knowledge (RFC 7540
  * §3.4) — the transport gRPC servers accept on a plaintext port, which
  * is how the reference's milvus-sdk-go dials an unencrypted Milvus
  * (`client.NewGrpcClient`, internal/sink/milvus/milvus.go:29-37).
  *
  * HPACK scope (RFC 7541): the ENCODER emits only "literal header field
  * without indexing — new name" with raw (non-huffman) strings — a form
  * every compliant decoder must accept. The DECODER handles indexed
  * static-table fields, all three literal forms (with the dynamic-table
  * insertions incremental indexing implies), dynamic-size updates, and
  * HUFFMAN-coded strings (Appendix B's 257-code canonical table —
  * grpc-go's hpack encoder huffman-compresses literal names/values
  * whenever shorter, and `grpc-status`/`grpc-message` are not in the
  * static table, so real response trailers arrive huffman-coded).
  */
object H2 {
  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII)

  // frame types
  val Data = 0x0; val Headers = 0x1; val RstStream = 0x3; val Settings = 0x4
  val Ping = 0x6; val GoAway = 0x7; val WindowUpdate = 0x8
  val Continuation = 0x9

  // flags
  val EndStream = 0x1; val Ack = 0x1; val EndHeaders = 0x4

  final case class Frame(tpe: Int, flags: Int, streamId: Int, payload: Array[Byte])

  def writeFrame(out: DataOutputStream, f: Frame): Unit = {
    out.writeByte((f.payload.length >>> 16) & 0xff)
    out.writeByte((f.payload.length >>> 8) & 0xff)
    out.writeByte(f.payload.length & 0xff)
    out.writeByte(f.tpe)
    out.writeByte(f.flags)
    out.writeInt(f.streamId & 0x7fffffff)
    out.write(f.payload)
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val len = ((in.readUnsignedByte() << 16) | (in.readUnsignedByte() << 8) |
      in.readUnsignedByte())
    val tpe = in.readUnsignedByte()
    val flags = in.readUnsignedByte()
    val sid = in.readInt() & 0x7fffffff
    val payload = new Array[Byte](len)
    in.readFully(payload)
    Frame(tpe, flags, sid, payload)
  }

  // settings identifiers (RFC 7540 §6.5.2)
  val SettingsInitialWindowSize = 0x4; val SettingsMaxFrameSize = 0x5

  // ---- HPACK huffman code (RFC 7541 Appendix B) ---------------------------

  /** The static huffman code for header strings: canonical codes for
    * symbols 0..255 plus EOS (256). `HuffmanSpec` pins the table against
    * the RFC's own Appendix C vectors plus the structural invariants
    * (prefix-freedom, Kraft equality) a transcription error would break. */
  object Huffman {
    // (code, bitLength) in symbol order; codes are right-aligned
    private val table: Array[(Int, Int)] = Array(
      (0x1ff8, 13), (0x7fffd8, 23), (0xfffffe2, 28), (0xfffffe3, 28),
      (0xfffffe4, 28), (0xfffffe5, 28), (0xfffffe6, 28), (0xfffffe7, 28),
      (0xfffffe8, 28), (0xffffea, 24), (0x3ffffffc, 30), (0xfffffe9, 28),
      (0xfffffea, 28), (0x3ffffffd, 30), (0xfffffeb, 28), (0xfffffec, 28),
      (0xfffffed, 28), (0xfffffee, 28), (0xfffffef, 28), (0xffffff0, 28),
      (0xffffff1, 28), (0xffffff2, 28), (0x3ffffffe, 30), (0xffffff3, 28),
      (0xffffff4, 28), (0xffffff5, 28), (0xffffff6, 28), (0xffffff7, 28),
      (0xffffff8, 28), (0xffffff9, 28), (0xffffffa, 28), (0xffffffb, 28),
      (0x14, 6), (0x3f8, 10), (0x3f9, 10), (0xffa, 12),
      (0x1ff9, 13), (0x15, 6), (0xf8, 8), (0x7fa, 11),
      (0x3fa, 10), (0x3fb, 10), (0xf9, 8), (0x7fb, 11),
      (0xfa, 8), (0x16, 6), (0x17, 6), (0x18, 6),
      (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
      (0x1a, 6), (0x1b, 6), (0x1c, 6), (0x1d, 6),
      (0x1e, 6), (0x1f, 6), (0x5c, 7), (0xfb, 8),
      (0x7ffc, 15), (0x20, 6), (0xffb, 12), (0x3fc, 10),
      (0x1ffa, 13), (0x21, 6), (0x5d, 7), (0x5e, 7),
      (0x5f, 7), (0x60, 7), (0x61, 7), (0x62, 7),
      (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
      (0x67, 7), (0x68, 7), (0x69, 7), (0x6a, 7),
      (0x6b, 7), (0x6c, 7), (0x6d, 7), (0x6e, 7),
      (0x6f, 7), (0x70, 7), (0x71, 7), (0x72, 7),
      (0xfc, 8), (0x73, 7), (0xfd, 8), (0x1ffb, 13),
      (0x7fff0, 19), (0x1ffc, 13), (0x3ffc, 14), (0x22, 6),
      (0x7ffd, 15), (0x3, 5), (0x23, 6), (0x4, 5),
      (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
      (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
      (0x28, 6), (0x29, 6), (0x2a, 6), (0x7, 5),
      (0x2b, 6), (0x76, 7), (0x2c, 6), (0x8, 5),
      (0x9, 5), (0x2d, 6), (0x77, 7), (0x78, 7),
      (0x79, 7), (0x7a, 7), (0x7b, 7), (0x7ffe, 15),
      (0x7fc, 11), (0x3ffd, 14), (0x1ffd, 13), (0xffffffc, 28),
      (0xfffe6, 20), (0x3fffd2, 22), (0xfffe7, 20), (0xfffe8, 20),
      (0x3fffd3, 22), (0x3fffd4, 22), (0x3fffd5, 22), (0x7fffd9, 23),
      (0x3fffd6, 22), (0x7fffda, 23), (0x7fffdb, 23), (0x7fffdc, 23),
      (0x7fffdd, 23), (0x7fffde, 23), (0xffffeb, 24), (0x7fffdf, 23),
      (0xffffec, 24), (0xffffed, 24), (0x3fffd7, 22), (0x7fffe0, 23),
      (0xffffee, 24), (0x7fffe1, 23), (0x7fffe2, 23), (0x7fffe3, 23),
      (0x7fffe4, 23), (0x1fffdc, 21), (0x3fffd8, 22), (0x7fffe5, 23),
      (0x3fffd9, 22), (0x7fffe6, 23), (0x7fffe7, 23), (0xffffef, 24),
      (0x3fffda, 22), (0x1fffdd, 21), (0xfffe9, 20), (0x3fffdb, 22),
      (0x3fffdc, 22), (0x7fffe8, 23), (0x7fffe9, 23), (0x1fffde, 21),
      (0x7fffea, 23), (0x3fffdd, 22), (0x3fffde, 22), (0xfffff0, 24),
      (0x1fffdf, 21), (0x3fffdf, 22), (0x7fffeb, 23), (0x7fffec, 23),
      (0x1fffe0, 21), (0x1fffe1, 21), (0x3fffe0, 22), (0x1fffe2, 21),
      (0x7fffed, 23), (0x3fffe1, 22), (0x7fffee, 23), (0x7fffef, 23),
      (0xfffea, 20), (0x3fffe2, 22), (0x3fffe3, 22), (0x3fffe4, 22),
      (0x7ffff0, 23), (0x3fffe5, 22), (0x3fffe6, 22), (0x7ffff1, 23),
      (0x3ffffe0, 26), (0x3ffffe1, 26), (0xfffeb, 20), (0x7fff1, 19),
      (0x3fffe7, 22), (0x7ffff2, 23), (0x3fffe8, 22), (0x1ffffec, 25),
      (0x3ffffe2, 26), (0x3ffffe3, 26), (0x3ffffe4, 26), (0x7ffffde, 27),
      (0x7ffffdf, 27), (0x3ffffe5, 26), (0xfffff1, 24), (0x1ffffed, 25),
      (0x7fff2, 19), (0x1fffe3, 21), (0x3ffffe6, 26), (0x7ffffe0, 27),
      (0x7ffffe1, 27), (0x3ffffe7, 26), (0x7ffffe2, 27), (0xfffff2, 24),
      (0x1fffe4, 21), (0x1fffe5, 21), (0x3ffffe8, 26), (0x3ffffe9, 26),
      (0xffffffd, 28), (0x7ffffe3, 27), (0x7ffffe4, 27), (0x7ffffe5, 27),
      (0xfffec, 20), (0xfffff3, 24), (0xfffed, 20), (0x1fffe6, 21),
      (0x3fffe9, 22), (0x1fffe7, 21), (0x1fffe8, 21), (0x7ffff3, 23),
      (0x3fffea, 22), (0x3fffeb, 22), (0x1ffffee, 25), (0x1ffffef, 25),
      (0xfffff4, 24), (0xfffff5, 24), (0x3ffffea, 26), (0x7ffff4, 23),
      (0x3ffffeb, 26), (0x7ffffe6, 27), (0x3ffffec, 26), (0x3ffffed, 26),
      (0x7ffffe7, 27), (0x7ffffe8, 27), (0x7ffffe9, 27), (0x7ffffea, 27),
      (0x7ffffeb, 27), (0xffffffe, 28), (0x7ffffec, 27), (0x7ffffed, 27),
      (0x7ffffee, 27), (0x7ffffef, 27), (0x7fffff0, 27), (0x3ffffee, 26),
      (0x3fffffff, 30))

    /** Exposed for the structural spec (prefix-freedom, Kraft sum). */
    private[graft] def codes: IndexedSeq[(Int, Int)] = table.toIndexedSeq

    // (len << 32 | code) -> symbol, for the bit-at-a-time decode walk
    private val lookup: Map[Long, Int] =
      table.iterator.zipWithIndex.map { case ((code, len), sym) =>
        ((len.toLong << 32) | (code.toLong & 0xffffffffL)) -> sym
      }.toMap

    /** Decode a huffman-coded string literal (RFC 7541 §5.2): bit-at-a-
      * time canonical walk; the trailing padding must be a strict prefix
      * of EOS (all ones, shorter than 8 bits). */
    def decode(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var code = 0L; var n = 0
      var i = off
      while (i < off + len) {
        val b = data(i) & 0xff
        var bit = 7
        while (bit >= 0) {
          code = (code << 1) | ((b >> bit) & 1); n += 1
          lookup.get((n.toLong << 32) | code) match {
            case Some(256) =>
              throw new IOException("HPACK huffman: EOS inside string")
            case Some(sym) => out.write(sym); code = 0; n = 0
            case None =>
              if (n > 30)
                throw new IOException("HPACK huffman: invalid code")
          }
          bit -= 1
        }
        i += 1
      }
      if (n >= 8 || code != (1L << n) - 1)
        throw new IOException("HPACK huffman: bad padding")
      out.toByteArray
    }

    /** Encode (RFC 7541 §5.2): used by the in-test mock server to
      * exercise the decoder the way grpc-go's encoder would; pads the
      * final partial byte with EOS prefix bits (all ones). */
    def encode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = 0L; var nbits = 0
      data.foreach { byte =>
        val (code, len) = table(byte & 0xff)
        cur = (cur << len) | (code.toLong & 0xffffffffL); nbits += len
        while (nbits >= 8) {
          nbits -= 8; out.write(((cur >>> nbits) & 0xff).toInt)
        }
      }
      if (nbits > 0)
        out.write((((cur << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt)
      out.toByteArray
    }
  }

  // ---- HPACK -------------------------------------------------------------

  /** RFC 7541 Appendix A static table (1-based). Only names matter for
    * decoding requests we did not encode; values present where defined. */
  val StaticTable: Vector[(String, String)] = Vector(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST",
    ":path" -> "/", ":path" -> "/index.html", ":scheme" -> "http",
    ":scheme" -> "https", ":status" -> "200", ":status" -> "204",
    ":status" -> "206", ":status" -> "304", ":status" -> "400",
    ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
    "accept-ranges" -> "", "accept" -> "", "access-control-allow-origin" -> "",
    "age" -> "", "allow" -> "", "authorization" -> "", "cache-control" -> "",
    "content-disposition" -> "", "content-encoding" -> "",
    "content-language" -> "", "content-length" -> "", "content-location" -> "",
    "content-range" -> "", "content-type" -> "", "cookie" -> "", "date" -> "",
    "etag" -> "", "expect" -> "", "expires" -> "", "from" -> "", "host" -> "",
    "if-match" -> "", "if-modified-since" -> "", "if-none-match" -> "",
    "if-range" -> "", "if-unmodified-since" -> "", "last-modified" -> "",
    "link" -> "", "location" -> "", "max-forwards" -> "",
    "proxy-authenticate" -> "", "proxy-authorization" -> "", "range" -> "",
    "referer" -> "", "refresh" -> "", "retry-after" -> "", "server" -> "",
    "set-cookie" -> "", "strict-transport-security" -> "",
    "transfer-encoding" -> "", "user-agent" -> "", "vary" -> "", "via" -> "",
    "www-authenticate" -> "")

  /** Encode one header as literal-without-indexing/new-name, raw strings. */
  private def encodeLiteral(out: java.io.ByteArrayOutputStream,
                            name: String, value: String): Unit = {
    out.write(0x00)
    def str(s: String): Unit = {
      val b = s.getBytes(UTF_8)
      writeInt(out, b.length, 7, 0x00) // high bit 0 = no huffman
      out.write(b)
    }
    str(name); str(value)
  }

  /** HPACK prefixed-integer encoding (RFC 7541 §5.1). */
  private def writeInt(out: java.io.ByteArrayOutputStream, v0: Int,
                       prefixBits: Int, firstByteFlags: Int): Unit = {
    val max = (1 << prefixBits) - 1
    if (v0 < max) out.write(firstByteFlags | v0)
    else {
      out.write(firstByteFlags | max)
      var v = v0 - max
      while (v >= 128) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
      out.write(v)
    }
  }

  def encodeHeaders(headers: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    headers.foreach { case (n, v) => encodeLiteral(out, n, v) }
    out.toByteArray
  }

  /** Same literal form with HUFFMAN-coded strings — how grpc-go's hpack
    * encoder emits `grpc-status`/`grpc-message` trailers when the coded
    * form is shorter. Used by the in-test mock server to exercise the
    * client decoder's huffman path. */
  def encodeHeadersHuffman(headers: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def str(s: String): Unit = {
      val b = Huffman.encode(s.getBytes(UTF_8))
      writeInt(out, b.length, 7, 0x80) // high bit 1 = huffman
      out.write(b)
    }
    headers.foreach { case (n, v) => out.write(0x00); str(n); str(v) }
    out.toByteArray
  }

  /** Stateful per-connection HPACK decoder (the dynamic table persists
    * across header blocks on one connection, RFC 7541 §2.2). */
  final class HpackDecoder {
    private var dynamic = Vector.empty[(String, String)]

    private def entry(index: Int): (String, String) =
      if (index >= 1 && index <= StaticTable.size) StaticTable(index - 1)
      else {
        val d = index - StaticTable.size - 1
        if (d >= 0 && d < dynamic.size) dynamic(d)
        else throw new IOException(s"HPACK index $index out of table")
      }

    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var i = 0
      def readInt(prefixBits: Int): Int = {
        val max = (1 << prefixBits) - 1
        var v = block(i) & max; i += 1
        if (v == max) {
          var shift = 0; var more = true
          while (more) {
            val b = block(i) & 0xff; i += 1
            v += (b & 0x7f) << shift; shift += 7; more = (b & 0x80) != 0
          }
        }
        v
      }
      def readString(): String = {
        val huffman = (block(i) & 0x80) != 0
        val len = readInt(7)
        val s =
          if (huffman) new String(Huffman.decode(block, i, len), UTF_8)
          else new String(block, i, len, UTF_8)
        i += len; s
      }
      while (i < block.length) {
        val b = block(i) & 0xff
        if ((b & 0x80) != 0) { // indexed
          out += entry(readInt(7))
        } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
          val idx = readInt(6)
          val name = if (idx == 0) readString() else entry(idx)._1
          val value = readString()
          dynamic = (name, value) +: dynamic
          out += (name -> value)
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          readInt(5); () // size bound not enforced: client tables stay tiny
        } else { // literal without indexing (0000) / never indexed (0001)
          val idx = readInt(4)
          val name = if (idx == 0) readString() else entry(idx)._1
          out += (name -> readString())
        }
      }
      out.result()
    }
  }
}

/** Blocking single-connection gRPC client over cleartext HTTP/2 (h2c,
  * prior knowledge): one request-response call per stream, odd stream
  * ids, gRPC length-prefixed message framing (1-byte compressed flag +
  * 4-byte big-endian length). Calls are serialized per client — the
  * sink's per-partition usage is sequential by construction, so stream
  * multiplexing buys nothing here.
  *
  * Send path honors the server's advertised limits (grpc-go enforces
  * both): request bodies split into DATA frames no larger than
  * SETTINGS_MAX_FRAME_SIZE (16384 until advertised otherwise — one
  * oversized frame is a connection-fatal FRAME_SIZE_ERROR), and sending
  * blocks on the connection- and stream-level flow-control windows
  * (65535 initial, RFC 7540 §6.9.2), consuming WINDOW_UPDATE / SETTINGS
  * frames while blocked. Response frames that arrive mid-send (a server
  * may answer before the request ends) are queued for the receive loop.
  */
object H2cGrpcClient {
  /** Socket read-timeout backstop (5 min): far above any healthy RPC,
    * small enough that a peer that never grants credit and never ends
    * the stream fails the task instead of wedging it. 0 disables. */
  val DefaultReadTimeoutMs: Int = 300000
}

final class H2cGrpcClient(host: String, port: Int,
                          readTimeoutMs: Int = H2cGrpcClient.DefaultReadTimeoutMs)
  extends AutoCloseable {

  private val socket = new Socket(host, port)
  // backstop against a peer that neither grants window credit nor ends the
  // stream: a blocked partition task must eventually fail, not hang forever
  if (readTimeoutMs > 0) socket.setSoTimeout(readTimeoutMs)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val hpackIn = new H2.HpackDecoder
  private var nextStream = 1

  // server-advertised send-side limits (RFC 7540 defaults until its
  // SETTINGS arrives; calls are serialized, so plain vars suffice)
  private var maxFrameSize = 16384
  private var connWindow = 65535L
  private var initialWindow = 65535L
  private var streamWindow = 0L // reset per call from initialWindow
  private var settingsSeen = false

  // connection preface: magic + our (empty) SETTINGS; the server's
  // SETTINGS is consumed by the first call's frame loops (servers may
  // send it any time before first use)
  out.write(H2.Preface)
  H2.writeFrame(out, H2.Frame(H2.Settings, 0, 0, Array.emptyByteArray))

  /** Connection-level bookkeeping for one inbound frame (SETTINGS apply +
    * ack, PING ack, window credits, fatal GOAWAY/RST). Returns true when
    * the frame belongs to stream `sid` and must be handled by the caller. */
  private def control(f: H2.Frame, sid: Int, path: String): Boolean = f.tpe match {
    case H2.Settings =>
      if ((f.flags & H2.Ack) == 0) {
        applySettings(f.payload)
        settingsSeen = true
        H2.writeFrame(out, H2.Frame(H2.Settings, H2.Ack, 0, Array.emptyByteArray))
      }
      false
    case H2.Ping =>
      if ((f.flags & H2.Ack) == 0)
        H2.writeFrame(out, H2.Frame(H2.Ping, H2.Ack, 0, f.payload))
      false
    case H2.WindowUpdate =>
      val inc = (java.nio.ByteBuffer.wrap(f.payload).getInt & 0x7fffffff).toLong
      if (f.streamId == 0) connWindow += inc
      else if (f.streamId == sid) streamWindow += inc
      false
    case H2.GoAway =>
      throw new IOException(s"h2 GOAWAY from $host:$port")
    case H2.RstStream if f.streamId == sid =>
      throw new IOException(s"h2 RST_STREAM on $path")
    case _ => f.streamId == sid // HEADERS / DATA on our stream
  }

  private def applySettings(p: Array[Byte]): Unit = {
    var i = 0
    while (i + 6 <= p.length) {
      val id = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
      val v = ((p(i + 2) & 0xffL) << 24) | ((p(i + 3) & 0xffL) << 16) |
        ((p(i + 4) & 0xffL) << 8) | (p(i + 5) & 0xffL)
      id match {
        case H2.SettingsInitialWindowSize =>
          // applies retroactively to the open stream (RFC 7540 §6.9.2)
          streamWindow += v - initialWindow; initialWindow = v
        case H2.SettingsMaxFrameSize => maxFrameSize = v.toInt
        case _ => ()
      }
      i += 6
    }
  }

  /** One unary call; returns the response message bytes. Non-OK
    * `grpc-status` raises IOException with the status and message. */
  def call(path: String, request: Array[Byte]): Array[Byte] = synchronized {
    val sid = nextStream; nextStream += 2
    // the server preface's SETTINGS is the first frame it must send (RFC
    // 7540 §3.5): wait for it before the first request so the advertised
    // frame/window limits are in force from the first DATA byte — the
    // same handshake-wait stance as grpc-go (no stream frames can arrive
    // before we have sent anything, so control() alone drains safely)
    while (!settingsSeen) control(H2.readFrame(in), sid, path)
    streamWindow = initialWindow
    // response frames that arrive while the send loop is blocked on flow
    // control — handed to the receive loop in arrival order
    val pending = scala.collection.mutable.Queue.empty[H2.Frame]
    val headerBlock = H2.encodeHeaders(Seq(
      ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
      ":authority" -> s"$host:$port",
      "content-type" -> "application/grpc", "te" -> "trailers"))
    H2.writeFrame(out, H2.Frame(H2.Headers, H2.EndHeaders, sid, headerBlock))
    val body = java.nio.ByteBuffer.allocate(5 + request.length)
      .put(0.toByte).putInt(request.length).put(request).array()
    var off = 0
    // a server may end the stream early instead of granting credit — a
    // trailers-only error response is HEADERS+END_STREAM with no
    // RST_STREAM and no further WINDOW_UPDATE. Waiting only for credit
    // would then block forever; once the peer half-closes, abandon the
    // remaining DATA and let the receive loop surface its grpc-status.
    var peerEnded = false
    while (off < body.length && !peerEnded) {
      while (math.min(connWindow, streamWindow) <= 0 && !peerEnded) {
        val f = H2.readFrame(in) // blocked: wait for credit OR early end
        if (control(f, sid, path)) {
          pending.enqueue(f)
          if ((f.tpe == H2.Headers || f.tpe == H2.Data) &&
            (f.flags & H2.EndStream) != 0) peerEnded = true
        }
      }
      if (!peerEnded) {
        val n = math.min(math.min(connWindow, streamWindow),
          math.min(maxFrameSize.toLong, (body.length - off).toLong)).toInt
        val flags = if (off + n == body.length) H2.EndStream else 0
        H2.writeFrame(out, H2.Frame(H2.Data, flags, sid,
          java.util.Arrays.copyOfRange(body, off, off + n)))
        connWindow -= n; streamWindow -= n; off += n
      }
    }

    val data = new java.io.ByteArrayOutputStream()
    var headers = Map.empty[String, String]
    var done = false
    // a header block larger than the PEER's max frame size arrives split
    // across HEADERS + CONTINUATION frames (RFC 7540 §6.10): buffer until
    // END_HEADERS before HPACK-decoding — a partial block is not decodable
    // (its last prefixed integer may be cut mid-varint). END_STREAM lives
    // on the initial HEADERS frame only.
    val headerBuf = new java.io.ByteArrayOutputStream()
    var headerEndStream = false
    def endHeaderBlock(): Unit = {
      headers ++= hpackIn.decode(headerBuf.toByteArray).toMap
      headerBuf.reset()
      if (headerEndStream) done = true
    }
    while (!done) {
      val (f, fresh) =
        if (pending.nonEmpty) (pending.dequeue(), false)
        else (H2.readFrame(in), true)
      val relevant = if (fresh) control(f, sid, path) else true
      if (relevant) f.tpe match {
        case H2.Headers =>
          headerBuf.write(f.payload)
          headerEndStream = (f.flags & H2.EndStream) != 0
          if ((f.flags & H2.EndHeaders) != 0) endHeaderBlock()
        case H2.Continuation =>
          headerBuf.write(f.payload)
          if ((f.flags & H2.EndHeaders) != 0) endHeaderBlock()
        case H2.Data =>
          data.write(f.payload)
          // replenish RECEIVE windows so long responses never stall
          if (f.payload.nonEmpty) {
            val inc = java.nio.ByteBuffer.allocate(4).putInt(f.payload.length).array()
            H2.writeFrame(out, H2.Frame(H2.WindowUpdate, 0, 0, inc))
            H2.writeFrame(out, H2.Frame(H2.WindowUpdate, 0, sid, inc))
          }
          if ((f.flags & H2.EndStream) != 0) done = true
        case _ => ()
      }
    }
    val status = headers.getOrElse("grpc-status", "0")
    if (status != "0")
      throw new IOException(s"grpc $path failed: status $status " +
        headers.getOrElse("grpc-message", ""))
    val resp = data.toByteArray
    if (resp.isEmpty) Array.emptyByteArray
    else {
      val b = java.nio.ByteBuffer.wrap(resp)
      b.get() // compressed flag — identity only (we never negotiate one)
      val len = b.getInt()
      val msg = new Array[Byte](len); b.get(msg); msg
    }
  }

  override def close(): Unit = socket.close()
}
