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
  * insertions incremental indexing implies), and dynamic-size updates;
  * HUFFMAN-coded strings are rejected with an actionable error rather
  * than mis-decoded — the one RFC 7541 surface deliberately out of scope
  * (Appendix B's 257-code table; extend `decodeString` for servers whose
  * encoders huffman-compress trailers).
  */
object H2 {
  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(US_ASCII)

  // frame types
  val Data = 0x0; val Headers = 0x1; val RstStream = 0x3; val Settings = 0x4
  val Ping = 0x6; val GoAway = 0x7; val WindowUpdate = 0x8

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
        if (huffman)
          throw new IOException(
            "HPACK huffman-coded string: decoding not implemented — extend " +
              "H2.HpackDecoder.decode (RFC 7541 Appendix B) for this peer")
        val s = new String(block, i, len, UTF_8); i += len; s
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
  */
final class H2cGrpcClient(host: String, port: Int) extends AutoCloseable {

  private val socket = new Socket(host, port)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val hpackIn = new H2.HpackDecoder
  private var nextStream = 1

  // connection preface: magic + our (empty) SETTINGS; the server's
  // SETTINGS is consumed lazily by the first call's frame loop (servers
  // may send it any time before first use)
  out.write(H2.Preface)
  H2.writeFrame(out, H2.Frame(H2.Settings, 0, 0, Array.emptyByteArray))

  /** One unary call; returns the response message bytes. Non-OK
    * `grpc-status` raises IOException with the status and message. */
  def call(path: String, request: Array[Byte]): Array[Byte] = synchronized {
    val sid = nextStream; nextStream += 2
    val headerBlock = H2.encodeHeaders(Seq(
      ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
      ":authority" -> s"$host:$port",
      "content-type" -> "application/grpc", "te" -> "trailers"))
    H2.writeFrame(out, H2.Frame(H2.Headers, H2.EndHeaders, sid, headerBlock))
    val grpcFrame = java.nio.ByteBuffer.allocate(5 + request.length)
    grpcFrame.put(0.toByte).putInt(request.length).put(request)
    H2.writeFrame(out, H2.Frame(H2.Data, H2.EndStream, sid, grpcFrame.array()))

    val data = new java.io.ByteArrayOutputStream()
    var headers = Map.empty[String, String]
    var done = false
    while (!done) {
      val f = H2.readFrame(in)
      f.tpe match {
        case H2.Settings =>
          if ((f.flags & H2.Ack) == 0)
            H2.writeFrame(out, H2.Frame(H2.Settings, H2.Ack, 0, Array.emptyByteArray))
        case H2.Ping =>
          if ((f.flags & H2.Ack) == 0)
            H2.writeFrame(out, H2.Frame(H2.Ping, H2.Ack, 0, f.payload))
        case H2.WindowUpdate => () // we never exceed the initial window
        case H2.GoAway =>
          throw new IOException(s"h2 GOAWAY from $host:$port")
        case H2.RstStream if f.streamId == sid =>
          throw new IOException(s"h2 RST_STREAM on $path")
        case H2.Headers if f.streamId == sid =>
          headers ++= hpackIn.decode(f.payload).toMap
          if ((f.flags & H2.EndStream) != 0) done = true
        case H2.Data if f.streamId == sid =>
          data.write(f.payload)
          // replenish flow-control windows so long responses never stall
          if (f.payload.nonEmpty) {
            val inc = java.nio.ByteBuffer.allocate(4).putInt(f.payload.length).array()
            H2.writeFrame(out, H2.Frame(H2.WindowUpdate, 0, 0, inc))
            H2.writeFrame(out, H2.Frame(H2.WindowUpdate, 0, sid, inc))
          }
          if ((f.flags & H2.EndStream) != 0) done = true
        case _ => () // frames for other streams / unknown extensions
      }
    }
    val status = headers.getOrElse("grpc-status", "0")
    if (status != "0")
      throw new IOException(s"grpc $path failed: status $status " +
        headers.getOrElse("grpc-message", ""))
    val body = data.toByteArray
    if (body.isEmpty) Array.emptyByteArray
    else {
      val b = java.nio.ByteBuffer.wrap(body)
      b.get() // compressed flag — identity only (we never negotiate one)
      val len = b.getInt()
      val msg = new Array[Byte](len); b.get(msg); msg
    }
  }

  override def close(): Unit = socket.close()
}
