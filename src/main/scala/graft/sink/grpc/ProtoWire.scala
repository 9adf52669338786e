package graft.sink.grpc

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal protobuf wire-format codec — writer + field-map reader — for
  * the Milvus gRPC messages ([[MilvusProto]]). Only the wire types those
  * messages use: VARINT (0), 64-bit (1), LEN (2), 32-bit (5). No
  * generated code, no runtime dependency: the same hand-rolled-protocol
  * stance as the PostgreSQL replication client (`PgOutputWire`), applied
  * to protobuf's public encoding (protobuf.dev/programming-guides/encoding).
  */
final class ProtoWriter {
  private val out = new ByteArrayOutputStream()

  def varint(v: Long): ProtoWriter = {
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
    this
  }

  private def tag(field: Int, wire: Int): ProtoWriter =
    varint((field.toLong << 3) | wire)

  def int(field: Int, v: Long): ProtoWriter = { tag(field, 0); varint(v) }

  def bool(field: Int, v: Boolean): ProtoWriter =
    if (v) int(field, 1L) else this // proto3: false is the default, omitted

  def bytes(field: Int, b: Array[Byte]): ProtoWriter = {
    tag(field, 2); varint(b.length.toLong); out.write(b); this
  }

  def string(field: Int, s: String): ProtoWriter =
    bytes(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Nested message: serialize the body, emit as a LEN field. */
  def message(field: Int)(f: ProtoWriter => Unit): ProtoWriter = {
    val w = new ProtoWriter; f(w); bytes(field, w.toBytes)
  }

  /** Packed repeated float (LEN of little-endian IEEE-754 singles). */
  def packedFloats(field: Int, fs: Seq[Float]): ProtoWriter = {
    val b = ByteBuffer.allocate(4 * fs.size).order(ByteOrder.LITTLE_ENDIAN)
    fs.foreach(b.putFloat)
    bytes(field, b.array())
  }

  def toBytes: Array[Byte] = out.toByteArray
}

/** Parsed message: field number → values in wire order. VARINT and both
  * fixed widths land in `ints`; LEN fields land in `lens` (nested
  * messages, strings, packed arrays — the caller re-parses). */
final case class ProtoMessage(ints: Map[Int, Seq[Long]],
                              lens: Map[Int, Seq[Array[Byte]]]) {
  def int(field: Int): Option[Long] = ints.get(field).flatMap(_.headOption)
  def len(field: Int): Option[Array[Byte]] = lens.get(field).flatMap(_.headOption)
  def lensOf(field: Int): Seq[Array[Byte]] = lens.getOrElse(field, Nil)
  def string(field: Int): Option[String] =
    len(field).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
  def msg(field: Int): Option[ProtoMessage] = len(field).map(ProtoWire.parse)
  def msgs(field: Int): Seq[ProtoMessage] = lensOf(field).map(ProtoWire.parse)
}

object ProtoWire {

  def parse(bytes: Array[Byte]): ProtoMessage = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var ints = Map.empty[Int, Seq[Long]]
    var lens = Map.empty[Int, Seq[Array[Byte]]]
    def readVarint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        val x = b.get().toInt & 0xff
        v |= (x.toLong & 0x7f) << shift
        shift += 7; more = (x & 0x80) != 0
      }
      v
    }
    while (b.hasRemaining) {
      val key = readVarint()
      val field = (key >>> 3).toInt
      (key & 7L) match {
        case 0 => ints += field -> (ints.getOrElse(field, Nil) :+ readVarint())
        case 1 => ints += field -> (ints.getOrElse(field, Nil) :+ b.getLong())
        case 5 => ints += field -> (ints.getOrElse(field, Nil) :+ (b.getInt().toLong & 0xffffffffL))
        case 2 =>
          val n = readVarint().toInt
          require(n >= 0 && n <= b.remaining(), s"bad LEN $n in field $field")
          val payload = new Array[Byte](n); b.get(payload)
          lens += field -> (lens.getOrElse(field, Nil) :+ payload)
        case w => sys.error(s"unsupported protobuf wire type $w (field $field)")
      }
    }
    ProtoMessage(ints, lens)
  }

  /** Packed little-endian float payload → values. */
  def floats(payload: Array[Byte]): Seq[Float] = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(payload.length / 4)(b.getFloat())
  }
}
