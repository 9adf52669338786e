package graft

import graft.sink.grpc.H2.Huffman

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** Pins the HPACK huffman table (RFC 7541 Appendix B) and codec against
  * the RFC's OWN Appendix C examples — authoritative vectors a
  * transcription error in the 257-entry table cannot survive — plus the
  * structural invariants of a canonical prefix code.
  */
class HuffmanSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** (plain, huffman-hex) pairs straight from RFC 7541 Appendix C
    * (C.4.1-3 request examples, C.6.1-3 response examples). */
  private val rfcVectors = Seq(
    "www.example.com" -> "f1e3c2e5f23a6ba0ab90f4ff",
    "no-cache" -> "a8eb10649cbf",
    "custom-key" -> "25a849e95ba97d7f",
    "custom-value" -> "25a849e95bb8e8b4bf",
    "302" -> "6402",
    "private" -> "aec3771a4b",
    "Mon, 21 Oct 2013 20:13:21 GMT" ->
      "d07abe941054d444a8200595040b8166e082a62d1bff",
    "https://www.example.com" -> "9d29ad171863c78f0b97c8e9ae82ae43d3",
    "307" -> "640eff",
    "gzip" -> "9bd9ab")

  test("RFC 7541 Appendix C vectors decode and encode exactly") {
    rfcVectors.foreach { case (plain, coded) =>
      assert(new String(Huffman.decode(hex(coded), 0, coded.length / 2),
        UTF_8) == plain, s"decode($coded)")
      assert(Huffman.encode(plain.getBytes(UTF_8)).map("%02x".format(_))
        .mkString == coded, s"encode($plain)")
    }
  }

  test("the 257-entry table is a canonical prefix code (unique codes, " +
    "prefix-free, Kraft equality)") {
    val codes = Huffman.codes
    assert(codes.size == 257)
    // unique (code, len)
    assert(codes.distinct.size == 257, "duplicate code")
    // Kraft equality for a complete code: sum 2^(30-len) == 2^30
    val kraft = codes.map { case (_, len) => 1L << (30 - len) }.sum
    assert(kraft == (1L << 30), s"Kraft sum $kraft != 2^30")
    // prefix-freedom: no code is a prefix of a longer one
    val sorted = codes.sortBy(_._2)
    for (i <- sorted.indices; j <- (i + 1) until sorted.size) {
      val (ca, la) = sorted(i); val (cb, lb) = sorted(j)
      if (la < lb)
        assert((cb >>> (lb - la)) != ca,
          f"code $ca%x/$la is a prefix of $cb%x/$lb")
    }
  }

  test("all 256 symbols round-trip, including non-ASCII bytes") {
    val all = Array.tabulate(256)(_.toByte)
    assert(Huffman.decode(Huffman.encode(all), 0,
      Huffman.encode(all).length).sameElements(all))
  }

  test("corrupt input is rejected: EOS in stream, bad padding") {
    // a full EOS code (30 ones then 0-bits) must raise
    val eos = hex("fffffffc") // 30 ones + 00 padding (not all-ones)
    intercept[java.io.IOException] { Huffman.decode(eos, 0, eos.length) }
    // '0' (00000/5) followed by 3 ZERO pad bits — padding must be ones
    val badPad = Array(0x00.toByte)
    intercept[java.io.IOException] { Huffman.decode(badPad, 0, 1) }
  }
}
