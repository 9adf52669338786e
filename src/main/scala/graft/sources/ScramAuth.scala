package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 client (RFC 5802 mechanics, RFC 7677 hash parameters) —
  * the SASL exchange PostgreSQL wraps in AuthenticationSASL /
  * SASLInitialResponse / AuthenticationSASLContinue / SASLResponse /
  * AuthenticationSASLFinal messages (the reference authenticates through
  * its driver's DSN: internal/cdc/postgres/postgres.go:97-113; this is
  * the same exchange implemented directly, JDK crypto only).
  *
  * Channel binding is not offered (`n,,` gs2 header — the plain
  * SCRAM-SHA-256 mechanism, not -PLUS), and the username in the SCRAM
  * message is empty: PostgreSQL ignores it in favor of the startup-message
  * user, which is what libpq sends. The exchange is pure (nonce injected),
  * so `ScramSpec` pins it byte-for-byte to the RFC 7677 test vector and
  * `HandshakeSpec` drives it against an in-process mock backend that
  * independently verifies the proof.
  */
final class ScramClient(password: String, clientNonce: String) {

  import ScramAuth._

  private val gs2Header = "n,,"
  private var clientFirstBare: String = _
  private var serverSignatureB64: String = _

  /** `client-first-message`: gs2 header + bare (`n=,r=<nonce>`). */
  def clientFirstMessage(): String = {
    clientFirstBare = s"n=,r=$clientNonce"
    gs2Header + clientFirstBare
  }

  /** Consume `server-first-message`, produce `client-final-message`.
    * Fails if the server nonce does not extend the client nonce (RFC 5802
    * §5.1 r-attribute rule — a mismatch is a MITM or a broken server). */
  def clientFinalMessage(serverFirst: String): String = {
    val attrs = parseAttrs(serverFirst)
    val combinedNonce = attrs.getOrElse("r",
      fail("server-first-message missing r="))
    if (!combinedNonce.startsWith(clientNonce))
      fail("server nonce does not extend the client nonce")
    if (combinedNonce.length <= clientNonce.length)
      fail("server added no nonce entropy")
    val salt = Base64.getDecoder.decode(
      attrs.getOrElse("s", fail("server-first-message missing s=")))
    val iterations = attrs.getOrElse("i",
      fail("server-first-message missing i=")).toInt
    if (iterations < 1) fail(s"non-positive iteration count $iterations")

    val saltedPassword = hi(password, salt, iterations)
    val clientKey = hmac(saltedPassword, "Client Key")
    val storedKey = h(clientKey)
    val channelBinding = Base64.getEncoder.encodeToString(gs2Header.getBytes(UTF_8))
    val withoutProof = s"c=$channelBinding,r=$combinedNonce"
    val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
    val clientSignature = hmac(storedKey, authMessage)
    val proof = xor(clientKey, clientSignature)

    val serverKey = hmac(saltedPassword, "Server Key")
    serverSignatureB64 =
      Base64.getEncoder.encodeToString(hmac(serverKey, authMessage))

    s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}"
  }

  /** Verify `server-final-message` (`v=<ServerSignature>`) — the mutual-
    * auth half: a server that never knew the password cannot forge it. */
  def verifyServerFinal(serverFinal: String): Unit = {
    val attrs = parseAttrs(serverFinal)
    attrs.get("e").foreach(e => fail(s"server rejected authentication: $e"))
    val v = attrs.getOrElse("v", fail("server-final-message missing v="))
    if (v != serverSignatureB64)
      fail("server signature mismatch — server does not know the password")
  }

  private def fail(msg: String): Nothing =
    throw new SecurityException(s"SCRAM: $msg")
}

object ScramAuth {

  val Mechanism = "SCRAM-SHA-256"

  /** `Hi(str, salt, i)` = PBKDF2-HMAC-SHA-256 (RFC 5802 §2.2). */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }

  def h(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** `a=value` attribute pairs of a SCRAM message (value may contain `=`). */
  def parseAttrs(msg: String): Map[String, String] =
    msg.split(",").iterator.filter(_.length >= 2).map { kv =>
      kv.substring(0, 1) -> kv.substring(2)
    }.toMap

  /** Printable nonce from SecureRandom — RFC 5802 requires ASCII printable
    * minus comma; base64 of 18 random bytes satisfies that. */
  def randomNonce(): String = {
    val bytes = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(bytes)
    Base64.getEncoder.encodeToString(bytes)
  }
}
