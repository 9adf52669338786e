package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 / SCRAM-SHA-256-PLUS client (RFC 5802 mechanics,
  * RFC 7677 hash parameters, RFC 5929 `tls-server-end-point` channel
  * binding) — the SASL exchange PostgreSQL wraps in AuthenticationSASL /
  * SASLInitialResponse / AuthenticationSASLContinue / SASLResponse /
  * AuthenticationSASLFinal messages (the reference authenticates through
  * its driver's DSN: internal/cdc/postgres/postgres.go:97-113; this is
  * the same exchange implemented directly, JDK crypto only).
  *
  * With `channelBinding` (the server certificate's tls-server-end-point
  * hash, available once the dial upgraded through [[PgTls]]) the client
  * runs the -PLUS variant: gs2 header `p=tls-server-end-point,,` and the
  * c= attribute carries the header plus the binding data, so a MITM that
  * terminates TLS with its own certificate corrupts the authenticated
  * channel-binding bytes and the proof fails. Without it the plain
  * mechanism runs (`n,,` — libpq's behavior when the server does not
  * offer -PLUS). The username in the SCRAM message is empty: PostgreSQL
  * ignores it in favor of the startup-message user, which is what libpq
  * sends. The exchange is pure (nonce injected), so `ScramSpec` pins it
  * byte-for-byte to the RFC 7677 test vector and `HandshakeSpec`/`TlsSpec`
  * drive both variants against in-process mock backends that
  * independently verify proof AND binding.
  */
final class ScramClient(password: String, clientNonce: String,
                        channelBinding: Option[Array[Byte]] = None) {

  import ScramAuth._

  // SASLprep the password like libpq (pg_saslprep): normalized form when
  // valid, RAW password when prep rejects it — a server that stored an
  // exotic password unprepared still authenticates.
  private val preppedPassword: String =
    saslPrep(password).getOrElse(password)

  private val gs2Header =
    if (channelBinding.isDefined) "p=tls-server-end-point,," else "n,,"
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

    val saltedPassword = hi(preppedPassword, salt, iterations)
    val clientKey = hmac(saltedPassword, "Client Key")
    val storedKey = h(clientKey)
    // c = base64(gs2-header || cb-data): with binding, the certificate
    // hash itself is folded into the signed auth message
    val cAttr = Base64.getEncoder.encodeToString(
      gs2Header.getBytes(UTF_8) ++ channelBinding.getOrElse(Array.emptyByteArray))
    val withoutProof = s"c=$cAttr,r=$combinedNonce"
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
  val MechanismPlus = "SCRAM-SHA-256-PLUS"

  /** RFC 5929 `tls-server-end-point` channel-binding data: a hash of the
    * server certificate's DER encoding, using the certificate signature's
    * hash function with MD5/SHA-1 upgraded to SHA-256 (§4.1) — the one
    * binding type PostgreSQL supports.
    *
    * RSASSA-PSS certificates name no hash in the algorithm identifier —
    * the digest lives in the signature's AlgorithmParameters
    * (PSSParameterSpec), so it is read from there; a bare "RSASSA-PSS"
    * name falling through to the SHA-256 default would compute a binding
    * the server (which follows RFC 5929 §4.1) disagrees with, failing
    * SCRAM-SHA-256-PLUS closed against every PSS-cert server. */
  def tlsServerEndPoint(cert: java.security.cert.X509Certificate): Array[Byte] = {
    val alg = cert.getSigAlgName.toUpperCase match {
      case pss if pss.contains("RSASSA-PSS") =>
        Option(cert.getSigAlgParams).map { der =>
          val params = java.security.AlgorithmParameters.getInstance("RSASSA-PSS")
          params.init(der)
          params.getParameterSpec(
            classOf[java.security.spec.PSSParameterSpec])
            .getDigestAlgorithm.toUpperCase
        }.getOrElse(pss) // parameter-less PSS: RFC default is SHA-1 → upgrade
      case named => named
    }
    val hash =
      if (alg.contains("384")) "SHA-384"
      else if (alg.contains("512")) "SHA-512"
      else "SHA-256" // incl. the MD5/SHA-1 upgrade rule
    MessageDigest.getInstance(hash).digest(cert.getEncoded)
  }

  /** SASLprep (RFC 4013 profile of stringprep) for the password, matching
    * PostgreSQL's client behavior (libpq's pg_saslprep): map non-ASCII
    * spaces to space and drop the map-to-nothing set (RFC 3454 B.1),
    * normalize NFKC, then reject prohibited output (control chars,
    * surrogates, non-characters, private/unassigned planes). Returns None
    * when the result is prohibited or empty — callers fall back to the
    * RAW password, exactly like libpq, so an exotic password still works
    * against a server that stored it unprepared. ASCII passwords pass
    * through unchanged (prep is the identity there). */
  def saslPrep(password: String): Option[String] = {
    val mapped = new StringBuilder
    password.codePoints().forEach { cp =>
      // map-to-nothing takes precedence over space-mapping for the
      // overlap (U+200B is in both tables) — the order saslprep.c uses
      if (isMapToNothing(cp)) ()
      else if (isNonAsciiSpace(cp)) mapped.append(' ')
      else mapped.appendAll(Character.toChars(cp))
    }
    val normalized = java.text.Normalizer
      .normalize(mapped, java.text.Normalizer.Form.NFKC)
    val ok = normalized.nonEmpty &&
      normalized.codePoints().allMatch(cp => !isProhibited(cp))
    if (ok) Some(normalized) else None
  }

  /** RFC 3454 C.1.2 non-ASCII space characters. */
  private def isNonAsciiSpace(cp: Int): Boolean =
    cp == 0x00a0 || cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200b) ||
      cp == 0x202f || cp == 0x205f || cp == 0x3000

  /** RFC 3454 B.1 commonly-mapped-to-nothing. */
  private def isMapToNothing(cp: Int): Boolean =
    cp == 0x00ad || cp == 0x034f || cp == 0x1806 ||
      (cp >= 0x180b && cp <= 0x180d) || (cp >= 0x200b && cp <= 0x200d) ||
      cp == 0x2060 || (cp >= 0xfe00 && cp <= 0xfe0f) || cp == 0xfeff

  /** RFC 4013 §2.3 prohibited output: C.2.1/C.2.2 control, C.3 private
    * use, C.4 non-characters, C.5 surrogates, C.6 inappropriate for plain
    * text, C.7 inappropriate for canonical representation, C.8
    * change-display/deprecated, C.9 tagging. */
  private def isProhibited(cp: Int): Boolean =
    (cp <= 0x1f) || cp == 0x7f ||                          // C.2.1 ASCII control
      (cp >= 0x80 && cp <= 0x9f) || cp == 0x06dd || cp == 0x070f ||
      cp == 0x180e || cp == 0x200c || cp == 0x200d || cp == 0x2028 ||
      cp == 0x2029 || (cp >= 0x2060 && cp <= 0x2063) ||
      (cp >= 0x206a && cp <= 0x206f) || cp == 0xfeff ||
      (cp >= 0xfff9 && cp <= 0xfffc) ||                    // C.2.2 + C.6
      (cp >= 0xe000 && cp <= 0xf8ff) || (cp >= 0xf0000 && cp <= 0xffffd) ||
      (cp >= 0x100000 && cp <= 0x10fffd) ||                // C.3 private use
      (cp & 0xfffe) == 0xfffe || (cp >= 0xfdd0 && cp <= 0xfdef) || // C.4
      (cp >= 0xd800 && cp <= 0xdfff) ||                    // C.5 surrogates
      cp == 0xfffd ||                                      // C.6 replacement
      (cp >= 0x2ff0 && cp <= 0x2ffb) ||                    // C.7
      cp == 0x0340 || cp == 0x0341 || cp == 0x200e || cp == 0x200f ||
      (cp >= 0x202a && cp <= 0x202e) ||                    // C.8 bidi control
      cp == 0xe0001 || (cp >= 0xe0020 && cp <= 0xe007f)    // C.9 tagging

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
