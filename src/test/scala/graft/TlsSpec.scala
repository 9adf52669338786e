package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket,
  TrustManagerFactory}

import graft.sources.{PgReplicationHandshake, PgTls}
import org.scalatest.funsuite.AnyFunSuite

/** Self-signed TLS material for the mock walsender specs: the committed
  * PKCS12 keystore (CN=localhost, SAN dns:localhost + ip:127.0.0.1) acts
  * as the server's identity and the client's trust anchor. */
object TlsTestMaterial {
  private val Password = "graft-test".toCharArray

  private def keyStore(resource: String): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing test resource $resource")
    try ks.load(in, Password) finally in.close()
    ks
  }

  private def rsaKs = keyStore("/graft/tls-test.p12")
  // RSASSA-PSS-signed twin (SHA-384 digest in the PSS parameters): RFC
  // 5929 puts the binding hash in the signature's AlgorithmParameters,
  // not the algorithm name — the material that catches a SHA-256
  // fall-through
  private def pssKs = keyStore("/graft/tls-test-pss.p12")

  /** The self-signed certificate itself (for channel-binding checks). */
  def certificate: java.security.cert.X509Certificate =
    rsaKs.getCertificate("graft-test")
      .asInstanceOf[java.security.cert.X509Certificate]

  /** The RSASSA-PSS (SHA-384) self-signed certificate. */
  def pssCertificate: java.security.cert.X509Certificate =
    pssKs.getCertificate("graft-test-pss")
      .asInstanceOf[java.security.cert.X509Certificate]

  private def serverContextOf(ks: KeyStore): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Password)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Server-side context: holds the self-signed key pair. */
  def serverContext: SSLContext = serverContextOf(rsaKs)

  /** Server-side context with the RSASSA-PSS identity. */
  def pssServerContext: SSLContext = serverContextOf(pssKs)

  /** Client-side context trusting exactly the self-signed certificate —
    * the injected-trust path a deployment with a private CA uses. */
  def clientContext: SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(rsaKs)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Server half of the SSLRequest dance: read the 8-byte preamble off
    * `raw`, assert its shape, answer 'S', and hand back the TLS layer. */
  def acceptTls(raw: Socket, ctx: SSLContext = serverContext): Socket = {
    val in = new DataInputStream(raw.getInputStream)
    val len = in.readInt()
    val code = in.readInt()
    require(len == 8 && code == 80877103, s"bad SSLRequest: len=$len code=$code")
    raw.getOutputStream.write('S')
    raw.getOutputStream.flush()
    val ssl = ctx.getSocketFactory
      .createSocket(raw, null, raw.getPort, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(false)
    ssl
  }
}

/** TLS on the replication dial: SSLRequest preamble bytes, 'S'/'N'
  * handling, sslmode semantics (require = encrypt-only, verify-full =
  * authenticate + hostname), and a full startup handshake running over
  * the negotiated channel. */
class TlsSpec extends AnyFunSuite {

  private def msg(tag: Char, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + body.length)
    b.put(tag.toByte).putInt(4 + body.length).put(body)
    b.array()
  }
  private def authOk = msg('R', ByteBuffer.allocate(4).putInt(0).array())
  private def readyForQuery = msg('Z', Array('I'.toByte))

  test("sslmode=disable sends no preamble and returns the raw socket") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      assert(PgTls.negotiate(sock, "localhost", PgTls.ModeDisable) eq sock)
    } finally { sock.close(); server.close() }
  }

  test("sslmode=require fails hard when the server answers 'N'") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val in = new DataInputStream(s.getInputStream)
        assert(in.readInt() == 8 && in.readInt() == 80877103)
        s.getOutputStream.write('N'); s.getOutputStream.flush()
      } finally s.close()
    })
    t.start()
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val e = intercept[IllegalStateException](
        PgTls.negotiate(sock, "localhost", PgTls.ModeRequire))
      assert(e.getMessage.contains("refused TLS"))
    } finally { sock.close(); t.join(5000); server.close() }
  }

  test("unknown sslmode is rejected before any bytes flow") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try intercept[IllegalArgumentException](
      PgTls.negotiate(sock, "localhost", "prefer-ish"))
    finally { sock.close(); server.close() }
  }

  /** Mock backend that upgrades to TLS then runs a trust-auth startup. */
  private def tlsBackend(server: ServerSocket,
                         failure: java.util.concurrent.atomic.AtomicReference[String])
  : Thread = {
    val t = new Thread(() => {
      val raw = server.accept()
      try {
        val s = TlsTestMaterial.acceptTls(raw)
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        // StartupMessage arrives ENCRYPTED — prove it by parsing it here,
        // beyond the TLS layer
        val slen = sin.readInt() - 4
        val sp = new Array[Byte](slen)
        sin.readFully(sp)
        val params = new String(sp, 4, slen - 5, UTF_8)
          .split('\u0000').grouped(2).collect { case Array(k, v) => k -> v }.toMap
        if (params.get("replication") != Some("database"))
          failure.set(s"startup over TLS lost replication=database: $params")
        sout.write(authOk); sout.write(readyForQuery); sout.flush()
      } catch { case e: Throwable => failure.set(s"tls backend: $e") }
      finally raw.close()
    })
    t.start()
    t
  }

  test("sslmode=require: full startup handshake rides the TLS channel " +
    "(self-signed accepted, encrypt-only semantics)") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()
    val t = tlsBackend(server, failure)
    val raw = new Socket("localhost", server.getLocalPort)
    try {
      val sock = PgTls.negotiate(raw, "localhost", PgTls.ModeRequire)
      assert(sock.isInstanceOf[SSLSocket], "require must yield a TLS layer")
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream))
      hs.startup("rep", "postgres") // throws unless ReadyForQuery arrives
      t.join(5000)
      assert(failure.get() == null, s"backend saw: ${failure.get()}")
    } finally { raw.close(); server.close() }
  }

  test("sslmode=verify-full succeeds against the trusted cert with a " +
    "matching hostname") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()
    val t = tlsBackend(server, failure)
    val raw = new Socket("localhost", server.getLocalPort)
    try {
      val sock = PgTls.negotiate(raw, "localhost", PgTls.ModeVerifyFull,
        Some(TlsTestMaterial.clientContext))
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream))
      hs.startup("rep", "postgres")
      t.join(5000)
      assert(failure.get() == null, s"backend saw: ${failure.get()}")
    } finally { raw.close(); server.close() }
  }

  /** Full SCRAM-SHA-256-PLUS exchange over a TLS server presenting
    * `serverCtx`'s identity: the mock backend independently verifies the
    * mechanism choice, the bound c= attribute, and the proof against
    * `expectedBinding` (computed by the CALLER, so an agreed-upon-but-
    * wrong binding on both sides cannot hide). */
  private def runPlusExchange(serverCtx: javax.net.ssl.SSLContext,
                              expectedBinding: Array[Byte]): Unit = {
    import java.util.Base64
    import graft.sources.ScramAuth
    val password = "bound+s3cret"
    val salt = "plus-variant-salt".getBytes(UTF_8)
    val iterations = 4096
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val raw = server.accept()
      try {
        val s = TlsTestMaterial.acceptTls(raw, serverCtx)
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        val slen = sin.readInt() - 4
        sin.readFully(new Array[Byte](slen)) // StartupMessage
        // offer BOTH mechanisms: the bound client must pick -PLUS
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(10).array()
          ++ ("SCRAM-SHA-256-PLUS".getBytes(UTF_8) :+ 0.toByte)
          ++ ("SCRAM-SHA-256".getBytes(UTF_8) :+ 0.toByte) :+ 0.toByte))
        sout.flush()
        // SASLInitialResponse
        val t1 = sin.readByte().toChar
        val l1 = sin.readInt() - 4
        val p1 = new Array[Byte](l1); sin.readFully(p1)
        if (t1 != 'p') failure.set(s"expected SASLInitialResponse, got $t1")
        val b1 = ByteBuffer.wrap(p1)
        val mech = new StringBuilder
        var c = b1.get(); while (c != 0) { mech.append(c.toChar); c = b1.get() }
        if (mech.toString != "SCRAM-SHA-256-PLUS")
          failure.set(s"client did not pick -PLUS: ${mech.toString}")
        val len = b1.getInt
        val fb = new Array[Byte](len); b1.get(fb)
        val clientFirst = new String(fb, UTF_8)
        if (!clientFirst.startsWith("p=tls-server-end-point,,"))
          failure.set(s"gs2 header not bound: $clientFirst")
        val bare = clientFirst.stripPrefix("p=tls-server-end-point,,")
        val nonce = ScramAuth.parseAttrs(bare)("r")
        val combined = nonce + "SrvExt"
        val serverFirst = s"r=$combined," +
          s"s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(11).array()
          ++ serverFirst.getBytes(UTF_8))); sout.flush()
        // client-final: c= must be base64(gs2 || OUR cert's cb data), and
        // the proof must verify against the auth message containing it
        val t2 = sin.readByte().toChar
        val l2 = sin.readInt() - 4
        val p2 = new Array[Byte](l2); sin.readFully(p2)
        if (t2 != 'p') failure.set(s"expected SASLResponse, got $t2")
        val clientFinal = new String(p2, UTF_8)
        val attrs = ScramAuth.parseAttrs(clientFinal)
        val wantC = Base64.getEncoder.encodeToString(
          "p=tls-server-end-point,,".getBytes(UTF_8) ++ expectedBinding)
        if (attrs("c") != wantC)
          failure.set(s"c= does not carry the certificate binding")
        val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
        val authMessage = s"$bare,$serverFirst,$withoutProof"
        val salted = ScramAuth.hi(password, salt, iterations)
        val clientKey = ScramAuth.hmac(salted, "Client Key")
        val wantProof = Base64.getEncoder.encodeToString(ScramAuth.xor(
          clientKey, ScramAuth.hmac(ScramAuth.h(clientKey), authMessage)))
        if (attrs("p") != wantProof) failure.set("bound client proof REJECTED")
        val serverSig = Base64.getEncoder.encodeToString(ScramAuth.hmac(
          ScramAuth.hmac(salted, "Server Key"), authMessage))
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(12).array()
          ++ s"v=$serverSig".getBytes(UTF_8)))
        sout.write(authOk); sout.write(readyForQuery); sout.flush()
      } catch { case e: Throwable => failure.set(s"plus backend: $e") }
      finally raw.close()
    })
    t.start()
    val raw = new Socket("localhost", server.getLocalPort)
    try {
      val sock = PgTls.negotiate(raw, "localhost", PgTls.ModeRequire)
      val binding = sock.asInstanceOf[SSLSocket].getSession
        .getPeerCertificates.head match {
        case c: java.security.cert.X509Certificate =>
          graft.sources.ScramAuth.tlsServerEndPoint(c)
      }
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream),
        password = Some(password), channelBinding = Some(binding))
      hs.startup("rep", "postgres") // throws on any SCRAM/binding failure
      t.join(5000)
      assert(failure.get() == null, s"backend saw: ${failure.get()}")
    } finally { raw.close(); server.close() }
  }

  test("SCRAM-SHA-256-PLUS: channel binding from the TLS session is " +
    "negotiated, carried in c=, and the bound proof verifies") {
    runPlusExchange(TlsTestMaterial.serverContext,
      graft.sources.ScramAuth.tlsServerEndPoint(TlsTestMaterial.certificate))
  }

  test("SCRAM-SHA-256-PLUS against an RSASSA-PSS certificate: the binding " +
    "hash comes from the PSS parameters (SHA-384), not a SHA-256 default") {
    val cert = TlsTestMaterial.pssCertificate
    assert(cert.getSigAlgName.toUpperCase.contains("RSASSA-PSS"),
      s"fixture is not PSS-signed: ${cert.getSigAlgName}")
    // independent pin of the RFC 5929 digest choice: the PSS parameters
    // name SHA-384, so the binding must be SHA-384(DER) — the pre-fix
    // fall-through hashed with SHA-256 and failed -PLUS closed against
    // every PSS-cert server
    val binding = graft.sources.ScramAuth.tlsServerEndPoint(cert)
    assert(binding.sameElements(java.security.MessageDigest
      .getInstance("SHA-384").digest(cert.getEncoded)),
      "tls-server-end-point did not use the PSS parameter digest")
    assert(!binding.sameElements(java.security.MessageDigest
      .getInstance("SHA-256").digest(cert.getEncoded)))
    runPlusExchange(TlsTestMaterial.pssServerContext, binding)
  }

  test("without TLS the client never selects -PLUS even if offered") {
    import graft.sources.ScramAuth
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val sin = new DataInputStream(s.getInputStream)
        val sout = new DataOutputStream(s.getOutputStream)
        val slen = sin.readInt() - 4
        sin.readFully(new Array[Byte](slen))
        sout.write(msg('R', ByteBuffer.allocate(4).putInt(10).array()
          ++ ("SCRAM-SHA-256-PLUS".getBytes(UTF_8) :+ 0.toByte)
          ++ ("SCRAM-SHA-256".getBytes(UTF_8) :+ 0.toByte) :+ 0.toByte))
        sout.flush()
        val tag = sin.readByte().toChar
        val l = sin.readInt() - 4
        val p = new Array[Byte](l); sin.readFully(p)
        val b = ByteBuffer.wrap(p)
        val mech = new StringBuilder
        var c = b.get(); while (c != 0) { mech.append(c.toChar); c = b.get() }
        if (tag != 'p' || mech.toString != ScramAuth.Mechanism)
          failure.set(s"plaintext client picked ${mech.toString}")
      } catch { case e: Throwable => failure.set(s"backend: $e") }
      finally s.close()
    })
    t.start()
    val sock = new Socket(InetAddress.getLoopbackAddress, server.getLocalPort)
    try {
      val hs = new PgReplicationHandshake(
        new DataInputStream(sock.getInputStream),
        new DataOutputStream(sock.getOutputStream),
        password = Some("pw")) // no channelBinding: plaintext dial
      // the backend closes after the initial response; EOF here is fine —
      // the assertion is the mechanism choice the backend observed
      intercept[Exception](hs.startup("rep", "postgres"))
      t.join(5000)
      assert(failure.get() == null, s"backend saw: ${failure.get()}")
    } finally { sock.close(); server.close() }
  }

  test("sslmode=verify-full rejects an untrusted (self-signed) certificate " +
    "under the default trust store") {
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val failure = new java.util.concurrent.atomic.AtomicReference[String]()
    val t = tlsBackend(server, failure)
    val raw = new Socket("localhost", server.getLocalPort)
    try {
      intercept[javax.net.ssl.SSLException](
        PgTls.negotiate(raw, "localhost", PgTls.ModeVerifyFull))
      // backend sees its own handshake failure — that's the point
    } finally { raw.close(); t.join(5000); server.close() }
  }
}
