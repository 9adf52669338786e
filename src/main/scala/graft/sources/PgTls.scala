package graft.sources

import java.net.Socket
import javax.net.ssl.{SNIHostName, SSLContext, SSLParameters, SSLSocket,
  TrustManager, X509TrustManager}

/** TLS upgrade for the replication connection — the PostgreSQL SSLRequest
  * preamble (protocol 1234.5679) followed by a JDK TLS layering over the
  * same TCP socket. This runs BEFORE the StartupMessage: the client sends
  * the 8-byte SSLRequest, the server answers a single byte — 'S' (proceed
  * with a TLS handshake on the same connection) or 'N' (TLS not
  * supported) — and everything after, including SCRAM, flows through the
  * encrypted streams. The reference inherits this negotiation from its
  * driver's DSN `sslmode` handling
  * (/root/reference/internal/cdc/postgres/postgres.go:97-113).
  *
  * Modes mirror libpq semantics for the subset a replication client
  * needs:
  *  - `disable`     — plaintext; no SSLRequest is sent.
  *  - `require`     — demand encryption but do NOT authenticate the peer
  *                    (libpq `require` trusts any certificate); an 'N'
  *                    answer is a hard error.
  *  - `verify-full` — encryption + certificate chain validation against
  *                    the default (or injected) trust material + hostname
  *                    verification (HTTPS-style endpoint identification).
  *
  * A spec-injectable [[SSLContext]] keeps the handshake testable against
  * an in-process mock walsender with a self-signed certificate
  * (`HandshakeSpec`): with a context supplied, `require` still skips
  * hostname checks while `verify-full` enforces them.
  */
object PgTls {

  val ModeDisable = "disable"
  val ModeRequire = "require"
  val ModeVerifyFull = "verify-full"

  /** The SSLRequest "version": 1234 << 16 | 5679 (protocol.h). */
  private val SslRequestCode = 80877103

  /** Negotiate per `mode` and return the socket to speak the startup
    * protocol on — the raw socket (disable) or a TLS layer over it. */
  def negotiate(sock: Socket, host: String, mode: String,
                context: Option[SSLContext] = None): Socket = mode match {
    case ModeDisable => sock
    case ModeRequire | ModeVerifyFull =>
      val out = sock.getOutputStream
      out.write(java.nio.ByteBuffer.allocate(8)
        .putInt(8).putInt(SslRequestCode).array())
      out.flush()
      sock.getInputStream.read() match {
        case 'S' => wrap(sock, host, mode, context)
        case 'N' => throw new IllegalStateException(
          s"sslmode=$mode but the server refused TLS (answered 'N') — " +
            "enable ssl on the server or set sslmode=disable")
        case -1 => throw new java.io.EOFException(
          "connection closed during SSLRequest")
        case other => throw new IllegalStateException(
          f"unexpected SSLRequest answer 0x$other%02x — a pre-9.x server " +
            "or a non-PostgreSQL endpoint")
      }
    case other => throw new IllegalArgumentException(
      s"unknown sslmode '$other' (disable, require, verify-full)")
  }

  private def wrap(sock: Socket, host: String, mode: String,
                   context: Option[SSLContext]): Socket = {
    val ctx = context.getOrElse {
      if (mode == ModeVerifyFull) SSLContext.getDefault
      else trustAllContext() // libpq `require`: encrypt, don't authenticate
    }
    val ssl = ctx.getSocketFactory
      .createSocket(sock, host, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    val params = new SSLParameters()
    // SNI carries DNS names only (RFC 6066 forbids IP literals)
    if (host.exists(c => c.isLetter) && !host.contains(":"))
      params.setServerNames(java.util.List.of(new SNIHostName(host)))
    if (mode == ModeVerifyFull)
      params.setEndpointIdentificationAlgorithm("HTTPS") // hostname check
    ssl.setSSLParameters(params)
    ssl.startHandshake()
    ssl
  }

  /** Encryption-without-authentication trust manager — ONLY for
    * sslmode=require, whose libpq contract is exactly that. */
  private def trustAllContext(): SSLContext = {
    val tm: TrustManager = new X509TrustManager {
      override def checkClientTrusted(
        chain: Array[java.security.cert.X509Certificate], t: String): Unit = ()
      override def checkServerTrusted(
        chain: Array[java.security.cert.X509Certificate], t: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
        Array.empty
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array(tm), new java.security.SecureRandom())
    ctx
  }
}
