package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import java.util.concurrent.atomic.AtomicReference

/** Health/status observation (reference O1: the `/healthz` endpoint returns
  * `{status, last_offset, batch_size, timestamp}` from pipeline state under
  * a mutex — cmd/cdc2vec/main.go:136-151, internal/pipeline/pipeline.go:280-289).
  * Spark's native equivalent is a [[StreamingQueryListener]] over
  * `lastProgress`; this adapter exposes the same fields.
  */
final class Health extends StreamingQueryListener {

  final case class Status(
      status: String,
      lastOffset: String,
      batchRows: Long,
      timestamp: String)

  private val last = new AtomicReference(
    Status("starting", "", 0L, java.time.Instant.now.toString))

  def status: Status = last.get()

  /** The reference serves this as JSON; kept dependency-free. */
  def statusJson: String = {
    val s = status
    s"""{"status":"${s.status}","last_offset":${escape(s.lastOffset)},""" +
      s""""batch_size":${s.batchRows},"timestamp":"${s.timestamp}"}"""
  }

  private def escape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    last.set(Status("running", "", 0L, e.timestamp))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val offset = Option(p.sources).filter(_.nonEmpty)
      .flatMap(s => Option(s.head.endOffset)).getOrElse("")
    last.set(Status("running", offset, p.numInputRows, p.timestamp))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    last.set(last.get().copy(
      status = if (e.exception.isDefined) "failed" else "stopped",
      timestamp = java.time.Instant.now.toString))

  def register(spark: SparkSession): Health = {
    spark.streams.addListener(this); this
  }
}

/** Serves `/healthz` over the JDK's built-in HTTP server (dependency-free),
  * returning [[Health.statusJson]] — the reference exposes the same payload
  * from a real HTTP listener (cmd/cdc2vec/main.go:136-151, default addr
  * `:8080` — internal/config/config.go:102-114). Bind port 0 for an
  * ephemeral port (tests). */
final class HealthServer(health: Health, addr: String = ":8080") {

  private val server = {
    val (host, port) = addr.lastIndexOf(':') match {
      case i if i >= 0 =>
        val h = addr.substring(0, i)
        (if (h.isEmpty) "0.0.0.0" else h, addr.substring(i + 1).toInt)
      case _ => ("0.0.0.0", addr.toInt)
    }
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(host, port), 0)
    s.createContext("/healthz", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = health.statusJson.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    })
    s
  }

  /** The bound port (useful with addr ":0"). */
  def boundPort: Int = server.getAddress.getPort

  def start(): HealthServer = { server.start(); this }

  def stop(): Unit = server.stop(0)
}

/** Restart supervision (reference O2: CDC failures retried forever with a
  * fixed 5s sleep — internal/cdc/postgres/postgres.go:67-82). Spark's
  * checkpoint makes restarts resume exactly where the failed attempt left
  * off, so the retry wrapper is safe against duplicates by construction. */
object Supervisor {

  /** Run `start` and restart it on failure with fixed backoff until it
    * terminates cleanly or `maxRestarts` is exhausted. `start()` runs inside
    * the retry scope: the reference's loop also re-enters through connection
    * setup (postgres.go:67-82), and (re)starting a query — source connect,
    * checkpoint recovery — is exactly where transient failures surface. */
  def runWithRestarts(maxRestarts: Int = Int.MaxValue, backoffMs: Long = 5000L)
                     (start: () => StreamingQuery): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      try {
        start().awaitTermination()
        done = true
      } catch {
        case e: Exception =>
          attempts += 1
          if (attempts > maxRestarts) throw e
          Thread.sleep(backoffMs)
      }
    }
  }
}
