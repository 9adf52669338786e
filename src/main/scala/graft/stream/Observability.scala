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

  // cumulative counters for the /metrics surface (monotone; Prometheus
  // counter semantics — rates derive from deltas, never reset mid-run)
  private val batchesTotal = new java.util.concurrent.atomic.AtomicLong(0L)
  private val rowsTotal = new java.util.concurrent.atomic.AtomicLong(0L)

  def status: Status = last.get()

  /** Prometheus text exposition of the pipeline counters: batches and
    * input rows since start, the last batch's size, and an up gauge. */
  def metricsText: String = {
    val s = status
    val up = if (s.status == "running" || s.status == "starting") 1 else 0
    s"""# TYPE graft_batches_total counter
       |graft_batches_total ${batchesTotal.get()}
       |# TYPE graft_input_rows_total counter
       |graft_input_rows_total ${rowsTotal.get()}
       |# TYPE graft_last_batch_rows gauge
       |graft_last_batch_rows ${s.batchRows}
       |# TYPE graft_up gauge
       |graft_up $up
       |""".stripMargin
  }

  /** The reference serves this as JSON; kept dependency-free. */
  def statusJson: String = {
    val s = status
    s"""{"status":"${s.status}","last_offset":${escape(s.lastOffset)},""" +
      s""""batch_size":${s.batchRows},"timestamp":"${s.timestamp}"}"""
  }

  // the one escape implementation every codec uses (graft.util.Json) —
  // a local re-implementation missed control chars below 0x20, which
  // would make statusJson invalid JSON for exotic offsets
  private def escape(s: String): String = "\"" + graft.util.Json.escape(s) + "\""

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    last.set(Status("running", "", 0L, e.timestamp))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val offset = Option(p.sources).filter(_.nonEmpty)
      .flatMap(s => Option(s.head.endOffset)).getOrElse("")
    batchesTotal.incrementAndGet()
    rowsTotal.addAndGet(p.numInputRows)
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
    // Prometheus text exposition on the same listener — what a scrape
    // target expects next to /healthz (beyond the reference's surface,
    // recorded as a deliberate addition)
    s.createContext("/metrics", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = health.metricsText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
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
