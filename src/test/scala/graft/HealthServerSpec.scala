package graft

import graft.stream.{Health, HealthServer}

import org.scalatest.funsuite.AnyFunSuite

/** O1 parity: the reference serves `{status, last_offset, batch_size,
  * timestamp}` from a real HTTP listener (cmd/cdc2vec/main.go:136-151);
  * [[HealthServer]] must answer a real local request with the same fields. */
class HealthServerSpec extends AnyFunSuite {

  test("/healthz answers over HTTP with the reference's payload fields") {
    val health = new Health
    val server = new HealthServer(health, "127.0.0.1:0").start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(
            s"http://127.0.0.1:${server.boundPort}/healthz"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("") ==
        "application/json")
      val tree = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(resp.body())
      // reference fields: status, last_offset, batch_size, timestamp
      assert(tree.get("status").asText() == "starting")
      assert(tree.has("last_offset") && tree.has("batch_size") &&
        tree.has("timestamp"))
      assert(tree.get("batch_size").asLong() == 0L)
    } finally server.stop()
  }

  test("bind to port 0 yields a usable ephemeral port") {
    val server = new HealthServer(new Health, ":0").start()
    try assert(server.boundPort > 0)
    finally server.stop()
  }

  test("/metrics serves Prometheus text with monotone counters") {
    val health = new Health
    val server = new HealthServer(health, "127.0.0.1:0").start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def scrape(): String = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(
            s"http://127.0.0.1:${server.boundPort}/metrics"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val first = scrape()
      assert(first.contains("graft_batches_total 0"))
      assert(first.contains("graft_input_rows_total 0"))
      assert(first.contains("graft_up 1")) // starting counts as up
      // every non-comment line is `name value` with an integer value —
      // the exposition format a scraper parses (counter advancement rides
      // the listener path the streaming suites drive)
      first.linesIterator.filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        .foreach { l =>
          val parts = l.trim.split(' ')
          assert(parts.length == 2 && parts(1).matches("-?\\d+"), s"bad line: $l")
        }
    } finally server.stop()
  }
}
