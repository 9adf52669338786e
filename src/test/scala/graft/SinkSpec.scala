package graft

import graft.cdc.Changelog
import graft.model.Mapping
import graft.pipeline.VectorPipeline
import graft.sink.{KafkaVectorSink, QdrantSink}

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("qdrant point id is the unsigned FNV-1a 64 of the external id") {
    // reference: internal/sink/qdrant/qdrant.go:174-179
    assert(QdrantSink.pointId("") == java.lang.Long.toUnsignedString(0xcbf29ce484222325L))
    assert(QdrantSink.pointId("public.documents:1") ==
      java.lang.Long.toUnsignedString(
        graft.ops.expr.Fnv1a64.hash("public.documents:1")))
  }

  test("qdrant upsert body carries multi-point batch + ext_id payload") {
    val body = QdrantSink.upsertBody(Seq(
      ("a:1", Seq(0.5f, -0.25f), Map("table" -> "a", "pk" -> "1"))))
    assert(body.startsWith("""{"points":[{"id":"""))
    assert(body.contains(""""vector":[0.5,-0.25]"""))
    assert(body.contains(""""ext_id":"a:1""""))
    assert(body.contains(""""pk":"1""""))
    assert(body.endsWith("]}"))
  }

  test("qdrant delete body hashes every id") {
    val body = QdrantSink.deleteBody(Seq("x", "y"))
    assert(body == s"""{"points":[${QdrantSink.pointId("x")},${QdrantSink.pointId("y")}]}""")
  }

  test("qdrant url normalization: scheme + default port, gRPC port rejected") {
    // reference: internal/sink/qdrant/qdrant.go:47-68
    assert(QdrantSink.normalizeBaseUrl("localhost") == "http://localhost:6333")
    assert(QdrantSink.normalizeBaseUrl("qdrant.internal:9000") ==
      "http://qdrant.internal:9000")
    assert(QdrantSink.normalizeBaseUrl("https://host") == "https://host:6333")
    assert(QdrantSink.normalizeBaseUrl("http://host:6333/base/") ==
      "http://host:6333/base")
    val e = intercept[IllegalArgumentException] {
      QdrantSink.normalizeBaseUrl("host:6334")
    }
    assert(e.getMessage.contains("6334 is gRPC"))
  }

  test("qdrant create body + vector-size extraction from collection info") {
    // reference: internal/sink/qdrant/qdrant.go:96-98,119-125,146-168
    assert(QdrantSink.createCollectionBody(768, "Cosine") ==
      """{"vectors":{"size":768,"distance":"Cosine"}}""")
    val info =
      """{"result":{"config":{"params":{"vectors":{"size":64,"distance":"Cosine"}}}}}"""
    assert(QdrantSink.extractVectorSize(info) == 64)
    assert(QdrantSink.extractVectorSize("""{"result":{}}""") == 0)
    assert(QdrantSink.extractVectorSize("not json") == 0)
  }

  test("qdrant ensureCollection: creates when missing, errors on dim conflict") {
    // mocked-server contract test, mirroring the reference's httptest
    // strategy (internal/embeddings/embeddings_test.go:12-44)
    val puts = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var existingDim = 0
    @volatile var infoStatus = 0 // 0 = behave normally, else force this GET status
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/collections/vecs", (ex: com.sun.net.httpserver.HttpExchange) => {
      if (ex.getRequestMethod != "PUT" && infoStatus != 0) {
        val body = """{"status":"error"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(infoStatus, body.length.toLong)
        val os = ex.getResponseBody; os.write(body); os.close()
      } else {
        val resp =
          if (ex.getRequestMethod == "PUT") {
            puts.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
            """{"result":true,"status":"ok"}"""
          } else if (existingDim > 0)
            s"""{"result":{"config":{"params":{"vectors":{"size":$existingDim}}}}}"""
          else null
        val body = Option(resp).getOrElse("""{"status":"not found"}""")
          .getBytes("UTF-8")
        ex.sendResponseHeaders(if (resp == null) 404 else 200, body.length.toLong)
        val os = ex.getResponseBody; os.write(body); os.close()
      }
    })
    server.start()
    try {
      val base = s"127.0.0.1:${server.getAddress.getPort}"
      // missing → PUT create with {size, distance}
      new QdrantSink(base, "vecs").ensureCollection(64)
      assert(puts.size == 1 &&
        puts.get(0) == QdrantSink.createCollectionBody(64, "Cosine"))
      // exists with the same dim → no additional create
      existingDim = 64
      new QdrantSink(base, "vecs").ensureCollection(64)
      assert(puts.size == 1)
      // exists with another dim → hard error (reference: qdrant.go:96-98)
      val e = intercept[IllegalStateException] {
        new QdrantSink(base, "vecs").ensureCollection(128)
      }
      assert(e.getMessage.contains("size=64") && e.getMessage.contains("dim=128"))
      // transient 500 on info → error, NOT treated as missing (a create
      // here would race a live collection the server failed to describe)
      infoStatus = 500
      intercept[java.io.IOException] {
        new QdrantSink(base, "vecs").ensureCollection(64)
      }
      assert(puts.size == 1) // no create was attempted
    } finally server.stop(0)
  }

  test("kafka envelope has the reference wire shape (id/vector/metadata/op/table/pk)") {
    // reference: internal/sink/kafka/kafka.go:19-26
    val points = VectorPipeline.vectorPoints(
      Changelog.changes(spark, sfDir), Mapping.documents).limit(1)
    val row = KafkaVectorSink.envelope(points, "upsert")
      .select("key", "value").as[(String, String)].head()
    assert(row._1.startsWith("public.documents:"))
    assert(row._2.contains(""""op":"upsert""""))
    assert(row._2.contains(""""table":"public.documents""""))
    assert(row._2.contains(""""vector":["""))
  }
}
