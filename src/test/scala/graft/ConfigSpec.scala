package graft

import graft.config.GraftConfig
import graft.model.Mapping
import graft.sink.MilvusSink

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  val yaml: String =
    """# engine config (same shape as the reference's YAML)
      |source:
      |  dir: /data/envelopes
      |  checkpoint_dir: /data/ckpt
      |embedding:
      |  provider: ollama_http
      |  url: http://localhost:11434
      |  model: nomic-embed-text
      |  vector_size: 768
      |  normalize: true
      |sink:
      |  type: qdrant
      |  url: http://localhost:6333
      |  collection: documents
      |pipeline:
      |  batch_size: 64
      |  flush_interval_ms: 500
      |http:
      |  addr: :9090
      |mappings:
      |  - table: public.documents
      |    id_column: id
      |    text_columns: [title, content]
      |    metadata_columns: [created_at, author]
      |  - table: public.products
      |    id_column: sku
      |    text_columns: [name]
      |""".stripMargin

  test("yaml config parses to the reference's config shape") {
    val cfg = GraftConfig.fromYaml(yaml)
    assert(cfg.sourceDir == "/data/envelopes")
    assert(cfg.embeddingProvider == "ollama_http")
    assert(cfg.vectorSize == 768 && cfg.normalize)
    assert(cfg.sinkType == "qdrant" && cfg.sinkCollection == "documents")
    assert(cfg.batchSize == 64 && cfg.flushIntervalMs == 500L)
    assert(cfg.httpAddr == ":9090")
    assert(cfg.mappings == Seq(
      Mapping("public.documents", "id", Seq("title", "content"),
        Seq("created_at", "author")),
      Mapping("public.products", "sku", Seq("name"), Nil)))
  }

  test("live postgres source block parses (slot/publication/password_env/lsn)") {
    val cfg = GraftConfig.fromYaml(
      """source:
        |  type: postgres
        |  dir: /data/wal
        |  postgres:
        |    host: db.internal
        |    port: 5433
        |    user: rep
        |    database: appdb
        |    password_env: GRAFT_PG_PASSWORD
        |    slot: graft_main
        |    publication: graft_tables
        |    start_lsn: 1A/2B3C4D5E
        |mappings:
        |  - table: public.documents
        |""".stripMargin)
    assert(cfg.sourceType == "postgres")
    assert(cfg.pgHost == "db.internal" && cfg.pgPort == 5433)
    assert(cfg.pgUser == "rep" && cfg.pgDatabase == "appdb")
    assert(cfg.pgPasswordEnv == "GRAFT_PG_PASSWORD")
    assert(cfg.pgSlot == "graft_main" && cfg.pgPublication == "graft_tables")
    assert(cfg.pgStartLsn ==
      graft.sources.PgReplicationHandshake.parseLsn("1A/2B3C4D5E"))
    // bootstrap flags mirror the reference's create_publication/create_slot
    val hardened = GraftConfig.fromYaml(
      """source:
        |  type: postgres
        |  postgres:
        |    create_publication: false
        |    create_slot: false
        |mappings:
        |  - table: t
        |""".stripMargin)
    assert(!hardened.pgCreatePublication && !hardened.pgCreateSlot)
    // absent block keeps file mode + reference-shaped defaults
    val d = GraftConfig.fromYaml("mappings:\n  - table: t\n")
    assert(d.sourceType == "files" && d.pgPort == 5432 && d.pgStartLsn == 0L)
    assert(d.pgSlot == "graft" && d.pgPublication == "graft_pub")
    assert(d.pgCreatePublication && d.pgCreateSlot)
  }

  test("segment tap resumes numbering after existing segments") {
    val dir = java.nio.file.Files.createTempDirectory("tap_resume")
    val tap1 = new graft.sources.WalSegmentTap(dir)
    tap1.write(Seq(1L -> Array[Byte](1, 2)))
    tap1.write(Seq(2L -> Array[Byte](3)))
    // a restarted process must append, not overwrite segment-00000000.bin
    val tap2 = new graft.sources.WalSegmentTap(dir)
    val p = tap2.write(Seq(3L -> Array[Byte](4)))
    assert(p.exists(_.getFileName.toString == "segment-00000002.bin"),
      s"expected resume at index 2, got $p")
  }

  test("a filesystem refusing directory fsync warns rename-only " +
    "durability exactly ONCE — tolerated, but never silent") {
    val dir = java.nio.file.Files.createTempDirectory("tap_nofsync")
    val warns = new java.util.concurrent.atomic.AtomicInteger
    val tap = new graft.sources.WalSegmentTap(dir) {
      override protected def forceDir(): Unit =
        throw new java.io.IOException("Operation not permitted")
      override protected def warnRenameOnly(msg: String): Unit = {
        assert(msg.contains("rename-only"), s"warning lost its point: $msg")
        warns.incrementAndGet()
      }
    }
    tap.write(Seq(1L -> Array[Byte](1)))
    tap.write(Seq(2L -> Array[Byte](2)))
    tap.write(Seq(3L -> Array[Byte](3)))
    assert(warns.get() == 1, s"expected exactly one warning, got ${warns.get()}")
    // the refusal is tolerated: every segment still lands
    val listing = java.nio.file.Files.list(dir)
    val n = try listing.count() finally listing.close()
    assert(n == 3)
  }

  test("shipped example configs parse to the intended topologies") {
    // the configs/ directory is the reference's configs/ equivalent: a
    // user switching from the reference starts from these files, so they
    // must always parse and carry the documented wiring
    val qdrant = GraftConfig.load("configs/postgres-qdrant.yaml")
    assert(qdrant.sourceType == "postgres" && qdrant.sinkType == "qdrant")
    assert(qdrant.pgSlot == "cdc2vec_slot" &&
      qdrant.pgPublication == "cdc2vec_pub")
    assert(qdrant.pgPasswordEnv == "GRAFT_PG_PASSWORD" &&
      qdrant.pgSslMode == "require")
    assert(qdrant.embeddingProvider == "ollama_http" &&
      qdrant.vectorSize == 1024 && qdrant.normalize)
    assert(qdrant.mappings.map(_.table) == Seq("public.documents"))
    assert(qdrant.mappings.head.textColumns == Seq("title", "content"))
    val parquet = GraftConfig.load("configs/postgres-parquet.yaml")
    assert(parquet.sourceType == "postgres" && parquet.sinkType == "parquet")
    assert(parquet.pgSslMode == "verify-full" &&
      parquet.embeddingProvider == "deterministic")
  }

  test("defaults mirror the reference when sections are absent") {
    val cfg = GraftConfig.fromYaml("mappings:\n  - table: t\n")
    assert(cfg.batchSize == 64)           // config.go:103-105
    assert(cfg.flushIntervalMs == 500L)   // config.go:106-108
    assert(cfg.vectorSize == 768)         // config.go:112-114
    assert(cfg.normalize && cfg.sinkType == "parquet")
    assert(cfg.httpAddr == ":8080")     // config.go:109-111
    assert(cfg.mappings.head.idColumn == "id")
  }

  test("milvus bodies: upsert batch + escaped delete filter are valid JSON") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val up = MilvusSink.upsertBody("c", Seq(("a:1", Seq(1.0f), Map("pk" -> "1"))))
    assert(up == """{"collectionName":"c","data":[{"id":"a:1","vector":[1.0],"payload":{"pk":"1"}}]}""")
    mapper.readTree(up) // throws on malformed JSON

    val del = MilvusSink.deleteBody("c", Seq("a:1", """x" or 1=1"""))
    val tree = mapper.readTree(del) // the quotes around ids must be escaped
    assert(tree.get("filter").asText() == """id in ["a:1","x\" or 1=1"]""")
  }

  test("milvus collection bootstrap bodies: schema, HNSW index, has/load") {
    // reference: internal/sink/milvus/milvus.go:53-120 (schema :77-82,
    // HNSW M=16/efConstruction=200 :93)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val create = MilvusSink.createCollectionBody("c", 768)
    val fields = mapper.readTree(create).get("schema").get("fields")
    assert(fields.size() == 3)
    assert(fields.get(0).get("fieldName").asText() == "id" &&
      fields.get(0).get("isPrimary").asBoolean() &&
      fields.get(0).get("elementTypeParams").get("max_length").asText() == "512")
    assert(fields.get(1).get("dataType").asText() == "FloatVector" &&
      fields.get(1).get("elementTypeParams").get("dim").asText() == "768")
    assert(fields.get(2).get("dataType").asText() == "JSON")

    val idx = mapper.readTree(MilvusSink.createIndexBody("c", "IP"))
      .get("indexParams").get(0)
    assert(idx.get("metricType").asText() == "IP")
    assert(idx.get("params").get("index_type").asText() == "HNSW")
    assert(idx.get("params").get("M").asInt() == 16)
    assert(idx.get("params").get("efConstruction").asInt() == 200)

    assert(MilvusSink.collectionBody("c") == """{"collectionName":"c"}""")
    assert(MilvusSink.parseHas("""{"code":0,"data":{"has":true}}"""))
    assert(!MilvusSink.parseHas("""{"code":0,"data":{"has":false}}"""))
    assert(!MilvusSink.parseHas("garbage"))
  }

  test("milvus ensureCollection: create+index+load when missing, " +
    "describe+load when present, dim conflict is a hard error") {
    val calls = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var exists = false
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v2/vectordb", (ex: com.sun.net.httpserver.HttpExchange) => {
      val path = ex.getRequestURI.getPath.stripPrefix("/v2/vectordb")
      calls.add(path)
      val body = (path match {
        case "/collections/has" => s"""{"code":0,"data":{"has":$exists}}"""
        case "/collections/describe" =>
          """{"code":0,"data":{"fields":[
            |{"name":"id","params":[]},
            |{"name":"vector","params":[{"key":"dim","value":"64"}]}]}}""".stripMargin
        case _ => """{"code":0,"data":{}}"""
      }).getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody; os.write(body); os.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      new MilvusSink(base, "c").ensureCollection(64)
      assert(calls.toArray.toSeq == Seq("/collections/has",
        "/collections/create", "/indexes/create", "/collections/load"))
      calls.clear(); exists = true
      new MilvusSink(base, "c").ensureCollection(64)
      assert(calls.toArray.toSeq == Seq("/collections/has",
        "/collections/describe", "/collections/load"))
      // existing dim=64, payload dim=128 → drop-or-recreate error, no load
      val e = intercept[IllegalStateException] {
        new MilvusSink(base, "c").ensureCollection(128)
      }
      assert(e.getMessage.contains("dim=64") && e.getMessage.contains("dim=128"))
    } finally server.stop(0)
  }

  test("yaml parser: document markers, comments in URLs, colon-less lines") {
    val cfg = GraftConfig.fromYaml(
      "---\nsink:\n  url: http://h:6333/#frag # trailing comment\nmappings:\n  - table: t\n")
    assert(cfg.sinkUrl == "http://h:6333/#frag")
    assert(cfg.mappings.map(_.table) == Seq("t"))
    intercept[IllegalArgumentException] {
      GraftConfig.fromYaml("sink:\n  just a stray line\n")
    }
  }
}
