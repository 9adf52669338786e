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
    assert(cfg.mappings == Seq(
      Mapping("public.documents", "id", Seq("title", "content"),
        Seq("created_at", "author")),
      Mapping("public.products", "sku", Seq("name"), Nil)))
  }

  test("defaults mirror the reference when sections are absent") {
    val cfg = GraftConfig.fromYaml("mappings:\n  - table: t\n")
    assert(cfg.batchSize == 64)           // config.go:103-105
    assert(cfg.flushIntervalMs == 500L)   // config.go:106-108
    assert(cfg.vectorSize == 768)         // config.go:112-114
    assert(cfg.normalize && cfg.sinkType == "parquet")
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
