package graft

import graft.embed.{DeterministicHashEmbedder, OllamaHttpEmbedder}

class EmbedderSpec extends SparkSpec {

  test("deterministic embedder is a pure function of the text") {
    val e1 = new DeterministicHashEmbedder(16)
    val e2 = new DeterministicHashEmbedder(16)
    val v1 = e1.embed("hello world")
    val v2 = e2.embed("hello world")
    assert(v1.toSeq == v2.toSeq)
    assert(v1.length == 16)
    assert(v1.forall(x => x >= -1.0f && x < 1.0f))
    assert(e1.embed("hello worlds").toSeq != v1.toSeq)
  }

  test("empty/null text embeds to the zero vector (→ zero-norm passthrough)") {
    val e = new DeterministicHashEmbedder(8)
    assert(e.embed("").forall(_ == 0.0f))
    assert(e.embed(null).forall(_ == 0.0f))
  }

  test("Ollama JSON request codec matches the reference wire shape") {
    // reference: internal/embeddings/embeddings.go:37-51
    val json = OllamaHttpEmbedder.requestJson("nomic-embed-text", "a \"b\"\nc")
    assert(json == """{"model":"nomic-embed-text","prompt":"a \"b\"\nc"}""")
  }

  test("Ollama response decode extracts the embedding array") {
    // reference contract test shape: internal/embeddings/embeddings_test.go:12-44
    val v = OllamaHttpEmbedder.parseEmbedding("""{"embedding":[0.1, 0.2, 0.3]}""")
    assert(v.toSeq == Seq(0.1f, 0.2f, 0.3f))
    assert(OllamaHttpEmbedder.parseEmbedding("""{"embedding":[]}""").isEmpty)
    assert(OllamaHttpEmbedder.parseEmbedding("""{}""").isEmpty)
  }
}
