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
