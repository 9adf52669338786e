package graft

import graft.ops.Skew
import graft.queries.Q
import graft.sink.ParquetVectorStore

import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fnv1a64 is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv1a64('foobar') AS h").as[Long].head()
    assert(got == 0x85944171f73967e8L)
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Q.events(spark, sfDir).select("event_type", "value")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n")).orderBy("event_type")
      .as[(String, Long)].collect().toSeq
    val salted = Skew.saltedCount(ev, Seq("event_type"), saltFactor = 8)
      .orderBy("event_type").as[(String, Long)].collect().toSeq
    assert(salted == direct)

    val directSum = ev.groupBy("event_type")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
        .cast("double").as("total"))
      .orderBy("event_type").as[(String, Double)].collect().toSeq
    val saltedSum = Skew.saltedSum(ev, "value", Seq("event_type"), 8)
      .orderBy("event_type").as[(String, Double)].collect().toSeq
    assert(saltedSum == directSum) // decimal partials → exact, order-free
  }

  test("vector-store compaction preserves current state, shrinks the log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val store = new ParquetVectorStore(dir)
    def points(ids: Seq[String]) = ids.toDF("id")
      .withColumn("vector", array(lit(1.0f)))
      .withColumn("metadata", map(lit("pk"), col("id")))
    store.write(points(Seq("a", "b", "c")), Seq.empty[String].toDF("id"), 0L)
    store.write(points(Seq("b")), Seq("c").toDF("id"), 1L) // update b, delete c
    val before = store.current(spark).select("id").as[String].collect().sorted
    assert(before.toSeq == Seq("a", "b"))
    val logRows = spark.read.parquet(dir).count()
    assert(logRows == 5) // 3 upserts + 1 upsert + 1 delete
    store.compact(spark, batchId = 2L)
    val after = store.current(spark).select("id").as[String].collect().sorted
    assert(after.toSeq == Seq("a", "b"))
    assert(spark.read.parquet(dir).count() == 2) // current state only
  }
}
