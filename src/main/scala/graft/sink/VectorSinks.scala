package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed vector store: the engine's always-available sink (the
  * reference's Qdrant/Milvus/Kafka sinks are network services; this is the
  * lake-native equivalent). Writes are an append-only op log partitioned by
  * micro-batch; the current state is a latest-by-id view — the same
  * idempotent-upsert contract the reference relies on (at-least-once
  * delivery + upsert = exactly-once effect,
  * reference: internal/pipeline/pipeline.go:173-179).
  */
final class ParquetVectorStore(path: String) extends Serializable {

  /** Append one micro-batch of upserts and deletes. Re-delivery of the same
    * batchId is harmless: rows are identical and [[current]] dedupes. */
  def write(upserts: DataFrame, deletes: DataFrame, batchId: Long): Unit = {
    val spark = upserts.sparkSession
    import spark.implicits._
    val up = upserts.select(col("id"), col("vector"), col("metadata"),
      lit("upsert").as("op"), lit(batchId).as("batch_id"))
    val del = deletes.select(col("id"),
      lit(null).cast("array<float>").as("vector"),
      lit(null).cast("map<string,string>").as("metadata"),
      lit("delete").as("op"), lit(batchId).as("batch_id"))
    up.unionByName(del).write.mode("append").parquet(path)
  }

  /** Latest state per external id (deletes drop the id). */
  def current(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("batch_id").desc, col("op")) // same-batch dup rows identical
    spark.read.parquet(path)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select("id", "vector", "metadata")
  }

  /** Rewrite the op log down to current state. The log grows with every
    * micro-batch; at scale a periodic compaction (cheap latest-by-id shuffle
    * over the log, tiny result) keeps [[current]] reads O(state), not
    * O(history). `batchId` must exceed all live batch ids. */
  def compact(spark: SparkSession, batchId: Long): Unit = {
    val tmp = path + ".compact"
    current(spark)
      .select(col("id"), col("vector"), col("metadata"),
        lit("upsert").as("op"), lit(batchId).as("batch_id"))
      .write.mode("overwrite").parquet(tmp)
    val dst = new org.apache.hadoop.fs.Path(path)
    // resolve the filesystem FROM the store path (fs.defaultFS would break
    // s3a://-style stores)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}

/** Qdrant HTTP sink (reference: internal/sink/qdrant/qdrant.go). Point ids
  * are the FNV-1a 64 hash of the external id (reference: qdrant.go:174-179,
  * rendered unsigned as Qdrant expects u64); payload carries the metadata
  * plus `ext_id`. Deviation from the reference (SURVEY.md §7.6): requests
  * carry true multi-point batches, one HTTP client per partition — the
  * reference PUTs one point at a time (qdrant.go:196-203).
  *
  * Network sinks are exercised through their pure codec in tests
  * (zero-egress environment), mirroring the reference's own mocked-server
  * strategy.
  */
final class QdrantSink(baseUrl: String, collection: String,
                       requestBatchSize: Int = 128) extends Serializable {

  /** Distributed write: per-partition client, batched PUTs. */
  def upsert(points: DataFrame): Unit = {
    val url = s"$baseUrl/collections/$collection/points"
    val bs = requestBatchSize
    points.select("id", "vector", "metadata").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val client = java.net.http.HttpClient.newHttpClient()
        rows.grouped(bs).foreach { group =>
          val body = QdrantSink.upsertBody(group.map { r =>
            (r.getString(0), r.getSeq[Float](1),
              r.getMap[String, String](2).toMap)
          })
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(url))
            .header("Content-Type", "application/json")
            .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() != 200 && resp.statusCode() != 202)
            throw new java.io.IOException(
              s"qdrant upsert failed: HTTP ${resp.statusCode()}")
        }
    }
  }

  def delete(ids: DataFrame): Unit = {
    val url = s"$baseUrl/collections/$collection/points/delete"
    ids.select("id").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val client = java.net.http.HttpClient.newHttpClient()
        rows.grouped(512).foreach { group =>
          val body = QdrantSink.deleteBody(group.map(_.getString(0)))
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(url))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() != 200 && resp.statusCode() != 202)
            throw new java.io.IOException(
              s"qdrant delete failed: HTTP ${resp.statusCode()}")
        }
    }
  }
}

object QdrantSink {
  /** Unsigned FNV-1a 64 point id (reference: qdrant.go:174-179). */
  def pointId(extId: String): String =
    java.lang.Long.toUnsignedString(graft.ops.expr.Fnv1a64.hash(extId))

  private def esc(s: String): String = graft.util.Json.escape(s)

  /** `{"points":[{"id":…,"vector":[…],"payload":{…,"ext_id":…}}]}` */
  def upsertBody(points: Seq[(String, Seq[Float], Map[String, String])]): String =
    points.map { case (id, vec, meta) =>
      val payload = (meta + ("ext_id" -> id)).toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
      s"""{"id":${pointId(id)},"vector":[${vec.mkString(",")}],"payload":{$payload}}"""
    }.mkString("""{"points":[""", ",", "]}")

  /** `{"points":[id,…]}` (reference: qdrant.go:257-275). */
  def deleteBody(ids: Seq[String]): String =
    ids.map(pointId).mkString("""{"points":[""", ",", "]}")
}

/** Kafka vector sink (reference: internal/sink/kafka/kafka.go:19-26): JSON
  * envelope `{id, vector, metadata, op, table, pk}`, message key = id. The
  * envelope builder is pure DataFrame code; `write` needs the Kafka
  * connector on the classpath and a reachable broker. */
object KafkaVectorSink {

  /** Build the `(key, value)` frame the Kafka writer sends. */
  def envelope(points: DataFrame, op: String): DataFrame =
    points.select(
      col("id").cast("string").as("key"),
      to_json(struct(
        col("id"), col("vector"), col("metadata"),
        lit(op).as("op"),
        element_at(col("metadata"), "table").as("table"),
        element_at(col("metadata"), "pk").as("pk"))).as("value"))

  /** Streaming write (requires spark-sql-kafka on the classpath). */
  def write(envelopes: DataFrame, brokers: String, topic: String,
            checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    envelopes.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
}
