package graft.sink

import org.apache.spark.sql.DataFrame

/** Milvus sink over its RESTful v2 API (reference: internal/sink/milvus/
  * milvus.go — which uses gRPC; the HTTP surface carries the same schema:
  * `id VARCHAR primary key, vector FLOAT_VECTOR, payload JSON`,
  * milvus.go:77-82). Two deliberate deviations recorded in SURVEY.md §7.6:
  * true `upsert` instead of the reference's duplicate-row `Insert`
  * (milvus.go:150), and no string-interpolated delete expressions — ids are
  * sent as a JSON array, not spliced into a filter string (milvus.go:166 is
  * injection-prone).
  */
final class MilvusSink(baseUrl: String, collection: String,
                       requestBatchSize: Int = 128) extends Serializable {

  private def post(path: String, body: String): Unit = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$baseUrl$path"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"milvus $path failed: HTTP ${resp.statusCode()}")
  }

  /** Distributed upsert: per-partition client, batched requests. */
  def upsert(points: DataFrame): Unit = {
    val (url, coll, bs) = (baseUrl, collection, requestBatchSize)
    points.select("id", "vector", "metadata").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val sink = new MilvusSink(url, coll, bs)
        rows.grouped(bs).foreach { group =>
          sink.post("/v2/vectordb/entities/upsert",
            MilvusSink.upsertBody(coll, group.map { r =>
              (r.getString(0), r.getSeq[Float](1), r.getMap[String, String](2).toMap)
            }))
        }
    }
  }

  def delete(ids: DataFrame): Unit = {
    val (url, coll, bs) = (baseUrl, collection, requestBatchSize)
    ids.select("id").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val sink = new MilvusSink(url, coll, bs)
        rows.grouped(512).foreach { group =>
          sink.post("/v2/vectordb/entities/delete",
            MilvusSink.deleteBody(coll, group.map(_.getString(0))))
        }
    }
  }
}

object MilvusSink {
  private def esc(s: String): String = graft.util.Json.escape(s)

  /** `{"collectionName":…,"data":[{"id":…,"vector":[…],"payload":{…}}]}` */
  def upsertBody(collection: String,
                 points: Seq[(String, Seq[Float], Map[String, String])]): String = {
    val data = points.map { case (id, vec, meta) =>
      val payload = meta.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
      s"""{"id":"${esc(id)}","vector":[${vec.mkString(",")}],"payload":{$payload}}"""
    }.mkString(",")
    s"""{"collectionName":"${esc(collection)}","data":[$data]}"""
  }

  /** Delete filter built in two escape layers: ids are escaped for the
    * Milvus filter expression (the reference splices raw ids,
    * milvus.go:166), then the whole expression is JSON-escaped so the
    * quotes around each id survive as part of the JSON string value. */
  def deleteBody(collection: String, ids: Seq[String]): String = {
    val filterExpr = ids
      .map(id => "\"" + id.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("id in [", ",", "]")
    s"""{"collectionName":"${esc(collection)}","filter":"${esc(filterExpr)}"}"""
  }
}
