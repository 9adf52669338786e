package graft

import graft.config.GraftConfig
import graft.embed.{DeterministicHashEmbedder, Embedder, OllamaHttpEmbedder}
import graft.model.Mapping
import graft.pipeline.VectorPipeline
import graft.sink.{MilvusSink, ParquetVectorStore, QdrantSink}
import graft.stream.{CdcStream, Health, HealthServer, Supervisor}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Process entry point — the engine-shaped equivalent of the reference's
  * `main()` wiring (reference: cmd/cdc2vec/main.go:33-134): load config,
  * build embedder and sink, start the streaming pipeline, expose health,
  * shut down cleanly on SIGTERM. Usage:
  *   runMain graft.Main <config.yaml> [storeDir]
  */
object Main {

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load(args(0))
    val storeDir = if (args.length > 1) args(1) else "/tmp/graft-store"
    require(cfg.mappings.nonEmpty, "config carries no table mappings")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cdc2vec")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embedder = mkEmbedder(cfg)
    val health = new Health().register(spark)
    // O1: real /healthz listener (reference: main.go:136-151)
    val healthServer = new HealthServer(health, cfg.httpAddr).start()

    sys.addShutdownHook { // O3 graceful shutdown (main.go:153-199)
      healthServer.stop()
      // Spark's own shutdown hook may already have stopped the context
      if (!spark.sparkContext.isStopped)
        try spark.streams.active.foreach(_.stop())
        catch { case _: IllegalStateException => }
    }

    Supervisor.runWithRestarts(backoffMs = 5000L) { () =>
      CdcStream.readEnvelopes(spark, cfg.sourceDir, cfg.batchSize)
        .writeStream
        .option("checkpointLocation",
          if (cfg.checkpointDir.nonEmpty) cfg.checkpointDir
          else s"$storeDir/_checkpoint")
        .trigger(Trigger.ProcessingTime(cfg.flushIntervalMs))
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // one materialization of the micro-batch feeds every mapping and
          // sink (without this, each sink re-runs the whole chain up to and
          // including the per-row embedding calls)
          batch.persist()
          try {
            cfg.mappings.foreach { mapping => // ALL configured tables
              val upserts = VectorPipeline.vectorPoints(
                batch, mapping, embedder, cfg.normalize).persist()
              val deletes = VectorPipeline.deletions(batch, mapping)
              try writeBatch(cfg, storeDir, upserts, deletes, batchId)
              finally upserts.unpersist()
            }
          } finally batch.unpersist()
          System.err.println(s"[graft] batch $batchId → ${health.statusJson}")
        }
        .start()
    }
  }

  private def mkEmbedder(cfg: GraftConfig): Embedder = cfg.embeddingProvider match {
    // accepts the reference's provider names (embeddings.go:85-104)
    case "ollama_http" | "gorag_ollama" =>
      new OllamaHttpEmbedder(cfg.embeddingUrl, cfg.embeddingModel, cfg.vectorSize)
    case _ => new DeterministicHashEmbedder(cfg.vectorSize)
  }

  /** Route one micro-batch to the configured sink (reference sink switch:
    * main.go:66-92). The parquet store always records the op log too, so a
    * network sink can be replayed/backfilled from the lake. */
  private def writeBatch(cfg: GraftConfig, storeDir: String,
                         upserts: DataFrame, deletes: DataFrame,
                         batchId: Long): Unit = {
    new ParquetVectorStore(s"$storeDir/oplog").write(upserts, deletes, batchId)
    cfg.sinkType match {
      case "qdrant" =>
        val s = new QdrantSink(cfg.sinkUrl, cfg.sinkCollection)
        s.upsert(upserts); s.delete(deletes)
      case "milvus" =>
        val s = new MilvusSink(cfg.sinkUrl, cfg.sinkCollection)
        s.upsert(upserts); s.delete(deletes)
      case _ => () // parquet-only
    }
  }
}
