package graft.config

import graft.model.Mapping

import scala.collection.mutable

/** Engine configuration, same information content as the reference's YAML
  * (reference: internal/config/config.go:61-117): source, embedding
  * provider, sink selection, pipeline batching, per-table mappings.
  * Defaults mirror the reference's (batch 64, flush 500 ms, dim 768 —
  * config.go:102-114). */
final case class GraftConfig(
    sourceDir: String = "",
    checkpointDir: String = "",
    sourceType: String = "files",                // files | postgres
    pgHost: String = "localhost",
    pgPort: Int = 5432,
    pgUser: String = "postgres",
    pgDatabase: String = "postgres",
    pgPasswordEnv: String = "",                  // env var holding the password
    pgSslMode: String = "disable",               // disable | require | verify-full
    pgSlot: String = "graft",
    pgPublication: String = "graft_pub",
    pgStartLsn: Long = 0L,
    pgCreatePublication: Boolean = true,         // reference: config.go:21
    pgCreateSlot: Boolean = true,                // reference: config.go:22
    embeddingProvider: String = "deterministic", // or "ollama_http"
    embeddingUrl: String = "",
    embeddingModel: String = "",
    vectorSize: Int = 768,
    normalize: Boolean = true,
    sinkType: String = "parquet",                // parquet | qdrant | milvus | kafka
    sinkUrl: String = "",
    sinkCollection: String = "vectors",
    sinkTransport: String = "rest",              // milvus only: rest | grpc
    batchSize: Int = 64,
    flushIntervalMs: Long = 500L,
    httpAddr: String = ":8080",
    mappings: Seq[Mapping] = Nil)

object GraftConfig {

  /** Load from the YAML subset the reference's config files use: two-space
    * nested maps, scalars, inline `[a, b]` lists, and `-`-item lists of
    * maps. Hand-rolled because the build is dependency-free by design. */
  def load(path: String): GraftConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def fromYaml(text: String): GraftConfig = {
    val root = Yaml.parse(text)
    def section(name: String): Map[String, Any] =
      root.get(name).collect { case m: Map[String @unchecked, Any @unchecked] => m }
        .getOrElse(Map.empty)
    def str(m: Map[String, Any], k: String, d: String = ""): String =
      m.get(k).map(_.toString).getOrElse(d)
    def num(m: Map[String, Any], k: String, d: Long): Long =
      m.get(k).map(_.toString.trim.toLong).getOrElse(d)
    def bool(m: Map[String, Any], k: String, d: Boolean): Boolean =
      m.get(k).map(_.toString.trim.toBoolean).getOrElse(d)

    val source = section("source")
    val emb = section("embedding")
    val sink = section("sink")
    val pipe = section("pipeline")
    val mappings = root.get("mappings").collect {
      case items: Seq[Any @unchecked] => items.collect {
        case m: Map[String @unchecked, Any @unchecked] =>
          Mapping(
            table = str(m, "table"),
            idColumn = str(m, "id_column", "id"),
            textColumns = Yaml.stringList(m.getOrElse("text_columns", Nil)),
            metadataColumns = Yaml.stringList(m.getOrElse("metadata_columns", Nil)))
      }
    }.getOrElse(Nil)

    val pg = source.get("postgres")
      .collect { case m: Map[String @unchecked, Any @unchecked] => m }
      .getOrElse(Map.empty[String, Any])
    GraftConfig(
      sourceDir = str(source, "dir"),
      checkpointDir = str(source, "checkpoint_dir"),
      sourceType = str(source, "type", "files"),
      pgHost = str(pg, "host", "localhost"),
      pgPort = num(pg, "port", 5432L).toInt,
      pgUser = str(pg, "user", "postgres"),
      pgDatabase = str(pg, "database", "postgres"),
      // password via env indirection — credentials never live in YAML
      // (the reference embeds them in its DSN string, config.go:17)
      pgPasswordEnv = str(pg, "password_env"),
      pgSslMode = str(pg, "ssl_mode", "disable"),
      pgSlot = str(pg, "slot", "graft"),
      pgPublication = str(pg, "publication", "graft_pub"),
      pgStartLsn = {
        val s = str(pg, "start_lsn")
        if (s.isEmpty) 0L else graft.sources.PgReplicationHandshake.parseLsn(s)
      },
      pgCreatePublication = bool(pg, "create_publication", d = true),
      pgCreateSlot = bool(pg, "create_slot", d = true),
      embeddingProvider = str(emb, "provider", "deterministic"),
      embeddingUrl = str(emb, "url"),
      embeddingModel = str(emb, "model"),
      vectorSize = num(emb, "vector_size", 768L).toInt,
      normalize = bool(emb, "normalize", d = true),
      sinkType = str(sink, "type", "parquet"),
      sinkUrl = str(sink, "url"),
      sinkCollection = str(sink, "collection", "vectors"),
      sinkTransport = str(sink, "transport", "rest"),
      batchSize = num(pipe, "batch_size", 64L).toInt,
      flushIntervalMs = num(pipe, "flush_interval_ms", 500L),
      httpAddr = str(section("http"), "addr", ":8080"),
      mappings = mappings)
  }
}

/** Minimal YAML-subset parser (maps by 2-space indent, scalars, inline
  * lists, `-` lists of maps). Not a general YAML implementation. */
object Yaml {

  def stringList(v: Any): Seq[String] = v match {
    case s: Seq[Any @unchecked] => s.map(_.toString)
    case other => Seq(other.toString)
  }

  def parse(text: String): Map[String, Any] = {
    val lines = text.linesIterator
      // a comment '#' only counts at line start or after whitespace, so
      // values like "http://host/#frag" survive
      .map(_.replaceAll("(^|\\s)#.*$", "").stripTrailing())
      .filter(l => l.trim.nonEmpty && l.trim != "---" && l.trim != "...")
      .toVector
    parseBlock(lines, 0)._1
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  private def scalar(raw: String): Any = {
    val t = raw.trim.stripPrefix("\"").stripSuffix("\"")
    if (raw.trim.startsWith("[") && raw.trim.endsWith("]"))
      raw.trim.drop(1).dropRight(1).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).filter(_.nonEmpty).toSeq
    else t
  }

  /** Parse lines at one indent level; returns (map, linesConsumed). */
  private def parseBlock(lines: Vector[String], from: Int): (Map[String, Any], Int) = {
    if (from >= lines.length) return (Map.empty, from)
    val indent = indentOf(lines(from))
    val out = mutable.LinkedHashMap[String, Any]()
    var i = from
    while (i < lines.length && indentOf(lines(i)) == indent &&
      !lines(i).trim.startsWith("-")) {
      val line = lines(i).trim
      val colon = line.indexOf(':')
      if (colon < 0)
        throw new IllegalArgumentException(s"unparseable config line: '$line'")
      val key = line.substring(0, colon).trim
      val rest = line.substring(colon + 1).trim
      if (rest.nonEmpty) { out(key) = scalar(rest); i += 1 }
      else {
        // nested block: map, or a '-' list of maps
        if (i + 1 < lines.length && indentOf(lines(i + 1)) > indent) {
          if (lines(i + 1).trim.startsWith("-")) {
            val (items, next) = parseList(lines, i + 1, indentOf(lines(i + 1)))
            out(key) = items; i = next
          } else {
            val (m, next) = parseBlock(lines, i + 1)
            out(key) = m; i = next
          }
        } else { out(key) = ""; i += 1 }
      }
    }
    (out.toMap, i)
  }

  private def parseList(lines: Vector[String], from: Int,
                        indent: Int): (Seq[Any], Int) = {
    val items = mutable.ArrayBuffer[Any]()
    var i = from
    while (i < lines.length && indentOf(lines(i)) == indent &&
      lines(i).trim.startsWith("-")) {
      // rewrite "- k: v" as "k: v" at a deeper indent and parse the item map
      val first = lines(i).trim.stripPrefix("-").trim
      val itemIndent = indent + 2
      var itemLines = Vector(" " * itemIndent + first)
      var j = i + 1
      while (j < lines.length && indentOf(lines(j)) >= itemIndent &&
        !lines(j).trim.startsWith("-")) {
        itemLines :+= lines(j); j += 1
      }
      items += parseBlock(itemLines, 0)._1
      i = j
    }
    (items.toSeq, i)
  }
}
