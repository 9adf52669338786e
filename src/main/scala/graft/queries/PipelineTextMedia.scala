package graft.queries

import graft.multimodal.Multimodal
import graft.ops.{DedupOps, Lsh, TextAnalysis, TextOps, VectorOps}
import graft.queries.Q._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Text-analysis + multimodal + near-dup-graph family (split out of
  * PipelineQueries in round 12 — a pure move, no semantics changed):
  * language ID, quality scoring, token counts, fingerprints, the Unicode
  * fold gate, multimodal decode/resize/frame-sample, frame/chunk dedup,
  * chunking, PII, train split, decontamination, tf-idf terms, and the
  * near-dup graph reports (components, degrees, PageRank, triangles,
  * dataset card). Shared artifacts live in [[PipelineQueries]].
  */
object PipelineTextMedia {
  import PipelineQueries._

  val all: Seq[Q] = Seq(
    // ---- text analysis ---------------------------------------------------

    Q("q_text_analysis",
      """SELECT term, CAST(n AS BIGINT) AS n FROM (
        |  SELECT t AS term, count(*) AS n
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
        |  WHERE length(t) > 0
        |    AND t NOT IN ('the','a','an','and','or','of','to','in','is','it')
        |  GROUP BY t)
        |ORDER BY n DESC, term LIMIT 50""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "documents")
        .select(explode(DedupOps.tokens(col("text"))).as("term"))
        .filter(!col("term").isin(TextAnalysis.stopwords: _*))
        .groupBy("term")
        .agg(big(count(lit(1))).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(50)
    },

    Q("q_lang_id",
      """SELECT doc_id, lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted,
        |  CAST(s_en AS BIGINT) AS s_en, CAST(s_es AS BIGINT) AS s_es,
        |  CAST(s_de AS BIGINT) AS s_de, CAST(s_fr AS BIGINT) AS s_fr,
        |  CAST(s_zh AS BIGINT) AS s_zh
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_intersect(t, ['the','and','is','of','to'])) AS s_en,
        |    len(list_intersect(t, ['el','la','de','que','y'])) AS s_es,
        |    len(list_intersect(t, ['der','die','und','das','ist'])) AS s_de,
        |    len(list_intersect(t, ['le','la','et','les','des'])) AS s_fr,
        |    len(list_intersect(t, ['的','是','了','在','和'])) AS s_zh
        |  FROM (SELECT doc_id, lang,
        |               list_distinct(list_filter(string_split(lower(text), ' '),
        |                                         x -> x <> '')) AS t
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val t = DedupOps.tokenSet(col("text"))
      val scored = tbl(spark, dir, "documents")
        .withColumn("t", t)
        .select(col("doc_id") +: col("lang") +:
          TextAnalysis.langMarkers.map { case (l, _) =>
            big(TextAnalysis.markerHits(col("t"), l)).as(s"s_$l")
          } :+ TextAnalysis.predictedLang(col("t")).as("predicted"): _*)
      scored.select("doc_id", "lang", "predicted",
          "s_en", "s_es", "s_de", "s_fr", "s_zh")
        .orderBy("doc_id")
    },

    Q("q_quality_score",
      """SELECT doc_id,
        |  CAST(n_tok AS BIGINT) AS n_tokens,
        |  round(CAST(punct AS DOUBLE)/CAST(n_char AS DOUBLE), 9) AS punct_ratio,
        |  round(CAST(stop AS DOUBLE)/CAST(n_tok AS DOUBLE), 9) AS stopword_ratio,
        |  round(CAST(n_char - spaces AS DOUBLE)/CAST(n_tok AS DOUBLE), 9) AS avg_word_len,
        |  (n_tok >= 10 AND n_tok <= 1000
        |   AND CAST(punct AS DOUBLE)/CAST(n_char AS DOUBLE) < 0.1) AS is_quality
        |FROM (
        |  SELECT doc_id, length(text) AS n_char,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok,
        |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS stop,
        |    length(text) - length(regexp_replace(text, ' ', '', 'g')) AS spaces
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val toks = DedupOps.tokens(lower(col("text")))
      val nTok = size(toks).cast(DoubleType)
      val nChar = length(col("text")).cast(DoubleType)
      val punct = TextAnalysis.punctCount(col("text")).cast(DoubleType)
      val stop = TextAnalysis.stopwordCount(toks).cast(DoubleType)
      val spaces = (length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))).cast(DoubleType)
      tbl(spark, dir, "documents")
        .select(col("doc_id"),
          big(size(toks)).as("n_tokens"),
          // scale 9, not 6: small-integer ratios can be exactly
          // representable doubles AT a coarser tie boundary (1/128 =
          // 0.0078125), where Spark HALF_UP != DuckDB half-even; at scale 9
          // no 2^a*5^b denominator <= 1024 produces a tie
          round(punct / nChar, 9).as("punct_ratio"),
          round(stop / nTok, 9).as("stopword_ratio"),
          round((nChar - spaces) / nTok, 9).as("avg_word_len"),
          (size(toks) >= 10 && size(toks) <= 1000 && punct / nChar < 0.1)
            .as("is_quality"))
        .orderBy("doc_id")
    },

    Q("q_token_count",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured,
        |  CAST(ceil(CAST(length(text) AS DOUBLE)/4.0) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "documents")
        .select(col("doc_id"),
          big(size(filter(split(col("text"), "\\s+"), t => t =!= "")))
            .as("ws_tokens"),
          big(length(col("text"))).as("n_chars_measured"),
          TextAnalysis.bpeEstimate(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")
    },

    Q("q_doc_fingerprint",
      """SELECT doc_id,
        |  list_min(list_transform(range(1, greatest(length(norm)-7, 1)+1),
        |           i -> md5(substring(norm, i, 8)))) AS fp
        |FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(TextOps.normalizeText(col("text"))).as("fp"))
        .orderBy("doc_id")
    },

    // Non-ASCII through the ORACLE GATE: the corpus fixtures are ASCII by
    // construction, so without this query the 200+ green hash rows would
    // never exercise the codepoint-FNV contract (every oracle-checked text
    // kernel folds Unicode CODEPOINTS because DuckDB's ascii(c) per
    // character yields the codepoint — byte folds silently diverge on
    // anything non-ASCII). Both engines union the SAME literal zh / fr /
    // emoji / ru / mixed / ar rows (2-, 3-, and 4-byte UTF-8) into the
    // corpus, then hash-match char vs byte lengths, the whole-text
    // codepoint FNV, and the MinHash permutation-0 kernel on multi-byte
    // tokens — a regression to byte folding breaks this row instantly.
    Q("q_unicode_fold",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (9000001, '数据 管道 在 大规模 训练 中 去重 数据'),
        |    (9000002, 'déjà vu à côté naïve œuvre garçon'),
        |    (9000003, '🚀 🌍 data 🔥 pipeline 😀 🚀'),
        |    (9000004, 'данные конвейер дедупликация'),
        |    (9000005, 'mixed ASCII 与 中文 and émojis 🎯'),
        |    (9000006, 'بيانات معالجة تدفق')) v(doc_id, text)),
        |toks AS (
        |  SELECT doc_id, text,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM corpus),
        |f AS (
        |  SELECT doc_id, text, t,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(list_filter(string_split(lower(text), ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS HUGEINT))),
        |      (acc, x) -> (xor(acc, x) * 1099511628211)
        |                  % CAST(18446744073709551616 AS HUGEINT)) AS h,
        |    list_min(list_transform(t, tok ->
        |      CAST(CASE WHEN list_reduce(
        |             list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |               list_transform(list_filter(string_split('#0#' || tok, ''),
        |                                          c -> c <> ''),
        |                 c -> CAST(ascii(c) AS HUGEINT))),
        |             (acc, x) -> (xor(acc, x) * 1099511628211)
        |                         % CAST(18446744073709551616 AS HUGEINT))
        |             >= CAST(9223372036854775808 AS HUGEINT)
        |           THEN list_reduce(
        |             list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |               list_transform(list_filter(string_split('#0#' || tok, ''),
        |                                          c -> c <> ''),
        |                 c -> CAST(ascii(c) AS HUGEINT))),
        |             (acc, x) -> (xor(acc, x) * 1099511628211)
        |                         % CAST(18446744073709551616 AS HUGEINT))
        |             - CAST(18446744073709551616 AS HUGEINT)
        |           ELSE list_reduce(
        |             list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |               list_transform(list_filter(string_split('#0#' || tok, ''),
        |                                          c -> c <> ''),
        |                 c -> CAST(ascii(c) AS HUGEINT))),
        |             (acc, x) -> (xor(acc, x) * 1099511628211)
        |                         % CAST(18446744073709551616 AS HUGEINT))
        |           END AS BIGINT))) AS mh
        |  FROM toks WHERE len(t) > 0),
        |cb AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    list_concat(list_concat([CAST(0 AS BIGINT)],
        |      list_filter(range(8, length(text) + 1), i ->
        |        list_reduce(
        |          list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |            list_transform(
        |              list_filter(string_split(substring(text, CAST(i AS INT) - 7, 8),
        |                                       ''), c -> c <> ''),
        |              c -> CAST(ascii(c) AS HUGEINT))),
        |          (acc, x) -> (xor(acc, x) * 1099511628211)
        |                      % CAST(18446744073709551616 AS HUGEINT))
        |        % 32 = 0)),
        |      [CAST(length(text) AS BIGINT)]) AS bs
        |  FROM corpus WHERE doc_id >= 9000000),
        |cd AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(range(1, len(bs)), j ->
        |      substring(text, CAST(bs[j] AS INT) + 1,
        |                CAST(bs[j+1] - bs[j] AS INT))), c -> c <> '') AS chunks
        |  FROM cb),
        |ci AS (
        |  SELECT doc_id, CAST(len(chunks) AS BIGINT) AS n_chunks,
        |    CAST(CASE WHEN ch >= CAST(9223372036854775808 AS HUGEINT)
        |              THEN ch - CAST(18446744073709551616 AS HUGEINT)
        |              ELSE ch END AS BIGINT) AS chunks_fnv
        |  FROM (
        |    SELECT doc_id, chunks,
        |      list_reduce(
        |        list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |          list_transform(
        |            list_filter(string_split(array_to_string(chunks, '|'), ''),
        |                        c -> c <> ''),
        |            c -> CAST(ascii(c) AS HUGEINT))),
        |        (acc, x) -> (xor(acc, x) * 1099511628211)
        |                    % CAST(18446744073709551616 AS HUGEINT)) AS ch
        |    FROM cd))
        |SELECT f.doc_id AS doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(len(t) AS BIGINT) AS n_tokens,
        |       CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                 THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                 ELSE h END AS BIGINT) AS fnv_cp,
        |       mh AS minhash0,
        |       coalesce(ci.n_chunks, CAST(-1 AS BIGINT)) AS n_chunks,
        |       coalesce(ci.chunks_fnv, CAST(0 AS BIGINT)) AS chunks_fnv
        |FROM f LEFT JOIN ci ON f.doc_id = ci.doc_id
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val lits = Seq(
        9000001L -> "数据 管道 在 大规模 训练 中 去重 数据",
        9000002L -> "déjà vu à côté naïve œuvre garçon",
        9000003L -> "🚀 🌍 data 🔥 pipeline 😀 🚀",
        9000004L -> "данные конвейер дедупликация",
        9000005L -> "mixed ASCII 与 中文 and émojis 🎯",
        9000006L -> "بيانات معالجة تدفق").toDF("doc_id", "text")
      // ChunkSplit over the literal rows only: the content-defined chunker
      // is codepoint-indexed (DuckDB replays substring/ascii per
      // CHARACTER), and these rows are the first multi-byte text the gate
      // pushes through its boundary scan
      val litChunks = lits
        .select(col("doc_id"),
          filter(graft.ops.expr.ChunkSplit.column(col("text")),
            c => c =!= "").as("chunks"))
        .select(col("doc_id"), big(size(col("chunks"))).as("n_chunks"),
          graft.ops.expr.Fnv1a64.columnCodePoints(
            array_join(col("chunks"), "|")).as("chunks_fnv"))
      tbl(spark, dir, "documents").select(col("doc_id"), col("text"))
        .unionByName(lits)
        .select(col("doc_id"), col("text"),
          DedupOps.tokenSet(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .join(litChunks, Seq("doc_id"), "left")
        .select(col("doc_id"),
          big(length(col("text"))).as("n_chars"),
          big(octet_length(col("text"))).as("n_bytes"),
          big(size(col("t"))).as("n_tokens"),
          graft.ops.expr.Fnv1a64.columnCodePoints(lower(col("text"))).as("fnv_cp"),
          element_at(DedupOps.minhashSignatureFnv(col("t"), 1), 1).as("minhash0"),
          coalesce(col("n_chunks"), big(lit(-1))).as("n_chunks"),
          coalesce(col("chunks_fnv"), lit(0L)).as("chunks_fnv"))
        .orderBy("doc_id")
    },

    // ---- multimodal ------------------------------------------------------

    Q("q_multimodal_join",
      """SELECT d.doc_id, CAST(e.label AS BIGINT) AS label,
        |       CAST(d.n_chars AS BIGINT) AS n_chars,
        |       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        |       substring(d.text, 1, 20) AS text_prefix,
        |       round(sqrt(CAST(list_sum(list_transform(e.embedding,
        |             x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(30,15))))
        |             AS DOUBLE)), 6) AS vec_norm
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "documents")
        .join(tbl(spark, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), big(col("label")).as("label"),
          big(col("n_chars")).as("n_chars"),
          big(octet_length(col("text"))).as("n_bytes"),
          substring(col("text"), 1, 20).as("text_prefix"),
          round(normExact(col("embedding")), 6).as("vec_norm"))
        .orderBy("doc_id")
    },

    // Binary media payloads through per-partition decoders (stubbed decode,
    // real distribution plumbing). ORACLE-CHECKED: the stub decoder's
    // dims/frames/checksum are FNV-derived from the payload bytes, which
    // DuckDB refolds per character in HUGEINT (same contract q_media_meta
    // proves for the downstream prep plan) — so the mapPartitions decode
    // path itself is hash-matched, not just non-empty.
    Q("q_multimodal_extract",
      """WITH f AS (
        |  SELECT doc_id,
        |         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        |         length(text) AS n_bytes,
        |         list_reduce(
        |           list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |             list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |               c -> CAST(ascii(c) AS HUGEINT))),
        |           (acc, x) -> (xor(acc, x) * 1099511628211)
        |                       % CAST(18446744073709551616 AS HUGEINT)) AS h
        |  FROM documents)
        |SELECT doc_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes,
        |       64 + CAST(h % 16 AS BIGINT) * 32 AS width,
        |       64 + CAST((h // 256) % 9 AS BIGINT) * 32 AS height,
        |       CASE WHEN modality = 'video'
        |            THEN 1 + CAST((h // 65536) % 240 AS BIGINT)
        |            ELSE 1 END AS n_frames,
        |       CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                 THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                 ELSE h END AS BIGINT) AS checksum
        |FROM f
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          big(col("width")).as("width"), big(col("height")).as("height"),
          big(col("n_frames")).as("n_frames"), col("checksum"))
        .orderBy("doc_id")
    },

    // Full multimodal prep plan, ORACLE-CHECKED end to end: decode
    // metadata (per-partition stub decoder — FNV-derived dims/frames from
    // the payload bytes), aspect-preserving resize into a 224-box (pure
    // integer floor arithmetic), and a deterministic frame-sampling
    // schedule (stride = ⌈frames/8⌉, indices via `sequence`). The oracle
    // recomputes the decoder's hash with a linear `list_reduce` FNV fold
    // in HUGEINT — proving the mapPartitions decode path is reproducible,
    // not just non-empty. All outputs are integers; nothing floats.
    Q("q_media_meta",
      """WITH f AS (
        |  SELECT doc_id,
        |         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        |         length(text) AS n_bytes,
        |         list_reduce(
        |           list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |             list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |               c -> CAST(ascii(c) AS HUGEINT))),
        |           (acc, x) -> (xor(acc, x) * 1099511628211)
        |                       % CAST(18446744073709551616 AS HUGEINT)) AS h
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, modality, n_bytes,
        |         64 + CAST(h % 16 AS BIGINT) * 32 AS width,
        |         64 + CAST((h // 256) % 9 AS BIGINT) * 32 AS height,
        |         CASE WHEN modality = 'video'
        |              THEN 1 + CAST((h // 65536) % 240 AS BIGINT)
        |              ELSE 1 END AS n_frames,
        |         CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                   THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                   ELSE h END AS BIGINT) AS checksum
        |  FROM f),
        |r AS (
        |  SELECT *,
        |         CASE WHEN width >= height THEN 224
        |              ELSE (width * 224) // height END AS target_w,
        |         CASE WHEN width >= height THEN (height * 224) // width
        |              ELSE 224 END AS target_h,
        |         (n_frames + 7) // 8 AS stride
        |  FROM m)
        |SELECT doc_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes,
        |       CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |       CAST(n_frames AS BIGINT) AS n_frames, checksum,
        |       CAST(target_w AS BIGINT) AS target_w,
        |       CAST(target_h AS BIGINT) AS target_h,
        |       CAST(stride AS BIGINT) AS stride,
        |       CAST((n_frames + stride - 1) // stride AS BIGINT) AS n_sampled
        |FROM r
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
        .toDF()
      feats
        .withColumn("target_w",
          when(col("width") >= col("height"), lit(224L))
            .otherwise(expr("(width * 224L) div height")))
        .withColumn("target_h",
          when(col("width") >= col("height"), expr("(height * 224L) div width"))
            .otherwise(lit(224L)))
        .withColumn("stride", expr("(n_frames + 7L) div 8"))
        .withColumn("n_sampled",
          big(size(sequence(lit(0L), col("n_frames") - 1L, col("stride")))))
        .select(col("doc_id"), col("modality"), big(col("n_bytes")).as("n_bytes"),
          big(col("width")).as("width"), big(col("height")).as("height"),
          big(col("n_frames")).as("n_frames"), col("checksum"),
          col("target_w"), col("target_h"), col("stride"), col("n_sampled"))
        .orderBy("doc_id")
    },

    // Frame-level video dedup, ORACLE-CHECKED end to end: each video's
    // sampled frames (the q_media_meta schedule — stride ⌈frames/8⌉ over
    // the decoder's frame count) get a deterministic signature (fnv1a64 of
    // the frame's byte slice, the stub decode stand-in), and video pairs
    // sharing ≥1 sampled-frame signature are detected through a frame
    // inverted index — shared-content detection at FRAME granularity,
    // which whole-file checksums miss (a re-container of the same frames
    // still collides). EXACT matching only: no fake perceptual locality is
    // claimed for the stub decoder. Shapes: one explode (≤8 frames/video),
    // a distinct, and a sig equi-join — at production scale the standard
    // mitigation for boilerplate hub frames (intros/logos) is a df-cap on
    // the index, the same move as rare-prefix filtering in
    // q_ngram_containment. Frames shorter than 8 bytes are skipped (a
    // 1-byte slice would collide corpus-wide).
    Q("q_frame_dedup",
      """WITH v AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS HUGEINT))),
        |      (acc, x) -> (xor(acc, x) * 1099511628211)
        |                  % CAST(18446744073709551616 AS HUGEINT)) AS h
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, text, n, CAST(1 + (h // 65536) % 240 AS BIGINT) AS nf
        |  FROM v),
        |k AS (
        |  SELECT doc_id, text, n, nf, unnest(range(0, nf, (nf + 7) // 8)) AS k
        |  FROM f),
        |s AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(CASE WHEN fs >= CAST(9223372036854775808 AS HUGEINT)
        |              THEN fs - CAST(18446744073709551616 AS HUGEINT)
        |              ELSE fs END AS BIGINT) AS sig
        |  FROM (
        |    SELECT doc_id,
        |      list_reduce(
        |        list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |          list_transform(
        |            list_filter(string_split(
        |              substring(text, (k*n)//nf + 1, ((k+1)*n)//nf - (k*n)//nf),
        |              ''), c -> c <> ''),
        |            c -> CAST(ascii(c) AS HUGEINT))),
        |        (acc, x) -> (xor(acc, x) * 1099511628211)
        |                    % CAST(18446744073709551616 AS HUGEINT)) AS fs
        |    FROM k
        |    WHERE ((k+1)*n)//nf - (k*n)//nf >= 8))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(count(*) AS BIGINT) AS shared
        |FROM s a JOIN s b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      val frames = tbl(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the mediaTable video rows
        .select(col("doc_id"), col("text"),
          length(col("text")).as("n"),
          VectorOps.fnv1a64(col("text")).as("h"))
        // the decoder's video frame count (StubDecoder: unsigned bit-slices)
        .withColumn("nf",
          (lit(1L) + expr("shiftrightunsigned(h, 16)") % 240L).cast("int"))
        .withColumn("k",
          explode(sequence(lit(0), col("nf") - 1,
            expr("CAST((nf + 7) DIV 8 AS INT)"))))
        .withColumn("lo", expr("(k * n) DIV nf"))
        .withColumn("hi", expr("((k + 1) * n) DIV nf"))
        .filter(col("hi") - col("lo") >= 8)
        .select(col("doc_id"),
          VectorOps.fnv1a64(expr("substring(text, lo + 1, hi - lo)")).as("sig"))
        .distinct()
      def side(p: String) = frames.select(col("doc_id").as(s"${p}_id"), col("sig"))
      side("a").join(side("b"), "sig")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(big(count(lit(1))).as("shared"))
        .orderBy("a_id", "b_id")
    },

    // Content-defined chunk dedup (the rsync/LBFS/storage-dedup
    // algorithm), ORACLE-CHECKED end to end: chunk boundaries fall where
    // the fnv1a64 of the trailing 8-byte window ≡ 0 (mod 32) — boundaries
    // move WITH the content, so unlike fixed-offset frames (q_frame_dedup)
    // an insertion early in a payload does not shift every later chunk,
    // and payloads sharing byte runs still share chunks. Pairs sharing ≥1
    // chunk of ≥16 bytes are reported with their shared-chunk count
    // through a chunk inverted index. The join key is the chunk STRING
    // (exact equality — a signature join would hang the oracle contract on
    // a hash-collision argument); expected chunk length is 32 bytes, so
    // the index rows stay small. At production scale the hub mitigation is
    // a df-cap on the index, as in q_ngram_containment.
    Q("q_chunk_dedup",
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE length(text) >= 16),
        |b AS (
        |  SELECT doc_id, text, n,
        |    list_concat(list_concat([CAST(0 AS BIGINT)],
        |      list_filter(range(8, n + 1), i ->
        |        list_reduce(
        |          list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |            list_transform(
        |              list_filter(string_split(substring(text, CAST(i AS INT) - 7, 8),
        |                                       ''), c -> c <> ''),
        |              c -> CAST(ascii(c) AS HUGEINT))),
        |          (acc, x) -> (xor(acc, x) * 1099511628211)
        |                      % CAST(18446744073709551616 AS HUGEINT))
        |        % 32 = 0)),
        |      [CAST(n AS BIGINT)]) AS bs
        |  FROM d),
        |ch AS (
        |  SELECT DISTINCT doc_id, chunk FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(bs)), j ->
        |        substring(text, CAST(bs[j] AS INT) + 1,
        |                  CAST(bs[j+1] - bs[j] AS INT)))) AS chunk
        |    FROM b)
        |  WHERE length(chunk) >= 16)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(count(*) AS BIGINT) AS shared
        |FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      // native one-pass splitter (ChunkSplit): FNV's wrapping multiply is
      // not expressible in ANSI-mode SQL lambdas, and per-position
      // substring() would rescan the string from its start each time
      val chunks = tbl(spark, dir, "documents")
        .filter(length(col("text")) >= 16)
        .select(col("doc_id"),
          explode(graft.ops.expr.ChunkSplit.column(col("text"))).as("chunk"))
        .filter(length(col("chunk")) >= 16)
        .distinct()
      def side(p: String) = chunks.select(col("doc_id").as(s"${p}_id"), col("chunk"))
      side("a").join(side("b"), "chunk")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(big(count(lit(1))).as("shared"))
        .orderBy("a_id", "b_id")
    },

    // Token-window chunking (50-token windows, stride 40): the
    // context-window preparation step of a training pipeline, as a pure
    // explode — one row in, ⌈(n-50)/40⌉+1 rows out, no shuffle.
    Q("q_text_chunk",
      """SELECT doc_id, ci AS chunk_idx,
        |       array_to_string(t[ci*40+1 : ci*40+50], ' ') AS chunk_text,
        |       CAST(len(t[ci*40+1 : ci*40+50]) AS BIGINT) AS chunk_tokens
        |FROM (
        |  SELECT doc_id, t, unnest(range(0, nchunks)) AS ci
        |  FROM (SELECT doc_id, t,
        |               CASE WHEN len(t) <= 50 THEN 1
        |                    ELSE CAST(ceil((len(t)-50)/40.0) AS BIGINT)+1 END AS nchunks
        |        FROM (SELECT doc_id,
        |                     list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        |              FROM documents)))
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
      val n = size(col("t"))
      val nchunks = when(n <= 50, lit(1L))
        .otherwise(ceil((n - lit(50)).cast(DoubleType) / 40.0).cast("long") + 1L)
      tbl(spark, dir, "documents")
        .select(col("doc_id"), DedupOps.tokens(lower(col("text"))).as("t"))
        .withColumn("ci", explode(sequence(lit(0L), nchunks - 1L)))
        .select(col("doc_id"), col("ci").as("chunk_idx"),
          array_join(slice(col("t"), col("ci").cast("int") * 40 + 1, lit(50)), " ")
            .as("chunk_text"),
          big(size(slice(col("t"), col("ci").cast("int") * 40 + 1, lit(50))))
            .as("chunk_tokens"))
        .orderBy("doc_id", "chunk_idx")
    },

    // PII scrubbing: regex redaction with per-doc match counts — a standard
    // pre-training curation pass, single scan, fully codegen'd.
    Q("q_pii_redact",
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text,
        |            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
        |         AS n_emails,
        |       CAST(len(regexp_extract_all(text,
        |            '\d{3}[- ]\d{3,4}[- ]\d{4}')) AS BIGINT) AS n_phones,
        |       substring(regexp_replace(regexp_replace(text,
        |            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |            '\d{3}[- ]\d{3,4}[- ]\d{4}', '[PHONE]', 'g'), 1, 40) AS preview
        |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phone = "\\d{3}[- ]\\d{3,4}[- ]\\d{4}"
      tbl(spark, dir, "documents")
        .select(col("doc_id"),
          big(regexp_count(col("text"), lit(email))).as("n_emails"),
          big(regexp_count(col("text"), lit(phone))).as("n_phones"),
          substring(regexp_replace(
            regexp_replace(col("text"), email, "[EMAIL]"),
            phone, "[PHONE]"), 1, 40).as("preview"))
        .orderBy("doc_id")
    },

    // Deterministic stratified train/val/test split (hash-free: the split
    // key is a pure function of the stable doc id, so replays assign
    // identically) with per-language counts.
    Q("q_train_split",
      """SELECT lang, split, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(doc_id) AS BIGINT) AS min_id,
        |       CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM (SELECT lang, doc_id,
        |             CASE WHEN doc_id % 10 <= 7 THEN 'train'
        |                  WHEN doc_id % 10 = 8 THEN 'validation'
        |                  ELSE 'test' END AS split
        |      FROM documents)
        |GROUP BY lang, split
        |ORDER BY lang, split""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "documents")
        .select(col("lang"), col("doc_id"),
          when(col("doc_id") % 10 <= 7, "train")
            .when(col("doc_id") % 10 === 8, "validation")
            .otherwise("test").as("split"))
        .groupBy("lang", "split")
        .agg(big(count(lit(1))).as("n"), big(min(col("doc_id"))).as("min_id"),
          big(max(col("doc_id"))).as("max_id"))
        .orderBy("lang", "split")
    },

    // Benchmark decontamination: flag training documents sharing any word
    // 5-gram with the (deterministic ~14%) benchmark subset. The benchmark
    // shingle set is small by nature — it broadcasts; the corpus side
    // streams, so the check is one scan + a broadcast semi-ish join at any
    // scale (the standard n-gram-overlap decontamination pass an LLM
    // training pipeline runs before every release).
    Q("q_decontaminate",
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
        |  FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
        |  WHERE len(t) >= 5),
        |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 7 = 0)
        |SELECT s.doc_id, CAST(count(DISTINCT s.g) AS BIGINT) AS n_overlap
        |FROM sh s JOIN bench b ON s.g = b.g
        |WHERE s.doc_id % 7 <> 0
        |GROUP BY s.doc_id
        |ORDER BY s.doc_id""".stripMargin) { (spark, dir) =>
      val toks = tbl(spark, dir, "documents")
        .select(col("doc_id"), DedupOps.tokens(col("text")).as("t"))
      val sh = toks.filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - 4),
          i => array_join(slice(col("t"), i, lit(5)), " "))).as("g"))
      val bench = sh.filter(col("doc_id") % 7 === 0).select("g").distinct()
      sh.filter(col("doc_id") % 7 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(big(countDistinct(col("g"))).as("n_overlap"))
        .orderBy("doc_id")
    },

    // Top distinctive terms per document: rank by term frequency DESC then
    // document frequency ASC (frequent locally, rare globally — the tf-idf
    // ordering in pure integers, so no cross-engine float/log contract).
    // Shapes: explode → two hash aggregations → equi-join tf against the
    // per-term df table on `term` (both sides shuffle on the key; the df
    // table is vocabulary-sized and therefore unbounded, so it is NOT
    // broadcast-hinted — AQE still broadcasts it when it measures small)
    // → per-doc window top-3.
    Q("q_top_terms",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |                                    x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        |ranked AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |                            ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rn
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |       CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin) { (spark, dir) =>
      val tok = tbl(spark, dir, "documents")
        .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // tf rows ARE the distinct (doc, term) pairs, so document frequency
      // is a plain count over tf. Round 16 (guide §2.4): df rides a
      // whole-partition WINDOW over the same term-keyed exchange the old
      // plan paid for its join — one shuffle of the tf stream replaces
      // the separate df aggregation plus the join that re-shuffled tf
      // against it (3 exchanges + a join build → 1 exchange).
      val byTerm = Window.partitionBy("term")
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.withColumn("df", count(lit(1)).over(byTerm))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), big(col("tf")).as("tf"),
          big(col("df")).as("df"), big(col("rn")).as("rn"))
        .orderBy("doc_id", "rn")
    },

    // Near-dup cluster labeling: connected components over the ≥0.97
    // Jaccard edge set (q_ngram_jaccard's pairs at a tighter threshold:
    // 0.95 admits long borderline chains that fuse into one giant
    // component — a 786-node blob at sf0.1 — while 0.97 keeps the
    // content-clone clusters that dedup actually collapses), each node
    // labeled with its component's minimum doc_id. Implemented as distributed min-label
    // propagation — alternate a neighbor-min join with the current labels
    // until a fixpoint, the standard iterative-join pattern for graph
    // connectivity on Spark (each round is one shuffle on node id; edge
    // lists stay partitioned, nothing ever collects). The oracle reaches
    // the same fixpoint through a recursive CTE.
    Q("q_dup_components",
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6)
        |        >= 0.97),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.label FROM reach r JOIN edges e ON r.node = e.dst)
        |SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component,
        |       CAST(count(DISTINCT label) AS BIGINT) AS n_reachable
        |FROM reach GROUP BY node
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val pairs = jaccardPairs(spark, dir).filter(col("jac") >= 0.97)
        .select(col("a_id"), col("b_id"))
      // The 0.97 closure CANNOT ride h1sym (that artifact is the ≥0.95
      // set) and it stays checkpointed: round 16 tried recomputing it per
      // loop round from the persisted pair artifact and measured slower
      // (2.5 → 4.4 s isolated at sf0.1 — the filter+union re-ran once per
      // round instead of once per execution). Kept as the loop's
      // materialized constant.
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint(true)
      var labels = edges.select(col("src").as("node"), col("src").as("label"))
        .distinct().localCheckpoint(true)
      // Convergence is detected by a SCALAR: per-node labels are
      // non-increasing (every update is a `least` against the current
      // label), so the label sum strictly decreases until the fixpoint —
      // comparing sums replaces a per-round labels-vs-next shuffle join
      // with one tiny aggregation over the just-checkpointed frame. The
      // driver-visible cost of this query is dominated by per-round job
      // overhead, not data volume, so rounds run exactly two shuffles:
      // the neighbor union-aggregate and the pointer-jump self-join.
      def labelSum(df: DataFrame): java.math.BigDecimal = {
        // decimal accumulator: a long sum of ~10^9 64-bit ids could overflow
        val r = df.agg(sum(col("label").cast(DecimalType(38, 0)))).head
        if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
      }
      var prevSum = labelSum(labels)
      var converged = false
      var rounds = 0
      while (!converged) {
        rounds += 1
        require(rounds <= 64, "component labeling did not converge")
        // neighbor-min alone needs diameter rounds — a CHAIN of near-dup
        // edits makes that linear in cluster size. Each round therefore
        // combines (a) min over neighbors' labels with (b) pointer jumping
        // (label := label(label)), which halves remaining path lengths, so
        // convergence is O(log diameter) shuffles regardless of shape.
        // Self-labels ride the same aggregation as neighbor labels (union,
        // not a second join), so (a) is one shuffle, not two.
        val l1 = labels
          .unionByName(edges
            .join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(col("src").as("node"), col("label")))
          .groupBy("node").agg(min(col("label")).as("label"))
        // localCheckpoint truncates lineage: the self-join doubles the
        // logical plan per round, so without the cut analysis cost (and
        // heap) grows 2^rounds
        val next = l1
          .join(l1.select(col("node").as("label"), col("label").as("jlabel")),
            "label")
          .select(col("node"), least(col("label"), col("jlabel")).as("label"))
          .localCheckpoint(true)
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels.unpersist()
        labels = next
      }
      // component size joins back from a per-label count (in an undirected
      // graph, "labels that reach a node" == its whole component)
      val sizes = labels.groupBy("label").agg(big(count(lit(1))).as("n_reachable"))
      labels
        .join(sizes, "label")
        .select(col("node").as("doc_id"), big(col("label")).as("component"),
          col("n_reachable"))
        .orderBy("doc_id")
    },

    // Degree distribution of the near-dup graph — the shape report that
    // tells a curation team whether duplication is pairwise (degree 1) or
    // templated boilerplate (hub degrees). Reuses the shared verified pair
    // artifact; two tiny hash aggs over the edge list.
    Q("q_degree_dist",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6)
        |        >= 0.95),
        |deg AS (
        |  SELECT doc_id, count(*) AS degree FROM (
        |    SELECT a_id AS doc_id FROM pairs
        |    UNION ALL SELECT b_id FROM pairs)
        |  GROUP BY doc_id)
        |SELECT CAST(degree AS BIGINT) AS degree,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM deg GROUP BY degree
        |ORDER BY degree""".stripMargin) { (spark, dir) =>
      val pairs = jaccardPairs(spark, dir)
      pairs.select(col("a_id").as("doc_id"))
        .unionByName(pairs.select(col("b_id").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(big(count(lit(1))).as("n_docs"))
        .select(big(col("degree")).as("degree"), col("n_docs"))
        .orderBy("degree")
    },

    // PageRank over the near-dup graph (3 damped iterations): ranks the
    // canonical representative inside boilerplate/template clusters — the
    // hub a curation pass keeps — where min-id components (q_dup_components)
    // only label membership. Arithmetic is scaled-integer end to end:
    // ranks carry 10¹², every per-edge contribution is rank DIV degree and
    // the damping step is (85·Σ) DIV 100 — floor division of non-negative
    // longs, identical in any engine, so three unrolled iterations
    // hash-match the oracle with no float anywhere. Each iteration is two
    // shuffles (contribution agg on dst, rank join on node); edges stay
    // partitioned, nothing collects — the standard power-iteration plan
    // that scales to billion-edge graphs (at which point ranks move to
    // DECIMAL(38) accumulators; noted, not needed at 2⁶³÷85 total mass).
    Q("q_pagerank",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6)
        |        >= 0.95),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM deg),
        |r1 AS (
        |  SELECT d.node,
        |         CAST(150000000000 + (85 * coalesce(c.contrib, 0)) // 100
        |              AS BIGINT) AS r
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(r.r // sd.deg) AS BIGINT) AS contrib
        |    FROM edges e JOIN r0 r ON e.src = r.node
        |                 JOIN deg sd ON e.src = sd.node
        |    GROUP BY e.dst) c ON d.node = c.node),
        |r2 AS (
        |  SELECT d.node,
        |         CAST(150000000000 + (85 * coalesce(c.contrib, 0)) // 100
        |              AS BIGINT) AS r
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(r.r // sd.deg) AS BIGINT) AS contrib
        |    FROM edges e JOIN r1 r ON e.src = r.node
        |                 JOIN deg sd ON e.src = sd.node
        |    GROUP BY e.dst) c ON d.node = c.node),
        |r3 AS (
        |  SELECT d.node,
        |         CAST(150000000000 + (85 * coalesce(c.contrib, 0)) // 100
        |              AS BIGINT) AS r
        |  FROM deg d LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(r.r // sd.deg) AS BIGINT) AS contrib
        |    FROM edges e JOIN r2 r ON e.src = r.node
        |                 JOIN deg sd ON e.src = sd.node
        |    GROUP BY e.dst) c ON d.node = c.node)
        |SELECT r3.node AS doc_id, CAST(deg.deg AS BIGINT) AS degree,
        |       r3.r AS rank_e12
        |FROM r3 JOIN deg ON r3.node = deg.node
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      // round 16: the symmetric closure is the session artifact
      // PipelineQueries.h1sym (pairs hold unordered a<b edges, so the
      // directed union IS distinct — identical rows) — replaces a private
      // localCheckpoint materialization job per run with the persisted
      // frame q_link_predict/q_graph_khop already share
      val edges = PipelineQueries.h1sym(spark, dir)
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      // the per-round degree join stays IN the loop: deg is node-sized (a
      // broadcast join), while pre-joining it onto the edge list would
      // materialize a second edges-sized frame — measurably slower here
      // and no cheaper at scale
      var r = deg.select(col("node"), lit(1000000000000L).as("r"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(r.select(col("node").as("src"), col("r")), "src")
          .join(deg.select(col("node").as("src"), col("deg").as("sdeg")), "src")
          .select(col("dst").as("node"), expr("r DIV sdeg").as("c"))
          .groupBy("node").agg(sum(col("c")).as("contrib"))
        r = deg.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            expr("CAST(150000000000 + (85 * coalesce(contrib, CAST(0 AS BIGINT)))" +
              " DIV 100 AS BIGINT)").as("r"))
          .localCheckpoint(true)
      }
      r.join(deg, "node")
        .select(col("node").as("doc_id"), big(col("deg")).as("degree"),
          col("r").as("rank_e12"))
        .orderBy("doc_id")
    },

    // Triangle counting + local clustering coefficient over the near-dup
    // graph: distinguishes TEMPLATE CLIQUES (every pair similar — one
    // canonical doc survives curation) from CHAIN-shaped drift (A~B~C but
    // A≁C — each hop may deserve keeping). Wedges are generated from the
    // DEGREE-ORIENTED edge list (GraphOps.triangles — each edge directed
    // from its lower-(degree,id) endpoint, so every triangle is enumerated
    // exactly once from its minimum-degree vertex and wedge volume is
    // O(arboricity·|E|) instead of Σdeg²: a 10⁵-degree template hub emits
    // ZERO wedges because all its edges point inward), closed by a LEFT
    // SEMI against the canonical pair list. Exact — the triangle set is
    // orientation-invariant, so the oracle keeps the plain formulation.
    // The coefficient is float-free: lcc_e6 = ⌊2·tri·10⁶/(deg·(deg−1))⌋.
    // Saturation-pinned by GraphSaturationSpec (star-hub fixture: oriented
    // wedge volume ≥20× below the id-oriented plan's).
    Q("q_triangle_count",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6)
        |        >= 0.95),
        |tri AS (
        |  SELECT e1.a_id AS x, e1.b_id AS y, e2.b_id AS z
        |  FROM pairs e1 JOIN pairs e2 ON e1.b_id = e2.a_id
        |       JOIN pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
        |tcnt AS (
        |  SELECT doc_id, count(*) AS tri FROM (
        |    SELECT x AS doc_id FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY doc_id),
        |deg AS (
        |  SELECT doc_id, count(*) AS degree FROM (
        |    SELECT a_id AS doc_id FROM pairs
        |    UNION ALL SELECT b_id FROM pairs)
        |  GROUP BY doc_id)
        |SELECT deg.doc_id, CAST(deg.degree AS BIGINT) AS degree,
        |       CAST(coalesce(tcnt.tri, 0) AS BIGINT) AS triangles,
        |       CAST(CASE WHEN deg.degree > 1
        |                 THEN (2 * coalesce(tcnt.tri, 0) * 1000000)
        |                      // (deg.degree * (deg.degree - 1))
        |                 ELSE 0 END AS BIGINT) AS lcc_e6
        |FROM deg LEFT JOIN tcnt USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val pairs = jaccardPairs(spark, dir).select("a_id", "b_id")
      val tri = graft.util.SessionCache.getOrMaterialize(spark, s"tri:$dir")(
        graft.ops.GraphOps.triangles(pairs, Some(s"tri_oriented:$dir")))
      val tcnt = tri.select(col("x").as("doc_id"))
        .unionByName(tri.select(col("y").as("doc_id")))
        .unionByName(tri.select(col("z").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("tri"))
      val deg = pairs.select(col("a_id").as("doc_id"))
        .unionByName(pairs.select(col("b_id").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      deg.join(tcnt, Seq("doc_id"), "left")
        .select(col("doc_id"), big(col("degree")).as("degree"),
          big(coalesce(col("tri"), lit(0L))).as("triangles"),
          big(when(col("degree") > 1,
            expr("(2 * coalesce(tri, CAST(0 AS BIGINT)) * 1000000)" +
              " DIV (degree * (degree - 1))")).otherwise(0L)).as("lcc_e6"))
        .orderBy("doc_id")
    },

    // Dataset card: the per-source curation profile a data team publishes
    // with a release — doc/token/language counts plus near-duplicate
    // exposure, joining the corpus scan with the SHARED verified ≥0.95
    // pair artifact (computed once per session, reused by q_ngram_jaccard
    // / q_dup_components / q_incremental_dedup — a real pipeline derives
    // every report from the same indexed artifact, not a re-scan).
    // Dup membership is a semi-join flag; the only float op is the final
    // dup fraction (one IEEE division of exact counts).
    Q("q_dataset_card",
      """WITH toks AS (
        |  SELECT doc_id, source, lang,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        |  FROM documents),
        |tset AS (
        |  SELECT doc_id, lang, list_distinct(t) AS s FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM tset a JOIN tset b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6)
        |        >= 0.95),
        |dup AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT a_id AS doc_id FROM pairs
        |    UNION ALL SELECT b_id FROM pairs))
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(t)) AS BIGINT) AS total_tokens,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(count(d.doc_id) AS BIGINT) AS dup_docs,
        |       round(CAST(count(d.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
        |         AS dup_frac
        |FROM toks LEFT JOIN dup d USING (doc_id)
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (spark, dir) =>
      val pairs = jaccardPairs(spark, dir)
      val dup = pairs.select(col("a_id").as("doc_id"))
        .unionByName(pairs.select(col("b_id").as("doc_id")))
        .distinct()
        .withColumn("is_dup", lit(1L))
      tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          big(size(DedupOps.tokens(lower(col("text"))))).as("n_toks"))
        .join(dup, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(big(count(lit(1))).as("n_docs"),
          big(sum(col("n_toks"))).as("total_tokens"),
          big(countDistinct(col("lang"))).as("n_langs"),
          big(count(col("is_dup"))).as("dup_docs"),
          round(count(col("is_dup")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType), 9).as("dup_frac"))
        .orderBy("source")
    },
  )
}
