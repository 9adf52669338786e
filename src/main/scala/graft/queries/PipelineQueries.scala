package graft.queries

import graft.multimodal.Multimodal
import graft.ops.{DedupOps, Lsh, TextAnalysis, TextOps, VectorOps}
import graft.queries.Q._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Training-data pipeline operators (builder prompt + SURVEY.md §2.3 Group
  * B tail): deduplication (exact, MinHash+LSH, SimHash, token-set Jaccard,
  * embedding near-dup), similarity search (brute-force cosine top-k oracle
  * baseline, LSH-bucketed ANN scale path), text analysis (language ID,
  * quality score, token counts, fingerprints), multimodal columns.
  *
  * Scale notes: every pairwise operator goes through a blocking key (lang,
  * LSH band, simhash chunk, hyperplane bucket) so the join is an equi-join
  * on the block — never an all-pairs cross join; verification (true
  * Jaccard/cosine) runs only on bucket-collision candidates.
  */
object PipelineQueries {

  private def docTokens(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), DedupOps.tokenSet(col("text")).as("toks"))

  /** Exact-decimal L2 norm (deterministic across engines). */
  private def normExact(v: Column): Column = VectorOps.l2normExact(v)

  // ---- shared oracle-SQL fragments for the hyperplane-LSH family --------
  // DuckDB re-derives Lsh.fnvPlanesL from the same ASCII strings (HUGEINT
  // FNV-1a fold per character), quantizes every embedding component to
  // floor(x·2²⁴) — one exactly-replayable IEEE op — and then replays each
  // plane projection, bucket id, squared norm, and candidate cosine in pure
  // BIGINT arithmetic (graft.ops.expr.VecQuant's contract): bucket bits and
  // candidate sets match bit-for-bit, with no decimal folds on either side.

  /** `planes(p, d, comp)`: comp = fnv1a64("pl:salt:p:d") mod 15 − 7. */
  private[queries] def planesCte(salt: String, numPlanes: Int, dim: Int = 64): String =
    s"""planes AS (
       |  SELECT p, d,
       |    CAST(list_reduce(
       |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |        list_transform(list_filter(string_split(
       |            'pl:$salt:' || CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR),
       |            ''), c -> c <> ''),
       |          c -> CAST(ascii(c) AS HUGEINT))),
       |      (acc, x) -> (xor(acc, x) * 1099511628211)
       |                  % CAST(18446744073709551616 AS HUGEINT))
       |      % 15 AS BIGINT) - 7 AS comp
       |  FROM range(0, $numPlanes) tp(p), range(0, $dim) td(d))""".stripMargin

  /** `qe(vec_id, d, qx)`: quantized components floor(x·2²⁴), 0-indexed. */
  private[queries] val quantElemsCte: String =
    """qe AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 16777216.0)
      |              AS BIGINT) AS qx
      |  FROM embeddings)""".stripMargin

  /** `dots(vec_id, p, dp)`: integer plane projections Σ comp·qx. */
  private[queries] val quantDotsCte: String =
    """dots AS (
      |  SELECT v.vec_id, pl.p, CAST(sum(pl.comp * v.qx) AS BIGINT) AS dp
      |  FROM qe v JOIN planes pl ON v.d = pl.d
      |  GROUP BY v.vec_id, pl.p)""".stripMargin

  /** `qn(vec_id, q, n2)` (shared [[Q.quantNormsCte]], no extra columns). */
  private val quantNorms: String = quantNormsCte()

  /** PQ training replay (over `qe`): per-subspace seeds from the first k
    * vectors, one Lloyd iteration with floor(Σqx/count) updates, final
    * codes. Exposes `m1(s, c, i, m)` (trained codebooks), `dall(vec_id, s,
    * c, d2)` (all per-cell distances), `code(vec_id, s, c)` (assignments) —
    * the SQL twin of [[graft.ops.Pq.train]]/[[graft.ops.Pq.encode]] at
    * subspaces=8, subDim=8, k=16. */
  private val pqTrainCtes: String =
    """s8 AS (
      |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
      |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
      |m0 AS (SELECT q.d // 8 AS s, s8.c, q.d % 8 AS i, q.qx AS m
      |       FROM s8 JOIN qe q USING (vec_id)),
      |d0 AS (
      |  SELECT v.vec_id, m0.s, m0.c,
      |         CAST(sum((v.qx - m0.m)*(v.qx - m0.m)) AS BIGINT) AS d2
      |  FROM qe v JOIN m0 ON v.d // 8 = m0.s AND v.d % 8 = m0.i
      |  GROUP BY v.vec_id, m0.s, m0.c),
      |a0 AS (
      |  SELECT vec_id, s, c FROM (
      |    SELECT vec_id, s, c,
      |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
      |    FROM d0) WHERE rn = 1),
      |upd AS (
      |  SELECT a0.s, a0.c, v.d % 8 AS i,
      |         CAST(floor(CAST(sum(v.qx) AS DOUBLE)
      |                    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
      |  FROM a0 JOIN qe v ON a0.vec_id = v.vec_id AND v.d // 8 = a0.s
      |  GROUP BY a0.s, a0.c, i),
      |m1 AS (
      |  SELECT m0.s, m0.c, m0.i, coalesce(upd.m, m0.m) AS m
      |  FROM m0 LEFT JOIN upd
      |    ON m0.s = upd.s AND m0.c = upd.c AND m0.i = upd.i),
      |dall AS (
      |  SELECT v.vec_id, m1.s, m1.c,
      |         CAST(sum((v.qx - m1.m)*(v.qx - m1.m)) AS BIGINT) AS d2
      |  FROM qe v JOIN m1 ON v.d // 8 = m1.s AND v.d % 8 = m1.i
      |  GROUP BY v.vec_id, m1.s, m1.c),
      |code AS (
      |  SELECT vec_id, s, c FROM (
      |    SELECT vec_id, s, c,
      |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rn
      |    FROM dall) WHERE rn = 1)""".stripMargin

  /** IVF training replay (over `qe`), iv_-prefixed so it composes with
    * [[pqTrainCtes]] in one WITH: full-dim seeds from the first 16 vectors,
    * one Lloyd iteration with floor(Σqx/count) updates, final cell
    * assignment. Exposes `iv_m1(c, d, m)` (trained centroids),
    * `iv_dall(vec_id, c, d2)` (all vector↔centroid distances), `iv_idx
    * (neighbor_id, cluster)` — the SQL twin of [[graft.ops.Ivf.train]]/
    * [[graft.ops.Ivf.index]] at k=16, exact mode. */
  private val ivfTrainCtes: String =
    """iv_s AS (
      |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
      |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
      |iv_m0 AS (
      |  SELECT iv_s.c, v.d, v.qx AS m FROM iv_s JOIN qe v USING (vec_id)),
      |iv_d0 AS (
      |  SELECT v.vec_id, iv_m0.c,
      |         CAST(sum((v.qx - iv_m0.m)*(v.qx - iv_m0.m)) AS BIGINT) AS d2
      |  FROM qe v JOIN iv_m0 ON v.d = iv_m0.d
      |  GROUP BY v.vec_id, iv_m0.c),
      |iv_a0 AS (
      |  SELECT vec_id, c FROM (
      |    SELECT vec_id, c,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
      |    FROM iv_d0) WHERE rn = 1),
      |iv_upd AS (
      |  SELECT iv_a0.c, v.d,
      |         CAST(floor(CAST(sum(v.qx) AS DOUBLE)
      |                    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
      |  FROM iv_a0 JOIN qe v USING (vec_id) GROUP BY iv_a0.c, v.d),
      |iv_m1 AS (
      |  SELECT iv_m0.c, iv_m0.d, coalesce(iv_upd.m, iv_m0.m) AS m
      |  FROM iv_m0 LEFT JOIN iv_upd
      |    ON iv_m0.c = iv_upd.c AND iv_m0.d = iv_upd.d),
      |iv_dall AS (
      |  SELECT v.vec_id, iv_m1.c,
      |         CAST(sum((v.qx - iv_m1.m)*(v.qx - iv_m1.m)) AS BIGINT) AS d2
      |  FROM qe v JOIN iv_m1 ON v.d = iv_m1.d
      |  GROUP BY v.vec_id, iv_m1.c),
      |iv_idx AS (
      |  SELECT vec_id AS neighbor_id, c AS cluster FROM (
      |    SELECT vec_id, c,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
      |    FROM iv_dall) WHERE rn = 1)""".stripMargin

  /** NN-descent internal shortlist width: each round keeps the top-K
    * neighbors per node while the REPORTED graph is the final top-3 —
    * standard NN-descent practice (a wider working set gives each
    * neighbor-of-neighbor wave more bridges; measured recall@3 on the
    * fixtures: K=3/1 round 0.41, K=5/2 rounds ~0.8). */
  private val nnK = 5
  private val nnRounds = 2

  /** NN-descent replay chain shared by q_nn_descent / q_hubness: LSH seed
    * graph (8 tables × 6 planes, salt "nnd") → top-[[nnK]] per node →
    * [[nnRounds]] neighbor-of-neighbor waves, each exactly rescored — the
    * final ranked graph is exposed as `r1(vec_id, nb, sim, rn)`. The round
    * CTEs are GENERATED (same text per round, distinct suffixes), so the
    * SQL twin stays mechanically in lock-step with the Spark loop. */
  private lazy val nnDescentCtes: String = {
    def rankCte(from: String, out: String, gOut: String): String =
      s"""$out AS (
         |  SELECT vec_id, nb, sim,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY sim DESC, nb) AS rn
         |  FROM $from),
         |$gOut AS (SELECT vec_id, nb FROM $out WHERE rn <= $nnK)""".stripMargin
    val rounds = (1 to nnRounds).map { i =>
      // NN-descent propagates through the UNDIRECTED neighborhood (out ∪
      // reverse neighbors): reverse links are what carry information into
      // sparsely-bucketed nodes — directed nb-of-nb alone converges far
      // slower (measured recall@3 0.49 vs 0.9+ with reverse links)
      val (g, u, nonc, c, s) = (s"g${i - 1}", s"u$i", s"nonc$i", s"c$i", s"s$i")
      val (r, gOut) = (if (i == nnRounds) "r1" else s"rr$i", s"g$i")
      s"""$u AS (
         |  SELECT vec_id, nb FROM $g UNION SELECT nb, vec_id FROM $g),
         |$nonc AS (
         |  SELECT DISTINCT a.vec_id, b.nb
         |  FROM $u a JOIN $u b ON a.nb = b.vec_id
         |  WHERE b.nb <> a.vec_id),
         |$c AS (SELECT vec_id, nb FROM $u UNION SELECT vec_id, nb FROM $nonc),
         |$s AS (
         |  SELECT $c.vec_id, $c.nb, ${quantCosSql("q", "c")} AS sim
         |  FROM $c JOIN qn q ON $c.vec_id = q.vec_id
         |          JOIN qn c ON $c.nb = c.vec_id),
         |${rankCte(s, r, gOut)}""".stripMargin
    }.mkString(",\n")
    s"""${planesCte("nnd", 48)},
      |$quantElemsCte,
      |$quantDotsCte,
      |tk AS (SELECT vec_id, p // 6 AS t, p % 6 AS i, dp FROM dots),
      |keys AS (
      |  SELECT vec_id,
      |         CAST(sum(CASE WHEN dp >= 0
      |                       THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
      |              + (t << 6) AS BIGINT) AS bucket
      |  FROM tk GROUP BY vec_id, t),
      |cand AS (
      |  SELECT DISTINCT q.vec_id, c.vec_id AS nb
      |  FROM keys q JOIN keys c ON q.bucket = c.bucket
      |  WHERE c.vec_id <> q.vec_id),
      |$quantNorms,
      |s0 AS (
      |  SELECT cand.vec_id, cand.nb, ${quantCosSql("q", "c")} AS sim
      |  FROM cand JOIN qn q ON cand.vec_id = q.vec_id
      |            JOIN qn c ON cand.nb = c.vec_id),
      |${rankCte("s0", "r0", "g0")},
      |$rounds""".stripMargin
  }

  /** The refined per-doc top-3 kNN graph (vec_id, nb, sim, rn) after one
    * NN-descent round — the Spark twin of [[nnDescentCtes]], materialized
    * once per session ([[graft.util.SessionCache]]) because the index
    * build is the shared artifact q_nn_descent (the graph itself) and
    * q_hubness (its in-degree health) both report on. */
  private[queries] def nnDescentGraph(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.util.SessionCache.getOrMaterialize(spark, s"nn_descent:$dir") {
      val (tables, ppt) = (8, 6)
      val planes = Lsh.fnvPlanesL(tables * ppt, dim = 64, salt = "nnd")
      val base = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          quantN2(col("embedding")).as("n2"))
        .localCheckpoint(true) // bucket keys + both rescoring passes read it
      val keys = base.select(col("vec_id"),
        explode(Lsh.tableKeysQ(col("embedding"), planes, tables, ppt))
          .as("bucket"))
      def rescore(cand: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("nb"))
        cand
          .join(base.select(col("vec_id"), col("embedding").as("qv"),
            col("n2").as("qn2")), Seq("vec_id"))
          .join(base.select(col("vec_id").as("nb"), col("embedding").as("cv"),
            col("n2").as("cn2")), Seq("nb"))
          .withColumn("sim", quantCos(col("qv"), col("cv"), col("qn2"), col("cn2")))
          .withColumn("rn", big(row_number().over(w)))
          .filter(col("rn") <= nnK)
          .select("vec_id", "nb", "sim", "rn")
      }
      val seed = rescore(
        keys.join(keys.select(col("vec_id").as("nb"), col("bucket")), Seq("bucket"))
          .filter(col("nb") =!= col("vec_id"))
          .select("vec_id", "nb").distinct())
        .select("vec_id", "nb")
      (1 to nnRounds).foldLeft(seed) { (g, _) =>
        // the UNDIRECTED neighborhood (out ∪ reverse): reverse links carry
        // information into sparsely-bucketed nodes — see the SQL twin.
        // Checkpoint per round: both sides of the wedge join read it, and
        // the loop would otherwise stack logical plans
        val gc = g.select("vec_id", "nb")
        val u = gc.unionByName(
            gc.select(col("nb").as("vec_id"), col("vec_id").as("nb")))
          .distinct()
          .localCheckpoint(true)
        val nonc = u.select(col("vec_id"), col("nb").as("mid"))
          .join(u.select(col("vec_id").as("mid"), col("nb")), Seq("mid"))
          .filter(col("nb") =!= col("vec_id"))
          .select("vec_id", "nb")
        rescore(u.unionByName(nonc).distinct())
      }
    }

  /** Verified ≥0.95 token-set Jaccard near-dup pairs (a_id, b_id, jac),
    * materialized once per session ([[graft.util.SessionCache]]): the dedup
    * pair table is a pipeline artifact both q_ngram_jaccard and
    * q_dup_components consume — a real pipeline computes it once. The
    * banding/verification pipeline itself is [[DedupOps.nearDupPairs]]
    * (recall math, size prefilter, closed-vs-open-vocabulary payloads and
    * their equivalence proof documented there); the oracle recomputes the
    * exact pair set its own all-pairs way, so it does not depend on which
    * verification path ran. */
  private[queries] def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrMaterialize(spark, s"jaccard_pairs:$dir") {
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          DedupOps.sortedTokenSet(col("text")).as("toks"))
        // empty token sets all share the degenerate all-MaxValue signature:
        // within a lang they collide in every band and pass the 0>=0 size
        // prefilter, a quadratic candidate blob verification must drain.
        // They can never emit (0/0 Jaccard is null), so drop them up front.
        .filter(size(col("toks")) > 0)
      DedupOps.nearDupPairs(docs)
    }

  /** PQ codebooks for a fixture dir, trained once per process and shared by
    * q_pq_encode / q_pq_adc — the [[jaccardPairs]] principle for a
    * driver-side artifact: a real pipeline trains the quantizer once and
    * every encoder/searcher loads it. Keyed by dir only (fixture data is
    * immutable for the session); the value is subspaces·k·subDim longs. */
  private val pqCells =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[graft.ops.Pq.Cell]]()
  private def pqCodebooks(spark: SparkSession, dir: String): Seq[graft.ops.Pq.Cell] =
    pqCells.computeIfAbsent(dir, _ =>
      graft.ops.Pq.train(tbl(spark, dir, "embeddings"), "vec_id", "embedding",
        subspaces = 8, k = 16))

  /** The encoded corpus (vec_id, s, code) as a session artifact: a real
    * pipeline encodes once at index-build time and every searcher scans the
    * codes, never the floats — q_pq_encode emits this table, q_pq_adc and
    * q_ivf_pq join against it. Materialized via [[graft.util.SessionCache]]
    * (the encode expression is 128 inlined cell distances — worth compiling
    * and running exactly once per session). */
  private def pqCodes(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrMaterialize(spark, s"pq_codes:$dir") {
      graft.ops.Pq.encode(tbl(spark, dir, "embeddings"), "vec_id", "embedding",
        pqCodebooks(spark, dir), subspaces = 8, subDim = 8)
    }

  /** IVF coarse centroids (k=16, quantized-exact), trained once per fixture
    * dir and shared by q_ann_ivf / q_ivf_pq — the coarse quantizer is the
    * same session artifact class as the PQ codebooks. */
  private val ivfCells =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Seq[Double])]]()
  private def ivfCentroids(spark: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    ivfCells.computeIfAbsent(dir, _ =>
      graft.ops.Ivf.train(tbl(spark, dir, "embeddings"), "vec_id", "embedding",
        k = 16, exact = true))

  val all: Seq[Q] = Seq(

    // ---- deduplication ---------------------------------------------------

    Q("q_dedup_exact",
      """SELECT doc_id, CAST(dup_count AS BIGINT) AS dup_count FROM (
        |  SELECT doc_id,
        |         row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn,
        |         count(*) OVER (PARTITION BY norm) AS dup_count
        |  FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        |        FROM documents))
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val norm = TextOps.normalizeText(col("text"))
      val byNorm = Window.partitionBy(col("norm"))
      tbl(spark, dir, "documents")
        .select(col("doc_id"), norm.as("norm"))
        .withColumn("rn", row_number().over(byNorm.orderBy(col("doc_id"))))
        .withColumn("dup_count", big(count(lit(1)).over(byNorm)))
        .filter(col("rn") === 1)
        .select("doc_id", "dup_count")
        .orderBy("doc_id")
    },

    // Token-set Jaccard near-dup. Candidates come from MinHash band buckets
    // (16 salted-hash perms, 8 bands × 2 rows, lang folded into the bucket
    // key), NOT from a within-language all-pairs join — per-language blocking
    // is quadratic in corpus size, band buckets keep the join linear-ish.
    // At the 0.95 threshold a true pair misses all 8 bands with probability
    // (1 - 0.95²)⁸ ≈ 1e-8, so the band filter is recall-safe for the oracle,
    // which recomputes the exact pair set its own all-pairs way; survivors
    // are verified with exact popcount set-mask Jaccard.
    Q("q_ngram_jaccard",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents)
        |SELECT a_id, b_id, jac FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |               / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6) AS jac
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |WHERE jac >= 0.95
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      jaccardPairs(spark, dir).orderBy("a_id", "b_id")
    },

    // Cross-source contamination matrix — the dataset-release report next
    // to q_dataset_card: how many verified ≥0.95 near-dup pairs connect
    // each (source, source) combination, canonicalized so (a,b)=(b,a).
    // Within-source counts on the diagonal expose internal duplication;
    // off-diagonal cells expose sources scraping each other — the decision
    // input for which source to drop. Rides the SAME session-cached pair
    // artifact as q_ngram_jaccard/q_dup_components plus one broadcast-size
    // doc→source join; the oracle recomputes the exact pair set its own
    // all-pairs way.
    Q("q_source_overlap",
      """WITH toks AS (
        |  SELECT doc_id, lang, source,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.source AS sa, b.source AS sb
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |              / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6)
        |        >= 0.95)
        |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
        |       CAST(count(*) AS BIGINT) AS pairs
        |FROM pairs
        |GROUP BY 1, 2
        |ORDER BY source_a, source_b""".stripMargin) { (spark, dir) =>
      val src = tbl(spark, dir, "documents").select(col("doc_id"), col("source"))
      jaccardPairs(spark, dir)
        .join(broadcast(src.select(col("doc_id").as("a_id"),
          col("source").as("sa"))), "a_id")
        .join(broadcast(src.select(col("doc_id").as("b_id"),
          col("source").as("sb"))), "b_id")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(big(count(lit(1))).as("pairs"))
        .orderBy("source_a", "source_b")
    },

    // Incremental (batch-vs-corpus) near-dedup: the ingest-time shape —
    // flag each NEW document (doc_id % 5 ≠ 0 models the arriving batch)
    // that near-duplicates an EXISTING one (% 5 = 0), keeping the best
    // match. Consumes the same banded-and-verified pair artifact as
    // q_ngram_jaccard/q_dup_components (a real pipeline indexes the corpus
    // once and probes only the new batch against it); the per-new-doc
    // argmax is a partitioned window, never global.
    Q("q_incremental_dedup",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS n_id, b.doc_id AS e_id,
        |         round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |               / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE), 6) AS jac
        |  FROM toks a JOIN toks b
        |    ON a.lang = b.lang AND a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0),
        |hits AS (
        |  SELECT n_id, e_id, jac,
        |         row_number() OVER (PARTITION BY n_id
        |                            ORDER BY jac DESC, e_id) AS rn
        |  FROM pairs WHERE jac >= 0.95)
        |SELECT n_id AS doc_id, e_id AS dup_of, jac
        |FROM hits WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val p = jaccardPairs(spark, dir)
      val edges = p.select(col("a_id").as("x"), col("b_id").as("y"), col("jac"))
        .unionByName(
          p.select(col("b_id").as("x"), col("a_id").as("y"), col("jac")))
        .filter(col("x") % 5 =!= 0 && col("y") % 5 === 0)
      val w = Window.partitionBy(col("x"))
        .orderBy(col("jac").desc, col("y"))
      edges.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("x").as("doc_id"), col("y").as("dup_of"), col("jac"))
        .orderBy("doc_id")
    },

    // MinHash near-dup ESTIMATOR, ORACLE-CHECKED end to end: 16 FNV-1a
    // permutation hashes (fnv1a64("#p#" + token), leading salt — a linear
    // byte fold DuckDB replays per character in HUGEINT arithmetic),
    // output = every pair whose signatures agree on ≥15 of 16 permutations
    // (agreement/16 estimates Jaccard at ±1/16 resolution; the
    // exact-verified ≥0.95 surface is q_ngram_jaccard's contract). The
    // contract is a DETERMINISTIC function of the corpus — unlike banding
    // RECALL vs true Jaccard, which is probabilistic — so the oracle
    // recomputes every signature and every agreement count its own
    // all-pairs way and must match exactly. The Spark side never goes
    // all-pairs: candidates come from 2 bands × 8 rows — LOSSLESS for the
    // ≥15 floor by pigeonhole (≤1 disagreeing permutation cannot touch
    // both bands), the same argument as the simhash chunk blocking — and a
    // band-key hash collision only adds a candidate the agree-floor
    // verification rejects.
    Q("q_dedup_minhash",
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents
        |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), p ->
        |      list_min(
        |        list_transform(
        |          list_transform(t, tok ->
        |            list_reduce(
        |              list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                list_transform(
        |                  list_filter(string_split('#' || CAST(p AS VARCHAR) || '#' || tok,
        |                                           ''), c -> c <> ''),
        |                  c -> CAST(ascii(c) AS HUGEINT))),
        |              (acc, x) -> (xor(acc, x) * 1099511628211)
        |                          % CAST(18446744073709551616 AS HUGEINT))),
        |          h -> CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                    THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                    ELSE h END AS BIGINT)))) AS s
        |  FROM toks)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(len(list_filter(range(0, 16), i -> a.s[i+1] = b.s[i+1]))
        |            AS BIGINT) AS agree,
        |       CAST(len(list_filter(range(0, 16), i -> a.s[i+1] = b.s[i+1]))
        |            AS DOUBLE) / 16.0 AS est
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE len(list_filter(range(0, 16), i -> a.s[i+1] = b.s[i+1])) >= 15
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      val sigs = tbl(spark, dir, "documents")
        .select(col("doc_id"), DedupOps.tokenSet(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"),
          DedupOps.minhashSignatureFnv(col("toks"), 16).as("sig"))
      // IDENTICAL-SIGNATURE COMPACTION before the banded join: exact-dup
      // cliques (hundreds of members in this corpus) would otherwise sit in
      // one band bucket and pay a quadratic bucket×bucket join through the
      // shuffle. Grouping by signature first makes join volume a function
      // of DISTINCT signatures, not corpus multiplicity; clique-internal
      // pairs (agree = 16 by construction) and the member expansion of
      // group-level matches are pure explodes with no shuffle.
      // SessionCache persist (lineage kept), not localCheckpoint: the
      // group table feeds two consumers (intra pairs + banded join), and
      // a non-replicated checkpoint block is unrecoverable after an
      // executor loss at cluster scale — the persisted form rebuilds
      val groups = graft.util.SessionCache.getOrMaterialize(
        spark, s"mh_groups:$dir") {
        sigs.groupBy("sig")
          .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      }
      val n = size(col("members"))
      // within-group ordered pairs: members is sorted, so (m[i], m[j>i])
      // is already (a_id < b_id)
      val intra = groups.filter(n > 1)
        .select(explode(flatten(transform(
          sequence(lit(1), n - 1),
          i => transform(slice(col("members"), i + 1, n - i),
            b => struct(element_at(col("members"), i.cast("int")).as("a_id"),
              b.as("b_id")))))).as("p"))
        .select(col("p.a_id"), col("p.b_id"), lit(16L).as("agree"))
      // cross-group candidates: 2 bands × 8 rows over DISTINCT signatures —
      // lossless for the ≥15 floor (≤1 disagreeing permutation cannot touch
      // both bands); a band-key hash collision only adds a candidate the
      // agree floor rejects
      val banded = groups
        .withColumn("band", explode(DedupOps.bandKeys(col("sig"), 2, 8)))
        .withColumn("bh", xxhash64(col("band")))
      def side(p: String) = banded.select(col("members").as(s"${p}m"),
        col("sig").as(s"${p}_sig"), col("bh"))
      val cross = side("a").join(side("b"), "bh")
        // order group pairs by their (distinct) first members so each
        // unordered group pair appears once before the member expansion
        .filter(element_at(col("am"), 1) < element_at(col("bm"), 1))
        .select(col("am"), col("bm"),
          big(size(filter(zip_with(col("a_sig"), col("b_sig"),
            (x, y) => when(x === y, lit(1)).otherwise(lit(0))), v => v === 1)))
            .as("agree"))
        .filter(col("agree") >= 15 && col("agree") < 16)
        .dropDuplicates("am", "bm")
        .select(explode(col("am")).as("x"), col("bm"), col("agree"))
        .select(col("x"), explode(col("bm")).as("y"), col("agree"))
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"), col("agree"))
      intra.unionByName(cross)
        .withColumn("est", col("agree").cast(DoubleType) / lit(16.0d))
        .orderBy("a_id", "b_id")
    },

    // WEIGHTED near-dup detection: plain set Jaccard treats "spam spam
    // spam buy" and "spam buy analysis report" as similar; weighted
    // Jaccard Σmin(cₐ,c_b)/Σmax(cₐ,c_b) over token MULTIPLICITIES does
    // not. Implemented by the capped-multiplicity expansion (Chum et al.'s
    // histogram-intersection trick): token t with count c becomes the
    // distinct elements t~1..t~min(c,4), and weighted Jaccard (counts
    // capped at 4) becomes EXACT set Jaccard of the expansions — so the
    // whole verified MinHash-banding machinery (nearDupPairs: identical-
    // signature compaction, lossless 8×2 banding at the 0.95 floor,
    // mask/merge verification) is reused unchanged, and the oracle is the
    // all-pairs exact form over the same expansion. The occurrence index
    // comes from SORTING the tokens first: on a sorted list, occurrence =
    // position − first-occurrence position + 1, and first-occurrence is a
    // scan (list_position / array_position) with NO per-position array
    // allocation — the prefix-count formulation (len(filter(t[1:i],...)))
    // materializes O(len²) slice copies per document and measured 381 s
    // at sf0.1 vs sub-second for this form. O(len²) compares, bounded by
    // document length, never corpus size.
    Q("q_minhash_weighted",
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_sort(list_filter(string_split(lower(text), ' '),
        |                               x -> x <> '')) AS t
        |  FROM documents),
        |expd AS (
        |  SELECT doc_id, lang,
        |    list_sort(list_filter(
        |      list_transform(range(1, len(t)+1), i ->
        |        CASE WHEN i - list_position(t, t[i]) + 1 <= 4
        |             THEN t[i] || '~' ||
        |                  CAST(i - list_position(t, t[i]) + 1 AS VARCHAR)
        |             END),
        |      e -> e IS NOT NULL)) AS w
        |  FROM toks WHERE len(t) > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       round(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |             / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE), 6)
        |         AS wjac
        |FROM expd a JOIN expd b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE round(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |            / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE), 6)
        |      >= 0.95
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      // the expansion runs in the weighted_expand native kernel — one
      // hash-map pass per document instead of the HOF form's O(len²)
      // array_position scans (WeightedExpandSpec pins kernel ≡ HOF).
      // SessionCache persists the artifact (nearDupPairs reads it from
      // FIVE plans: vocab probe, two banding sides, two verify sides)
      // with lineage intact — an executor loss recomputes partitions
      // instead of failing the job as the previous localCheckpoint did.
      val expd = graft.util.SessionCache.getOrMaterialize(spark, s"wexpand:$dir") {
        tbl(spark, dir, "documents")
          .select(col("doc_id"), col("lang"),
            DedupOps.tokens(col("text")).as("t"))
          .filter(size(col("t")) > 0)
          .select(col("doc_id"), col("lang"),
            graft.ops.expr.WeightedExpand.column(col("t"), 4).as("toks"))
      }
      DedupOps.nearDupPairs(expd)
        .select(col("a_id"), col("b_id"), col("jac").as("wjac"))
        .orderBy("a_id", "b_id")
    },

    // The dedup DECISION step: detection queries emit pairs, this one
    // emits the curation action — per signature-identical group (all 16
    // MinHash permutations equal ⟹ near-certain duplicates), KEEP the
    // longest member (max n_chars; tie → smallest doc_id, an explicit rule
    // rather than an engine's unspecified arg_max tie-break) and name the
    // dropped ids. ORACLE-CHECKED: the oracle recomputes signatures from
    // per-character HUGEINT folds, groups, and applies the same rule.
    // Shapes: one hash agg by signature, then pure array ops — argmax via
    // array_max over (n_chars, -doc_id) structs (a nested `when` fold
    // would duplicate subtrees exponentially), never a window over an
    // array partition.
    Q("q_dedup_keep",
      """WITH toks AS (
        |  SELECT doc_id, n_chars,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents
        |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) > 0),
        |sig AS (
        |  SELECT doc_id, n_chars,
        |    array_to_string(list_transform(range(0, 16), p ->
        |      list_min(
        |        list_transform(
        |          list_transform(t, tok ->
        |            list_reduce(
        |              list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                list_transform(
        |                  list_filter(string_split('#' || CAST(p AS VARCHAR) || '#' || tok,
        |                                           ''), c -> c <> ''),
        |                  c -> CAST(ascii(c) AS HUGEINT))),
        |              (acc, x) -> (xor(acc, x) * 1099511628211)
        |                          % CAST(18446744073709551616 AS HUGEINT))),
        |          h -> CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                    THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                    ELSE h END AS BIGINT)))), ',') AS gk
        |  FROM toks),
        |w AS (
        |  SELECT gk, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY gk
        |                            ORDER BY n_chars DESC, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY gk) AS m
        |  FROM sig),
        |k AS (
        |  SELECT gk, doc_id AS keeper_id, CAST(n_chars AS BIGINT) AS kept_chars,
        |         CAST(m AS BIGINT) AS n_members
        |  FROM w WHERE rn = 1 AND m > 1),
        |dr AS (
        |  SELECT gk, array_to_string(list_sort(list(doc_id)), ',') AS dropped
        |  FROM w WHERE rn > 1 GROUP BY gk)
        |SELECT keeper_id, kept_chars, n_members, dropped
        |FROM k JOIN dr USING (gk)
        |ORDER BY keeper_id""".stripMargin) { (spark, dir) =>
      val groups = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          DedupOps.tokenSet(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("n_chars"),
          DedupOps.minhashSignatureFnv(col("toks"), 16).as("sig"))
        .groupBy("sig")
        .agg(collect_list(struct(col("n_chars"), col("doc_id"))).as("ms"))
        .filter(size(col("ms")) > 1)
      groups
        .withColumn("best", array_max(transform(col("ms"),
          m => struct(m.getField("n_chars").as("nc"),
            (m.getField("doc_id") * -1).as("nd")))))
        .select(
          big(col("best.nd") * -1).as("keeper_id"),
          big(col("best.nc")).as("kept_chars"),
          big(size(col("ms"))).as("n_members"),
          array_join(
            transform(
              array_sort(filter(
                transform(col("ms"), m => m.getField("doc_id")),
                d => d =!= col("best.nd") * -1)),
              _.cast("string")), ",").as("dropped"))
        .orderBy("keeper_id")
    },

    // 64-bit SimHash near-dup pairs, ORACLE-CHECKED end to end: signatures
    // use the FNV-1a token-hash variant (a linear byte fold DuckDB replays
    // per character in HUGEINT arithmetic; xxhash64's block mixing is not
    // practically re-expressible), so the oracle recomputes every
    // signature, every hamming distance, and the exact pair set its own
    // all-pairs way. The Spark side never goes all-pairs: candidates come
    // from 4×16-bit pigeonhole chunks — LOSSLESS at hamming ≤ 3 (3 flipped
    // bits cannot touch all 4 chunks) — and the verified distance is one
    // xor+popcount on the two longs riding the join. At larger corpora the
    // 16-bit chunk space saturates (~birthday at 10⁵ docs per language);
    // the scale move is wider chunks over multiple index tables (the
    // standard multi-index hamming scheme), same join shape.
    Q("q_dedup_simhash",
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_distinct(list_filter(string_split(lower(text), ' '),
        |                                   x -> x <> '')) AS t
        |  FROM documents
        |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) > 0),
        |th AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(t, tok ->
        |        list_reduce(
        |          list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |            list_transform(list_filter(string_split(tok, ''), c -> c <> ''),
        |              c -> CAST(ascii(c) AS HUGEINT))),
        |          (acc, x) -> (xor(acc, x) * 1099511628211)
        |                      % CAST(18446744073709551616 AS HUGEINT))),
        |      h -> CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                ELSE h END AS BIGINT)) AS hs
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), k ->
        |      CASE WHEN 2 * len(list_filter(hs, h -> ((h >> CAST(k AS BIGINT)) & 1) = 1))
        |                >= len(hs)
        |           THEN 1 ELSE 0 END) AS b
        |  FROM th)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(len(list_filter(range(0, 64), k -> a.b[k+1] <> b.b[k+1])) AS BIGINT)
        |         AS hamming
        |FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |WHERE len(list_filter(range(0, 64), k -> a.b[k+1] <> b.b[k+1])) <= 3
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      val sims = tbl(spark, dir, "documents")
        .select(col("doc_id"), DedupOps.tokenSet(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), DedupOps.simhashFnv(col("toks")).as("sim"))
      // IDENTICAL-SIGNATURE COMPACTION (round-11, the q_dedup_minhash
      // layer applied here): clone-heavy corpora put every copy of a doc
      // at the SAME simhash, so the member-level chunk join paid the
      // clone square through ~20 block-triple tables and the distinct
      // (sf1 measured 59× for 10× data). Grouping by signature first
      // makes chunk-join volume a function of DISTINCT signatures; the
      // chunk join is symmetric (both sides explode all keys), so every
      // member pair of a qualifying group pair qualifies — expansion is
      // a pure explode with least/greatest ordering. Intra-group pairs
      // are hamming 0 by construction. Output identical; the oracle
      // keeps its all-pairs form.
      // SessionCache persist (lineage kept), not localCheckpoint — same
      // executor-loss argument as the q_dedup_minhash group table
      val groups = graft.util.SessionCache.getOrMaterialize(
        spark, s"sh_groups:$dir") {
        sims.groupBy("sim")
          .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      }
      val n = size(col("members"))
      val intra = groups.filter(n > 1)
        .select(explode(flatten(transform(
          sequence(lit(1), n - 1),
          i => transform(slice(col("members"), i + 1, n - i),
            b => struct(element_at(col("members"), i.cast("int")).as("a_id"),
              b.as("b_id")))))).as("p"))
        .select(col("p.a_id"), col("p.b_id"), lit(0L).as("hamming"))
      // multi-index block-triple keys (lossless for hamming≤3, ~32-bit key
      // space): random-collision candidate volume stays sub-quadratic out
      // to 1e6-1e7 DISTINCT docs where single 16-bit chunks saturate
      // around 1e5 — the oracle is unaffected because candidates are
      // verified exactly
      val chunked = groups
        .withColumn("chunk", explode(DedupOps.simhashMultiKeys(col("sim"))))
      def side(p: String) = chunked.select(col("members").as(s"${p}m"),
        col("sim").as(s"${p}_sim"), col("chunk"))
      val cross = side("a").join(side("b"), "chunk")
        .filter(element_at(col("am"), 1) < element_at(col("bm"), 1))
        .select(col("am"), col("bm"),
          big(DedupOps.hamming(col("a_sim"), col("b_sim"))).as("hamming"))
        .filter(col("hamming") <= 3) // ≥1 implicit: distinct signatures
        .dropDuplicates("am", "bm")
        .select(explode(col("am")).as("x"), col("bm"), col("hamming"))
        .select(col("x"), explode(col("bm")).as("y"), col("hamming"))
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"), col("hamming"))
      intra.unionByName(cross)
        .orderBy("a_id", "b_id")
    },

    // Embedding near-dup: hyperplane buckets (multi-probe on one side),
    // candidates verified with quantized cosine. Planes are FNV-derived
    // integers (Lsh.fnvPlanesL) and every projection/norm/dot an exact long
    // sum over floor(x·2²⁴) components, so the oracle replays bucket
    // assignment, probe flips (bit XORs), the candidate join, and the
    // cosine verification — a full hash-match contract on the whole
    // LSH pipeline, not just a rows-only count.
    Q("q_dedup_embedding",
      s"""WITH ${planesCte("dd", 4)},
        |$quantElemsCte,
        |$quantDotsCte,
        |bl AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN dp >= 0
        |                       THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
        |              AS BIGINT) AS bucket
        |  FROM dots GROUP BY vec_id),
        |probes AS (
        |  SELECT vec_id, unnest(list_prepend(bucket,
        |    list_transform(range(0, 4),
        |      i -> xor(bucket, CAST(1 AS BIGINT) << i)))) AS bucket
        |  FROM bl),
        |pairs AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM probes a JOIN bl b
        |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |$quantNorms
        |SELECT a_id, b_id, cos FROM (
        |  SELECT p.a_id, p.b_id, ${quantCosSql("a", "b")} AS cos
        |  FROM pairs p JOIN qn a ON p.a_id = a.vec_id
        |               JOIN qn b ON p.b_id = b.vec_id)
        |WHERE cos >= 0.35
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      val planes = Lsh.fnvPlanesL(numPlanes = 4, dim = 64, salt = "dd")
      val e = tbl(spark, dir, "embeddings")
      // CLONE COMPACTION (round-11): buckets, probes, and cosines are
      // pure functions of the embedding, so the probe join runs over
      // DISTINCT vectors (sf1 measured the member-level join 48× for 10×
      // data — every clone pair re-paid the candidate shuffle and the
      // cosine). The probe join is ASYMMETRIC (only the a-side probes),
      // so a member pair (u, v) with u < v qualifies iff u's GROUP
      // probed v's group — both directed qualifications are kept per
      // unordered group pair and the member expansion filters on the
      // direction the smaller id belongs to. Output identical; the
      // oracle keeps its member-level form.
      // SessionCache persist (lineage kept), not localCheckpoint — the
      // frame feeds three plans (probe side, exact side, expansion) and
      // must survive executor loss at cluster scale
      val groups = graft.util.SessionCache.getOrMaterialize(
        spark, s"emb_groups:$dir") {
        e.groupBy(col("embedding"))
          .agg(sort_array(collect_list(col("vec_id"))).as("members"))
          .select(col("embedding"), col("members"),
            element_at(col("members"), 1).as("rep"),
            Lsh.bucketQ(col("embedding"), planes).as("bucket"),
            quantN2(col("embedding")).as("n2"))
      }
      // intra-group pairs: every clone pair shares its bucket (probes
      // prepend the unflipped bucket), so only the cos ≥ 0.35 predicate
      // decides — computed with the identical kernel (cos(v, v))
      val n = size(col("members"))
      val intra = groups.filter(n > 1)
        .withColumn("cos", quantCos(col("embedding"), col("embedding"),
          col("n2"), col("n2")))
        .filter(col("cos") >= 0.35)
        .select(explode(flatten(transform(
          sequence(lit(1), n - 1),
          i => transform(slice(col("members"), i + 1, n - i),
            b => struct(element_at(col("members"), i.cast("int")).as("a_id"),
              b.as("b_id")))))).as("p"), col("cos"))
        .select(col("p.a_id"), col("p.b_id"), col("cos"))
      val probed = groups.select(col("rep").as("a_rep"),
        explode(Lsh.probesQ(col("bucket"), planes.size)).as("bucket"))
      // directed candidates (a-group probed b-group), bare rep pairs
      val dirCand = probed
        .join(groups.select(col("rep").as("b_rep"), col("bucket")), Seq("bucket"))
        .filter(col("a_rep") =!= col("b_rep"))
        .select(col("a_rep"), col("b_rep"))
        .dropDuplicates("a_rep", "b_rep")
      val und = dirCand
        .select(least(col("a_rep"), col("b_rep")).as("lo"),
          greatest(col("a_rep"), col("b_rep")).as("hi"),
          (col("a_rep") < col("b_rep")).as("fw"))
        .groupBy("lo", "hi")
        .agg(max(when(col("fw"), 1).otherwise(0)).as("q_lo_hi"),
          max(when(!col("fw"), 1).otherwise(0)).as("q_hi_lo"))
      val cross = und
        .join(groups.select(col("rep").as("lo"), col("embedding").as("lv"),
          col("n2").as("ln2"), col("members").as("lm")), Seq("lo"))
        .join(groups.select(col("rep").as("hi"), col("embedding").as("hv"),
          col("n2").as("hn2"), col("members").as("hm")), Seq("hi"))
        .withColumn("cos", quantCos(col("lv"), col("hv"), col("ln2"), col("hn2")))
        .filter(col("cos") >= 0.35)
        .select(explode(col("lm")).as("x"), col("hm"),
          col("q_lo_hi"), col("q_hi_lo"), col("cos"))
        .select(col("x"), explode(col("hm")).as("y"),
          col("q_lo_hi"), col("q_hi_lo"), col("cos"))
        .filter((col("x") < col("y") && col("q_lo_hi") === 1) ||
          (col("y") < col("x") && col("q_hi_lo") === 1))
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"), col("cos"))
      intra.unionByName(cross)
        .orderBy("a_id", "b_id")
    },

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // deduplication as cluster-then-prune — assign every embedding to its
    // nearest IVF coarse centroid, compare pairs only WITHIN a cluster,
    // and of each ≥0.35-cosine pair drop the member closer to the centroid
    // (keeping the outlier preserves diversity, the paper's keep-low-
    // centroid-similarity rule; "closer" is the exact quantized L2 d², so
    // the decision is pure long arithmetic). The cluster partition is what
    // makes semantic dedup feasible at corpus scale: the quadratic is
    // bounded per cell (k grows with the corpus to cap cell sizes), and
    // the join is an equi-join on cluster id — never all-pairs. Training
    // and assignment reuse the session IVF centroids (deterministic seeds,
    // one exact Lloyd step), so DuckDB replays membership, d², every
    // within-cluster cosine, and each drop decision bit-for-bit.
    Q("q_semdedup",
      s"""WITH $quantElemsCte,
        |$ivfTrainCtes,
        |$quantNorms,
        |mem AS (
        |  SELECT i.neighbor_id AS vec_id, i.cluster, d.d2
        |  FROM iv_idx i JOIN iv_dall d
        |    ON i.neighbor_id = d.vec_id AND i.cluster = d.c),
        |pairs AS (
        |  SELECT x.cluster, x.vec_id, x.d2 AS xd2, y.vec_id AS y_id,
        |         y.d2 AS yd2, ${quantCosSql("a", "b")} AS sim
        |  FROM mem x JOIN mem y
        |    ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
        |  JOIN qn a ON x.vec_id = a.vec_id
        |  JOIN qn b ON y.vec_id = b.vec_id)
        |SELECT CAST(cluster AS BIGINT) AS cluster, vec_id,
        |       CAST(count(*) AS BIGINT) AS n_dups,
        |       CAST(max(CASE WHEN yd2 > xd2 OR (yd2 = xd2 AND y_id < vec_id)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped
        |FROM pairs WHERE sim >= 0.35
        |GROUP BY cluster, vec_id
        |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      val centroids = ivfCentroids(spark, dir)
      val e = tbl(spark, dir, "embeddings")
      // one argmin yields cluster AND its exact d² (array_min over
      // (d2, cid) structs — ties resolve to the lower cid, as iv_idx)
      val nearest = array_min(array(centroids.map { case (cid, c) =>
        struct(graft.ops.expr.VecQuant
          .dist2Column(col("embedding"), typedLit(c.map(_.toLong))).as("d2"),
          lit(cid).as("cluster"))
      }: _*))
      // CLONE COMPACTION (round-11, after the sf1 run measured the member-
      // level pair join 39× for 10× data on the clone fixture): cluster,
      // d², n², and every pairwise cosine are pure functions of the
      // embedding VALUES, so the within-cell quadratic runs over DISTINCT
      // vectors — one row per distinct embedding carrying its sorted
      // member list — and clone cliques never expand into pairs. The
      // per-member output stays linear: n_dups(x) = Σ m_b over qualifying
      // neighbor groups (+ m−1 for x's own clones), and the drop decision
      // decomposes exactly — (yd2 > xd2) is group-uniform, the yd2 = xd2
      // tie only needs the SMALLEST qualifying equal-d² neighbor id
      // (min member = that group's rep), and same-group pairs (d² equal,
      // sim = cos(v,v) — computed with the identical kernel so a
      // zero-norm NaN keeps its engine semantics) drop every member but
      // the group minimum. The oracle keeps its all-pairs form — output
      // is bit-identical. groupBy on the raw float array is exact
      // equality (Spark normalizes -0.0, invisible under quantization).
      val groups = graft.util.SessionCache
        .getOrMaterialize(spark, s"semdedup_groups:$dir") {
          e.groupBy(col("embedding"))
            .agg(sort_array(collect_list(col("vec_id"))).as("members"),
              count(lit(1)).as("mult"))
            .select(col("embedding"), col("members"), col("mult"),
              element_at(col("members"), 1).as("rep_id"),
              quantN2(col("embedding")).as("n2"),
              nearest.getField("cluster").as("cluster"),
              nearest.getField("d2").as("d2"))
        }
      val x = groups.select(col("cluster"), col("rep_id").as("a_rep"),
        col("d2").as("xd2"), col("embedding").as("xv"), col("n2").as("xn2"))
      val y = groups.select(col("cluster"), col("rep_id").as("b_rep"),
        col("mult").as("b_m"), col("d2").as("yd2"),
        col("embedding").as("yv"), col("n2").as("yn2"))
      val crossAgg = x.join(y, Seq("cluster"))
        .filter(col("a_rep") =!= col("b_rep"))
        .withColumn("sim", quantCos(col("xv"), col("yv"), col("xn2"), col("yn2")))
        .filter(col("sim") >= 0.35)
        .groupBy(col("a_rep"))
        .agg(sum(col("b_m")).as("cross_dups"),
          max(when(col("yd2") > col("xd2"), 1).otherwise(0)).as("any_greater"),
          min(when(col("yd2") === col("xd2"), col("b_rep"))).as("min_eq_id"))
      groups
        .withColumn("same_q", col("mult") > 1 &&
          quantCos(col("embedding"), col("embedding"),
            col("n2"), col("n2")) >= 0.35)
        .join(crossAgg, col("rep_id") === col("a_rep"), "left")
        .select(col("cluster"), col("members"), col("mult"), col("same_q"),
          col("cross_dups"), col("any_greater"), col("min_eq_id"),
          explode(col("members")).as("vec_id"))
        .withColumn("n_dups", coalesce(col("cross_dups"), lit(0L)) +
          when(col("same_q"), col("mult") - 1).otherwise(lit(0L)))
        .filter(col("n_dups") > 0)
        .withColumn("dropped",
          when(col("any_greater") === 1, 1)
            .when(col("min_eq_id") < col("vec_id"), 1)
            .when(col("same_q") &&
              col("vec_id") =!= element_at(col("members"), 1), 1)
            .otherwise(0))
        .select(big(col("cluster")).as("cluster"), col("vec_id"),
          big(col("n_dups")).as("n_dups"), big(col("dropped")).as("dropped"))
        .orderBy("vec_id")
    },

    // Top principal direction of the embedding cloud — one matrix-free
    // power-iteration step: w = Σᵢ (xᵢ−μ)·((xᵢ−μ)·v₀) computes C·v₀
    // without ever materializing the d×d covariance (the only shape that
    // survives d in the thousands). μ is the integer floor-mean of
    // quantized components; v₀ is the FNV-derived integer seed direction
    // (the hyperplane-LSH trick), so the per-vector projection s = (x−μ)·v₀
    // and the component accumulations are exact integers end to end —
    // accumulated in DECIMAL(38,0) (s reaches ~2³³ and component sums
    // ~2⁶⁶, past BIGINT at scale) and reported as floor(w/2²⁴), whose
    // double conversion is exactly-rounded and engine-identical. Two
    // bounded shuffles: the d-row μ aggregate and the d-row w aggregate.
    Q("q_pca_power",
      s"""WITH $quantElemsCte,
        |${planesCte("pca", 1)},
        |mu AS (
        |  SELECT d, CAST(floor(CAST(sum(qx) AS DOUBLE)
        |                       / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
        |  FROM qe GROUP BY d),
        |sc AS (
        |  SELECT q.vec_id, CAST(sum((q.qx - mu.m) * p.comp) AS BIGINT) AS s
        |  FROM qe q JOIN mu USING (d) JOIN planes p ON q.d = p.d
        |  GROUP BY q.vec_id),
        |w AS (
        |  SELECT q.d, sum(CAST(q.qx - mu.m AS HUGEINT) * sc.s) AS w
        |  FROM qe q JOIN mu USING (d) JOIN sc USING (vec_id)
        |  GROUP BY q.d)
        |SELECT CAST(w.d AS BIGINT) AS d, mu.m AS mu,
        |       CAST(floor(CAST(w.w AS DOUBLE) / 16777216.0) AS BIGINT)
        |         AS w_scaled
        |FROM w JOIN mu USING (d)
        |ORDER BY d""".stripMargin) { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
      val qv = transform(col("embedding"),
        x => floor(x.cast(DoubleType) * lit(graft.ops.expr.VecQuant.Scale))
          .cast(LongType))
      // the d-row mean is a bounded driver artifact (the Ivf.train
      // precedent): collect 64 longs, re-enter the plan as literals so the
      // projection and the outer product stay in-row expressions
      val mu: Seq[Long] = e
        .select(posexplode(qv).as(Seq("d", "qx")))
        .groupBy("d")
        .agg(floor(sum(col("qx")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).cast(LongType).as("m"))
        .orderBy("d").collect().map(_.getLong(1)).toSeq
      val v0: Seq[Long] = graft.ops.Lsh.fnvPlanesL(1, mu.size, "pca").head
      val centered = zip_with(qv, typedLit(mu), (a, b) => a - b)
      val s = aggregate(zip_with(centered, typedLit(v0), (a, b) => a * b),
        lit(0L), (acc, t) => acc + t)
      e.select(s.as("s"), posexplode(centered).as(Seq("d", "cx")))
        .groupBy("d")
        .agg(sum((col("cx") * col("s")).cast(DecimalType(38, 0))).as("w"))
        .select(big(col("d")).as("d"),
          element_at(typedLit(mu), col("d").cast("int") + 1).as("mu"),
          floor(col("w").cast(DoubleType) / lit(16777216.0)).cast(LongType)
            .as("w_scaled"))
        .orderBy("d")
    },

    // ---- similarity search ----------------------------------------------

    // Brute-force cosine top-k: oracle baseline. The 10-query side is
    // broadcast; candidates stream — no shuffle of the big side. Scoring
    // runs the quantized-integer contract (Q.quantCos), so sim values and
    // the ranking replay bit-for-bit in DuckDB.
    Q("q_cosine_topk",
      s"""WITH $quantNorms,
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ${quantCosSql("q", "c")} AS sim
        |  FROM qn q JOIN qn c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      // per-vector quantized norms computed once (the oracle divides by the
      // same precomputed sqrt), so only the dot product is per-pair work
      val e = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), quantN2(col("embedding")).as("n2"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("n2").as("qn2"))
      val cands = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), col("n2").as("cn2"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(queries)
        .join(cands, col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", quantCos(col("qv"), col("cv"), col("qn2"), col("cn2")))
        .withColumn("rn", big(row_number().over(w)))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id", "sim", "rn")
        .orderBy("query_id", "rn")
    },

    // Binary (1-bit) quantization + Hamming search: each 64-dim float
    // vector compresses 256× into two 32-bit sign words (bit i = component
    // i's quantized sign), and neighbor ranking is xor + popcount — the
    // binary-rerank first stage every memory-bound vector store ships.
    // The scan shape is q_cosine_topk's (broadcast 10 queries, corpus
    // streams, no shuffle of the big side) but each candidate costs 2
    // xors + 2 bit_counts instead of a 64-term dot — the reason this scan
    // survives at 100 TB where the float scan saturates memory bandwidth.
    // Packing by SUM of distinct powers (no carries ⟹ sum = bitwise or)
    // keeps both words in non-negative BIGINT range, so signatures AND
    // distances replay exactly; ranking ties break by neighbor id.
    Q("q_binary_ann",
      s"""WITH $quantElemsCte,
        |sig AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN qx >= 0 AND d < 32
        |                       THEN (CAST(1 AS BIGINT) << CAST(d AS INTEGER))
        |                       ELSE 0 END) AS BIGINT) AS lo,
        |         CAST(sum(CASE WHEN qx >= 0 AND d >= 32
        |                       THEN (CAST(1 AS BIGINT) << CAST(d - 32 AS INTEGER))
        |                       ELSE 0 END) AS BIGINT) AS hi
        |  FROM qe GROUP BY vec_id),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         CAST(bit_count(xor(q.lo, c.lo))
        |              + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming
        |  FROM sig q JOIN sig c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, hamming,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY hamming, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT query_id, neighbor_id, hamming, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      // sign word: zip 32 components with their power of two, keep the
      // power where the quantized component is non-negative, sum — distinct
      // powers never carry, so the sum stays < 2^32 and equals the or-fold
      def sigWord(v: Column, off: Int): Column =
        aggregate(
          zip_with(slice(v, off + 1, 32),
            typedLit((0 until 32).map(i => 1L << i)),
            (x, p) => when(
              floor(x.cast("double") * lit(graft.ops.expr.VecQuant.Scale)) >= 0,
              p).otherwise(lit(0L))),
          lit(0L), (acc, t) => acc + t)
      val sigs = tbl(spark, dir, "embeddings")
        .select(col("vec_id"),
          sigWord(col("embedding"), 0).as("lo"),
          sigWord(col("embedding"), 32).as("hi"))
      val queries = sigs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          col("lo").as("qlo"), col("hi").as("qhi"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming"), col("neighbor_id"))
      broadcast(queries)
        .join(sigs.select(col("vec_id").as("neighbor_id"), col("lo"), col("hi")),
          col("neighbor_id") =!= col("query_id"))
        .withColumn("hamming",
          big(bit_count(col("qlo").bitwiseXOR(col("lo")))
            + bit_count(col("qhi").bitwiseXOR(col("hi")))))
        .withColumn("rn", big(row_number().over(w)))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id", "hamming", "rn")
        .orderBy("query_id", "rn")
    },

    // LSH-bucketed ANN — the scale path: probe buckets on the query side,
    // equi-join on bucket, rank only collision candidates. FNV-derived
    // integer planes + quantized projections make the multi-table BIGINT
    // bucket keys, the candidate set, and the ranked output fully
    // oracle-replayable.
    Q("q_ann_lsh",
      s"""WITH ${planesCte("ann", 32)},
        |$quantElemsCte,
        |$quantDotsCte,
        |tk AS (SELECT vec_id, p // 4 AS t, p % 4 AS i, dp FROM dots),
        |keys AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN dp >= 0
        |                       THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |              + (t << 4) AS BIGINT) AS bucket
        |  FROM tk GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM keys q JOIN keys c ON q.bucket = c.bucket
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |$quantNorms,
        |scored AS (
        |  SELECT cand.query_id, cand.neighbor_id, ${quantCosSql("q", "c")} AS sim
        |  FROM cand JOIN qn q ON cand.query_id = q.vec_id
        |            JOIN qn c ON cand.neighbor_id = c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      // multi-table OR-construction (8 tables × 4 planes): recall@5 ≈ 0.75
      // on the fixture embeddings where single-table multi-probe measured
      // 0.20 (AnnRecallSpec pins the floor); both sides explode their table
      // keys, so the candidate join stays a bucket equi-join on longs
      val (tables, planesPerTable) = (8, 4)
      val planes = Lsh.fnvPlanesL(tables * planesPerTable, dim = 64, salt = "ann")
      val e = tbl(spark, dir, "embeddings")
      val n2 = quantN2(col("embedding"))
      val cands = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), n2.as("cn2"),
        explode(Lsh.tableKeysQ(col("embedding"), planes, tables, planesPerTable))
          .as("bucket"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          n2.as("qn2"),
          explode(Lsh.tableKeysQ(col("embedding"), planes, tables, planesPerTable))
            .as("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(queries)
        .join(cands, Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"),
          col("qn2"), col("cn2"))
        .dropDuplicates("query_id", "neighbor_id") // multi-probe dups out first
        .withColumn("sim", quantCos(col("qv"), col("cv"), col("qn2"), col("cn2")))
        .withColumn("rn", big(row_number().over(w)))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id", "sim", "rn")
        .orderBy("query_id", "rn")
    },

    // Index-quality report: recall@5 of the LSH ANN path against the exact
    // brute-force ranking, per query, as integer ppm — the number an ops
    // dashboard watches to decide when the index needs more tables or a
    // retrain (q_ivf_stats is the IVF-side counterpart). Both rankings are
    // already fully oracle-replayable, so their intersection is too; the
    // Spark side composes the two REGISTERED queries rather than
    // re-deriving either plan.
    Q("q_recall_at_k",
      s"""WITH ${planesCte("ann", 32)},
        |$quantElemsCte,
        |$quantDotsCte,
        |tk AS (SELECT vec_id, p // 4 AS t, p % 4 AS i, dp FROM dots),
        |keys AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN dp >= 0
        |                       THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |              + (t << 4) AS BIGINT) AS bucket
        |  FROM tk GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM keys q JOIN keys c ON q.bucket = c.bucket
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |$quantNorms,
        |scored AS (
        |  SELECT cand.query_id, cand.neighbor_id, ${quantCosSql("q", "c")} AS sim
        |  FROM cand JOIN qn q ON cand.query_id = q.vec_id
        |            JOIN qn c ON cand.neighbor_id = c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM scored),
        |ex_pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ${quantCosSql("q", "c")} AS sim
        |  FROM qn q JOIN qn c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ex_rank AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM ex_pairs),
        |hits AS (
        |  SELECT query_id, count(*) AS n_hits
        |  FROM (SELECT query_id, neighbor_id FROM ranked WHERE rn <= 5) a
        |  JOIN (SELECT query_id, neighbor_id FROM ex_rank WHERE rn <= 5) x
        |    USING (query_id, neighbor_id)
        |  GROUP BY 1),
        |qs AS (SELECT DISTINCT vec_id AS query_id FROM qn WHERE vec_id < 10)
        |SELECT query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        |       CAST(coalesce(n_hits, 0) * 200000 AS BIGINT) AS recall_ppm
        |FROM qs LEFT JOIN hits USING (query_id)
        |ORDER BY query_id""".stripMargin) { (spark, dir) =>
      val ann = graft.SparkEntry.queries("q_ann_lsh")(spark, dir)
        .select("query_id", "neighbor_id")
      val exact = graft.SparkEntry.queries("q_cosine_topk")(spark, dir)
        .select("query_id", "neighbor_id")
      val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      exact.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          big(coalesce(col("n_hits"), lit(0L))).as("n_hits"),
          big(coalesce(col("n_hits"), lit(0L)) * 200000).as("recall_ppm"))
        .orderBy("query_id")
    },

    // IVF-style ANN: coarse centroids from one distributed Lloyd iteration,
    // cluster-assignment index, queries probe their 4 nearest cells only —
    // the data-adaptive counterpart to the hyperplane-LSH path. Seeds are
    // deterministic (first k by id, quantized to floor(x·2²⁴)), distances
    // are exact long sums, and the centroid update re-quantizes
    // floor(Σqx/count) — one exactly-rounded IEEE divide — so DuckDB
    // replays the full train → index → probe → rank pipeline: assignment
    // as an integer argmin over the seed centroids, the centroid update as
    // unnest + group-by, and ranking as quantized cosine.
    Q("q_ann_ivf",
      s"""WITH $quantElemsCte,
        |s AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |m0 AS (SELECT s.c, v.d, v.qx AS m FROM s JOIN qe v USING (vec_id)),
        |d0 AS (
        |  SELECT v.vec_id, m0.c,
        |         CAST(sum((v.qx - m0.m)*(v.qx - m0.m)) AS BIGINT) AS d2
        |  FROM qe v JOIN m0 ON v.d = m0.d
        |  GROUP BY v.vec_id, m0.c),
        |a0 AS (
        |  SELECT vec_id, c FROM (
        |    SELECT vec_id, c,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        |    FROM d0) WHERE rn = 1),
        |upd AS (
        |  SELECT a0.c, v.d,
        |         CAST(floor(CAST(sum(v.qx) AS DOUBLE)
        |                    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
        |  FROM a0 JOIN qe v USING (vec_id) GROUP BY a0.c, v.d),
        |m1 AS (
        |  SELECT m0.c, m0.d, coalesce(upd.m, m0.m) AS m
        |  FROM m0 LEFT JOIN upd ON m0.c = upd.c AND m0.d = upd.d),
        |dall AS (
        |  SELECT v.vec_id, m1.c,
        |         CAST(sum((v.qx - m1.m)*(v.qx - m1.m)) AS BIGINT) AS d2
        |  FROM qe v JOIN m1 ON v.d = m1.d
        |  GROUP BY v.vec_id, m1.c),
        |idx AS (
        |  SELECT vec_id AS neighbor_id, c AS cluster FROM (
        |    SELECT vec_id, c,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        |    FROM dall) WHERE rn = 1),
        |qp AS (
        |  SELECT vec_id AS query_id, c AS cluster FROM (
        |    SELECT vec_id, c,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        |    FROM dall WHERE vec_id < 10) WHERE rn <= 4),
        |cand AS (
        |  SELECT qp.query_id, idx.neighbor_id
        |  FROM qp JOIN idx USING (cluster)
        |  WHERE idx.neighbor_id <> qp.query_id),
        |$quantNorms,
        |scored AS (
        |  SELECT cand.query_id, cand.neighbor_id, ${quantCosSql("q", "c")} AS sim
        |  FROM cand JOIN qn q ON cand.query_id = q.vec_id
        |            JOIN qn c ON cand.neighbor_id = c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, sim, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
      val n2 = quantN2(col("embedding"))
      val centroids = ivfCentroids(spark, dir)
      val indexed = graft.ops.Ivf.index(e, "vec_id", "embedding", centroids,
        exact = true)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
          n2.as("cn2"), col("cluster"))
      val queries = graft.ops.Ivf.probes(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            n2.as("qn2")),
        "query_id", "qv", centroids, nprobe = 4, exact = true)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(queries)
        .join(indexed, Seq("cluster"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          quantCos(col("qv"), col("cv"), col("qn2"), col("cn2")).as("sim"))
        .withColumn("rn", big(row_number().over(w)))
        .filter(col("rn") <= 5)
        .orderBy("query_id", "rn")
    },

    // Product quantization, the memory half of the IVF-PQ stack (see
    // graft.ops.Pq): per-subspace codebooks from one Lloyd iteration over
    // quantized sub-vectors, every vector encoded as 8 small code ids.
    // Deterministic seeds + integer distances + floor(Σqx/count) updates
    // make training AND the emitted codes fully oracle-replayable.
    Q("q_pq_encode",
      s"""WITH $quantElemsCte,
        |$pqTrainCtes
        |SELECT vec_id, CAST(s AS BIGINT) AS s, CAST(c AS BIGINT) AS code
        |FROM code
        |ORDER BY vec_id, s""".stripMargin) { (spark, dir) =>
      pqCodes(spark, dir)
        .select(col("vec_id"), big(col("s")).as("s"), big(col("code")).as("code"))
        .orderBy("vec_id", "s")
    },

    // Two-stage PQ search, the canonical billion-vector plan: (1) ADC — each
    // query precomputes its distance to all 128 (subspace, code) cells and a
    // candidate's approximate distance is sum-of-8-lookups over its codes;
    // the corpus side of this join carries CODES ONLY (8 small ints/vector,
    // ~30× smaller than the embeddings). (2) The top-20 ADC shortlist per
    // query is rescored with the EXACT quantized L2 distance (via the dot
    // identity d² = n²a + n²b − 2·a·b, still pure long arithmetic) — exact
    // work touches 4% of the corpus. Integer distances end to end, so both
    // stages hash-match the oracle with no float anywhere.
    Q("q_pq_adc",
      s"""WITH $quantElemsCte,
        |$pqTrainCtes,
        |qd AS (
        |  SELECT vec_id AS query_id, s, c AS code, d2
        |  FROM dall WHERE vec_id < 10),
        |adc AS (
        |  SELECT qd.query_id, code.vec_id AS neighbor_id,
        |         CAST(sum(qd.d2) AS BIGINT) AS adc_dist
        |  FROM code JOIN qd ON code.s = qd.s AND code.c = qd.code
        |  WHERE code.vec_id <> qd.query_id
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY adc_dist, neighbor_id) AS rn
        |    FROM adc) WHERE rn <= 20),
        |$quantNorms,
        |rescored AS (
        |  SELECT sl.query_id, sl.neighbor_id,
        |         CAST(a.n2 + b.n2
        |              - 2 * CAST(list_sum(list_transform(range(1, len(a.q)+1),
        |                    i -> a.q[i] * b.q[i])) AS BIGINT) AS BIGINT) AS l2_dist
        |  FROM shortlist sl JOIN qn a ON sl.query_id = a.vec_id
        |                    JOIN qn b ON sl.neighbor_id = b.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, l2_dist,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY l2_dist, neighbor_id) AS rn
        |  FROM rescored)
        |SELECT query_id, neighbor_id, l2_dist, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
      val cells = pqCodebooks(spark, dir)
      val codes = pqCodes(spark, dir)
        .select(col("vec_id").as("neighbor_id"), col("s"), col("code"))
      val qd = graft.ops.Pq.adcTable(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", "embedding", cells, subDim = 8)
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      val shortlist = codes
        .join(broadcast(qd), Seq("s", "code"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(sum(col("d2")).as("adc_dist"))
        .withColumn("rn", row_number().over(wAdc))
        .filter(col("rn") <= 20)
        .select("query_id", "neighbor_id")
      // rescore: the tiny (query_id, neighbor_id, query vector) shortlist
      // broadcasts; the corpus vector side STREAMS (never broadcast — it is
      // the 100TB column), and only shortlist members survive the join
      val qside = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          quantN2(col("embedding")).as("qn2"))
      val cside = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), quantN2(col("embedding")).as("cn2"))
      val wL2 = Window.partitionBy(col("query_id"))
        .orderBy(col("l2_dist"), col("neighbor_id"))
      broadcast(shortlist.join(broadcast(qside), Seq("query_id")))
        .join(cside, Seq("neighbor_id"))
        .withColumn("l2_dist",
          big(col("qn2") + col("cn2")
            - lit(2L) * graft.ops.expr.VecQuant.dotColumn(col("qv"), col("cv"))))
        .withColumn("rn", big(row_number().over(wL2)))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id", "l2_dist", "rn")
        .orderBy("query_id", "rn")
    },

    // IVF-PQ: the full billion-vector composite — the IVF coarse quantizer
    // (q_ann_ivf's centroids, shared session artifact) prunes the SEARCH
    // SPACE to the query's 4 nearest cells, and PQ codes (q_pq_encode's
    // table, same artifact both searchers scan) prune the BYTES: the ADC
    // join touches only code rows of vectors in probed cells, then the
    // exact quantized-L2 rescore touches only the top-20 shortlist. This is
    // the FAISS IVFx,PQy plan as three equi-joins: corpus (codes ⋈ cell
    // assignment) streams past the broadcast probe set, the broadcast
    // per-query ADC table scores survivors, and the broadcast shortlist
    // picks up exact distances from the streamed float column — at 100 TB
    // the floats are read once here, in the last (4%-selective) stage.
    // Every stage is the already-oracled integer arithmetic of its parts,
    // so the composite replays end-to-end: IVF CTEs get an iv_ prefix to
    // coexist with the PQ training CTEs in one WITH.
    Q("q_ivf_pq",
      s"""WITH $quantElemsCte,
        |$pqTrainCtes,
        |$ivfTrainCtes,
        |iv_qp AS (
        |  SELECT vec_id AS query_id, c AS cluster FROM (
        |    SELECT vec_id, c,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        |    FROM iv_dall WHERE vec_id < 10) WHERE rn <= 4),
        |cand AS (
        |  SELECT iv_qp.query_id, iv_idx.neighbor_id
        |  FROM iv_qp JOIN iv_idx USING (cluster)
        |  WHERE iv_idx.neighbor_id <> iv_qp.query_id),
        |qd AS (
        |  SELECT vec_id AS query_id, s, c AS code, d2
        |  FROM dall WHERE vec_id < 10),
        |adc AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |         CAST(sum(qd.d2) AS BIGINT) AS adc_dist
        |  FROM cand JOIN code ON code.vec_id = cand.neighbor_id
        |            JOIN qd ON qd.query_id = cand.query_id
        |                   AND qd.s = code.s AND qd.code = code.c
        |  GROUP BY 1, 2),
        |shortlist AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY adc_dist, neighbor_id) AS rn
        |    FROM adc) WHERE rn <= 20),
        |$quantNorms,
        |rescored AS (
        |  SELECT sl.query_id, sl.neighbor_id,
        |         CAST(a.n2 + b.n2
        |              - 2 * CAST(list_sum(list_transform(range(1, len(a.q)+1),
        |                    i -> a.q[i] * b.q[i])) AS BIGINT) AS BIGINT) AS l2_dist
        |  FROM shortlist sl JOIN qn a ON sl.query_id = a.vec_id
        |                    JOIN qn b ON sl.neighbor_id = b.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, l2_dist,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY l2_dist, neighbor_id) AS rn
        |  FROM rescored)
        |SELECT query_id, neighbor_id, l2_dist, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
      val centroids = ivfCentroids(spark, dir)
      val cells = pqCodebooks(spark, dir)
      // corpus side: code rows tagged with their IVF cell — 8 small ints +
      // a cluster id per vector, the only thing the ADC stage ever reads
      val corpus = pqCodes(spark, dir)
        .join(graft.ops.Ivf.index(e, "vec_id", "embedding", centroids,
            exact = true).select(col("vec_id"), col("cluster")),
          Seq("vec_id"))
        .select(col("vec_id").as("neighbor_id"), col("cluster"),
          col("s"), col("code"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val probes = graft.ops.Ivf.probes(queries, "query_id", "embedding",
        centroids, nprobe = 4, exact = true)
        .select("query_id", "cluster")
      val qd = graft.ops.Pq.adcTable(queries, "query_id", "embedding",
        cells, subDim = 8)
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      val shortlist = corpus
        .join(broadcast(probes), Seq("cluster"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(broadcast(qd), Seq("query_id", "s", "code"))
        .groupBy("query_id", "neighbor_id")
        .agg(sum(col("d2")).as("adc_dist"))
        .withColumn("rn", row_number().over(wAdc))
        .filter(col("rn") <= 20)
        .select("query_id", "neighbor_id")
      val qside = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          quantN2(col("embedding")).as("qn2"))
      val cside = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), quantN2(col("embedding")).as("cn2"))
      val wL2 = Window.partitionBy(col("query_id"))
        .orderBy(col("l2_dist"), col("neighbor_id"))
      broadcast(shortlist.join(broadcast(qside), Seq("query_id")))
        .join(cside, Seq("neighbor_id"))
        .withColumn("l2_dist",
          big(col("qn2") + col("cn2")
            - lit(2L) * graft.ops.expr.VecQuant.dotColumn(col("qv"), col("cv"))))
        .withColumn("rn", big(row_number().over(wL2)))
        .filter(col("rn") <= 5)
        .select("query_id", "neighbor_id", "l2_dist", "rn")
        .orderBy("query_id", "rn")
    },

    // ANN-accelerated MaxSim — the scale path q_maxsim (GroupC) keeps as
    // its exact contract: multi-table LSH keys on every TOKEN vector, a
    // (qdoc, cdoc) candidate prefilter from bucket collisions (a doc pair
    // survives iff ≥1 query token collides with ≥1 candidate token), then
    // exact MaxSim rescoring of survivors only — the candidate stream
    // never cross-joins. FNV integer planes + quantized long math make the
    // whole approximate pipeline (keys, candidate set, rescored ranking)
    // hash-match oracle-checkable, not merely recall-pinned.
    Q("q_maxsim_ann",
      s"""WITH ${planesCte("ms", 32)},
        |$quantElemsCte,
        |$quantDotsCte,
        |tk AS (SELECT vec_id, p // 4 AS t, p % 4 AS i, dp FROM dots),
        |keys AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN dp >= 0
        |                       THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |              + (t << 4) AS BIGINT) AS bucket
        |  FROM tk GROUP BY vec_id, t),
        |qk AS (SELECT DISTINCT vec_id // 4 AS qdoc, bucket
        |       FROM keys WHERE vec_id < 20),
        |ck AS (SELECT DISTINCT vec_id // 8 AS cdoc, bucket
        |       FROM keys WHERE vec_id >= 40),
        |cand AS (SELECT DISTINCT qk.qdoc, ck.cdoc FROM qk JOIN ck USING (bucket)),
        |$quantNorms,
        |qt AS (SELECT vec_id // 4 AS qdoc, q, n2
        |       FROM qn WHERE vec_id < 20),
        |cd AS (SELECT vec_id // 8 AS cdoc,
        |              list(struct_pack(v := q, n2 := n2)) AS toks
        |       FROM qn WHERE vec_id >= 40 GROUP BY 1),
        |pair AS (
        |  SELECT qt.qdoc, cand.cdoc,
        |         list_max(list_transform(cd.toks, t ->
        |           ${quantCosRawSql("qt.q", "qt.n2", "t.v", "t.n2")})) AS best
        |  FROM cand JOIN cd ON cand.cdoc = cd.cdoc
        |            JOIN qt ON cand.qdoc = qt.qdoc),
        |score AS (
        |  SELECT qdoc, cdoc,
        |         round(CAST(sum(CAST(best AS DECIMAL(38,15))) AS DOUBLE), 6) AS maxsim
        |  FROM pair GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qdoc, cdoc, maxsim,
        |         row_number() OVER (PARTITION BY qdoc
        |                            ORDER BY maxsim DESC, cdoc) AS rn
        |  FROM score)
        |SELECT qdoc, cdoc, maxsim, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 3
        |ORDER BY qdoc, rn""".stripMargin) { (spark, dir) =>
      val (tables, planesPerTable) = (8, 4)
      val planes = Lsh.fnvPlanesL(tables * planesPerTable, dim = 64, salt = "ms")
      val e = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), quantN2(col("embedding")).as("n2"))
      val qt = e.filter(col("vec_id") < 20)
        .select(expr("vec_id DIV 4").as("qdoc"), col("embedding").as("qv"),
          col("n2").as("qn2"))
      val ct = e.filter(col("vec_id") >= 40)
      // per-token keys, deduped per DOC before the join: the collision join
      // moves (doc, bucket) pairs only — token vectors stay out of it
      val qk = qt.select(col("qdoc"),
        explode(Lsh.tableKeysQ(col("qv"), planes, tables, planesPerTable))
          .as("bucket")).distinct()
      val ck = ct.select(expr("vec_id DIV 8").as("cdoc"),
        explode(Lsh.tableKeysQ(col("embedding"), planes, tables, planesPerTable))
          .as("bucket")).distinct()
      val cand = qk.join(ck, Seq("bucket")).select("qdoc", "cdoc").distinct()
      val cd = ct.groupBy(expr("vec_id DIV 8").as("cdoc"))
        .agg(collect_list(struct(col("embedding").as("v"), col("n2").as("n2")))
          .as("toks"))
      val w = Window.partitionBy(col("qdoc"))
        .orderBy(col("maxsim").desc, col("cdoc"))
      cand.join(cd, Seq("cdoc")).join(broadcast(qt), Seq("qdoc"))
        .withColumn("best", array_max(transform(col("toks"), t =>
          quantCosRaw(col("qv"), t.getField("v"), col("qn2"), t.getField("n2")))))
        .groupBy("qdoc", "cdoc")
        .agg(round(sum(col("best").cast(DecimalType(38, 15))).cast(DoubleType), 6)
          .as("maxsim"))
        .withColumn("rn", big(row_number().over(w)))
        .filter(col("rn") <= 3)
        .select("qdoc", "cdoc", "maxsim", "rn")
        .orderBy("qdoc", "rn")
    },

    // Per-label centroid: posexplode + exact-decimal mean per component —
    // the UDAF-shaped aggregation, expressed as a first-class hash agg.
    Q("q_vector_centroid",
      """SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
        |       round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS centroid
        |FROM (SELECT label, unnest(embedding) AS x,
        |             generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin) { (spark, dir) =>
      val dec = DecimalType(30, 12)
      tbl(spark, dir, "embeddings")
        .select(big(col("label")).as("label"), posexplode(col("embedding")))
        .select(col("label"), big(col("pos") + 1).as("pos"),
          col("col").cast(DoubleType).cast(dec).as("x"))
        .groupBy("label", "pos")
        // float-derived doubles can tie exactly at the decimal scale (and
        // Spark HALF_UPs where DuckDB half-evens), so the oracle contract
        // rounds the final mean to 6 decimals.
        .agg(round(sum(col("x")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("centroid"))
        .orderBy("label", "pos")
    },

    // Embedding drift matrix: pairwise cosine between per-label QUANTIZED
    // centroids — the monitoring query a vector pipeline runs per batch to
    // catch provider/model drift (a label pair whose centroid similarity
    // moves is re-embedded or quarantined). Centroid components are
    // floor(Σqx/count) integers (the IVF update step), so dots and norms
    // are exact long sums and the k×k matrix replays bit-for-bit. The
    // pairwise stage joins per-COMPONENT rows on d (an equi-join producing
    // k²·dim rows, trivially bounded by label count) — never a vector
    // cross join.
    Q("q_embedding_drift",
      s"""WITH $quantElemsCte,
        |cent AS (
        |  SELECT e.label, q.d,
        |         CAST(floor(CAST(sum(q.qx) AS DOUBLE)
        |                    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
        |  FROM qe q JOIN embeddings e USING (vec_id)
        |  GROUP BY e.label, q.d),
        |n2 AS (SELECT label, CAST(sum(m*m) AS BIGINT) AS n2 FROM cent GROUP BY 1),
        |dots AS (
        |  SELECT a.label AS la, b.label AS lb, CAST(sum(a.m*b.m) AS BIGINT) AS dp
        |  FROM cent a JOIN cent b ON a.d = b.d AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
        |       round(CAST(dp AS DOUBLE)
        |             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
        |             6) AS sim
        |FROM dots JOIN n2 na ON dots.la = na.label
        |          JOIN n2 nb ON dots.lb = nb.label
        |ORDER BY label_a, label_b""".stripMargin) { (spark, dir) =>
      val qe = tbl(spark, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("label"), col("d"),
          floor(col("x").cast(DoubleType) * lit(graft.ops.expr.VecQuant.Scale))
            .cast(LongType).as("qx"))
      // k×dim rows; pinned so the three consumers below don't re-scan the
      // embedding column
      val cent = qe.groupBy("label", "d")
        .agg(floor(sum(col("qx")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).cast(LongType).as("m"))
        .localCheckpoint(true)
      val n2 = cent.groupBy("label").agg(sum(col("m") * col("m")).as("n2"))
      cent.select(col("label").as("la"), col("d"), col("m").as("ma"))
        .join(cent.select(col("label").as("lb"), col("d"), col("m").as("mb")),
          Seq("d"))
        .filter(col("la") < col("lb"))
        .groupBy("la", "lb")
        .agg(sum(col("ma") * col("mb")).as("dp"))
        .join(n2.select(col("label").as("la"), col("n2").as("n2a")), "la")
        .join(n2.select(col("label").as("lb"), col("n2").as("n2b")), "lb")
        .select(big(col("la")).as("label_a"), big(col("lb")).as("label_b"),
          round(col("dp").cast(DoubleType) /
            (sqrt(col("n2a").cast(DoubleType)) * sqrt(col("n2b").cast(DoubleType))),
            6).as("sim"))
        .orderBy("label_a", "label_b")
    },

    // IVF index health: per-cell occupancy plus the FAISS imbalance factor
    // k·Σc²/N² (=1 for perfectly balanced cells; grows as cells skew) —
    // the stat that decides when to retrain the coarse quantizer or raise
    // nprobe. Scaled-integer everywhere (share and imbalance ×10⁶, floor
    // division), one bounded 1-row stats cross join (the q_bm25 scalar
    // shape). k counts OBSERVED (non-empty) cells, matching the index
    // table the searchers actually probe.
    Q("q_ivf_stats",
      s"""WITH $quantElemsCte,
        |$ivfTrainCtes,
        |cells AS (
        |  SELECT cluster, count(*) AS n_vectors FROM iv_idx GROUP BY 1),
        |tot AS (
        |  SELECT sum(n_vectors) AS n, sum(n_vectors*n_vectors) AS ss,
        |         count(*) AS k
        |  FROM cells)
        |SELECT CAST(cluster AS BIGINT) AS cluster,
        |       CAST(n_vectors AS BIGINT) AS n_vectors,
        |       CAST((n_vectors * 1000000) // n AS BIGINT) AS share_e6,
        |       CAST((k * ss * 1000000) // (n * n) AS BIGINT) AS imbalance_e6
        |FROM cells CROSS JOIN tot
        |ORDER BY cluster""".stripMargin) { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
      val cells = graft.ops.Ivf.index(e, "vec_id", "embedding",
        ivfCentroids(spark, dir), exact = true)
        .groupBy("cluster").agg(count(lit(1)).as("n_vectors"))
      val tot = cells.agg(sum(col("n_vectors")).as("n"),
        sum(col("n_vectors") * col("n_vectors")).as("ss"),
        count(lit(1)).as("k"))
      cells.crossJoin(broadcast(tot))
        .select(big(col("cluster")).as("cluster"),
          big(col("n_vectors")).as("n_vectors"),
          expr("CAST((n_vectors * 1000000) DIV n AS BIGINT)").as("share_e6"),
          expr("CAST((k * ss * 1000000) DIV (n * n) AS BIGINT)")
            .as("imbalance_e6"))
        .orderBy("cluster")
    },

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
      // is a plain count over tf — no second corpus explode, and the
      // count-distinct becomes a cheap re-aggregation of the tf shuffle
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(df, "term")
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
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint(true) // materialize the verified edge set once
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
      val pairs = jaccardPairs(spark, dir).select("a_id", "b_id")
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint(true)
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

    // NN-descent kNN-graph construction: seed a per-doc top-K shortlist
    // from LSH buckets (8 tables × 6 planes — wider buckets than
    // q_ann_lsh's 4 because EVERY doc queries here, and bucket width is
    // the knob that keeps the self-join sub-quadratic as n grows), then
    // run NN-descent rounds: a neighbor of my neighbor is my candidate —
    // rescore shortlist ∪ neighbor-of-neighbor exactly, keep the new
    // top-K (K=5 working width, 2 rounds; the reported graph is the final
    // top-3 — AnnRecallSpec pins recall@3 vs exact). This is how graph
    // ANN indexes (HNSW/NSG base layers) are built distributed: each
    // round is two equi-joins and a ranked agg, candidates stay O(n·k²),
    // and recall climbs round over round. Output is the refined graph for
    // the audit sample (vec_id % 10 = 0).
    Q("q_nn_descent",
      s"""WITH $nnDescentCtes
        |SELECT CAST(vec_id AS BIGINT) AS query_id, CAST(nb AS BIGINT) AS neighbor_id,
        |       sim, CAST(rn AS BIGINT) AS rn
        |FROM r1 WHERE rn <= 3 AND vec_id % 10 = 0
        |ORDER BY query_id, rn""".stripMargin) { (spark, dir) =>
      nnDescentGraph(spark, dir)
        .filter(col("vec_id") % 10 === 0 && col("rn") <= 3)
        .select(big(col("vec_id")).as("query_id"),
          big(col("nb")).as("neighbor_id"), col("sim"), col("rn"))
        .orderBy("query_id", "rn")
    },

    // Graph-based ANN SEARCH over the NN-descent k-NN graph — the HNSW
    // family's layer-0 beam search, the modality the brute/LSH/IVF/PQ
    // suite was missing: from a deterministic entry point (min vec_id),
    // 3 rounds of frontier expansion along the graph's out-edges, each
    // round exactly rescoring beam ∪ neighbors(beam) against the query
    // (quantized-integer cosine) and keeping the top-8 beam by
    // (sim DESC, id). Per round the work is one edge join keyed by the
    // beam's members + one rescore join — beam×outdeg candidates, never
    // a scan of the corpus; at 100 TB the graph artifact is the index
    // and each query touches O(rounds·beam·k) vectors. Every round is
    // CTE-replayed in the oracle (generated text, same per round), so
    // the search path — not just the graph build — is hash-matched.
    // Self-matches stay IN the beam (a corpus query's own out-edges are
    // its best frontier) and are dropped only from the reported top-3.
    Q("q_ann_graph", {
      val beamRounds = (1 to 3).map { i =>
        s"""bc$i AS (
           |  SELECT qid, nb FROM be${i - 1}
           |  UNION
           |  SELECT e.qid, g.nb FROM be${i - 1} e JOIN gb g ON g.src = e.nb),
           |bs$i AS (
           |  SELECT bc.qid, bc.nb, ${quantCosSql("q", "c")} AS sim
           |  FROM bc$i bc JOIN qn q ON bc.qid = q.vec_id
           |               JOIN qn c ON bc.nb = c.vec_id),
           |be$i AS (
           |  SELECT qid, nb FROM (
           |    SELECT qid, nb, row_number() OVER (PARTITION BY qid
           |                      ORDER BY sim DESC, nb) AS brn
           |    FROM bs$i) WHERE brn <= 8)""".stripMargin
      }.mkString(",\n")
      s"""WITH $nnDescentCtes,
         |gb AS (SELECT vec_id AS src, nb FROM r1 WHERE rn <= $nnK),
         |qq AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10),
         |be0 AS (
         |  SELECT qid, (SELECT min(vec_id) FROM embeddings) AS nb FROM qq),
         |$beamRounds
         |SELECT CAST(qid AS BIGINT) AS query_id, CAST(nb AS BIGINT) AS neighbor_id,
         |       sim, CAST(rnk AS BIGINT) AS rnk
         |FROM (
         |  SELECT qid, nb, sim, row_number() OVER (PARTITION BY qid
         |                         ORDER BY sim DESC, nb) AS rnk
         |  FROM bs3 WHERE nb <> qid)
         |WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin
    }) { (spark, dir) =>
      val g = nnDescentGraph(spark, dir).select(col("vec_id").as("src"), col("nb"))
      val base = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), quantN2(col("embedding")).as("n2"))
        .localCheckpoint(true) // rescored once per round, 3 rounds
      val queries = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("n2").as("qn2"))
        .localCheckpoint(true)
      val entry = base.agg(min(col("vec_id"))).head().getLong(0)
      def score(cand: org.apache.spark.sql.DataFrame) = cand
        .join(queries, Seq("qid"))
        .join(base.select(col("vec_id").as("nb"), col("embedding").as("cv"),
          col("n2").as("cn2")), Seq("nb"))
        .withColumn("sim", quantCos(col("qv"), col("cv"), col("qn2"), col("cn2")))
        .select("qid", "nb", "sim")
      val b0 = queries.select(col("qid"), lit(entry).as("nb"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nb"))
      val lastScored = (1 to 3).foldLeft((b0, b0.limit(0))) { case ((beam, _), _) =>
        val cand = beam.unionByName(
          beam.join(g, beam("nb") === g("src")).select(col("qid"), g("nb")))
          .distinct()
        val scored = score(cand).localCheckpoint(true) // beam + next round read it
        (scored.withColumn("brn", row_number().over(w)).filter(col("brn") <= 8)
          .select("qid", "nb"),
          scored)
      }._2
      lastScored.filter(col("nb") =!= col("qid"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(big(col("qid")).as("query_id"), big(col("nb")).as("neighbor_id"),
          col("sim"), big(col("rnk")).as("rnk"))
        .orderBy("query_id", "rnk")
    },

    // LSH index-health report: per hash table of the q_ann_lsh index —
    // occupied buckets, largest bucket, its ppm share of the table's
    // rows, and the candidate-pair volume Σ c·(c−1)/2 the bucket sizes
    // imply. This is the dashboard row that says "table 3's buckets
    // collapsed — add planes or re-salt" (q_ivf_stats is the IVF-side
    // counterpart, q_recall_at_k the quality side; this is the COST
    // side). ONE key materialization → (bucket) count agg → 8-row
    // per-table rollup; everything after the first agg is bucket-sized.
    Q("q_lsh_stats",
      s"""WITH ${planesCte("ann", 32)},
        |$quantElemsCte,
        |$quantDotsCte,
        |tk AS (SELECT vec_id, p // 4 AS t, p % 4 AS i, dp FROM dots),
        |keys AS (
        |  SELECT vec_id, t,
        |         CAST(sum(CASE WHEN dp >= 0
        |                       THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |              + (t << 4) AS BIGINT) AS bucket
        |  FROM tk GROUP BY vec_id, t),
        |bc AS (SELECT t, bucket, count(*) AS c FROM keys GROUP BY 1, 2)
        |SELECT CAST(t AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(sum(c) AS BIGINT) AS n_rows,
        |       CAST(max(c) AS BIGINT) AS max_bucket,
        |       CAST(1000000 * max(c) // sum(c) AS BIGINT) AS max_share_ppm,
        |       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs
        |FROM bc GROUP BY 1
        |ORDER BY t""".stripMargin) { (spark, dir) =>
      val (tables, ppt) = (8, 4)
      val planes = Lsh.fnvPlanesL(tables * ppt, dim = 64, salt = "ann")
      tbl(spark, dir, "embeddings")
        .select(posexplode(Lsh.tableKeysQ(col("embedding"), planes, tables, ppt))
          .as(Seq("t", "bucket")))
        .groupBy("t", "bucket").agg(count(lit(1)).as("c"))
        .groupBy("t")
        .agg(count(lit(1)).as("n_buckets"), sum("c").as("n_rows"),
          max("c").as("max_bucket"),
          expr("1000000 * max(c) div sum(c)").as("max_share_ppm"),
          sum(expr("c * (c - 1) div 2")).as("cand_pairs"))
        .select(big(col("t")).as("t"), big(col("n_buckets")).as("n_buckets"),
          big(col("n_rows")).as("n_rows"), big(col("max_bucket")).as("max_bucket"),
          big(col("max_share_ppm")).as("max_share_ppm"),
          big(col("cand_pairs")).as("cand_pairs"))
        .orderBy("t")
    },

    // Hubness profile of the NN-descent graph: the in-degree histogram of
    // the refined top-3 kNN graph — high-dimensional ANN's classic
    // pathology is a few "hub" vectors appearing in everyone's neighbor
    // list (they poison downstream kNN classification and dedup), while a
    // long zero-in-degree tail means those vectors are UNREACHABLE as
    // neighbors. One count agg over the SESSION-SHARED graph artifact
    // (built once, reported on by q_nn_descent and here) + a left join
    // from the id spine to keep the zero bucket honest.
    Q("q_hubness",
      s"""WITH $nnDescentCtes,
        |gsel AS (SELECT vec_id, nb FROM r1 WHERE rn <= 3),
        |ind AS (SELECT nb AS vec_id, count(*) AS in_deg FROM gsel GROUP BY 1),
        |nd AS (
        |  SELECT e.vec_id, coalesce(i.in_deg, 0) AS in_deg
        |  FROM embeddings e LEFT JOIN ind i ON e.vec_id = i.vec_id)
        |SELECT CAST(in_deg AS BIGINT) AS in_deg,
        |       CAST(count(*) AS BIGINT) AS n_nodes
        |FROM nd GROUP BY 1
        |ORDER BY in_deg""".stripMargin) { (spark, dir) =>
      val ind = nnDescentGraph(spark, dir)
        .filter(col("rn") <= 3) // the REPORTED graph, not the working set
        .groupBy(col("nb").as("vec_id")).agg(count(lit(1)).as("in_deg"))
      tbl(spark, dir, "embeddings").select(col("vec_id"))
        .join(ind, Seq("vec_id"), "left")
        .select(coalesce(col("in_deg"), lit(0L)).as("in_deg"))
        .groupBy("in_deg").agg(count(lit(1)).as("n_nodes"))
        .select(big(col("in_deg")).as("in_deg"), big(col("n_nodes")).as("n_nodes"))
        .orderBy("in_deg")
    }
  )
}
