package graft.queries

import graft.ops.{DedupOps, TextAnalysis, TextOps}
import graft.queries.Q._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-3 training-data curation operators: repetition-based quality
  * signals (the Gopher-style repetition rules), a cumulative quality-filter
  * funnel, BM25 relevance scoring, n-gram containment (partial-duplicate
  * detection — the directional counterpart of Jaccard near-dup), a
  * deterministic stratified sample, and sliding event-time windows (the
  * batch twin of a sliding streaming aggregation).
  *
  * Determinism rules (the repo-wide oracle-twin discipline, also stated in
  * SURVEY.md): thresholds
  * compare in INTEGER arithmetic wherever possible (`a*10 >= b*6` instead
  * of `a/b >= 0.6`), double aggregation goes through DECIMAL accumulators,
  * ratios round at scale 9 where no small-denominator tie exists, and every
  * ORDER BY ends in a unique non-null key.
  */
object QualityQueries {

  /** tokens of lower(text), empty strings dropped — the corpus-wide
    * tokenizer every operator here shares. */
  private def docToks(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), DedupOps.tokens(col("text")).as("t"))

  val all: Seq[Q] = Seq(

    // Gopher-style repetition signals: duplicate-token fraction and the
    // most-frequent-bigram fraction. Single scan + two hash aggregations
    // (per-doc bigram counts, then per-doc max) — the explode is linear in
    // corpus tokens and shuffles on doc_id only, so the shape survives any
    // scale-up; nothing is all-pairs.
    Q("q_repetition_ratio",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd
        |  FROM t WHERE len(toks) > 0),
        |grams AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |  FROM t, UNNEST(range(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top2 FROM gc GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
        |       round(CAST(b.n - b.nd AS DOUBLE) / CAST(b.n AS DOUBLE), 9)
        |         AS dup_token_ratio,
        |       round(coalesce(CAST(top.top2 AS DOUBLE) / CAST(b.n - 1 AS DOUBLE),
        |                      0.0), 9) AS top_bigram_frac,
        |       ((b.n - b.nd) * 10 > b.n * 8
        |        OR coalesce(top.top2 * 20 > (b.n - 1), false)) AS is_repetitive
        |FROM base b LEFT JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val t = docToks(spark, dir)
      val base = t.filter(size(col("t")) > 0)
        .select(col("doc_id"), size(col("t")).as("n"),
          size(array_distinct(col("t"))).as("nd"))
      val grams = t.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1)))).as("g"))
      val top = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top2"))
      base.join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), big(col("n")).as("n_tokens"),
          round((col("n") - col("nd")).cast(DoubleType) /
            col("n").cast(DoubleType), 9).as("dup_token_ratio"),
          round(coalesce(col("top2").cast(DoubleType) /
            (col("n") - 1).cast(DoubleType), lit(0.0)), 9).as("top_bigram_frac"),
          // thresholds compare in exact integer arithmetic (ratio > 0.8 ⟺
          // 10·dup > 8·n), immune to any float-rounding divergence
          ((col("n") - col("nd")) * 10 > col("n") * 8 ||
            coalesce(col("top2") * 20 > (col("n") - 1), lit(false)))
            .as("is_repetitive"))
        .orderBy("doc_id")
    },

    // Cumulative quality-filter funnel per language: how many documents
    // survive each successive curation rule. All rules are INTEGER
    // comparisons (punct_ratio < 0.1 ⟺ 10·punct < chars), so the funnel is
    // bit-deterministic across engines; one scan, one hash aggregation.
    Q("q_quality_funnel",
      """SELECT lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
        |       CAST(sum(CASE WHEN pass_len AND pass_punct THEN 1 ELSE 0 END) AS BIGINT)
        |         AS pass_punct,
        |       CAST(sum(CASE WHEN pass_len AND pass_punct AND pass_rep THEN 1 ELSE 0 END)
        |            AS BIGINT) AS pass_rep
        |FROM (
        |  SELECT lang,
        |         n_tok BETWEEN 10 AND 1000 AS pass_len,
        |         punct * 10 < n_char AS pass_punct,
        |         (n_tok - n_dis) * 10 <= n_tok * 8 AS pass_rep
        |  FROM (
        |    SELECT lang, length(text) AS n_char,
        |      len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok,
        |      len(list_distinct(list_filter(string_split(lower(text), ' '),
        |                                    x -> x <> ''))) AS n_dis,
        |      length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct
        |    FROM documents))
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (spark, dir) =>
      val toks = DedupOps.tokens(col("text"))
      val nTok = size(toks)
      val scored = tbl(spark, dir, "documents").select(col("lang"),
        (nTok >= 10 && nTok <= 1000).as("pass_len"),
        (graft.ops.TextAnalysis.punctCount(col("text")) * 10 <
          length(col("text"))).as("pass_punct"),
        ((nTok - size(array_distinct(toks))) * 10 <= nTok * 8).as("pass_rep"))
      def cum(c: Column, name: String) =
        big(sum(when(c, 1).otherwise(0))).as(name)
      scored.groupBy("lang").agg(
          big(count(lit(1))).as("n_docs"),
          cum(col("pass_len"), "pass_len"),
          cum(col("pass_len") && col("pass_punct"), "pass_punct"),
          cum(col("pass_len") && col("pass_punct") && col("pass_rep"), "pass_rep"))
        .orderBy("lang")
    },

    // BM25 relevance (k1=1.2, b=0.75) of every document against a fixed
    // query term set, with the log-free rational idf (N−df+0.5)/(df+0.5) —
    // ln() is the one libm call the two engines may round differently, and
    // a monotone-in-df substitute keeps the score fully deterministic
    // (documented engine deviation; the ranking behavior is the same).
    // Shapes: corpus stats are two scalar aggregates (broadcast), tf is a
    // hash aggregation over the exploded term stream filtered to the query
    // terms (the filter prunes the explode to ~|Q| rows per doc), and the
    // per-doc sum runs through a DECIMAL accumulator so partial-aggregation
    // order can never show through.
    Q("q_bm25",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |                                    x -> x <> '')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |          FROM dl),
        |qt AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE term IN ('join', 'hash', 'vector') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |       FROM tok WHERE term IN ('join', 'hash', 'vector') GROUP BY term),
        |scored AS (
        |  SELECT qt.doc_id,
        |         round((stats.n - df.df + 0.5) / (df.df + 0.5)
        |               * (CAST(qt.tf AS DOUBLE) * 2.2)
        |               / (CAST(qt.tf AS DOUBLE)
        |                  + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl))),
        |               12) AS s
        |  FROM qt JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id,
        |       round(CAST(sum(CAST(s AS DECIMAL(38,12))) AS DOUBLE), 6) AS bm25
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val queryTerms = Seq("join", "hash", "vector")
      val tok = tbl(spark, dir, "documents")
        .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("term"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        (sum(col("dl")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avgdl"))
      val qtok = tok.filter(col("term").isin(queryTerms: _*))
      val tf = qtok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // tf rows are the distinct (doc, term) pairs — df is a re-aggregation
      // of tf, not a second count-distinct pass over the token stream
      val df = tf.groupBy("term")
        .agg(count(lit(1)).cast(DoubleType).as("df"))
      val tfD = col("tf").cast(DoubleType)
      val dlD = col("dl").cast(DoubleType)
      // the double expression tree mirrors the oracle's operation order
      // exactly — same IEEE ops in the same order give identical bits
      val perTerm = round(
        (col("n") - col("df") + 0.5) / (col("df") + 0.5) * (tfD * 2.2) /
          (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * (dlD / col("avgdl")))), 12)
      tf.join(broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), perTerm.as("s"))
        .groupBy("doc_id")
        .agg(round(sum(col("s").cast(DecimalType(38, 12))).cast(DoubleType), 6)
          .as("bm25"))
        .orderBy("doc_id")
    },

    // Partial-duplicate detection: directional 5-gram containment
    // |A∩B|/|A| — the scale path for "is this document contained in
    // another" (Jaccard misses small-in-large duplication; containment is
    // the right asymmetry). A naive shingle inverted-index join is
    // Σ per-shingle df² — one boilerplate shingle with df=10⁶ yields 10¹²
    // candidates. Candidates therefore come from PPJoin-style PREFIX
    // FILTERING, which is lossless here: |A∩B| ≥ ⌈0.6·|A|⌉ forces B to hit
    // one of A's first |A|−⌈0.6·|A|⌉+1 shingles in a global canonical
    // order; ordering that canon by ascending document frequency pushes
    // high-df shingles out of prefixes, so the probe join is bounded by
    // rare-shingle frequencies instead of df². The prefix bound ⌈3n/5⌉
    // is computed in pure integers ((3n+4) div 5 — no 0.6 float). Exact
    // verification (sorted set intersection) runs on candidate pairs only;
    // the final threshold compares integer (shared·10 ≥ |A|·6).
    Q("q_ngram_containment",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS g
        |  FROM t, UNNEST(range(1, len(toks) - 3)) AS u(i)
        |  WHERE len(toks) >= 5),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT s.a_id, s.b_id,
        |       round(CAST(s.c AS DOUBLE) / CAST(za.n AS DOUBLE), 9) AS containment
        |FROM shared s JOIN sz za ON s.a_id = za.doc_id
        |WHERE s.c * 10 >= za.n * 6
        |ORDER BY a_id, b_id""".stripMargin) { (spark, dir) =>
      // CLONE COMPACTION (round-11): containment is a pure function of
      // the two shingle SETS, so docs group by raw text first and
      // everything downstream — df, canonical prefix order, probe join,
      // exact verification — runs over DISTINCT texts' sets
      // (the sf1 clone fixture measured the member-level probe join at
      // 7.4× for 10× data; compacted it is flat). df counts DISTINCT
      // sets rather than documents — losslessness of prefix filtering
      // needs only SOME globally consistent total order (pigeonhole on
      // |A∩B| ≥ ⌈0.6|A|⌉), not the document-frequency one, and exact
      // verification decides membership either way. Intra-group pairs
      // are containment 1.0 by construction (c = n); cross pairs expand
      // DIRECTIONALLY (A→B uses prefix(A)) so each directed rep pair
      // explodes to members(A) × members(B). Output identical; the
      // oracle keeps its member-level form.
      // docs group by RAW TEXT (identical text ⟹ identical shingle set;
      // one narrow shuffle of the text itself — grouping by the derived
      // shingle arrays measured ~5× heavier), tokens/shingles computed
      // once per distinct text
      val groups = tbl(spark, dir, "documents")
        .groupBy(col("text"))
        .agg(sort_array(collect_list(col("doc_id"))).as("members"))
        .select(col("members"), element_at(col("members"), 1).as("rep"),
          graft.ops.DedupOps.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("rep"), col("members"), col("t"))
        .localCheckpoint(true) // shingle build + both expansions
      // candidate plumbing runs on xxhash64 LONGS of the shingles, never
      // the ~30-byte strings: a hash collision merely adds a candidate
      // that exact STRING verification rejects
      val sh = groups
        .select(col("rep"), explode(transform(
          sequence(lit(1), size(col("t")) - 4),
          i => array_join(slice(col("t"), i, lit(5)), " "))).as("g"))
        .distinct()
        .withColumn("gh", xxhash64(col("g")))
        .localCheckpoint(true) // feeds df, the set build, AND the probe
      val df = sh.groupBy("gh").agg(count(lit(1)).as("df"))
      // canonical per-SET arrays, rarity first (df asc, gh tiebreak)
      val sets = sh.join(df, "gh")
        .groupBy("rep")
        .agg(sort_array(collect_list(struct(col("df"), col("gh"), col("g"))))
          .as("sgs"))
        .select(col("rep"),
          // round 16: the verification arrays are LEXICALLY sorted (the
          // rarity order only matters for the prefix, which reads ghs) so
          // the exact |A∩B| runs through the zero-allocation two-pointer
          // merge kernel instead of array_intersect's per-pair hash set —
          // the same swap that took q_minhash_calibration's verify stage
          // from 7.7 s to sub-second in round 15. Same distinct string
          // elements, same count, bit-identical output.
          sort_array(transform(col("sgs"), s => s.getField("g"))).as("gs"),
          transform(col("sgs"), s => s.getField("gh")).as("ghs"),
          size(col("sgs")).as("n"))
        .localCheckpoint(true) // three consumers, one computation
      // prefix length |A| − ⌈3|A|/5⌉ + 1, all-integer arithmetic
      val prefLen = col("n") - expr("(n * 3 + 4) DIV 5") + 1
      val aPrefix = sets.select(col("rep").as("a_rep"),
        explode(slice(col("ghs"), lit(1), prefLen)).as("gh"))
      val cands = aPrefix
        .join(sh.select(col("rep").as("b_rep"), col("gh")), "gh")
        .filter(col("a_rep") =!= col("b_rep"))
        .select("a_rep", "b_rep").distinct()
      val cross = cands
        .join(sets.select(col("rep").as("a_rep"), col("gs").as("ags"),
          col("n").as("an")), "a_rep")
        .join(sets.select(col("rep").as("b_rep"), col("gs").as("bgs")), "b_rep")
        .withColumn("c",
          graft.ops.expr.IntersectSortedCount.column(col("ags"), col("bgs")))
        .filter(col("c") * 10 >= col("an") * 6)
        .withColumn("containment",
          round(col("c").cast(DoubleType) / col("an").cast(DoubleType), 9))
        .join(groups.select(col("rep").as("a_rep"), col("members").as("am")),
          Seq("a_rep"))
        .join(groups.select(col("rep").as("b_rep"), col("members").as("bm")),
          Seq("b_rep"))
        .select(explode(col("am")).as("a_id"), col("bm"), col("containment"))
        .select(col("a_id"), explode(col("bm")).as("b_id"), col("containment"))
      // identical sets: c = n, threshold always passes, ratio exactly 1.0
      val intra = groups.filter(size(col("members")) > 1)
        .select(col("members"), explode(col("members")).as("a_id"))
        .select(col("a_id"), explode(col("members")).as("b_id"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), lit(1.0d).as("containment"))
      cross.unionByName(intra)
        .orderBy("a_id", "b_id")
    },

    // Exact substring-level duplication signal: 20-token windows (stride
    // 10) that recur across ≥2 documents mark memorization-grade overlap
    // that document-level Jaccard misses. Per-doc output: window count,
    // cross-doc duplicated window count, duplicated fraction. Shapes: the
    // window explode is linear in corpus tokens; the only shuffles are the
    // (window → distinct-doc count) hash agg and the join back — no pair
    // enumeration anywhere, so the pass scales like word-count, not like
    // dedup joins.
    Q("q_dup_spans",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+19], ' ') AS g
        |  FROM t, UNNEST(range(1, len(toks) - 18, 10)) AS u(i)
        |  WHERE len(toks) >= 20),
        |wc AS (SELECT g, count(*) AS nd FROM w GROUP BY g),
        |per AS (
        |  SELECT w.doc_id, count(*) AS nw,
        |         sum(CASE WHEN wc.nd >= 2 THEN 1 ELSE 0 END) AS ndup
        |  FROM w JOIN wc USING (g) GROUP BY w.doc_id)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_windows,
        |       CAST(ndup AS BIGINT) AS n_dup_windows,
        |       round(CAST(ndup AS DOUBLE) / CAST(nw AS DOUBLE), 9) AS dup_frac
        |FROM per
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val t = docToks(spark, dir)
      val w = t.filter(size(col("t")) >= 20)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - 19, lit(10)),
          i => array_join(slice(col("t"), i, lit(20)), " "))).as("g"))
        .distinct()
      val wc = w.groupBy("g").agg(count(lit(1)).as("nd"))
      w.join(wc, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nw"),
          sum(when(col("nd") >= 2, 1).otherwise(0)).as("ndup"))
        .select(col("doc_id"), big(col("nw")).as("n_windows"),
          big(col("ndup")).as("n_dup_windows"),
          round(col("ndup").cast(DoubleType) / col("nw").cast(DoubleType), 9)
            .as("dup_frac"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sample: k=20 per language, ranked by a pure
    // integer hash of the stable doc id (Knuth multiplicative mod a prime)
    // so replays — and both engines — elect identical rows. Per-stratum
    // window, partitioned by lang: no global sort, scales with strata.
    Q("q_sample_stratified",
      """SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY (doc_id * 2654435761) % 1000000007,
        |                                     doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20
        |ORDER BY lang, rn""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy((col("doc_id") * 2654435761L) % 1000000007L, col("doc_id"))
      tbl(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), big(row_number().over(w)).as("rn"))
        .filter(col("rn") <= 20)
        .orderBy("lang", "rn")
    },

    // Int8 scalar quantization of the embedding table with per-vector
    // reconstruction error — the compression pass an ANN index runs before
    // serving (4x memory cut for float32 corpora). Per-dimension min/max
    // are one hash aggregation over the exploded components; the 64-row
    // stats table broadcasts back; quantization uses floor(), which unlike
    // round() has no half-way ties to diverge on across engines. Errors
    // accumulate through DECIMAL so partial-agg order never shows.
    Q("q_vec_quantize",
      """WITH d AS (
        |  SELECT vec_id, CAST(v AS DOUBLE) AS vd, pos FROM (
        |    SELECT vec_id, unnest(embedding) AS v,
        |           generate_subscripts(embedding, 1) AS pos
        |    FROM embeddings)),
        |st AS (SELECT pos, min(vd) AS mn, max(vd) AS mx FROM d GROUP BY pos),
        |qz AS (
        |  SELECT d.vec_id, d.vd, st.mn, st.mx,
        |         CASE WHEN st.mx = st.mn THEN 0
        |              ELSE CAST(floor((d.vd - st.mn) / (st.mx - st.mn) * 255)
        |                        AS BIGINT) END AS q
        |  FROM d JOIN st USING (pos)),
        |err AS (
        |  SELECT vec_id,
        |         round(abs(vd - (mn + (CAST(q AS DOUBLE) / 255) * (mx - mn))), 12) AS e
        |  FROM qz)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
        |       round(CAST(sum(CAST(e AS DECIMAL(38,12))) AS DOUBLE), 6) AS abs_err
        |FROM err GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      val d = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos"),
          col("col").cast(DoubleType).as("vd"))
      val st = d.groupBy("pos").agg(min(col("vd")).as("mn"), max(col("vd")).as("mx"))
      // the expression order mirrors the oracle exactly: same IEEE ops in
      // the same order produce identical bits in both engines
      val q = when(col("mx") === col("mn"), lit(0L))
        .otherwise(floor((col("vd") - col("mn")) /
          (col("mx") - col("mn")) * 255).cast("long"))
      val dequant = col("mn") + (col("q").cast(DoubleType) / 255) *
        (col("mx") - col("mn"))
      d.join(broadcast(st), "pos")
        .withColumn("q", q)
        .select(col("vec_id"), round(abs(col("vd") - dequant), 12).as("e"))
        .groupBy("vec_id")
        .agg(big(count(lit(1))).as("n_dims"),
          round(sum(col("e").cast(DecimalType(38, 12))).cast(DoubleType), 6)
            .as("abs_err"))
        .orderBy("vec_id")
    },

    // Sliding event-time windows (10 min, slide 5 min): every event lands
    // in exactly two epoch-aligned windows. The batch twin of a sliding
    // streaming aggregation — Spark's native window() generator, one hash
    // aggregation on (window), no self-join. The oracle unnests the two
    // candidate bucket starts per event.
    Q("q_sliding_window",
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
        |                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
        |           AS ws,
        |         user_id, value
        |  FROM events)
        |GROUP BY ws
        |ORDER BY window_start""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(big(count(lit(1))).as("n"),
          big(countDistinct(col("user_id"))).as("n_users"),
          dsum(col("value")).as("total_value"))
        .select(tstr(col("w.start")).as("window_start"), col("n"),
          col("n_users"), col("total_value"))
        .orderBy("window_start")
    },

    // The END-TO-END curation pipeline as ONE plan — the integration query
    // that proves the individually-oracled stages compose: quality rules
    // (q_quality_funnel's) → exact dedup keeper (q_dedup_exact's norm
    // rule) → near-dup keep decision (drop the larger id of any verified
    // ≥0.95 pair whose smaller side survived exact dedup — the one-pass
    // canonical-min rule; consumes the SAME session-cached pair artifact
    // as every other pair query) → per-language token budget
    // (q_token_budget's longest-first admission). Output is the
    // per-language funnel a curation run reports: doc counts surviving
    // each stage and the finally-selected token mass. Every stage is a
    // window or equi-join on keys already proven engine-exact, so the
    // whole pipeline hash-matches.
    Q("q_curation_pipeline",
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok,
        |    len(list_distinct(list_filter(string_split(lower(text), ' '),
        |                                  x -> x <> ''))) AS n_dis,
        |    length(text) AS n_char,
        |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
        |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |flags AS (
        |  SELECT doc_id, lang, n_tok, norm,
        |         (n_tok BETWEEN 10 AND 1000) AND (punct * 10 < n_char)
        |         AND ((n_tok - n_dis) * 10 <= n_tok * 8) AS pass_q
        |  FROM scored),
        |e2 AS (
        |  SELECT doc_id, lang, n_tok FROM (
        |    SELECT doc_id, lang, n_tok,
        |           row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
        |    FROM flags WHERE pass_q) WHERE rn = 1),
        |toks AS (
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
        |drop3 AS (
        |  SELECT DISTINCT p.b_id AS doc_id
        |  FROM pairs p JOIN e2 ON p.a_id = e2.doc_id),
        |s3 AS (
        |  SELECT * FROM e2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
        |sel AS (
        |  SELECT lang, doc_id, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang
        |                          ORDER BY n_tok DESC, doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s3),
        |base AS (
        |  SELECT lang, count(*) AS n_docs,
        |         sum(CASE WHEN pass_q THEN 1 ELSE 0 END) AS n_quality
        |  FROM flags GROUP BY lang)
        |SELECT base.lang,
        |       CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(n_quality AS BIGINT) AS n_quality,
        |       CAST(coalesce(e.c, 0) AS BIGINT) AS n_exact,
        |       CAST(coalesce(s.c, 0) AS BIGINT) AS n_near,
        |       CAST(coalesce(z.c, 0) AS BIGINT) AS n_selected,
        |       CAST(coalesce(z.tk, 0) AS BIGINT) AS sel_tokens
        |FROM base
        |LEFT JOIN (SELECT lang, count(*) AS c FROM e2 GROUP BY 1) e USING (lang)
        |LEFT JOIN (SELECT lang, count(*) AS c FROM s3 GROUP BY 1) s USING (lang)
        |LEFT JOIN (SELECT lang, count(*) AS c, sum(n_tok) AS tk
        |           FROM sel WHERE cum <= 20000 GROUP BY 1) z USING (lang)
        |ORDER BY lang""".stripMargin) { (spark, dir) =>
      val toksC = DedupOps.tokens(col("text"))
      val nTok = size(toksC)
      // one scan computes every per-doc signal; pinned because the funnel
      // aggregation and the dedup window both consume it
      val flags = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), big(nTok).as("n_tok"),
          (nTok >= 10 && nTok <= 1000 &&
            TextAnalysis.punctCount(col("text")) * 10 < length(col("text")) &&
            (nTok - size(array_distinct(toksC))) * 10 <= nTok * 8).as("pass_q"),
          TextOps.normalizeText(col("text")).as("norm"))
        .localCheckpoint(true)
      val e2 = flags.filter(col("pass_q"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("norm").orderBy("doc_id")))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "n_tok")
        .localCheckpoint(true)
      val dropped = PipelineQueries.jaccardPairs(spark, dir)
        .select("a_id", "b_id")
        .join(e2.select(col("doc_id").as("a_id")), Seq("a_id"), "left_semi")
        .select(col("b_id").as("doc_id")).distinct()
      val s3 = e2.join(dropped, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val wBudget = Window.partitionBy("lang")
        .orderBy(col("n_tok").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sel = s3.withColumn("cum", sum(col("n_tok")).over(wBudget))
        .filter(col("cum") <= 20000)
      flags.groupBy("lang")
        .agg(big(count(lit(1))).as("n_docs"),
          big(sum(when(col("pass_q"), 1).otherwise(0))).as("n_quality"))
        .join(e2.groupBy("lang").agg(count(lit(1)).as("ec")), Seq("lang"), "left")
        .join(s3.groupBy("lang").agg(count(lit(1)).as("sc")), Seq("lang"), "left")
        .join(sel.groupBy("lang").agg(count(lit(1)).as("zc"),
          sum(col("n_tok")).as("ztk")), Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("n_quality"),
          big(coalesce(col("ec"), lit(0L))).as("n_exact"),
          big(coalesce(col("sc"), lit(0L))).as("n_near"),
          big(coalesce(col("zc"), lit(0L))).as("n_selected"),
          big(coalesce(col("ztk"), lit(0L))).as("sel_tokens"))
        .orderBy("lang")
    }
  )
}
