package graft.queries

import graft.ops.{DedupOps, VectorOps}
import graft.queries.Q._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-12 third wave: release-planning statistics — the experiment
  * SIZING and corpus RELEASE-HYGIENE queries that close the loop the
  * Group AB/AC decision layer opened.
  *
  * `q_mde` is the experiment sizing primitive: the minimum detectable
  * absolute effect at α=0.05 / 80% power for the even/odd-cohort design
  * every A/B query here uses — read BEFORE q_ab_lift, not after.
  * `q_winsorized_lift` is q_ab_lift's robust companion: the lift after
  * exact-rank p5/p95 winsorization per arm (heavy-tail metrics move the
  * plain mean with a handful of rows; the trimmed lift is the sanity
  * check). `q_l_diversity` completes the privacy battery next to
  * q_k_anonymity: per (source, length-bucket) quasi-identifier class, the
  * count of distinct sensitive values (lang) — k-anonymous classes can
  * still be 1-diverse and leak the attribute. `q_stratified_kfold` is the
  * CV-split hygiene audit: deterministic 5-fold assignment by FNV hash
  * with per-(fold, lang) share — a fold whose language mix drifts from
  * the corpus invalidates cross-validation. `q_detector_length_bias`
  * extends the detector-evaluation family with the WHERE question: recall
  * of the MinHash detector per document-length bucket (short docs have
  * few tokens, so one differing token moves Jaccard a lot — the known
  * failure mode, measured). `q_broadcast_advisor` is the 100 TB planning
  * query: per-dimension-table byte estimates from the data itself, scaled
  * to the target corpus (world-bounded dimensions don't scale; entity
  * dimensions do), with the join-strategy recommendation the engine's own
  * TPC-H plans encode.
  */
object GroupAD {

  /** Exact-rank winsorization cut ranks (nearest-rank, no interpolation —
    * cut VALUES are picked from the data so both engines agree
    * bit-for-bit): p5 = rank (n−1)/20+1, p95 = rank (n−1)·19/20+1. */
  private val loRank = "(n - 1) div 20 + 1"
  private val hiRank = "((n - 1) * 19) div 20 + 1"

  val all: Seq[Q] = Seq(

    // Minimum detectable effect per event type for the even/odd-user
    // two-arm design: MDE = (z₀.₉₇₅ + z₀.₈)·√(σ²·(1/nₐ + 1/n_b)) with the
    // z-sum as the exact literal 2.801585 — the sizing number an
    // experimenter reads BEFORE shipping a treatment (an observed lift
    // below it is noise by construction). Variance from exact-decimal
    // moments (the q_cuped pattern); the √ is one exactly-rounded IEEE op,
    // so the double output hash-matches. One hash agg per type.
    Q("q_mde",
      """WITH e AS (
        |  SELECT event_type AS t, user_id % 2 AS arm, value FROM events),
        |s AS (
        |  SELECT t,
        |         count(CASE WHEN arm = 0 THEN 1 END) AS na,
        |         count(CASE WHEN arm = 1 THEN 1 END) AS nb,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
        |           AS sxx
        |  FROM e GROUP BY t)
        |SELECT t AS event_type,
        |       CAST(na AS BIGINT) AS n_even, CAST(nb AS BIGINT) AS n_odd,
        |       (sxx - sx * sx / n) / n AS variance,
        |       2.801585 * sqrt(((sxx - sx * sx / n) / n)
        |                       * (1.0 / CAST(na AS DOUBLE)
        |                          + 1.0 / CAST(nb AS DOUBLE))) AS mde_abs
        |FROM s ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val dec = DecimalType(25, 6)
      // scale 6, NOT 12, for the v² accumulator: v² ~ 1e4, and a scale-12
      // cast needs 16-17 significant digits — past the ~15 where Spark's
      // shortest-string double→decimal conversion and DuckDB's
      // exact-binary-expansion rounding can disagree in the last place
      // (measured on this very query)
      val wide = DecimalType(38, 6)
      val s = events(spark, dir)
        .select(col("event_type").as("t"),
          pmod(col("user_id"), lit(2L)).as("arm"), col("value"))
        .groupBy("t")
        .agg(count(when(col("arm") === 0, 1)).as("na"),
          count(when(col("arm") === 1, 1)).as("nb"),
          count(lit(1)).cast(DoubleType).as("n"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sx"),
          sum((col("value") * col("value")).cast(wide)).cast(DoubleType)
            .as("sxx"))
      val variance = (col("sxx") - col("sx") * col("sx") / col("n")) / col("n")
      s.select(col("t").as("event_type"),
        big(col("na")).as("n_even"), big(col("nb")).as("n_odd"),
        variance.as("variance"),
        (lit(2.801585) * sqrt(variance
          * (lit(1.0) / col("na").cast(DoubleType)
            + lit(1.0) / col("nb").cast(DoubleType)))).as("mde_abs"))
        .orderBy("event_type")
    },

    // Winsorized A/B lift: exact-rank p5/p95 per arm (the q_winsorize
    // nearest-rank convention — cut values PICKED from the data, both
    // engines bit-identical), clip, exact-decimal means, lift. The robust
    // companion q_ab_lift's plain mean needs: a handful of tail rows move
    // the untrimmed lift. Exact per-arm percentiles are one sort per arm
    // (2 partitions) — the irreducible cost of EXACT ranks, same contract
    // as q_winsorize's per-segment sorts; the approximate path at corpus
    // scale is q_percentiles' sketch.
    Q("q_winsorized_lift",
      s"""WITH r AS (
        |  SELECT user_id % 2 AS arm, value AS v, event_id,
        |         row_number() OVER (PARTITION BY user_id % 2
        |                            ORDER BY value, event_id) AS rn,
        |         count(*) OVER (PARTITION BY user_id % 2) AS n
        |  FROM events),
        |b AS (SELECT arm, n,
        |             min(CASE WHEN rn = ${loRank.replace("div", "//")} THEN v END) AS lo,
        |             min(CASE WHEN rn = ${hiRank.replace("div", "//")} THEN v END) AS hi
        |      FROM r GROUP BY arm, n),
        |w AS (
        |  SELECT r.arm AS arm, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN v < lo THEN 1 WHEN v > hi THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_clip,
        |         CAST(sum(CAST(CASE WHEN v < lo THEN lo WHEN v > hi THEN hi
        |                            ELSE v END AS DECIMAL(25,6))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS wmean
        |  FROM r JOIN b USING (arm) GROUP BY r.arm)
        |SELECT a.n AS n_even, o.n AS n_odd,
        |       a.n_clip AS n_clip_even, o.n_clip AS n_clip_odd,
        |       a.wmean AS wmean_even, o.wmean AS wmean_odd,
        |       a.wmean - o.wmean AS wlift
        |FROM (SELECT * FROM w WHERE arm = 0) a,
        |     (SELECT * FROM w WHERE arm = 1) o
        |ORDER BY n_even""".stripMargin) { (spark, dir) =>
      val byV = Window.partitionBy("arm").orderBy(col("v"), col("event_id"))
      val byArm = Window.partitionBy("arm")
      val r = events(spark, dir)
        .select(pmod(col("user_id"), lit(2L)).as("arm"),
          col("value").as("v"), col("event_id"))
        .withColumn("rn", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(byArm))
        .withColumn("lo",
          min(when(col("rn") === expr(loRank), col("v"))).over(byArm))
        .withColumn("hi",
          min(when(col("rn") === expr(hiRank), col("v"))).over(byArm))
      val clipped = when(col("v") < col("lo"), col("lo"))
        .when(col("v") > col("hi"), col("hi")).otherwise(col("v"))
      val w = r.groupBy("arm")
        .agg(big(count(lit(1))).as("n"),
          big(sum(when(col("v") < col("lo"), 1)
            .when(col("v") > col("hi"), 1).otherwise(0))).as("n_clip"),
          (sum(clipped.cast(DecimalType(25, 6))).cast(DoubleType)
            / count(lit(1)).cast(DoubleType)).as("wmean"))
      val a = w.filter(col("arm") === 0)
        .select(col("n").as("n_even"), col("n_clip").as("n_clip_even"),
          col("wmean").as("wmean_even"))
      val o = w.filter(col("arm") === 1)
        .select(col("n").as("n_odd"), col("n_clip").as("n_clip_odd"),
          col("wmean").as("wmean_odd"))
      a.crossJoin(broadcast(o))
        .select(col("n_even"), col("n_odd"), col("n_clip_even"),
          col("n_clip_odd"), col("wmean_even"), col("wmean_odd"),
          (col("wmean_even") - col("wmean_odd")).as("wlift"))
    },

    // l-diversity audit over the (source, 500-char length bucket)
    // quasi-identifier with lang as the sensitive attribute: per class,
    // row count and DISTINCT sensitive values — a k-anonymous class with
    // one language still discloses it (the classic k-anonymity gap this
    // completes, next to q_k_anonymity's generalization ladder). One
    // map-side-combining agg; the class table is bounded at any corpus
    // size (sources × length buckets).
    Q("q_l_diversity",
      """SELECT source, CAST(n_chars // 500 AS BIGINT) AS len_bucket,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(CASE WHEN count(DISTINCT lang) >= 3 THEN 1 ELSE 0 END
        |            AS BIGINT) AS diverse
        |FROM documents
        |GROUP BY source, n_chars // 500
        |ORDER BY source, len_bucket""".stripMargin) { (spark, dir) =>
      tbl(spark, dir, "documents")
        .groupBy(col("source"), expr("n_chars div 500").as("len_bucket"))
        .agg(big(count(lit(1))).as("n_rows"),
          big(countDistinct(col("lang"))).as("n_langs"))
        .withColumn("diverse",
          when(col("n_langs") >= 3, 1L).otherwise(0L))
        .orderBy("source", "len_bucket")
    },

    // Deterministic stratified 5-fold assignment audit: fold =
    // pmod(fnv1a64('kf:' ∥ doc_id ∥ ':'), 5) — replayable (5 does not
    // divide 2⁶⁴, so the oracle wraps the HUGEINT fold to signed and
    // replays pmod as ((h % 5) + 5) % 5, the documented modulus rule) —
    // with per-(fold, lang) counts and each fold's share of the language
    // in ppm. Cross-validation is only valid when every fold sees the
    // corpus mix; a share far from 200000 ppm flags assignment bias. One
    // hash agg + a bounded lang-margin join.
    Q("q_stratified_kfold",
      """WITH f AS (
        |  SELECT lang,
        |    CAST(((CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                THEN h - CAST(18446744073709551616 AS HUGEINT)
        |                ELSE h END % 5) + 5) % 5 AS BIGINT) AS fold
        |  FROM (
        |    SELECT lang,
        |      list_reduce(
        |        list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |          list_transform(
        |            list_filter(string_split('kf:' || CAST(doc_id AS VARCHAR)
        |                                     || ':', ''), c -> c <> ''),
        |            c -> CAST(ascii(c) AS HUGEINT))),
        |        (acc, x) -> (xor(acc, x) * 1099511628211)
        |                    % CAST(18446744073709551616 AS HUGEINT)) AS h
        |    FROM documents)),
        |c AS (SELECT fold, lang, count(*) AS n FROM f GROUP BY 1, 2),
        |m AS (SELECT lang, sum(n) AS lt FROM c GROUP BY 1)
        |SELECT c.fold AS fold, c.lang AS lang, CAST(c.n AS BIGINT) AS n,
        |       CAST((1000000 * CAST(c.n AS HUGEINT)) // m.lt AS BIGINT)
        |         AS share_ppm
        |FROM c JOIN m ON c.lang = m.lang
        |ORDER BY fold, lang""".stripMargin) { (spark, dir) =>
      val f = tbl(spark, dir, "documents")
        .select(col("lang"),
          pmod(VectorOps.fnv1a64(
            concat(lit("kf:"), col("doc_id").cast("string"), lit(":"))),
            lit(5L)).as("fold"))
      val c = f.groupBy("fold", "lang").agg(count(lit(1)).as("n"))
      val m = c.groupBy("lang").agg(sum(col("n")).as("lt"))
      c.join(m, Seq("lang"))
        .select(col("fold"), col("lang"), big(col("n")).as("n"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * n) div lt"))
            .as("share_ppm"))
        .orderBy("fold", "lang")
    },

    // Detector recall by document length: the exact ≥0.95-Jaccard truth
    // pairs bucketed by the two docs' mean DISTINCT-token count, with the
    // MinHash detector's catch rate per bucket — short documents are the
    // known MinHash failure mode (few tokens ⇒ one differing token moves
    // Jaccard a lot ⇒ the ≥15/16 agreement floor misses more), and this
    // measures WHERE the misses live instead of averaging them away
    // (q_detector_agreement reports the corpus-wide rate). Composes the
    // session artifacts (truth + minhash pair tables) with one bounded
    // token-count join — near-free after any dedup query has run.
    Q("q_detector_length_bias",
      s"""WITH ${GroupAB.detectorCtes},
        |tl AS (SELECT doc_id, len(t) AS tok FROM toks),
        |tr AS (
        |  SELECT least((a.tok + b.tok) // 8, 15) AS bucket,
        |         jp.a_id AS a_id, jp.b_id AS b_id
        |  FROM jp JOIN tl a ON jp.a_id = a.doc_id
        |          JOIN tl b ON jp.b_id = b.doc_id),
        |hit AS (
        |  SELECT tr.bucket,
        |         count(*) AS n_truth,
        |         count(mh.a_id) AS n_caught
        |  FROM tr LEFT JOIN mh ON tr.a_id = mh.a_id AND tr.b_id = mh.b_id
        |  GROUP BY tr.bucket)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(n_truth AS BIGINT) AS n_truth,
        |       CAST(n_caught AS BIGINT) AS n_caught,
        |       CAST((1000000 * CAST(n_caught AS HUGEINT)) // n_truth AS BIGINT)
        |         AS recall_ppm
        |FROM hit ORDER BY bucket""".stripMargin) { (spark, dir) =>
      val tl = tbl(spark, dir, "documents")
        .select(col("doc_id"), size(DedupOps.tokenSet(col("text"))).as("tok"))
        .filter(col("tok") > 0)
      val tr = PipelineQueries.jaccardPairs(spark, dir)
        .select(col("a_id"), col("b_id"))
        .join(tl.select(col("doc_id").as("a_id"), col("tok").as("ta")),
          Seq("a_id"))
        .join(tl.select(col("doc_id").as("b_id"), col("tok").as("tb")),
          Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          least(expr("(ta + tb) div 8"), lit(15L)).as("bucket"))
      val mh = PipelineDedup.minhashPairs(spark, dir)
        .select(col("a_id"), col("b_id")).withColumn("hit", lit(1))
      tr.join(mh, Seq("a_id", "b_id"), "left")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_caught"))
        .select(big(col("bucket")).as("bucket"),
          big(col("n_truth")).as("n_truth"),
          big(col("n_caught")).as("n_caught"),
          big(expr("(CAST(1000000 AS DECIMAL(38,0)) * n_caught) div n_truth"))
            .as("recall_ppm"))
        .orderBy("bucket")
    },

    // Join-strategy advisor from the data itself: per dimension table, an
    // exact byte estimate (8 bytes per numeric column + string lengths —
    // the same formula on both engines), scaled to the 100 TB target
    // (×1000 for entity dimensions; region/nation are WORLD-BOUNDED and
    // do not grow — exactly the distinction the engine's TPC-H plans
    // encode by broadcasting nation everywhere but shuffling customer in
    // q_tpch_q10), and the resulting strategy: broadcast under 100 MiB,
    // otherwise shuffle. Five single-table aggs over bounded outputs —
    // the planning query a 100 TB migration runs before setting hints.
    Q("q_broadcast_advisor",
      """WITH est AS (
        |  SELECT 'region' AS tbl, 0 AS grows, count(*) AS n,
        |         sum(8 + length(r_name)) AS bytes
        |  FROM region
        |  UNION ALL
        |  SELECT 'nation', 0, count(*),
        |         sum(16 + length(n_name))
        |  FROM nation
        |  UNION ALL
        |  SELECT 'customer', 1, count(*),
        |         sum(24 + length(c_name) + length(c_mktsegment))
        |  FROM customer
        |  UNION ALL
        |  SELECT 'supplier', 1, count(*),
        |         sum(24 + length(s_name))
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'part', 1, count(*),
        |         sum(24 + length(p_name) + length(p_brand) + length(p_type))
        |  FROM part)
        |SELECT tbl AS table_name, CAST(n AS BIGINT) AS n_rows,
        |       CAST(bytes AS BIGINT) AS est_bytes,
        |       CAST(CASE WHEN grows = 1 THEN bytes * 1000 ELSE bytes END
        |            AS BIGINT) AS est_bytes_sf1000,
        |       CASE WHEN (CASE WHEN grows = 1 THEN bytes * 1000 ELSE bytes END)
        |                 < 104857600
        |            THEN 'broadcast' ELSE 'shuffle' END AS strategy
        |FROM est ORDER BY table_name""".stripMargin) { (spark, dir) =>
      def est(table: String, grows: Boolean, fixed: Int,
              strCols: Seq[String]): DataFrame =
        tbl(spark, dir, table).agg(
          count(lit(1)).as("n"),
          sum(strCols.map(c => length(col(c)))
            .foldLeft(lit(fixed).cast("long"))(_ + _)).as("bytes"))
          .select(lit(table).as("table_name"),
            lit(if (grows) 1L else 0L).as("grows"), col("n"), col("bytes"))
      val frames = Seq(
        est("region", grows = false, 8, Seq("r_name")),
        est("nation", grows = false, 16, Seq("n_name")),
        est("customer", grows = true, 24, Seq("c_name", "c_mktsegment")),
        est("supplier", grows = true, 24, Seq("s_name")),
        est("part", grows = true, 24, Seq("p_name", "p_brand", "p_type")))
      frames.reduce(_.unionByName(_))
        .withColumn("est_bytes_sf1000",
          when(col("grows") === 1, col("bytes") * 1000).otherwise(col("bytes")))
        .select(col("table_name"), big(col("n")).as("n_rows"),
          big(col("bytes")).as("est_bytes"),
          big(col("est_bytes_sf1000")).as("est_bytes_sf1000"),
          when(col("est_bytes_sf1000") < 104857600L, "broadcast")
            .otherwise("shuffle").as("strategy"))
        .orderBy("table_name")
    }
  )
}
