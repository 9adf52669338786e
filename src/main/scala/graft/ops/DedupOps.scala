package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication primitives for large-scale training-data pipelines, built
  * from codegen'd built-ins so they scale as ordinary Catalyst plans:
  * exact (normalized-hash groupBy), MinHash+LSH banding (shingle → minhash →
  * band → bucket equi-join — the shuffle is on band keys, never all-pairs),
  * SimHash (hamming blocks via pigeonhole chunks), and token-set Jaccard.
  */
object DedupOps {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct token set (Jaccard/MinHash input). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Sorted distinct token set — the input contract of the open-vocabulary
    * merge-Jaccard kernel ([[jaccardSorted]]). */
  def sortedTokenSet(text: Column): Column = array_sort(tokenSet(text))

  /** Exact Jaccard of two sorted distinct string arrays in one native merge
    * pass (no per-pair hash sets or intermediate arrays, no vocabulary
    * cap); integer-identical to [[jaccard]] and to the set-mask popcount
    * form. See [[graft.ops.expr.JaccardSorted]]. */
  def jaccardSorted(a: Column, b: Column): Column =
    graft.ops.expr.JaccardSorted.column(a, b)

  /** Token-set Jaccard similarity, computed as exact integer set sizes
    * divided in double (engine-deterministic). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash signature: `numHashes` permutations simulated by salted
    * xxhash64; signature element i = min over tokens of hash_i(token).
    * Native one-pass kernel ([[graft.ops.expr.MinHashSig]]);
    * [[minhashSignatureHof]] keeps the built-in formulation as its
    * executable specification. */
  def minhashSignature(toks: Column, numHashes: Int): Column =
    graft.ops.expr.MinHashSig.column(toks, numHashes)

  /** [[minhashSignature]] with FNV-1a permutation hashes
    * ([[graft.ops.expr.MinHashSigFnv]]) — the cross-engine-checkable
    * variant: an external SQL engine replays `fnv1a64("#p#" + token)` per
    * character and reproduces the signature exactly. */
  def minhashSignatureFnv(toks: Column, numHashes: Int): Column =
    graft.ops.expr.MinHashSig.fnvColumn(toks, numHashes)

  /** The HOF reference formulation of [[minhashSignature]]: `numHashes`
    * array traversals, each `array_min(transform(..., xxhash64(t, i)))`.
    * Kept as the equivalence oracle for the native expression. */
  def minhashSignatureHof(toks: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(toks, t => xxhash64(t, lit(i))))
    }: _*)

  /** LSH band keys: signature split into `numBands` rows-per-band groups;
    * two documents collide in a band iff that band's slice matches exactly.
    * Key embeds the band index so buckets of different bands never join. */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      concat_ws(":", lit(b),
        array_join(transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
          x => x.cast("string")), ","))
    }: _*)

  /** 64-bit SimHash over a token array: bit k is set iff the sum over tokens
    * of ±1 (sign from bit k of the token's hash) is non-negative. Native
    * codegen'd kernel ([[graft.ops.expr.SimHash64]]); [[simhashHof]] keeps
    * the built-in-HOF formulation as its executable specification. */
  def simhash(toks: Column): Column = graft.ops.expr.SimHash64.column(toks)

  /** [[simhash]] with FNV-1a 64 token hashing ([[graft.ops.expr.SimHashFnv64]])
    * — the cross-engine-checkable variant (FNV is a linear byte fold an
    * external SQL engine can replay; xxhash64 is not). */
  def simhashFnv(toks: Column): Column = graft.ops.expr.SimHash64.fnvColumn(toks)

  /** The HOF reference formulation of [[simhash]] (aggregate/zip_with over
    * a constant mask array): same arithmetic, built from built-ins only.
    * Kept as the equivalence oracle for the native expression — and as the
    * fallback if a deployment can't register custom expressions. */
  def simhashHof(toks: Column): Column = {
    val masks = typedLit((0 until 64).map(k => 1L << k))
    val counts = aggregate(
      transform(toks, t => xxhash64(t)),
      typedLit(Seq.fill(64)(0L)),
      (acc, h) => zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) === m, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, masks, (c, m) => when(c >= 0, m).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Pigeonhole blocks for hamming-distance search: 4 16-bit chunks of the
    * simhash — any pair within hamming distance 3 shares ≥1 exact chunk.
    * A 16-bit key space birthday-saturates around 1e5 docs per blocking
    * group (random-collision candidates grow as n²/2^16); use
    * [[simhashMultiKeys]] past that. Kept as the small-corpus form and the
    * executable contrast case for the saturation guard spec. */
  def simhashChunks(sim: Column): Column =
    array((0 until 4).map { c =>
      concat_ws(":", lit(c),
        shiftright(sim, c * 16).bitwiseAND(0xffffL).cast("string"))
    }: _*)

  // ---- multi-index hamming blocks (the at-scale blocking scheme) --------

  /** Block bit-lengths: 64 bits as 4×11 + 2×10, LSB first. */
  private val BlockLens = Vector(11, 11, 11, 11, 10, 10)
  private val BlockOffs = BlockLens.scanLeft(0)(_ + _).init

  /** Multi-index hamming blocking (the scheme of Manku et al., WWW'07 §3):
    * the 64-bit signature splits into 6 blocks; a pair within hamming
    * distance 3 has ≥3 blocks with no differing bit, so it agrees exactly
    * on at least one of the C(6,3)=20 block TRIPLES — candidate generation
    * stays lossless for the hamming≤3 contract while each key carries
    * 31-33 bits instead of a single chunk's 16. Random-collision candidate
    * volume drops by ~2^16: n²/2^33-ish per table keeps hamming blocking
    * sub-quadratic out to 1e6-1e7 docs per blocking group. Each key packs
    * (table id, three block values) into ONE long — bits [34,39) the table
    * id, bits [0,33) the concatenated blocks — so the candidate join is a
    * bare long equi-join, never a string join. */
  def simhashMultiKeys(sim: Column): Column = {
    val blocks = BlockLens.zip(BlockOffs).map { case (len, off) =>
      shiftright(sim, off).bitwiseAND(lit((1L << len) - 1L))
    }
    val triples = for {
      i <- 0 until 6; j <- i + 1 until 6; k <- j + 1 until 6
    } yield (i, j, k)
    array(triples.zipWithIndex.map { case ((i, j, k), t) =>
      shiftleft(blocks(i), BlockLens(j) + BlockLens(k))
        .bitwiseOR(shiftleft(blocks(j), BlockLens(k)))
        .bitwiseOR(blocks(k))
        .bitwiseOR(lit(t.toLong << 34))
    }: _*)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- set-mask Jaccard (the pairwise-verification scale path) ----------
  // A similarity self-join shuffles every candidate pair; carrying token
  // arrays through that shuffle and re-hashing them per pair dominates cost.
  // When the corpus vocabulary fits 256 distinct tokens (true for the
  // fixtures), each token set compresses to 4 longs + a size; Jaccard
  // becomes popcount math: |A∩B| = Σ bit_count(aw & bw),
  // |A∪B| = |A| + |B| - |A∩B| — identical integers to the array form, so
  // oracle results are unchanged while the shuffled payload shrinks ~50×.

  /** Number of 64-bit words in a set mask (256-token vocabulary cap). */
  val MaskWords = 4

  /** Attach `sz` (set size) and mask words `w0..w3` for `toksCol` to the
    * rows of `docs`, identified by `idCols` — or None when the vocabulary
    * exceeds the 256-token mask capacity (callers then fall back to
    * [[jaccard]] on token arrays; both formulations produce identical
    * integers, so results don't depend on which path ran). The vocabulary
    * index comes from [[closedVocab]] (bounded driver-side collect) and the
    * words from the one-pass [[tokenSetMask]] kernel — no explode + join +
    * re-aggregate pass. Docs with empty token sets get sz=0 all-zero masks
    * (they used to drop out with the exploded formulation). */
  def setMasksOpt(docs: org.apache.spark.sql.DataFrame, idCols: Seq[String],
                  toksCol: String): Option[org.apache.spark.sql.DataFrame] =
    closedVocab(docs, toksCol).map { vocab =>
      val mask = tokenSetMask(col(toksCol), vocab)
      docs.select(idCols.map(col) ++ Seq(size(col(toksCol)).as("sz")) ++
        (0 until MaskWords).map(w => element_at(mask, w + 1).as(s"w$w")): _*)
    }

  /** [[setMasksOpt]] for callers that require the closed-vocabulary path. */
  def setMasks(docs: org.apache.spark.sql.DataFrame, idCols: Seq[String],
               toksCol: String): org.apache.spark.sql.DataFrame =
    setMasksOpt(docs, idCols, toksCol).getOrElse(
      throw new IllegalArgumentException(
        s"setMasks supports vocabularies up to ${MaskWords * 64} tokens"))

  /** Verified ≥0.95 token-set Jaccard near-dup pairs (a_id, b_id, jac) for
    * a corpus of (doc_id, lang, toks) rows, where `toks` is the SORTED
    * distinct token set ([[sortedTokenSet]]) and never empty. Candidates
    * come from MinHash band buckets (16 salted-hash perms, 8 bands × 2
    * rows, lang folded into the bucket key), NOT a within-language
    * all-pairs join. At the 0.95 threshold a true pair misses all 8 bands
    * with probability (1 − 0.95²)⁸ ≈ 1e-8.
    *
    * Verification payload adapts to the vocabulary: 4 flat mask words +
    * size on a closed ≤256-token vocabulary (inline AND+popcount), deduped
    * bare id pairs + the native merge-Jaccard kernel otherwise — identical
    * integers either way, so results don't depend on which path ran
    * (ScaleOpsSpec proves the two paths emit the same pair set).
    * `forceOpenVocab` exists for that equivalence proof (and for corpora
    * where the vocabulary probe collect is undesirable).
    *
    * Hot-path mechanics (each proven individually at sf0.1):
    *  - band keys join as xxhash64 LONGS, not ~50-char strings (a hash
    *    collision only adds a candidate that exact verification rejects);
    *  - per-document kernels (signature, size, mask) attach BEFORE the
    *    band explode, so each runs once per document, not once per band;
    *  - an integer size-ratio prefilter runs inside the join: round(jac,6)
    *    ≥ 0.95 implies min(sz)/max(sz) ≥ 0.9499995, checked at the
    *    slightly looser 0.949999 so the bound can never drop a true pair;
    *  - the BigDecimal `round` runs only on raw-threshold survivors
    *    (~true pairs), never on the candidate stream.
    */
  def nearDupPairs(docs: org.apache.spark.sql.DataFrame,
                   forceOpenVocab: Boolean = false): org.apache.spark.sql.DataFrame = {
    def banding(base: org.apache.spark.sql.DataFrame) = base
      .withColumn("sig", minhashSignature(col("toks"), 16))
      .withColumn("sz", size(col("toks")))
      .withColumn("band", explode(bandKeys(col("sig"), 8, 2)))
      .withColumn("bh", xxhash64(concat_ws("|", col("lang"), col("band"))))
    // lang rides both sides and is re-checked at the join: bh already
    // folds lang in, but a bucket-key xxhash64 collision would otherwise
    // admit a cross-language pair that genuine Jaccard verification CANNOT
    // reject — the equality restores the exact contract instead of a
    // 2^-64 argument.
    val sizeOk =
      col("alang") === col("blang") &&
        least(col("asz"), col("bsz")) * 2000000L >=
          greatest(col("asz"), col("bsz")) * 1899998L
    def finish(withRaw: org.apache.spark.sql.DataFrame) = withRaw
      .filter(col("raw") >= 0.949999)
      .select(col("a_id"), col("b_id"), round(col("raw"), 6).as("jac"))
      .filter(col("jac") >= 0.95)
      .distinct()
    val vocabOpt = if (forceOpenVocab) None else closedVocab(docs, "toks")
    vocabOpt match {
      case Some(vocab) =>
        val banded = banding(docs
          .withColumn("mask", tokenSetMask(col("toks"), vocab)))
          .select(col("doc_id") +: col("lang") +: col("bh") +: col("sz") +:
            (0 to 3).map(w => element_at(col("mask"), w + 1).as(s"w$w")): _*)
        def side(p: String) = banded.select(
          col("doc_id").as(s"${p}_id") +: col("lang").as(s"${p}lang") +:
            col("bh") +: col("sz").as(s"${p}sz") +:
            (0 to 3).map(w => col(s"w$w").as(s"$p$w")): _*)
        val inter = (0 to 3).map(w =>
          bit_count(col(s"a$w").bitwiseAND(col(s"b$w")))).reduce(_ + _)
        finish(side("a").join(side("b"), Seq("bh"))
          .filter(col("a_id") < col("b_id") && sizeOk)
          .select(col("a_id"), col("b_id"),
            (inter.cast("double") /
              (col("asz") + col("bsz") - inter).cast("double")).as("raw")))
      case None =>
        val bandedIds = banding(docs)
        def ids(p: String) = bandedIds.select(
          col("doc_id").as(s"${p}_id"), col("lang").as(s"${p}lang"),
          col("bh"), col("sz").as(s"${p}sz"))
        val pairs = ids("a").join(ids("b"), Seq("bh"))
          .filter(col("a_id") < col("b_id") && sizeOk)
          .select("a_id", "b_id").distinct()
        def toks(p: String) = docs.select(
          col("doc_id").as(s"${p}_id"), col("toks").as(s"${p}t"))
        finish(pairs.join(toks("a"), "a_id").join(toks("b"), "b_id")
          .select(col("a_id"), col("b_id"),
            jaccardSorted(col("at"), col("bt")).as("raw")))
    }
  }

  /** Corpus vocabulary index when it fits the mask capacity, else None.
    * One bounded limit-(cap+1) collect (≤ 257 rows on the driver). */
  def closedVocab(docs: org.apache.spark.sql.DataFrame,
                  toksCol: String): Option[Map[String, Int]] = {
    val cap = MaskWords * 64
    val toks = docs.select(explode(col(toksCol)).as("tok")).distinct()
      .limit(cap + 1).collect().map(_.getString(0))
    if (toks.length > cap) None
    else Some(toks.sorted.zipWithIndex.toMap)
  }

  /** One-pass native bitmask of a token array against a broadcast
    * vocabulary index (see [[graft.ops.expr.TokenSetMask]]) — the
    * shuffle-free way to attach mask words inline, where [[setMasksOpt]]
    * goes through explode + join + re-aggregate. */
  def tokenSetMask(toks: Column, vocab: Map[String, Int]): Column =
    graft.ops.expr.TokenSetMask.column(toks, vocab, MaskWords)

  /** Popcount Jaccard of two mask-word ARRAYS (as produced by
    * [[tokenSetMask]]) given the two exact set sizes — integer-identical to
    * the array-set and sorted-merge forms. */
  def maskArrayJaccard(a: Column, b: Column, sza: Column, szb: Column): Column = {
    val inter = (1 to MaskWords).map { i =>
      bit_count(element_at(a, i).bitwiseAND(element_at(b, i)))
    }.reduce(_ + _)
    inter.cast("double") / (sza + szb - inter).cast("double")
  }

  /** |A∩B| from two mask-word column prefixes (e.g. "a_" and "b_"). */
  def maskIntersect(aPrefix: String, bPrefix: String): Column =
    (0 until MaskWords).map { w =>
      bit_count(col(s"$aPrefix$w").bitwiseAND(col(s"$bPrefix$w")))
    }.reduce(_ + _)

  /** Jaccard from mask intersection and the two set sizes. */
  def maskJaccard(inter: Column, sa: Column, sb: Column): Column =
    inter.cast("double") / (sa + sb - inter).cast("double")
}
