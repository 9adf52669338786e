package graft

import graft.multimodal.Multimodal
import graft.ops.{DedupOps, Lsh}

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("jaccard on known token sets") {
    val df = Seq(("a b c d", "c d e f")).toDF("x", "y")
    val j = df.select(DedupOps.jaccard(
      DedupOps.tokenSet($"x"), DedupOps.tokenSet($"y")).as("j"))
      .as[Double].head()
    assert(math.abs(j - 2.0 / 6.0) < 1e-12)
  }

  test("minhash: identical texts give identical signatures, bands collide") {
    val df = Seq((1L, "spark dedup at scale"), (2L, "spark dedup at scale"),
      (3L, "utterly different words entirely")).toDF("id", "t")
    val sigs = df.select($"id",
        DedupOps.minhashSignature(DedupOps.tokenSet($"t"), 16).as("sig"))
      .withColumn("bands", DedupOps.bandKeys($"sig", 4, 4))
      .collect().sortBy(_.getLong(0))
    assert(sigs(0).getSeq[Long](1) == sigs(1).getSeq[Long](1))
    assert(sigs(0).getSeq[String](2) == sigs(1).getSeq[String](2))
    assert(sigs(0).getSeq[Long](1) != sigs(2).getSeq[Long](1))
  }

  test("simhash: identical → hamming 0; one-token change → small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"))
      .toDF("id", "t")
    val sims = df.select($"id", DedupOps.simhash(DedupOps.tokens($"t")).as("s"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    assert(sims(0) == sims(1))
    val hamming = java.lang.Long.bitCount(sims(0) ^ sims(2))
    assert(hamming > 0 && hamming <= 16, s"hamming was $hamming")
  }

  test("native minhash signature matches the HOF formulation exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", DedupOps.tokenSet($"text").as("toks"))
    val diff = docs.select(
        DedupOps.minhashSignature($"toks", 16).as("native"),
        DedupOps.minhashSignatureHof($"toks", 16).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
    // empty token set: the kernel pins the Long.MaxValue identity
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(DedupOps.minhashSignature($"toks", 4)).head().getSeq[Long](0)
    assert(empty == Seq.fill(4)(Long.MaxValue))
  }

  test("native token-set mask + popcount Jaccard match array-set Jaccard") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", DedupOps.sortedTokenSet($"text").as("toks"))
    val vocab = DedupOps.closedVocab(docs, "toks").get
    val masked = docs.select($"doc_id", size($"toks").as("sz"),
      DedupOps.tokenSetMask($"toks", vocab).as("m"), $"toks")
    def side(p: String) = masked.select(
      col("doc_id").as(s"${p}_id"), col("sz").as(s"${p}sz"),
      col("m").as(s"${p}m"), col("toks").as(s"${p}t"))
    val bad = side("a").join(side("b"), $"a_id" < $"b_id")
      .select(
        DedupOps.maskArrayJaccard($"am", $"bm", $"asz", $"bsz").as("mask_j"),
        DedupOps.jaccard($"at", $"bt").as("arr_j"))
      .filter($"mask_j" =!= $"arr_j").count()
    assert(bad == 0)
  }

  test("native merge-Jaccard matches array-set Jaccard on every fixture pair") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang", DedupOps.sortedTokenSet($"text").as("toks"))
    def side(p: String) = docs.select(
      col("doc_id").as(s"${p}_id"), col("lang").as(s"${p}l"), col("toks").as(s"${p}t"))
    val bad = side("a").join(side("b"),
        $"al" === $"bl" && $"a_id" < $"b_id") // bounded all-pairs at sf0.001
      .select(DedupOps.jaccardSorted($"at", $"bt").as("m"),
        DedupOps.jaccard($"at", $"bt").as("s"))
      .filter($"m" =!= $"s").count()
    assert(bad == 0)
    // empties: both-empty → 0.0; one-empty → 0.0
    val e = Seq((Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a"))).toDF("a", "b")
      .select(DedupOps.jaccardSorted($"a", $"b").as("j")).as[Double].collect()
    assert(e.toSeq == Seq(0.0, 0.0))
  }

  test("native vec_dot/vec_dist2 match the HOF double arithmetic exactly") {
    import graft.ops.expr.VecMath
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val pairs = vecs.as("a").join(vecs.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    val hofDot = aggregate(
      zip_with(col("a.embedding"), col("b.embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)
    val hofDist2 = aggregate(
      zip_with(col("a.embedding"), col("b.embedding"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)
    val bad = pairs.select(
        VecMath.dotColumn(col("a.embedding"), col("b.embedding")).as("nd"),
        hofDot.as("hd"),
        VecMath.dist2Column(col("a.embedding"), col("b.embedding")).as("n2"),
        hofDist2.as("h2"))
      .filter($"nd" =!= $"hd" || $"n2" =!= $"h2").count()
    assert(bad == 0)
    // double-typed right side (hyperplane/centroid literals)
    val one = vecs.limit(1).select(
      VecMath.dotColumn($"embedding", typedLit(Seq.fill(64)(1.0))).as("s"),
      aggregate($"embedding", lit(0.0), (a, x) => a + x.cast("double")).as("e"))
      .head()
    assert(one.getDouble(0) == one.getDouble(1))
  }

  test("native simhash64 expression matches the HOF formulation exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", DedupOps.tokens($"text").as("toks"))
    val diff = docs.select(
        DedupOps.simhash($"toks").as("native"),
        DedupOps.simhashHof($"toks").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
    // empty token array: all counters 0 → every bit set, on both paths
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(DedupOps.simhash($"toks").as("n"), DedupOps.simhashHof($"toks").as("h"))
      .head()
    assert(empty.getLong(0) == -1L && empty.getLong(1) == -1L)
  }

  test("FNV-variant simhash: pinned values, single-token identity, empty array") {
    // pinned against an independent implementation of FNV-1a + sign-count
    // (the same arithmetic the DuckDB oracle replays in HUGEINT)
    val r = Seq(Tuple1(Seq("a", "b")), Tuple1(Seq("the", "quick", "brown", "fox")))
      .toDF("t").select(DedupOps.simhashFnv($"t").as("s")).collect().map(_.getLong(0))
    assert(r(0) == -5808553574619021907L)
    assert(r(1) == -2378295205536862754L)
    // a single token's simhash IS its FNV hash (one +1/-1 vote per bit)
    val single = Seq(Tuple1(Seq("hello"))).toDF("t")
      .select(DedupOps.simhashFnv($"t").as("s"),
        graft.ops.VectorOps.fnv1a64(lit("hello")).as("h")).head()
    assert(single.getLong(0) == single.getLong(1))
    assert(single.getLong(0) == -6615550055289275125L)
    // empty array: all counters 0 → all bits set
    assert(Seq(Tuple1(Seq.empty[String])).toDF("t")
      .select(DedupOps.simhashFnv($"t")).head().getLong(0) == -1L)
  }

  test("FNV-variant minhash: pinned values, prefix-fold identity, empty array") {
    // pinned against an independent implementation of min over
    // fnv1a64("#p#" + token) in SIGNED 64-bit order
    val sig = Seq(Tuple1(Seq("a", "b"))).toDF("t")
      .select(DedupOps.minhashSignatureFnv($"t", 4).as("s"))
      .head().getSeq[Long](0)
    assert(sig == Seq(5589962729263556871L, 6277332319067202820L,
      4406539672438762184L, 4963887614185679139L))
    // kernel's prefix-fold continuation == hashing the concatenated string
    val full = Seq(Tuple1(Seq("hello"))).toDF("t")
      .select(DedupOps.minhashSignatureFnv($"t", 1).as("s"),
        graft.ops.VectorOps.fnv1a64(lit("#0#hello")).as("h")).head()
    assert(full.getSeq[Long](0).head == full.getLong(1))
    // empty token array pins the Long.MaxValue identity
    assert(Seq(Tuple1(Seq.empty[String])).toDF("t")
      .select(DedupOps.minhashSignatureFnv($"t", 2)).head()
      .getSeq[Long](0).forall(_ == Long.MaxValue))
    // SQL registry parity
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT minhash_sig_fnv(array('a','b'), 4) AS s")
      .head().getSeq[Long](0) == Seq(5589962729263556871L, 6277332319067202820L,
        4406539672438762184L, 4963887614185679139L))
    assert(spark.sql("SELECT simhash_fnv64(array('hello')) AS s")
      .head().getLong(0) == -6615550055289275125L)
  }

  test("chunk_split: pinned boundaries, shift invariance, SQL registry") {
    import graft.ops.expr.ChunkSplit
    val s = "the quick brown fox jumps over the lazy dog and then runs far " +
      "away into the woods tonight again"
    // pinned against an independent implementation of the 8-char-window
    // FNV boundary rule (hash % 32 == 0)
    val parts = Seq(Tuple1(s)).toDF("t")
      .select(ChunkSplit.column($"t").as("c")).head().getSeq[String](0)
    assert(parts == Seq("the quick brown fox jum", "ps over t",
      "he lazy dog and then runs far away in", "to the woods tonight again"))
    assert(parts.mkString == s) // chunks partition the payload exactly
    // content-defined = shift-invariant: an insertion at the FRONT changes
    // only the chunk it lands in; every later chunk survives byte-identical
    val shifted = Seq(Tuple1("oh " + s)).toDF("t")
      .select(ChunkSplit.column($"t").as("c")).head().getSeq[String](0)
    assert(shifted.toSet.intersect(parts.toSet).size == 3)
    // SQL registry parity
    GraftExtensions.register(spark)
    assert(spark.sql(s"SELECT chunk_split('${s}') AS c")
      .head().getSeq[String](0) == parts)
    // degenerate inputs: empty → no chunks; short → one whole-payload chunk
    assert(Seq(Tuple1("")).toDF("t")
      .select(ChunkSplit.column($"t")).head().getSeq[String](0).isEmpty)
    assert(Seq(Tuple1("short")).toDF("t")
      .select(ChunkSplit.column($"t")).head().getSeq[String](0) == Seq("short"))
  }

  test("FNV text kernels fold codepoints — the oracle contract beyond ASCII") {
    import graft.ops.expr.{ChunkSplit, Fnv1a64}
    // independent per-codepoint reimplementation of what the DuckDB oracles
    // compute: ascii(c) per character of string_split(s, '')
    def refFold(s: String): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h ^= cp.toLong; h *= 0x100000001b3L
        i += Character.charCount(cp)
      }
      h
    }
    val texts = Seq("héllo wörld", "中文 文本", "plain ascii", "emoji 🚀 test")
    texts.foreach(t => assert(Fnv1a64.hashCodePoints(t) == refFold(t)))
    // simhash of a single token is the token's hash (±1 counting over one
    // element reproduces its bit pattern) — pins the kernel's fold
    Seq("café", "中文", "ascii").foreach { tok =>
      val got = Seq(Tuple1(Seq(tok))).toDF("t")
        .select(DedupOps.simhashFnv($"t")).head().getLong(0)
      assert(got == refFold(tok), s"simhash fold diverged on '$tok'")
    }
    // minhash permutation p = min over tokens of fold("#p#" + token)
    val toks = Seq("café", "中文")
    val sig = Seq(Tuple1(toks)).toDF("t")
      .select(DedupOps.minhashSignatureFnv($"t", 4)).head().getSeq[Long](0)
    (0 until 4).foreach { p =>
      assert(sig(p) == toks.map(tok => refFold(s"#$p#$tok")).min)
    }
    // deterministic embedder: same codepoint fold behind each component
    val emb = new graft.embed.DeterministicHashEmbedder(4).embed("café")
    val expected = (0 until 4).map(i =>
      ((refFold(s"#$i#café") >>> 44).toInt / 524288.0f) - 1.0f)
    assert(emb.toSeq == expected)
    // chunk boundaries land BETWEEN characters: chunks reassemble exactly,
    // and match a char-level reference splitter (a byte-offset splitter
    // would bisect multi-byte characters and emit invalid UTF-8)
    def refChunks(s: String): Seq[String] = {
      val cps = s.codePoints.toArray
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var lo = 0
      for (j <- 8 to cps.length) {
        var h = 0xcbf29ce484222325L
        for (k <- j - 8 until j) { h ^= cps(k).toLong; h *= 0x100000001b3L }
        if (java.lang.Math.floorMod(h, 32L) == 0L) {
          out += new String(cps, lo, j - lo)
          lo = j
        }
      }
      if (lo < cps.length) out += new String(cps, lo, cps.length - lo)
      out.toSeq
    }
    // boundaries are probabilistic (hash % 32): embed the ASCII sentence
    // whose boundaries the pinned test above proves exist, flanked by
    // multi-byte text so chunk slices cross non-ASCII regions
    val payload = "héllo wörld à la carte ¡ñandú! 中文数据 🚀 " +
      "the quick brown fox jumps over the lazy dog and then runs far " +
      "away into the woods tonight again ünd wieder 中文"
    val parts = Seq(Tuple1(payload)).toDF("t")
      .select(ChunkSplit.column($"t")).head().getSeq[String](0)
    assert(parts.mkString == payload)
    assert(parts == refChunks(payload))
    assert(parts.size > 1, "fixture payload produced no content boundary")
  }

  test("fixture corpus is ASCII — the byte-folding media stub's oracle precondition") {
    // the multimodal stub decoder folds payload BYTES (binary payloads have
    // no characters; a real decoder hashes pixel data), while its oracle
    // folds per character — equivalent iff the fixture text is pure ASCII.
    // Guard that precondition so datagen drift fails loudly, not as a
    // silent oracle divergence.
    val nonAscii = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").as[String].collect()
      .count(t => t != null && t.exists(_ >= 0x80))
    assert(nonAscii == 0,
      s"$nonAscii non-ASCII documents break the byte-vs-char fold equivalence")
  }

  test("native expressions register for SQL (simhash64/vec_dot/jaccard_sorted/minhash_sig)") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT simhash64(array('a','b')) AS s").head().getLong(0)
    val c = Seq(Tuple1(Seq("a", "b"))).toDF("t")
      .select(DedupOps.simhash($"t")).head().getLong(0)
    assert(r == c)
    assert(spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT vec_dist2(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) == 8.0)
    assert(spark.sql("SELECT jaccard_sorted(array('a','b'), array('b','c')) AS j")
      .head().getDouble(0) == 1.0 / 3.0)
    assert(spark.sql("SELECT size(minhash_sig(array('a','b'), 4)) AS n")
      .head().getInt(0) == 4)
  }

  test("open vocabulary: setMasksOpt yields None, array fallback agrees with masks") {
    // > 256 distinct tokens → mask path unavailable
    val big = (1 to 300).map(i => (i.toLong, s"tok$i common words")).toDF("doc_id", "t")
      .select($"doc_id", DedupOps.tokenSet($"t").as("toks"))
    assert(DedupOps.setMasksOpt(big, Seq("doc_id"), "toks").isEmpty)
    // ≤ 256 tokens → masks exist, and popcount Jaccard equals array Jaccard
    val small = Seq((1L, "a b c d"), (2L, "c d e f"), (3L, "a b c d e"))
      .toDF("doc_id", "t")
      .select($"doc_id", DedupOps.tokenSet($"t").as("toks"))
    val masks = DedupOps.setMasksOpt(small, Seq("doc_id"), "toks").get
    def side(p: String) = masks.select(
      col("doc_id").as(s"${p}_id") +: col("sz").as(s"${p}sz") +:
        (0 until DedupOps.MaskWords).map(w => col(s"w$w").as(s"$p$w")): _*)
    val viaMasks = side("a").join(side("b"), col("a_id") < col("b_id"))
      .select($"a_id", $"b_id",
        DedupOps.maskJaccard(DedupOps.maskIntersect("a", "b"),
          $"asz", $"bsz").as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def tside(p: String) = small.select(
      col("doc_id").as(s"${p}_id"), col("toks").as(s"${p}t"))
    val viaArrays = tside("a").join(tside("b"), col("a_id") < col("b_id"))
      .select($"a_id", $"b_id", DedupOps.jaccard($"at", $"bt").as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaMasks == viaArrays && viaMasks.nonEmpty)
  }

  test("LSH bucket is deterministic; probe set contains the exact bucket") {
    val planes = Lsh.hyperplanes(4, 8)
    assert(planes == Lsh.hyperplanes(4, 8)) // seeded → reproducible
    val df = Seq(Tuple1(Array(0.1f, -0.2f, 0.3f, 0.5f, -0.5f, 0.2f, 0.0f, 0.9f)))
      .toDF("v")
    val r = df.select(Lsh.bucket($"v", planes).as("b"),
      Lsh.probeBuckets($"v", planes).as("p")).head()
    val bucket = r.getString(0)
    val probes = r.getSeq[String](1)
    assert(bucket.length == 4 && bucket.forall(c => c == '0' || c == '1'))
    assert(probes.head == bucket && probes.size == 5)
    // each non-exact probe differs in exactly one bit
    probes.tail.foreach { p =>
      assert(p.zip(bucket).count { case (a, b) => a != b } == 1)
    }
  }

  test("multimodal stub extraction is deterministic and partition-agnostic") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val once = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val again = Multimodal.extractFeatures(media.repartition(7)).collect()
      .sortBy(_.doc_id)
    assert(once.length == media.count())
    assert(once.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(once.forall(f => f.features.length == 8))
    assert(once.forall(f => f.modality != "video" || f.n_frames >= 1))
  }
}
