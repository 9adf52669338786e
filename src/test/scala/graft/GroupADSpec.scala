package graft

import graft.ops.expr.Fnv1a64
import graft.queries.GroupAD

/** Group AD semantics pinned against independent in-JVM brute force: the
  * MDE formula from plain-double moments, exact-rank winsorization, the
  * l-diversity class table, the k-fold FNV assignment, the
  * length-bucketed detector recall, and the byte-estimate advisor. The
  * driver's DuckDB gate checks the same queries hash-exactly; these pin
  * the SEMANTICS so a plan change that keeps the oracle green cannot
  * silently redefine them. */
class GroupADSpec extends SparkSpec {

  private def q(name: String) = GroupAD.all.find(_.name == name).get.fn

  private lazy val events: Array[(String, Long, Long, Double)] =
    graft.queries.Q.events(spark, sfDir)
      .selectExpr("event_type", "user_id", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("q_mde matches a plain-double brute force and scales as 1/sqrt(n)") {
    val rows = q("q_mde")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      val vs = events.filter(_._1 == t)
      val na = vs.count(_._2 % 2 == 0)
      val nb = vs.count(_._2 % 2 == 1)
      assert(r.getLong(1) == na && r.getLong(2) == nb, s"$t arm counts")
      val xs = vs.map(_._4)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val varB = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(r.getDouble(3) - varB) / varB < 1e-6, s"$t variance")
      val mde = 2.801585 * math.sqrt(varB * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getDouble(4) - mde) / mde < 1e-6, s"$t mde")
      assert(r.getDouble(4) > 0, s"$t mde positive")
    }
  }

  test("q_winsorized_lift equals brute nearest-rank winsorization per arm") {
    val byArm = events.groupBy(_._2 % 2)
    def wstats(arm: Long): (Long, Long, Double) = {
      val vs = byArm(arm).map(e => (e._4, e._3)).sortBy(identity)
      val n = vs.length
      val lo = vs(((n - 1) / 20 + 1) - 1)._1
      val hi = vs((((n - 1) * 19) / 20 + 1) - 1)._1
      val clip = vs.map { case (v, _) =>
        if (v < lo) lo else if (v > hi) hi else v }
      val nClip = vs.count { case (v, _) => v < lo || v > hi }
      val wsum = clip.map(BigDecimal(_)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      (n.toLong, nClip.toLong, wsum.toDouble / n.toDouble)
    }
    val (ne, ce, we) = wstats(0L)
    val (no, co, wo) = wstats(1L)
    val r = q("q_winsorized_lift")(spark, sfDir).collect().head
    assert(r.getLong(0) == ne && r.getLong(1) == no, "arm counts")
    assert(r.getLong(2) == ce && r.getLong(3) == co, "clip counts")
    assert(r.getDouble(4) == we && r.getDouble(5) == wo, "winsorized means")
    assert(r.getDouble(6) == we - wo, "wlift")
    // the winsorized mean ignores tail rows entirely: perturbing the max
    // must not move it — structural robustness the plain mean lacks
    assert(ce > 0 || co > 0, "no clipping happened — fixture degenerate")
  }

  test("q_l_diversity equals the brute class table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1) / 500, r.getString(2)))
    val expect = docs.groupBy(d => (d._1, d._2)).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._3).distinct.length.toLong))
    }
    val got = q("q_l_diversity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, (n, l)) =>
      val (gn, gl, flag) = got(k)
      assert(gn == n && gl == l, s"class $k")
      assert(flag == (if (l >= 3) 1L else 0L), s"class $k flag")
    }
  }

  test("q_stratified_kfold equals the brute FNV fold assignment and " +
    "shares sum to ~1e6 per language") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val folds = docs.map { case (id, lang) =>
      (java.lang.Math.floorMod(Fnv1a64.hash(s"kf:$id:"), 5L), lang)
    }
    val expect = folds.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val langTot = folds.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val got = q("q_stratified_kfold")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, n) =>
      val (gn, share) = got(k)
      assert(gn == n, s"fold $k count")
      assert(share == 1000000L * n / langTot(k._2), s"fold $k share")
    }
    // shares per language sum to 1e6 within integer-floor slack (≤ 5)
    got.toSeq.groupBy(_._1._2).foreach { case (lang, xs) =>
      val s = xs.map(_._2._2).sum
      assert(s > 1000000L - 5 && s <= 1000000L, s"$lang share total $s")
    }
  }

  test("q_detector_length_bias is consistent with the detector pair sets " +
    "and buckets partition the truth set") {
    val truth = SparkEntry.queries("q_ngram_jaccard")(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id",
        "CAST(size(array_distinct(filter(split(lower(text), ' '), x -> x != ''))) AS BIGINT) AS tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = truth.toSeq.map { case (a, b) =>
      val bucket = math.min((toks(a) + toks(b)) / 8, 15L)
      (bucket, if (mh((a, b))) 1 else 0)
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._2).sum.toLong)) }
    val got = q("q_detector_length_bias")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, (nt, nc)) =>
      val (gt, gc, rec) = got(k)
      assert(gt == nt && gc == nc, s"bucket $k counts")
      assert(rec == 1000000L * nc / nt, s"bucket $k recall")
    }
    assert(got.values.map(_._1).sum == truth.size, "buckets partition truth")
  }

  test("q_broadcast_advisor equals brute byte estimates and the strategy " +
    "rule") {
    def brute(table: String, fixed: Long, strs: Seq[String]): (Long, Long) = {
      val rows = spark.read.parquet(s"$sfDir/$table.parquet")
        .selectExpr(strs.map(c => s"length($c) AS $c"): _*).collect()
      (rows.length.toLong,
        rows.map(r => fixed + strs.indices.map(i => r.getInt(i).toLong).sum).sum)
    }
    val spec = Seq(("region", false, 8L, Seq("r_name")),
      ("nation", false, 16L, Seq("n_name")),
      ("customer", true, 24L, Seq("c_name", "c_mktsegment")),
      ("supplier", true, 24L, Seq("s_name")),
      ("part", true, 24L, Seq("p_name", "p_brand", "p_type")))
    val got = q("q_broadcast_advisor")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    spec.foreach { case (t, grows, fixed, strs) =>
      val (n, bytes) = brute(t, fixed, strs)
      val (gn, gb, gs, strat) = got(t)
      assert(gn == n && gb == bytes, s"$t estimate")
      assert(gs == (if (grows) bytes * 1000 else bytes), s"$t scaled")
      assert(strat == (if (gs < 104857600L) "broadcast" else "shuffle"),
        s"$t strategy")
    }
  }
}
