package graft

import graft.ops.expr.Fnv1a64
import graft.queries.GroupAC

/** Group AC semantics pinned against independent in-JVM brute force: the
  * McNemar discordant-pair decomposition, Cohen's κ from exact BigInt
  * algebra over the never-enumerated pair universe, the permutation test's
  * relabeled gaps recomputed from a JVM-side FNV fold, the jackknife
  * identity, SRM's per-day χ², and the A/B lift CI's order statistics. The
  * driver's DuckDB gate checks the same queries hash-exactly; these pin
  * the SEMANTICS so a plan change that keeps the oracle green cannot
  * silently redefine them. */
class GroupACSpec extends SparkSpec {

  private def q(name: String) = GroupAC.all.find(_.name == name).get.fn

  /** The registered replicate-bucket rule: the one-char-extended row hash
    * mod m, with replicate codes distinct mod m (GroupAB's balanced
    * design). */
  private def bucket(key: String, ch: Char, m: Long): Long =
    java.lang.Math.floorMod(Fnv1a64.hash(key + ch), m)

  private def pairSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q_mcnemar equals the set-algebra decomposition of the detector " +
    "pair sets against the truth set") {
    val mh = pairSet("q_dedup_minhash")
    val sh = pairSet("q_dedup_simhash")
    // fully independent truth: all same-lang pairs with round(jaccard, 6)
    // ≥ 0.95 over distinct lowercased space tokens — the jp definition
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang", "lower(text) AS text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSet))
    val truth = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (ia, la, ta) = docs(i); (ib, lb, tb) = docs(j)
      if la == lb
      inter = (ta & tb).size; union = (ta | tb).size
      if union > 0 &&
        BigDecimal(inter.toDouble / union.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.95
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
    val b = (mh & truth).count(p => !sh(p)) +
      (sh -- mh).count(p => !truth(p))
    val c = (sh & truth).count(p => !mh(p)) +
      (mh -- sh).count(p => !truth(p))
    val row = q("q_mcnemar")(spark, sfDir).collect().head
    assert(row.getLong(0) == mh.size, "n_minhash")
    assert(row.getLong(1) == sh.size, "n_simhash")
    assert(row.getLong(2) == b, "n_minhash_right")
    assert(row.getLong(3) == c, "n_simhash_right")
    val expectChi2 =
      if (b + c == 0) -1L
      else (BigInt(1000000) * (b - c) * (b - c) / (b + c)).toLong
    assert(row.getLong(4) == expectChi2, "chi2_ppm")
  }

  test("q_cohens_kappa equals exact BigInt kappa over the algebraic pair " +
    "universe") {
    val mh = pairSet("q_dedup_minhash")
    val sh = pairSet("q_dedup_simhash")
    val n = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("lower(text) AS text").collect()
      .count(_.getString(0).split(" ").exists(_.nonEmpty))
    val np = BigInt(n) * (n - 1) / 2
    val (a1, b1, m) = (BigInt(mh.size), BigInt(sh.size), BigInt((mh & sh).size))
    val agree = np - a1 - b1 + 2 * m
    val num = np * agree - (a1 * b1 + (np - a1) * (np - b1))
    val den = np * np - (a1 * b1 + (np - a1) * (np - b1))
    val kappa =
      if (den == 0) BigInt(-1)
      else if (num >= 0) BigInt(1000000) * num / den
      else -(BigInt(1000000) * -num / den)
    val row = q("q_cohens_kappa")(spark, sfDir).collect().head
    assert(row.getLong(0) == n, "n_docs")
    assert(row.getLong(1) == np.toLong, "n_pairs")
    assert(row.getLong(2) == mh.size && row.getLong(3) == sh.size)
    assert(row.getLong(4) == (mh & sh).size, "n_overlap")
    assert(row.getLong(5) == (BigInt(1000000) * agree / np).toLong, "agree_ppm")
    assert(row.getLong(6) == kappa.toLong, "kappa_ppm")
    assert(row.getLong(6) <= 1000000L, "kappa bounded")
  }

  test("q_permutation_test equals a JVM-side brute force of all 64 " +
    "relabelings") {
    val alpha = (48 to 111).map(_.toChar).mkString // codes distinct mod 64
    val slice = graft.queries.Q.events(spark, sfDir)
      .filter("event_type IN ('purchase', 'view')")
      .selectExpr("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def exactMean(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / xs.size.toDouble
    val tObs = exactMean(slice.filter(_._1 == "purchase").map(_._3).toSeq) -
      exactMean(slice.filter(_._1 == "view").map(_._3).toSeq)
    val reps = (0 until 64).flatMap { b =>
      val sides = slice.map { case (_, id, v) =>
        (bucket(s"pt:$id:", alpha(b), 64) / 32, v)
      }
      val (s0, s1) = (sides.filter(_._1 == 0L).map(_._2),
        sides.filter(_._1 == 1L).map(_._2))
      if (s0.nonEmpty && s1.nonEmpty)
        Some(exactMean(s0.toSeq) - exactMean(s1.toSeq))
      else None
    }
    val nExtreme = reps.count(t => math.abs(t) >= math.abs(tObs))
    val row = q("q_permutation_test")(spark, sfDir).collect().head
    assert(row.getLong(0) == slice.count(_._1 == "purchase"), "n_purchase")
    assert(row.getLong(1) == slice.count(_._1 == "view"), "n_view")
    assert(math.abs(row.getDouble(2) - tObs) < 1e-12, "t_obs")
    assert(row.getLong(3) == reps.size, "n_reps")
    assert(row.getLong(4) == nExtreme, "n_extreme")
    assert(row.getLong(5) == 1000000L * nExtreme / reps.size, "p_ppm")
  }

  test("q_jackknife equals the leave-one-day-out brute force with the " +
    "same op order") {
    val daily: Map[(String, Long), Double] =
      graft.queries.Q.events(spark, sfDir)
        .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day",
          "value").collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (k, xs) =>
          val s = xs.map(x => BigDecimal(x._2)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
          k -> (s.toDouble / xs.size.toDouble)
        }
    val rows = q("q_jackknife")(spark, sfDir).collect()
    val byType = daily.groupBy(_._1._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val ms = byType(t).values.toSeq
      val n = ms.size
      assert(r.getLong(1) == n, s"$t n_days")
      // exact-decimal total (the house scale-6 accumulator), double mean,
      // loo replicates, centered ssq — the registered op order in the JVM
      val sm = ms.map(m => BigDecimal(m)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val mean = sm.toDouble / n.toDouble
      val ssq = ms.map { m =>
        val loo = (sm - BigDecimal(m)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble / (n - 1).toDouble
        val dv = loo - mean
        BigDecimal(dv * dv).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val se = math.sqrt(ssq * (n - 1).toDouble / n.toDouble)
      assert(math.abs(r.getDouble(2) - mean) < 1e-12, s"$t mean_daily")
      assert(math.abs(r.getDouble(3) - se) < 1e-12, s"$t jack_se")
    }
    // every multi-day type is present
    assert(rows.map(_.getString(0)).toSet ==
      byType.collect { case (t, m) if m.size > 1 => t }.toSet)
  }

  test("q_srm equals brute per-day distinct-user parity counts and flags " +
    "exactly at the 3.841459 threshold") {
    val e = graft.queries.Q.events(spark, sfDir)
      .selectExpr("unix_micros(ts) div 86400000000 AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = e.groupBy(_._1).map { case (day, xs) =>
      val users = xs.map(_._2).distinct
      val na = users.count(_ % 2 == 0).toLong
      val nb = users.count(_ % 2 == 1).toLong
      val chi2 = BigInt(1000000) * (na - nb) * (na - nb) / (na + nb)
      day -> ((na, nb, chi2.toLong, if (chi2 > 3841459) 1L else 0L))
    }
    val got = q("q_srm")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
  }

  test("q_ab_lift: CI is the (2,15) order statistics of the brute " +
    "replicate lifts and brackets are ordered") {
    val repc = (48 to 63).map(_.toChar).mkString // codes distinct mod 16
    val e = graft.queries.Q.events(spark, sfDir)
      .selectExpr("user_id % 2 AS arm", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def wmean(xs: Seq[(Double, Long)]): Double = {
      val s = xs.map { case (v, w) => BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * w }.sum
      s.toDouble / xs.map(_._2).sum.toDouble
    }
    val reps = (0 until 16).flatMap { b =>
      val weighted = e.map { case (arm, id, v) =>
        val bk = bucket(s"ab:$id:", repc(b), 16)
        val w = if (bk < 6) 0L else if (bk < 12) 1L else if (bk < 15) 2L else 3L
        (arm, v, w)
      }
      val w0 = weighted.filter(_._1 == 0L).map(x => (x._2, x._3))
      val w1 = weighted.filter(_._1 == 1L).map(x => (x._2, x._3))
      if (w0.map(_._2).sum > 0 && w1.map(_._2).sum > 0)
        Some((wmean(w0.toSeq) - wmean(w1.toSeq), b))
      else None
    }.sortBy(identity).map(_._1)
    val row = q("q_ab_lift")(spark, sfDir).collect().head
    assert(row.getLong(0) == e.count(_._1 == 0L), "n_even")
    assert(row.getLong(1) == e.count(_._1 == 1L), "n_odd")
    assert(math.abs(row.getDouble(3) - reps(1)) < 1e-12, "lift_lo")
    assert(math.abs(row.getDouble(4) - reps(14)) < 1e-12, "lift_hi")
    assert(row.getDouble(3) < row.getDouble(4), "CI ordered")
  }
}
