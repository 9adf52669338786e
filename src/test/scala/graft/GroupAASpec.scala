package graft

import graft.queries.GroupAA

/** Group AA semantics pinned against independent in-JVM brute force:
  * Kendall's τ-a pair counts, the deterministic global-rank Kruskal–
  * Wallis H, the Page–Hinkley running-mean fold, and the Wald–Wolfowitz
  * run counting with the lower-median convention. The driver's DuckDB
  * gate checks the same queries hash-exactly; these pin the SEMANTICS so
  * a plan change that keeps the oracle green cannot silently redefine
  * them. */
class GroupAASpec extends SparkSpec {

  private def q(name: String) = GroupAA.all.find(_.name == name).get.fn

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute per-(type, day) (count, decimal-exact mean) — the registered
    * rule (the GroupZSpec helper plus the count column). */
  private lazy val dailyStats: Map[(String, Long), (Long, Double)] =
    graft.queries.Q.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day",
        "value")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (k, xs) =>
        val s = xs.map(x => BigDecimal(x._2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        k -> (xs.size.toLong, s.toDouble / xs.size.toDouble)
      }

  private def series(t: String): Seq[(Long, Long, Double)] =
    dailyStats.collect { case ((`t`, d), (c, m)) => (d, c, m) }
      .toSeq.sortBy(_._1)

  private def types: Seq[String] = dailyStats.keys.map(_._1).toSeq.distinct

  test("q_kendall_tau equals brute concordant/discordant day-pair counts " +
    "(strict τ-a sign agreement) with truncating ppm division") {
    val expect = types.map { t =>
      val s = series(t)
      val pairs = for {
        i <- s.indices; j <- (i + 1) until s.size
      } yield (s(i), s(j))
      val c = pairs.count { case ((_, ca, ma), (_, cb, mb)) =>
        (ca > cb && ma > mb) || (ca < cb && ma < mb) }
      val d = pairs.count { case ((_, ca, ma), (_, cb, mb)) =>
        (ca > cb && ma < mb) || (ca < cb && ma > mb) }
      (t, pairs.size.toLong, c.toLong, d.toLong,
        BigInt(1000000) * (c - d) / pairs.size)
    }.sortBy(_._1)
    val got = q("q_kendall_tau")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigInt(r.getLong(4)))).toSeq
    assert(got == expect)
  }

  test("q_kruskal_wallis equals brute global (m, t, day)-ranked sums and " +
    "the truncated-quotient integer H") {
    val all = dailyStats.toSeq
      .map { case ((t, d), (_, m)) => (m, t, d) }
      .sortBy(x => (x._1, x._2, x._3))
      .zipWithIndex.map { case ((m, t, d), i) => (t, i + 1L) }
    val rs = all.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.size.toLong, xs.map(_._2).sum) }
    val bigN = BigInt(all.size)
    val sq = rs.values.map { case (n, r) =>
      BigInt(1000000) * r * r / n }.sum
    val h = BigInt(12) * sq / (bigN * (bigN + 1)) - 3000000 * (bigN + 1)
    val expect = rs.toSeq.sortBy(_._1).map { case (t, (n, r)) =>
      (t, n, r, h) }
    val got = q("q_kruskal_wallis")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        BigInt(r.getLong(3)))).toSeq
    assert(got == expect)
  }

  test("q_page_hinkley equals the brute running-mean fold with δ = μ/8, " +
    "λ = μ/2, min-tracking, and per-step alarm/excursion accounting") {
    val expect = types.map { t =>
      val s = series(t).map { case (_, _, m) => m }
      val mu = s.map(x => BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        s.size.toDouble
      val (delta, lambda) = (mu / 8, mu / 2)
      var mean = 0.0; var g = 0.0; var mn = 0.0; var n = 0L
      var alarms = 0L; var mx = Double.NegativeInfinity
      s.foreach { x =>
        if (n == 0L) { mean = x; g = 0.0 + ((x - x) - delta); mn = g }
        else {
          mean = mean + (x - mean) / (n + 1).toDouble
          g = g + ((x - mean) - delta)
          mn = math.min(mn, g)
        }
        n += 1
        val exc = g - mn
        if (exc > lambda) alarms += 1
        mx = math.max(mx, exc)
      }
      (t, n, round6(mean), round6(g), round6(mx), alarms)
    }.sortBy(_._1)
    val got = q("q_page_hinkley")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == expect)
  }

  test("q_lsh_curve and q_dup_threshold_sweep equal brute S-curve math " +
    "and threshold counting over the collected pair artifact") {
    // same construction as the session artifact (jaccardPairs is
    // package-private): verified ≥0.95 banded near-dup pairs
    val pairs = {
      import org.apache.spark.sql.functions.{col, size}
      val docs = graft.queries.Q.tbl(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.ops.DedupOps.sortedTokenSet(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
      graft.ops.DedupOps.nearDupPairs(docs).collect()
        .map(r => (r.getLong(r.fieldIndex("a_id")),
          r.getLong(r.fieldIndex("b_id")), r.getDouble(r.fieldIndex("jac"))))
    }
    assert(pairs.nonEmpty)
    // S-curve per bucket: the exact multiply chains, never pow()
    val expCurve = pairs.groupBy(p => math.floor(p._3 * 100).toLong)
      .map { case (bucket, ps) =>
        // clamped midpoint: the exact-dup bucket (100) scores at s=1.0
        val s = math.min((bucket.toDouble + 0.5) / 100, 1.0)
        val s2 = s * s; val s4 = s2 * s2; val s8 = s4 * s4
        val p28 = 1 - (1 - s8) * (1 - s8)
        val q4 = 1 - s4
        val p44 = 1 - (q4 * q4) * (q4 * q4)
        (bucket, ps.size.toLong, math.floor(1000000 * p28).toLong,
          math.floor(1000000 * p44).toLong,
          math.floor(ps.size.toDouble * p28).toLong)
      }.toSeq.sortBy(_._1)
    val gotCurve = graft.queries.GroupAA.all.find(_.name == "q_lsh_curve")
      .get.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(gotCurve == expCurve)
    val expSweep = (0 until 6).map { i =>
      val t = 950000L + 10000L * i
      val hit = pairs.filter(_._3 * 1000000 >= t)
      (t, hit.size.toLong, hit.map(_._2).distinct.size.toLong)
    }
    val gotSweep = graft.queries.GroupAA.all
      .find(_.name == "q_dup_threshold_sweep").get.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotSweep == expSweep)
  }

  test("q_runs_test equals brute above/below-lower-median run counting " +
    "and the exact expected-runs ppm") {
    val expect = types.map { t =>
      val s = series(t)
      val med = s.map { case (d, _, m) => (m, d) }.sorted
        .apply((s.size + 1) / 2 - 1)._1
      val ab = s.map { case (_, _, m) => if (m > med) 1L else 0L }
      val runs = 1L + ab.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
      val (n1, n2) = (ab.sum, ab.size - ab.sum)
      (t, ab.size.toLong, n1, n2, runs,
        BigInt(1000000) * (n1 + n2 + 2 * n1 * n2) / (n1 + n2))
    }.sortBy(_._1)
    val got = q("q_runs_test")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), BigInt(r.getLong(5)))).toSeq
    assert(got == expect)
  }
}
