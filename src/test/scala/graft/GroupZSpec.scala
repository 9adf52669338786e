package graft

import graft.queries.GroupZ

/** Group Z semantics pinned against independent in-JVM brute force: the
  * CUSUM fold, the X̄–R subgroup limits, Spearman's Σd² with the
  * deterministic day tie-break, the cross-split near-dup pair set, and
  * the count-group nucleus construction. The driver's DuckDB gate checks
  * the same queries hash-exactly; these pin the SEMANTICS so a plan
  * change that keeps the oracle green cannot silently redefine them. */
class GroupZSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = GroupZ.all.find(_.name == name).get.fn

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute per-(type, day) means mirroring the registered decimal-exact
    * rule (the GroupYSpec helper, reproduced). */
  private lazy val dailyMeans: Map[(String, Long), Double] =
    graft.queries.Q.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day",
        "value")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (k, xs) =>
        val s = xs.map(x => BigDecimal(x._2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        k -> s.toDouble / xs.size.toDouble
      }

  test("q_cusum equals the brute max(0, s + (m − μ) − μ/8) fold in day " +
    "order, with first-max argmax and h = μ/2 alarms") {
    val expect = dailyMeans.groupBy(_._1._1).map { case (t, ms) =>
      val series = ms.toSeq.map { case ((_, d), m) => (d, m) }.sortBy(_._1)
      val mu = series.map(x => BigDecimal(x._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        series.size.toDouble
      var cs = 0.0; var mx = Double.NegativeInfinity
      var mxDay = 0L; var alarms = 0L; var first = true
      series.foreach { case (d, m) =>
        val step = m - mu - mu / 8
        cs = math.max(0.0, if (first) step else cs + step)
        first = false
        if (cs > mx) { mx = cs; mxDay = d }
        if (cs > mu / 2) alarms += 1
      }
      (t, series.size.toLong, round6(mx), mxDay, alarms)
    }.toSeq.sortBy(_._1)
    val got = q("q_cusum")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("q_control_chart equals brute complete-week X̄–R subgroups with " +
    "A2 = 419/1000, D4 = 1924/1000 limits") {
    val expect = dailyMeans.groupBy(_._1._1).flatMap { case (t, ms) =>
      val weeks = ms.toSeq.map { case ((_, d), m) => (d / 7, m) }
        .groupBy(_._1).filter(_._2.size == 7)
        .map { case (w, xs) =>
          val xbar = xs.map(x => BigDecimal(x._2)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / 7.0
          (w, xbar, xs.map(_._2).max - xs.map(_._2).min)
        }.toSeq
      if (weeks.isEmpty) None
      else {
        val center = weeks.map(x => BigDecimal(x._2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          weeks.size.toDouble
        val rbar = weeks.map(x => BigDecimal(x._3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          weeks.size.toDouble
        val ucl = center + (419.0 * rbar) / 1000.0
        val lcl = center - (419.0 * rbar) / 1000.0
        val nOut = weeks.count(w => w._2 > ucl || w._2 < lcl).toLong
        val nROut = weeks.count(_._3 > (1924.0 * rbar) / 1000.0).toLong
        Some((t, weeks.size.toLong, round6(center), round6(rbar),
          round6(ucl), round6(lcl), nOut, nROut))
      }
    }.toSeq.sortBy(_._1)
    val got = q("q_control_chart")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expect)
  }

  test("q_holt_winters equals the brute additive-seasonal fold with " +
    "7-slot state in day order") {
    val expect = dailyMeans.groupBy(_._1._1).map { case (t, ms) =>
      val sorted = ms.toSeq.map { case ((_, d), m) => (d, m) }.sortBy(_._1)
      var l = sorted.head._2; var b = 0.0
      val sv = Array.fill(7)(0.0)
      sorted.zipWithIndex.drop(1).foreach { case ((_, x), i) =>
        val slot = i % 7
        val sOld = sv(slot)
        val lp = ((x - sOld) + 3.0 * (l + b)) / 4.0
        val bp = (lp - l) / 2.0 + b / 2.0
        sv(slot) = (x - lp) / 2.0 + sOld / 2.0
        l = lp; b = bp
      }
      val f1 = (l + b) + sv(sorted.size % 7)
      (t, sorted.size.toLong, round6(l), round6(b), round6(f1),
        round6(sv.max - sv.min))
    }.toSeq.sortBy(_._1)
    val got = q("q_holt_winters")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect)
  }

  test("q_seasonal_strength equals brute between-over-total sum of " +
    "squares on the dow factor") {
    def dec6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = dailyMeans.groupBy(_._1._1).map { case (t, ms) =>
      val series = ms.toSeq.map { case ((_, d), m) => (d, m) }
      val gm = series.map(x => dec6(x._2)).sum.toDouble / series.size.toDouble
      val byDow = series.groupBy(_._1 % 7)
      val bss = byDow.values.map { xs =>
        val dm = xs.map(x => dec6(x._2)).sum.toDouble / xs.size.toDouble
        BigDecimal(xs.size) * dec6(dm - gm) * dec6(dm - gm)
      }.sum
      val tss = series.map(x => dec6(x._2 - gm) * dec6(x._2 - gm)).sum
      val ppm =
        if (tss.toDouble == 0.0) 0L
        else math.floor(1000000.0 * bss.toDouble / tss.toDouble).toLong
      (t, series.size.toLong, ppm)
    }.toSeq.sortBy(_._1)
    val got = q("q_seasonal_strength")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("q_spearman_corr equals brute row_number ranks tie-broken by day") {
    val counts: Map[(String, Long), Long] =
      graft.queries.Q.events(spark, sfDir)
        .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expect = dailyMeans.groupBy(_._1._1).map { case (t, ms) =>
      val days = ms.keys.map(_._2).toSeq.sorted
      val rc = days.sortBy(d => (counts((t, d)), d)).zipWithIndex
        .map { case (d, i) => d -> (i + 1L) }.toMap
      val rm = days.sortBy(d => (ms((t, d)), d)).zipWithIndex
        .map { case (d, i) => d -> (i + 1L) }.toMap
      val d2 = days.map(d => { val x = rc(d) - rm(d); BigInt(x) * BigInt(x) })
        .sum
      val n = BigInt(days.size)
      val rho = BigInt(1000000) - (BigInt(6000000) * d2) / (n * (n * n - 1))
      (t, days.size.toLong, d2.toLong, rho.toLong)
    }.toSeq.sortBy(_._1)
    val got = q("q_spearman_corr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
  }

  test("q_split_leakage equals brute all-pairs ≥0.95 Jaccard filtered to " +
    "cross-split endpoints") {
    val docs = graft.queries.Q.tbl(spark, sfDir, "documents")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").filter(_.nonEmpty).toSet))
      .filter(_._3.nonEmpty)
    def split(id: Long): String =
      if (id % 10 <= 7) "train" else if (id % 10 == 8) "validation" else "test"
    val expect = (for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1
      jac = round6(a._3.intersect(b._3).size.toDouble /
        a._3.union(b._3).size.toDouble)
      if jac >= 0.95 && split(a._1) != split(b._1)
    } yield (a._1, b._1, split(a._1), split(b._1), jac))
      .sortBy(p => (p._1, p._2)).toSeq
    val got = q("q_split_leakage")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
    // the fixture must actually exercise the cross-split case
    assert(expect.nonEmpty, "fixture has no cross-split near-dup pairs")
  }

  test("q_vocab_nucleus equals the brute term-rank prefix reaching 90% " +
    "of token mass") {
    val toks = graft.queries.Q.tbl(spark, sfDir, "documents")
      .selectExpr("lang", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val expect = toks.groupBy(_._1).map { case (lang, ts) =>
      val tf = ts.groupBy(_._2).map { case (t, xs) => (t, xs.size.toLong) }
        .toSeq.sortBy { case (t, c) => (-c, t) }
      val total = tf.map(_._2).sum
      val target = (total * 9 + 9) / 10 // ceil(0.9 · total)
      var cum = 0L; var k = 0L
      tf.iterator.takeWhile(_ => cum < target).foreach { case (_, c) =>
        cum += c; k += 1
      }
      (lang, tf.size.toLong, total, k, 1000000L * k / tf.size)
    }.toSeq.sortBy(_._1)
    val got = q("q_vocab_nucleus")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
  }
}
