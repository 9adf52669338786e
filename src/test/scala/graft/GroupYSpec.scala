package graft

import graft.queries.GroupY

import java.nio.file.Files
import java.sql.Timestamp

/** Group Y semantics pinned against independent in-JVM brute force: the
  * EWMA fold, the two-level concurrency sweep (including a synthetic
  * midnight-crossing session and a start-touches-end tie), and the exact
  * W₁ integral. The driver's DuckDB gate checks the same queries
  * hash-exactly; these specs pin the SEMANTICS so a plan change that
  * keeps the oracle green cannot silently redefine them.
  */
class GroupYSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = GroupY.all.find(_.name == name).get.fn

  private val DayUs = 86400000000L
  private val GapUs = 1800000000L

  /** Raw (user, us, value) stream from the fixture, event-id ordered. */
  private lazy val raw: Seq[(Long, Long, Double)] =
    graft.queries.Q.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "value", "event_id")
      .collect()
      .sortBy(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq

  /** HALF_UP at `scale` — Spark's round() semantics. */
  private def roundAt(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def round6(x: Double): Double = roundAt(x, 6)

  test("q_ewma equals the per-user (x + 3y)/4 fold in time order") {
    val expect = raw.groupBy(_._1).map { case (u, es) =>
      val y = es.map(_._3).reduceLeft((acc, x) => (x + 3 * acc) / 4)
      (u, es.size.toLong, round6(y))
    }.toSeq.sortBy(_._1)
    val got = q("q_ewma")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
  }

  test("q_holt equals the per-user double-exponential fold in time order") {
    val expect = raw.groupBy(_._1).map { case (u, es) =>
      val (l, b) = es.map(_._3).tail
        .foldLeft((es.head._3, 0.0)) { case ((l, b), x) =>
          val lp = (x + 3 * (l + b)) / 4
          (lp, (lp - l) / 2 + b / 2)
        }
      (u, es.size.toLong, round6(l), round6(b), round6(l + b))
    }.toSeq.sortBy(_._1)
    val got = q("q_holt")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
  }

  /** Brute per-(type, day) means mirroring the registered decimal-exact
    * rule: each value rounded to DECIMAL(25,6), exact sum, one double
    * divide. */
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

  test("q_mann_kendall equals the brute pairwise sign sum over daily means") {
    val expect = dailyMeans.groupBy(_._1._1).map { case (t, ms) =>
      val series = ms.toSeq.sortBy(_._1._2).map(_._2)
      val s = (for {
        i <- series.indices; j <- series.indices if i < j
      } yield math.signum(series(j) - series(i)).toLong).sum
      val half = series.size.toLong * (series.size - 1) / 2
      (t, series.size.toLong, s, 1000000 * s / half)
    }.toSeq.sortBy(_._1)
    val got = q("q_mann_kendall")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
  }

  test("q_theil_sen equals the brute lower-median of pairwise slopes") {
    val expect = dailyMeans.groupBy(_._1._1).map { case (t, ms) =>
      val series = ms.toSeq.sortBy(_._1._2)
      val slopes = (for {
        i <- series.indices; j <- series.indices if i < j
      } yield (series(j)._2 - series(i)._2) /
        (series(j)._1._2 - series(i)._1._2).toDouble).sorted
      (t, slopes.size.toLong, roundAt(slopes((slopes.size - 1) / 2), 9))
    }.toSeq.sortBy(_._1)
    val got = q("q_theil_sen")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
  }

  /** Brute concurrency: sessionize, clip to days, sort (+1 before −1 at
    * ties), sweep. */
  private def bruteConcurrency(
      rows: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val sessions = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ts = es.map(_._2).sorted
      val runs = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head <= GapUs) (t :: acc.head) :: acc.tail
        else List(t) :: acc
      }
      runs.map(r => (r.last, r.head)) // (start, end)
    }
    sessions
      .flatMap { case (s, e) =>
        (s / DayUs to e / DayUs).map { d =>
          (d, math.max(s, d * DayUs), math.min(e, (d + 1) * DayUs))
        }
      }
      .groupBy(_._1).toSeq.map { case (d, ivs) =>
        val pts = ivs.flatMap { case (_, s, e) => Seq((s, 1L), (e, -1L)) }
          .sortBy { case (t, delta) => (t, -delta) }
        var cur = 0L
        var peak = 0L
        pts.foreach { p => cur += p._2; peak = math.max(peak, cur) }
        (d, ivs.size.toLong, peak)
      }
      .sortBy(_._1)
  }

  test("q_peak_concurrency: the two-level cell scan equals the brute " +
    "single sweep on the fixture") {
    val expect = bruteConcurrency(raw.map(r => (r._1, r._2)))
    val got = q("q_peak_concurrency")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("q_peak_concurrency: midnight-crossing session counts on both " +
    "days; a session starting the instant another ends is concurrent") {
    val dir = Files.createTempDirectory("groupy-events").toString
    def ev(id: Long, user: Long, us: Long) =
      (id, new Timestamp(us / 1000), user, "view", 1.0, "{}")
    // user 1: one session 23:50 → 00:10 (crosses midnight of day 1)
    // users 2 & 3 on day 1: u3's session starts at the exact instant
    // u2's ends → concurrent under the starts-first tie rule
    val d1 = 19723L * DayUs
    val rows = Seq(
      ev(1, 1, d1 + DayUs - 600000000L), ev(2, 1, d1 + DayUs + 600000000L),
      ev(3, 2, d1 + 1000000000L), ev(4, 2, d1 + 2000000000L),
      ev(5, 3, d1 + 2000000000L), ev(6, 3, d1 + 3000000000L))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = q("q_peak_concurrency")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // day 19723: u1 (clipped), u2, u3 — peak 2 (u2 end == u3 start)
    // day 19724: u1's tail only
    assert(got == Seq((19723L, 3L, 2L), (19724L, 1L, 1L)))
    assert(got == bruteConcurrency(
      rows.map(r => (r._3, r._2.getTime * 1000L))))
  }

  test("q_chi_square equals the brute 2x2 contingency statistic") {
    // every user with any event appears; a purchase-free user maps false
    val conv = graft.queries.Q.events(spark, sfDir)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (u, es) =>
        u -> (es.count(_._2 == "purchase") >= 14)
      }
    val a = conv.count { case (u, s) => u % 2 == 0 && s }.toLong
    val b = conv.count { case (u, s) => u % 2 == 0 && !s }.toLong
    val c = conv.count { case (u, s) => u % 2 == 1 && s }.toLong
    val d = conv.count { case (u, s) => u % 2 == 1 && !s }.toLong
    val sel = BigDecimal(a) * BigDecimal(d) - BigDecimal(b) * BigDecimal(c)
    val chi2 = round6((BigDecimal(a + b + c + d) * sel * sel).toDouble /
      (BigDecimal(a + b) * BigDecimal(c + d) * BigDecimal(a + c)
        * BigDecimal(b + d)).toDouble)
    val r = q("q_chi_square")(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((a, b, c, d)))
    assert(r.getLong(4) == 1000000 * a / (a + b))
    assert(r.getLong(5) == 1000000 * c / (c + d))
    assert(r.getDouble(6) == chi2)
  }

  test("q_kaplan_meier equals the brute censored product-limit curve") {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val horizon = rows.map(_._2).max
    val perCust = rows.groupBy(_._1).values.map { os =>
      val ds = os.map(_._2)
      val dur = java.time.temporal.ChronoUnit.DAYS
        .between(ds.min, ds.max).toInt
      val censored = java.time.temporal.ChronoUnit.DAYS
        .between(ds.max, horizon) < 90
      (dur, censored)
    }.toSeq
    val ends = perCust.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, xs) =>
      (dur, xs.size.toLong, xs.count(!_._2).toLong)
    }
    var atRiskLeft = perCust.size.toLong
    var s = 1.0
    val expect = ends.flatMap { case (dur, ending, deaths) =>
      val atRisk = atRiskLeft
      atRiskLeft -= ending
      if (deaths > 0) {
        s = s * ((atRisk - deaths).toDouble / atRisk.toDouble)
        Some((dur.toLong, atRisk, deaths, roundAt(s, 9)))
      } else None
    }
    val got = q("q_kaplan_meier")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expect)
    // survival is monotone non-increasing and starts ≤ 1
    assert(got.map(_._4).sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
  }

  test("q_mann_whitney equals the brute pairwise-comparison U and AUC") {
    val byType = graft.queries.Q.events(spark, sfDir)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val xs = byType.filter(_._1 == "purchase").map(_._2)
    val ys = byType.filter(_._1 == "view").map(_._2).sorted
    def lower(v: Double) = {
      var lo = 0; var hi = ys.length
      while (lo < hi) { val m = (lo + hi) / 2
        if (ys(m) < v) lo = m + 1 else hi = m }
      lo
    }
    def upper(v: Double) = {
      var lo = 0; var hi = ys.length
      while (lo < hi) { val m = (lo + hi) / 2
        if (ys(m) <= v) lo = m + 1 else hi = m }
      lo
    }
    // 2U1 = 2·#{x>y} + #{x=y}
    val u1x2 = xs.map(x => 2L * lower(x) + (upper(x) - lower(x))).sum
    val n1 = xs.length.toLong; val n2 = ys.length.toLong
    val r = q("q_mann_whitney")(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n1, n2, u1x2, 1000000L * u1x2 / (2 * n1 * n2))))
  }

  test("q_log_rank equals the brute O-E hypergeometric accumulation") {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val horizon = rows.map(_._2).max
    val perCust = rows.groupBy(_._1).map { case (ck, os) =>
      val ds = os.map(_._2)
      val dur = java.time.temporal.ChronoUnit.DAYS
        .between(ds.min, ds.max).toInt
      val cens = java.time.temporal.ChronoUnit.DAYS
        .between(ds.max, horizon) < 90
      (dur, ck % 2 == 0, cens)
    }.toSeq
    val byDur = perCust.groupBy(_._1).toSeq.sortBy(_._1)
    var ar = perCust.size.toLong
    var ar0 = perCust.count(_._2).toLong
    var o1 = 0L
    var e1s, vs = BigDecimal(0)
    var nDeathTimes = 0L
    byDur.foreach { case (_, xs) =>
      val d = xs.count(!_._3).toLong
      if (d > 0) {
        nDeathTimes += 1
        o1 += xs.count(x => x._2 && !x._3)
        val e1 = (BigDecimal(d) * BigDecimal(ar0)).toDouble / ar.toDouble
        val v =
          if (ar == 1) 0.0
          else (BigDecimal(d) * BigDecimal(ar - d) * BigDecimal(ar0)
            * BigDecimal(ar - ar0)).toDouble /
            (BigDecimal(ar) * BigDecimal(ar) * BigDecimal(ar - 1)).toDouble
        e1s += BigDecimal(e1).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        vs += BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      ar -= xs.size
      ar0 -= xs.count(_._2)
    }
    val chi2 = round6((o1.toDouble - e1s.toDouble)
      * (o1.toDouble - e1s.toDouble) / vs.toDouble)
    val r = q("q_log_rank")(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) ==
      ((nDeathTimes, o1, round6(e1s.toDouble), round6(vs.toDouble), chi2)))
  }

  test("q_hll_distinct equals the brute FNV register sketch") {
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_orderkey").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).toSeq.map { case (g, ks) =>
      val hs = ks.map(k =>
        graft.ops.expr.Mix64.mix(graft.ops.expr.Fnv1a64.hash(s"hll:${k._2}")))
      val regs = hs.groupBy(_ & 255L).values.map(_.map { h =>
        val x = h >>> 8
        if (x == 0L) 57 else java.lang.Long.numberOfTrailingZeros(x) + 1
      }.max)
      val vEmpty = 256 - regs.size
      val sAll = regs.map(m => BigDecimal(1L << (57 - m))).sum +
        BigDecimal(vEmpty) * BigDecimal(1L << 57)
      val est4 = roundAt(
        (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * (1L << 57).toDouble
          / sAll.toDouble, 4)
      val n = ks.length
      (g, n.toLong, vEmpty.toLong, est4,
        math.floor(1000000.0 * (est4 - n) / n).toLong)
    }.sortBy(_._1)
    val got = q("q_hll_distinct")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    // accuracy floor: with the Mix64 finalizer the dense-orderkey groups
    // land within ~3σ of exact (σ = 6.5% at m = 256); the raw FNV fold's
    // 20–45% dense-key bias would trip this
    got.foreach { case (g, _, _, _, err) =>
      assert(math.abs(err) < 200000, s"$g: err_ppm $err")
    }
  }

  test("q_bloom_fpr equals the brute bloom build + probe on the same " +
    "salted FNV positions") {
    val keys = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val members = keys.filter(_ % 2 == 0).map(_.toString)
    val probes = keys.filter(_ % 2 != 0).map(_.toString)
    def pos(k: String): Set[Long] = (0 until 4).map { i =>
      val h = graft.ops.expr.Fnv1a64.hash(s"bf:$i:$k")
      ((h % 2048) + 2048) % 2048
    }.toSet
    val bits = members.flatMap(pos).toSet
    val fps = probes.count(p => pos(p).subsetOf(bits)).toLong
    val r = q("q_bloom_fpr")(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((2048L, 4L, members.length.toLong, bits.size.toLong,
        probes.length.toLong, fps, 1000000L * fps / probes.length)))
  }

  test("q_peak_concurrency plan: the sweep windows partition by " +
    "(day, cell) — never a whole day in one partition") {
    val plan = q("q_peak_concurrency")(spark, sfDir)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the per-cell running sum (2 keys) + the per-day ≤24-row cell-total
    // prefix (1 key); the sessionize windows partition by user. NO window
    // may partition by `day` alone — that is the whole-day serialization
    // the two-level scan exists to avoid.
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "partition-less window")
      val keys = w.partitionSpec.map(_.references.map(_.name).mkString)
      val dayAlone = w.partitionSpec.size == 1 && keys.headOption.contains("day")
      // the one single-key day window is the ≤24-row cell-total prefix:
      // its ORDER key must be `cell` (bounded frame), not a time axis
      if (dayAlone)
        assert(w.orderSpec.flatMap(_.references.map(_.name)) == Seq("cell"),
          s"whole-day window ordered by ${w.orderSpec}")
    }
  }

  test("q_wasserstein_drift matches the brute ∫|CDF gap| and is zero " +
    "for an identical distribution") {
    val vals = raw.map(_._3)
    val byType = graft.queries.Q.events(spark, sfDir)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val pooled = vals.distinct.sorted
    val n = byType.size.toLong
    def brute(t: String): Double = {
      val mine = byType.filter(_._1 == t).map(_._2)
      val nt = mine.size.toLong
      var cumT = 0L
      var cumAll = 0L
      var acc = BigDecimal(0)
      pooled.zip(pooled.tail).foreach { case (v, vn) =>
        cumT += mine.count(_ == v)
        cumAll += vals.count(_ == v)
        val gap = math.abs(cumT * (n - nt) - (cumAll - cumT) * nt)
        acc += BigDecimal((vn - v) * gap.toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      round6(acc.toDouble / (nt * (n - nt)).toDouble)
    }
    val got = q("q_wasserstein_drift")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap
    got.foreach { case (t, w1) =>
      assert(w1 >= 0.0)
      assert(math.abs(w1 - brute(t)) <= 1e-9, s"$t: $w1 vs ${brute(t)}")
    }
    // two types drawn as exact copies of each other → W₁ = 0 for both
    val dir = Files.createTempDirectory("groupy-w1").toString
    val twin = (1L to 50L).flatMap { i =>
      Seq((2 * i, new Timestamp(i * 1000), i, "a", i * 0.5, "{}"),
        (2 * i + 1, new Timestamp(i * 1000), i, "b", i * 0.5, "{}"))
    }
    twin.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val zero = q("q_wasserstein_drift")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(zero.toSeq.sorted == Seq(("a", 0.0), ("b", 0.0)))
  }
}
