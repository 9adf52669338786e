package graft

import graft.queries.GroupAB

/** Group AB semantics pinned against independent in-JVM brute force: the
  * exact-integer total-variation distance, the Friedman blocked-rank
  * statistic, the token-budgeted shard assignment, the Poisson-bootstrap
  * weight distribution, CUPED's variance-reduction guarantee, and the
  * detector-audit count invariants. The driver's DuckDB gate checks the
  * same queries hash-exactly; these pin the SEMANTICS so a plan change
  * that keeps the oracle green cannot silently redefine them. */
class GroupABSpec extends SparkSpec {

  private def q(name: String) = GroupAB.all.find(_.name == name).get.fn

  test("q_source_divergence equals exact BigInt total variation over " +
    "brute token counts") {
    val counts: Map[(String, String), Long] =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("source", "lower(text) AS text").collect()
        .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
          .map(t => (r.getString(0), t)))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val tot: Map[String, BigInt] = counts.groupBy(_._1._1)
      .map { case (s, m) => s -> BigInt(m.values.sum) }
    val sources = tot.keys.toSeq.sorted
    val expect = (for {
      i <- sources.indices; j <- (i + 1) until sources.size
      (sa, sb) = (sources(i), sources(j))
    } yield {
      val (ta, tb) = (tot(sa), tot(sb))
      val vocab = counts.keys.collect {
        case (s, t) if s == sa || s == sb => t }.toSet
      val sd = vocab.toSeq.map { t =>
        val ca = BigInt(counts.getOrElse((sa, t), 0L))
        val cb = BigInt(counts.getOrElse((sb, t), 0L))
        (ca * tb - cb * ta).abs
      }.sum
      (sa, sb) -> ((BigInt(1000000) * sd) / (2 * ta * tb)).toLong
    }).toMap
    val got = q("q_source_divergence")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("q_friedman equals brute blocked ranks with the (m, t) total " +
    "tiebreak over complete calendar days") {
    val daily: Map[(String, Long), Double] =
      graft.queries.Q.events(spark, sfDir)
        .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day",
          "value")
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (k, xs) =>
          val s = xs.map(x => BigDecimal(x._2)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
          k -> (s.toDouble / xs.size.toDouble)
        }
    val k = daily.keys.map(_._1).toSet.size
    val completeDays = daily.keys.groupBy(_._2)
      .collect { case (d, ks) if ks.size == k => d }.toSeq
    val rankSums: Map[String, Long] = completeDays.flatMap { d =>
      daily.collect { case ((t, `d`), m) => (t, m) }.toSeq
        .sortBy { case (t, m) => (m, t) }
        .zipWithIndex.map { case ((t, _), i) => t -> (i + 1).toLong }
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val n = completeDays.size.toLong
    val ss = rankSums.values.map(rs => BigInt(rs) * rs).sum
    val chi2 = ((BigInt(12000000) * ss) / (BigInt(n) * k * (k + 1))
      - BigInt(3000000) * n * (k + 1)).toLong
    val got = q("q_friedman")(spark, sfDir).collect()
    assert(got.length == k)
    got.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)} n_blocks")
      assert(r.getLong(2) == rankSums(r.getString(0)),
        s"${r.getString(0)} rank_sum")
      assert(r.getLong(3) == chi2, s"${r.getString(0)} chi2_ppm")
    }
  }

  test("q_shard_plan equals brute per-lang start-offset assignment and " +
    "shards partition each language's corpus in id order") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("lang", "doc_id",
        "CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).toSeq.map { case (lang, id, tok) =>
        val shard = cum / 4000; cum += tok
        ((lang, shard), (id, tok))
      }
    }.groupBy(_._1).map { case (key, xs) =>
      val ids = xs.map(_._2._1)
      key -> ((xs.size.toLong, xs.map(_._2._2).sum, ids.min, ids.max))
    }
    val got = q("q_shard_plan")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    // shards are contiguous from 0 and id ranges never interleave
    got.keys.groupBy(_._1).foreach { case (lang, ks) =>
      val shards = ks.map(_._2).toSeq.sorted
      assert(shards == (0L until shards.size).toSeq, s"$lang shard ids")
      val ranges = shards.map(s => got((lang, s)))
      ranges.sliding(2).foreach {
        case Seq((_, _, _, lastA), (_, _, firstB, _)) =>
          assert(lastA < firstB, s"$lang shard ranges interleave")
        case _ =>
      }
    }
  }

  test("q_poisson_bootstrap: hash buckets realize the 6/6/3/1 Poisson(1) " +
    "quantization and the CI brackets the point mean") {
    // re-derive the registered bucket rule over the fixture and check the
    // weight histogram is near the designed pmf (hash uniformity)
    import org.apache.spark.sql.functions._
    val repChars = typedLit((48 to 63).map(_.toChar.toString))
    val perRow = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(lit("bs:"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("string"),
        lit(":")).as("ks"))
      .withColumn("b", explode(sequence(lit(0), lit(15))))
      .withColumn("hb", graft.ops.VectorOps.fnv1a64(
        concat(col("ks"), element_at(repChars, col("b") + 1))))
      .select(col("ks"), col("b").cast("long").as("b"),
        pmod(col("hb"), lit(16L)).as("bucket"))
    val buckets = perRow.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = buckets.values.sum.toDouble
    (0L to 15L).foreach { b =>
      val share = buckets.getOrElse(b, 0L) / total
      assert(math.abs(share - 1.0 / 16) < 0.01,
        s"bucket $b share $share not uniform")
    }
    // the balanced-design contract: with replicate codes distinct mod 16,
    // each row's bucket map b ↦ 3·(kh₄⊕b) mod 16 is a BIJECTION — every
    // row sees every bucket exactly once across its 16 replicates (so
    // replicate pairs disagree on every row, where the old hex codes made
    // replicate 10 ≡ 1 … 15 ≡ 6 identical on every row)
    val byRow: Map[String, Set[Long]] = perRow.collect()
      .groupBy(_.getString(0))
      .map { case (ks, rs) => ks -> rs.map(_.getLong(2)).toSet }
    byRow.foreach { case (ks, bs) =>
      assert(bs.size == 16, s"row $ks buckets not a bijection: $bs")
    }
    val rows = q("q_poisson_bootstrap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= mean && mean <= hi,
        s"${r.getString(0)}: CI [$lo, $hi] misses point mean $mean")
      assert(lo < hi, s"${r.getString(0)}: degenerate CI")
    }
  }

  test("q_cuped: adjusted variance never exceeds the raw variance and " +
    "theta matches a double-precision brute force") {
    val r = q("q_cuped")(spark, sfDir).collect().head
    val (n, theta, varY, varAdj) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0)
    assert(varAdj <= varY, s"CUPED increased variance: $varAdj > $varY")
    // brute force in plain doubles (summation order differs from the
    // decimal-exact plan, so compare loosely — the oracle gate holds the
    // exact contract)
    val e = graft.queries.Q.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (e.map(_._2).min + e.map(_._2).max) / 2
    val users = e.groupBy(_._1).flatMap { case (_, xs) =>
      val (pre, post) = xs.partition(_._2 <= mid)
      if (pre.nonEmpty && post.nonEmpty)
        Some((pre.map(_._3).sum / pre.size, post.map(_._3).sum / post.size))
      else None
    }.toSeq
    val nn = users.size.toDouble
    val (sx, sy) = (users.map(_._1).sum, users.map(_._2).sum)
    val sxy = users.map(u => u._1 * u._2).sum
    val sxx = users.map(u => u._1 * u._1).sum
    val bruteTheta = ((sxy - sx * sy / nn) / nn) / ((sxx - sx * sx / nn) / nn)
    assert(users.size == n)
    assert(math.abs(theta / 1e6 - bruteTheta) < 1e-3,
      s"theta ${theta / 1e6} vs brute $bruteTheta")
  }

  test("q_detector_agreement: two detector rows with consistent counts " +
    "and ppm rates in range") {
    val rows = q("q_detector_agreement")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("minhash", "simhash"))
    rows.foreach { r =>
      val (det, truth, hits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (prec, rec) = (r.getLong(4), r.getLong(5))
      assert(hits <= det && hits <= truth, s"${r.getString(0)} counts")
      assert(prec >= -1 && prec <= 1000000, s"${r.getString(0)} precision")
      assert(rec >= -1 && rec <= 1000000, s"${r.getString(0)} recall")
      if (det > 0) assert(prec == 1000000L * hits / det)
      if (truth > 0) assert(rec == 1000000L * hits / truth)
    }
  }
}
