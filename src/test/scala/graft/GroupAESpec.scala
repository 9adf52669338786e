package graft

/** Group AE (k-detector agreement + retrieval evaluation + multiple
  * testing): every statistic re-derived INDEPENDENTLY in plain Scala from
  * the same inputs the registered queries consume — BigInt arithmetic for
  * the integer contracts, exact factorial binomials for the sign-test
  * tail — and compared bit-for-bit. The DuckDB oracle guards engine
  * equivalence; these pins guard the FORMULAS. */
class GroupAESpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth = pairSet(
    graft.queries.PipelineQueries.jaccardPairs(spark, sfDir))
  private lazy val exact = pairSet(
    graft.queries.GroupAE.exactTokPairs(spark, sfDir))
  private lazy val mh = pairSet(
    graft.queries.PipelineDedup.minhashPairs(spark, sfDir))
  private lazy val sh = pairSet(
    graft.queries.PipelineDedup.simhashPairs(spark, sfDir))

  test("q_cochran_q equals the BigInt reimplementation from the raw pair " +
    "sets, and its inputs are sane") {
    val row = q("q_cochran_q").collect().head
    val hits = truth.toSeq.map { p =>
      Seq(exact(p), mh(p), sh(p)).count(identity).toLong
    }
    val (ce, cm, cs) = (truth.count(exact), truth.count(mh), truth.count(sh))
    assert(row.getLong(0) == truth.size && row.getLong(1) == ce &&
      row.getLong(2) == cm && row.getLong(3) == cs)
    val st = BigInt(ce + cm + cs)
    val r2 = BigInt(hits.map(r => r * r).sum)
    val num = 3 * (BigInt(ce) * ce + BigInt(cm) * cm + BigInt(cs) * cs) - st * st
    val den = 3 * st - r2
    val expected = if (den == 0) -1L else ((BigInt(1000000) * 2 * num) / den).toLong
    assert(row.getLong(4) == expected, s"q_ppm ${row.getLong(4)} vs $expected")
    assert(row.getLong(5) == (if (den != 0 && expected > 5991465L) 1L else 0L))
  }

  test("q_fleiss_kappa equals the BigInt reimplementation over the union " +
    "universe") {
    val row = q("q_fleiss_kappa").collect().head
    val universe = truth ++ exact ++ mh ++ sh
    val rs = universe.toSeq.map(p =>
      BigInt(Seq(exact(p), mh(p), sh(p)).count(identity)))
    val n = BigInt(universe.size)
    val st = rs.sum
    val r2 = rs.map(r => r * r).sum
    val pe2 = 2 * (st * st + (3 * n - st) * (3 * n - st))
    val num = 3 * n * (2 * r2 - 6 * st + 6 * n) - pe2
    val den = 18 * n * n - pe2
    def trunc(a: BigInt, b: BigInt): Long =
      if (a >= 0) ((BigInt(1000000) * a) / b).toLong
      else -((BigInt(1000000) * -a) / b).toLong
    assert(row.getLong(0) == universe.size && row.getLong(1) == st.toLong)
    assert(row.getLong(2) == ((BigInt(1000000) * st) / (3 * n)).toLong)
    val expected = if (den == 0) -1L else trunc(num, den)
    assert(row.getLong(3) == expected, s"kappa_ppm ${row.getLong(3)} vs $expected")
  }

  test("q_ndcg and q_mrr equal the plain-Scala recomputation from the two " +
    "registered rankings") {
    val ann = q("q_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val ex = q("q_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val d = graft.queries.GroupAE.NdcgDiscountPpm
    val idcg = graft.queries.GroupAE.IdcgPpm
    assert(idcg == 10271920L) // Σ (6−j)·⌊10⁶/log2(j+1)⌋, j = 1..5
    val queries = ex.keys.map(_._1).toSeq.distinct.sorted
    val expNdcg = queries.map { qid =>
      val dcg = ann.collect { case ((q2, n2), rn) if q2 == qid =>
        ex.get((qid, n2)).map(er => (6L - er) * d(rn.toInt - 1)).getOrElse(0L)
      }.sum
      qid -> (dcg, (BigInt(1000000) * dcg / idcg).toLong)
    }.toMap
    q("q_ndcg").collect().foreach { r =>
      val (dcg, nd) = expNdcg(r.getLong(0))
      assert(r.getLong(1) == dcg && r.getLong(2) == nd, s"query ${r.getLong(0)}")
    }
    val expMrr = queries.map { qid =>
      val target = ex.collectFirst { case ((q2, n2), 1L) if q2 == qid => n2 }.get
      val arn = ann.getOrElse((qid, target), 0L)
      qid -> (target, arn, if (arn == 0L) 0L else 1000000L / arn)
    }.toMap
    q("q_mrr").collect().foreach { r =>
      val (t, arn, rr) = expMrr(r.getLong(0))
      assert(r.getLong(1) == t && r.getLong(2) == arn && r.getLong(3) == rr,
        s"query ${r.getLong(0)}")
    }
  }

  test("q_sign_test's tail is the exact factorial binomial sum; the p-value " +
    "matches") {
    val row = q("q_sign_test").collect().head
    val (n, pos, neg) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n == pos + neg && n > 0)
    def fact(x: Long): BigInt = (1L to x).foldLeft(BigInt(1))(_ * _)
    def c(nn: Long, i: Long): BigInt = fact(nn) / (fact(i) * fact(nn - i))
    val k = math.min(pos, neg)
    val tail = (0L to k).map(c(n, _)).sum
    val p = (BigInt(2000000) * tail / (BigInt(1) << n.toInt)).min(1000000).toLong
    assert(row.getLong(3) == p, s"p_ppm ${row.getLong(3)} vs $p")
    assert(row.getLong(4) ==
      (if ((BigInt(2000000) * tail / (BigInt(1) << n.toInt)) <= 50000) 1L else 0L))
  }

  test("q_bh_fdr: ranks are a permutation of 1..m, the rejection set is " +
    "exactly ranks 1..i*, and i* satisfies the BH condition") {
    val rows = q("q_bh_fdr").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val m = rows.length
    assert(m > 1)
    assert(rows.map(_._3).sorted.toSeq == (1L to m).toSeq)
    // ranks ascend with (p, type) — the deterministic tiebreak
    val byRank = rows.sortBy(_._3)
    assert(byRank.sliding(2).forall { case Array(a, b) =>
      a._2 < b._2 || (a._2 == b._2 && a._1 < b._1) })
    val istar = rows.filter(r => r._2 * m <= r._3 * 50000L)
      .map(_._3).maxOption.getOrElse(0L)
    rows.foreach { r =>
      assert(r._4 == (if (r._3 <= istar) 1L else 0L), s"type ${r._1}")
    }
  }
}
