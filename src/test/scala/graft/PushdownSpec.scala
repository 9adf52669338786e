package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-efficiency regression guard: queries whose predicates and
  * projections are expressible at the source must reach the parquet scan
  * as PushedFilters and a pruned ReadSchema — at 100 TB, a scan that reads
  * every column for a 3-column projection is the difference between
  * touching 100 TB and touching 5. */
class PushdownSpec extends SparkSpec {

  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    root.collect { case s: FileSourceScanExec => s }
  }

  test("q_scan_project_filter pushes its predicate and prunes columns") {
    val ss = scans("q_scan_project_filter")
    assert(ss.nonEmpty)
    val s = ss.head
    assert(s.dataFilters.nonEmpty || s.metadata("PushedFilters") != "[]",
      "filter must reach the scan")
    // the query projects a handful of lineitem columns; a full-width scan
    // (16 columns) means pruning regressed
    assert(s.requiredSchema.size <= 6,
      s"expected pruned ReadSchema, got ${s.requiredSchema.size} columns")
  }

  test("joins prune both sides to the columns they use") {
    for (name <- Seq("q_join_broadcast", "q_join_shuffle")) {
      val wide = scans(name).filter(_.requiredSchema.size > 8)
      assert(wide.isEmpty,
        s"$name scans ${wide.map(_.requiredSchema.size)} columns — pruning lost")
    }
  }

  test("q_unpivot pushes the orderkey predicate and prunes to 5 columns") {
    val ss = scans("q_unpivot")
    assert(ss.nonEmpty)
    val s = ss.head
    assert(s.dataFilters.nonEmpty, "the % 97 predicate must reach the scan")
    assert(s.requiredSchema.size <= 5,
      s"expected 5-column ReadSchema, got ${s.requiredSchema.size}")
  }

  test("event analytics scan only the columns they aggregate") {
    // q_funnel needs (user_id, event_type, ts); q_retention (user_id, ts);
    // q_window_range (event_id, user_id, value, ts) — props (the widest
    // column, JSON) must never be read
    for (name <- Seq("q_funnel", "q_retention", "q_window_range", "q_outlier_mad")) {
      val wide = scans(name).filter(_.requiredSchema.fieldNames.contains("props"))
      assert(wide.isEmpty, s"$name reads the props column — pruning lost")
    }
  }

  test("round-4 event/order analytics scan only what they aggregate") {
    // q_seq_transitions needs (user_id, event_type, ts, event_id);
    // q_resample_ffill (user_id, ts, value); q_join_salted (event_id,
    // event_type) — props (the widest column, JSON) must never be read
    for (name <- Seq("q_seq_transitions", "q_resample_ffill", "q_join_salted")) {
      val wide = scans(name).filter(_.requiredSchema.fieldNames.contains("props"))
      assert(wide.isEmpty, s"$name reads the props column — pruning lost")
    }
    // q_histogram and q_correlated_avg aggregate 1 and 3 orders columns
    for (name <- Seq("q_histogram", "q_correlated_avg")) {
      val wide = scans(name).filter(_.requiredSchema.size > 3)
      assert(wide.isEmpty,
        s"$name scans ${wide.map(_.requiredSchema.size)} columns — pruning lost")
    }
  }

  test("signature dedup and collocation scans prune the documents table") {
    // q_dedup_minhash / q_dedup_simhash need (doc_id, text) only — the
    // lang/source/n_chars columns must never reach their scans
    for (name <- Seq("q_dedup_minhash", "q_dedup_simhash")) {
      val extra = scans(name).filter(_.requiredSchema.fieldNames
        .exists(Set("lang", "source", "n_chars")))
      assert(extra.isEmpty, s"$name scans more than (doc_id, text)")
    }
    // q_collocations aggregates the token stream alone: every documents
    // scan in its plan must read exactly the text column
    val cs = scans("q_collocations")
    assert(cs.nonEmpty)
    assert(cs.forall(_.requiredSchema.fieldNames.sameElements(Array("text"))),
      s"q_collocations must scan only text, got ${cs.map(_.requiredSchema.fieldNames.mkString(","))}")
  }

  test("TPC-H round-5 shapes push predicates and prune the fact scan") {
    // Q6 is the pushdown benchmark: date window + discount band + quantity
    // cap all reach the scan; 4 of 11 lineitem columns read
    val q6 = scans("q_tpch_q6")
    assert(q6.nonEmpty)
    assert(q6.head.dataFilters.size >= 3,
      s"q_tpch_q6 filters lost from the scan: ${q6.head.dataFilters}")
    assert(q6.head.requiredSchema.size <= 4,
      s"q_tpch_q6 scans ${q6.head.requiredSchema.size} columns")
    // the join shapes: no lineitem scan reads more than the columns its
    // query projects plus filters (Q14: 3+shipdate, Q19: 4, Q4: 2, Q21: 3)
    for ((name, cap) <- Seq("q_tpch_q14" -> 4, "q_tpch_q19" -> 4,
      "q_tpch_q4" -> 2, "q_tpch_q21" -> 3)) {
      val li = scans(name).filter(_.requiredSchema.fieldNames.exists(_.startsWith("l_")))
      assert(li.nonEmpty, s"$name: no lineitem scan found")
      val wide = li.filter(_.requiredSchema.size > cap)
      assert(wide.isEmpty,
        s"$name lineitem scan reads ${wide.map(_.requiredSchema.size)} columns (cap $cap)")
    }
  }

  test("documents-table operators never read text when they only need ids") {
    // q_sample_stratified uses doc_id + lang only; dragging the text
    // column through the sample window would dominate its scan cost
    val ss = scans("q_sample_stratified")
    assert(ss.nonEmpty)
    assert(ss.forall(!_.requiredSchema.fieldNames.contains("text")),
      "q_sample_stratified must not scan the text column")
  }

  test("final-wave panels prune their fact scans") {
    // q_ship_latency: lineitem → (l_orderkey, l_shipdate) only
    val li = scans("q_ship_latency")
      .filter(_.requiredSchema.fieldNames.exists(_.startsWith("l_")))
    assert(li.nonEmpty && li.forall(_.requiredSchema.size <= 2),
      s"q_ship_latency lineitem reads ${li.map(_.requiredSchema.size)} columns")
    // q_supplier_scorecard: lineitem needs 4 (suppkey, price, discount, flag)
    val sc = scans("q_supplier_scorecard")
      .filter(_.requiredSchema.fieldNames.exists(_.startsWith("l_")))
    assert(sc.nonEmpty && sc.forall(_.requiredSchema.size <= 4),
      s"q_supplier_scorecard lineitem reads ${sc.map(_.requiredSchema.size)} columns")
    // growth accounting and the AQP sum sample only touch (user_id, ts) /
    // (event_type, user_id, value, ts) — never the wide props JSON
    for (name <- Seq("q_growth_accounting", "q_sum_sample", "q_kmv_setops")) {
      val wide = scans(name).filter(_.requiredSchema.fieldNames.contains("props"))
      assert(wide.isEmpty, s"$name reads the props column — pruning lost")
    }
  }
}
