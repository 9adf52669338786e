package graft

/** q_range_join_agg is q_range_join's pre-aggregated twin (per-day
  * count/sum pushed BELOW the bucket join, day table broadcast): the two
  * plans are different — pair-level bucketed equi-join vs calendar-sized
  * pre-aggregate — but the (o_orderkey, n_items, total_qty) contract must
  * agree bit-for-bit. Decimal day sums make the fold exact, so this is an
  * equality pin, not a tolerance check. Verified at two fixture scales so
  * a day-boundary defect (the explode probe set vs the residual range
  * filter) can't hide in a single calendar.
  */
class RangeJoinAggSpec extends SparkSpec {

  private def rows(name: String, dir: String): Seq[(Long, Long, Double)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"pair-level and pre-aggregated range joins agree on $dir") {
      val pair = rows("q_range_join", dir)
      val agg = rows("q_range_join_agg", dir)
      assert(pair.nonEmpty)
      assert(pair == agg)
      // at least one urgent order must actually have shipments in-window,
      // or the agreement is vacuous (both all-zero)
      assert(pair.exists(_._2 > 0L))
    }
  }
}
