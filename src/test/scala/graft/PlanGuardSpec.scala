package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Scale regression guard: every declared query must compile to a plan with
  * no cartesian product, no partition-less window (single-task global
  * sorts), and no broadcast-nested-loop join outside the documented
  * exceptions where the broadcast side is a bounded literal-sized input.
  * These are exactly the plan shapes that stop scaling at 100× data.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries deliberately joining a bounded broadcast side on a non-equi
    * condition: the brute-force cosine baseline streams all candidates
    * against 10 broadcast query vectors (its LSH/IVF siblings are the
    * scale paths), and BM25 cross-joins a ONE-ROW corpus-stats aggregate
    * (N, avgdl) — the scalar-subquery shape, bounded by construction.
    * q_snapshot_at / q_merge_upsert cross-join a ONE-ROW max-LSN cut the
    * same way. */
  private val nonEquiAllowed =
    Set("q_cosine_topk", "q_knn_vote", "q_bm25", "q_maxsim", "q_snapshot_at",
      "q_merge_upsert", "q_idf_novelty", "q_collocations")

  test("no global windows, cartesian products, or stray nested-loop joins") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val qe = fn(spark, sfDir).queryExecution
        val globalWindows = qe.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        val physical = qe.sparkPlan.toString
        val problems =
          (if (globalWindows.nonEmpty) Seq("partition-less window") else Nil) ++
          (if (physical.contains("CartesianProduct")) Seq("cartesian product") else Nil) ++
          (if (physical.contains("BroadcastNestedLoopJoin") &&
            !nonEquiAllowed(name)) Seq("nested-loop join") else Nil)
        problems.map(p => s"$name: $p")
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
