package graft.tools

import java.nio.file.{Files, Paths}
import scala.util.matching.Regex

/** Per-query bench regression gate: compares a fresh `graft.Bench` JSON
  * line against the committed budget (`tools/bench_budget.json`, the
  * round-6 sf0.1 per-query record) and exits non-zero when
  *
  *   - any budgeted query regresses beyond `ratio` × max(budget,
  *     `floorSec`) — the floor absorbs scheduling noise on sub-150 ms
  *     queries WITHOUT exempting them entirely (a 30 s regression on a
  *     0.1 s query must still trip), or
  *   - the total regresses beyond `totalRatio`×, or
  *   - a budgeted query disappeared from the fresh run.
  *
  * New queries (in the run, not the budget) are reported but pass — the
  * budget is refreshed by committing the new JSON, a deliberate act.
  *
  * Usage: `runMain graft.tools.BenchGate <freshBench.json> [budget.json]`
  * where freshBench.json holds Bench's one-line output. The parser is a
  * regex over the flat `"name":seconds` map — dependency-free, and the
  * format is pinned by Bench itself.
  */
object BenchGate {

  val DefaultRatio = 2.0
  val DefaultTotalRatio = 1.5
  val FloorSec = 0.15

  // whitespace-tolerant: pretty-printed JSON ("key": 1.0) must parse the
  // same as the bench's compact output ("key":1.0)
  private val entry: Regex = "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*([0-9.eE+-]+)".r
  private val totalRe: Regex = "\"value\"\\s*:\\s*([0-9.eE+-]+)".r

  def parseQueries(json: String): Map[String, Double] =
    entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toDouble).toMap

  def parseTotal(json: String): Option[Double] =
    totalRe.findFirstMatchIn(json).map(_.group(1).toDouble)

  /** Returns human-readable violation lines (empty = gate passes). */
  def violations(budget: String, fresh: String,
                 ratio: Double = DefaultRatio,
                 totalRatio: Double = DefaultTotalRatio,
                 floorSec: Double = FloorSec): Seq[String] = {
    val b = parseQueries(budget)
    val f = parseQueries(fresh)
    // an unparseable/empty side must FAIL the gate, not pass it vacuously
    // (a reformatted budget file once parsed to zero entries and the gate
    // reported OK over nothing)
    val degenerate =
      (if (b.isEmpty) Seq("EMPTY budget: no q_* entries parsed") else Nil) ++
        (if (f.isEmpty) Seq("EMPTY fresh run: no q_* entries parsed") else Nil)
    if (degenerate.nonEmpty) return degenerate
    val perQuery = b.toSeq.sortBy(_._1).flatMap { case (name, bt) =>
      f.get(name) match {
        case None => Some(s"MISSING $name (budget ${fmt(bt)}s)")
        case Some(ft) if ft > math.max(bt, floorSec) * ratio =>
          Some(s"REGRESSION $name ${fmt(ft)}s > ${ratio}x " +
            s"max(budget ${fmt(bt)}s, floor ${fmt(floorSec)}s)")
        case _ => None
      }
    }
    val total = for {
      bt <- parseTotal(budget); ft <- parseTotal(fresh)
      if ft > bt * totalRatio
    } yield s"REGRESSION total ${fmt(ft)}s > ${totalRatio}x budget ${fmt(bt)}s"
    perQuery ++ total
  }

  private def fmt(d: Double): String = f"$d%.2f"

  def main(args: Array[String]): Unit = {
    val freshPath = args.headOption.getOrElse(
      sys.error("usage: BenchGate <freshBench.json> [budget.json]"))
    val budgetPath =
      if (args.length > 1) args(1) else "tools/bench_budget.json"
    val fresh = Files.readString(Paths.get(freshPath))
    val budget = Files.readString(Paths.get(budgetPath))
    val news = (parseQueries(fresh).keySet -- parseQueries(budget).keySet).toSeq.sorted
    if (news.nonEmpty)
      println(s"NEW (unbudgeted, passing): ${news.mkString(", ")}")
    val v = violations(budget, fresh)
    if (v.isEmpty) println(s"BENCH GATE OK (${parseQueries(budget).size} budgeted queries)")
    else { v.foreach(println); sys.exit(1) }
  }
}
