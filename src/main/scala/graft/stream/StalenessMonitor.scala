package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One effective change entering the monitor (pk non-empty; deletes or
  * upserts with a non-null After — the q_index_staleness population). */
final case class PkChange(pk: String, lsn: Long, op: String)

/** One freshness transition: the pk's index-vs-WAL status changed. */
final case class StatusChange(pk: String, status: String, cur_lsn: Long)

/** Streaming index-freshness monitor — the keyed-state twin of the batch
  * q_index_staleness audit: the vector index holds each pk's FIRST
  * effective change (the snapshot load — the minimum LSN ever seen); the
  * WAL keeps moving. Per pk the state is three values (first LSN, latest
  * LSN, latest op) folded with min/max — ORDER-FREE, so re-delivered and
  * out-of-order chunks converge to the same statuses (the MergeStream
  * convergence property, here for the freshness dimension). A row is
  * emitted only when the pk's status CHANGES (fresh → stale → ghost...),
  * so the output is the freshness transition log an alerting pipeline
  * consumes, not a per-batch rescan. StalenessMonitorSpec pins final
  * statuses against the REGISTERED batch query and split-invariance.
  */
object StalenessMonitor {

  /** (index LSN = min seen, current LSN = max seen, op at current LSN). */
  type S = (Long, Long, String)

  def status(s: S): String =
    if (s._3 != "d") { if (s._2 == s._1) "fresh" else "stale" }
    else "ghost" // indexed (every pk's first change is its snapshot row)

  /** Fold one change — commutative in LSN (min/max; the op follows the
    * max), so arrival order never matters. */
  def step(s: Option[S], c: PkChange): S = s match {
    case None => (c.lsn, c.lsn, c.op)
    case Some((idx, cur, op)) =>
      val (nCur, nOp) = if (c.lsn > cur) (c.lsn, c.op) else (cur, op)
      (math.min(idx, c.lsn), nCur, nOp)
  }

  /** Fold a batch; emit a transition row iff the status changed (or the
    * pk is new). Shared by the stream and its batch twin. */
  def transition(pk: String, rows: Iterator[PkChange],
                 prior: Option[S]): (Seq[StatusChange], S) = {
    val before = prior.map(status)
    var s = prior
    rows.foreach { c => s = Some(step(s, c)) }
    val st = s.get
    val now = status(st)
    val out =
      if (before.contains(now)) Nil
      else Seq(StatusChange(pk, now, st._2))
    (out, st)
  }

  /** Streaming monitor: three values of state per pk, transition rows out. */
  def monitor(ds: Dataset[PkChange]): Dataset[StatusChange] = {
    implicit val outEnc = Encoders.product[StatusChange]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.kryo[S]
    ds.groupByKey(_.pk)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (pk: String, rows: Iterator[PkChange], state: GroupState[S]) => {
          val (out, next) = transition(pk, rows, state.getOption)
          state.update(next)
          out.iterator
        })
  }

  /** Batch twin: one pass, final status per pk. */
  def monitorBatch(ds: Dataset[PkChange]): Dataset[StatusChange] = {
    implicit val outEnc = Encoders.product[StatusChange]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.pk)
      .mapGroups { (pk: String, rows: Iterator[PkChange]) =>
        val s = rows.foldLeft(Option.empty[S])((acc, c) => Some(step(acc, c)))
        StatusChange(pk, status(s.get), s.get._2)
      }
  }
}
