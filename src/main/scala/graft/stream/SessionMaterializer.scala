package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}

/** One event entering the session tracker (`us` = event-time micros — the
  * same µs axis every batch query uses). */
final case class SessionEvent(user_id: Long, us: Long)

/** One CLOSED session: emitted exactly when the watermark passes the
  * session's gap horizon — the point where no in-order event can reopen
  * it. */
final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                               n_events: Long)

/** Event-time session materialization on the Spark 4 `transformWithState`
  * API — the arbitrary-state successor of `flatMapGroupsWithState` with
  * NATIVE timers: instead of re-checking every key on every micro-batch
  * (the fMGWS timeout pattern), the open session registers one event-time
  * timer at `last + gap`, and the state store fires exactly the expired
  * keys when the watermark crosses it. Per user the state is ONE
  * (start, last, count) triple — bounded forever — and a closed session
  * is emitted exactly once, when it can no longer be reopened by in-order
  * data.
  *
  * The session RULE is the batch `q_sessionize` contract (gap 30 min
  * default): TwsSessionSpec pins that the closed-session stream equals the
  * batch window formulation on the same events, and that a session
  * spanning micro-batches stays open until the watermark passes its gap.
  *
  * Out-of-order limits: arrivals are sorted WITHIN a micro-batch.
  * Cross-batch late events more than a gap BEFORE the open session's
  * start accumulate into one pending late session (consecutive late
  * events within a gap of each other merge, exactly the batch
  * sessionization of that run), which closes when the run breaks —
  * UNLESS the run ends within a gap of the first in-range event: such a
  * gap-bridging arrival chains late-run + bridge + open session into ONE
  * batch session, so the pending run merges into the open session
  * instead (spec-pinned against the batch rule). A late event landing
  * inside the open session's span extends it (start = min). The one
  * remaining divergence: a late run split ACROSS micro-batches closes at
  * each batch boundary (full equivalence there would need an event
  * buffer drained at the watermark) — by design this operator keeps O(1)
  * state per key and accepts that narrow case.
  *
  * Requires the RocksDB state-store provider (the only backend
  * implementing transformWithState's typed-state + timer surface).
  */
object SessionMaterializer {

  val DefaultGapUs: Long = 30L * 60 * 1000000 // the q_sessionize 30-min gap

  /** (start_us, last_us, n_events). */
  type Sess = (Long, Long, Long)

  final class Processor(gapUs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var sess: ValueState[Sess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[Sess]("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[ClosedSession] = {
      var out = List.empty[ClosedSession]
      // fold this batch's arrivals in event-time order so an intra-batch
      // gap still splits sessions exactly like the batch rule
      val sorted = rows.toSeq.sortBy(_.us)
      var cur = if (sess.exists()) sess.get() else null
      // CROSS-BATCH late arrivals (within the watermark, more than a gap
      // BEFORE the open session's start) can never merge with the open
      // session — but consecutive late events within a gap of EACH OTHER
      // must merge with each other, exactly as the batch rule would have
      // sessionized them; `late` accumulates that pending late session
      var late: Sess = null
      def flushLate(): Unit = if (late != null) {
        out ::= ClosedSession(user, late._1, late._2, late._3); late = null
      }
      sorted.foreach { e =>
        cur match {
          case null => cur = (e.us, e.us, 1L)
          case (s, l, n) =>
            if (s - e.us > gapUs) {
              // late event: accumulate into the pending late session
              // (sorted order guarantees e.us >= late's last event)
              late match {
                case null => late = (e.us, e.us, 1L)
                case (ls, ll, ln) =>
                  if (e.us - ll > gapUs) {
                    out ::= ClosedSession(user, ls, ll, ln)
                    late = (e.us, e.us, 1L)
                  } else late = (ls, e.us, ln + 1)
              }
            } else {
              // sorted order: once events reach the open session's range
              // no later event in this batch can be late again
              late match {
                case (ls, ll, ln) if e.us - ll <= gapUs =>
                  // gap-bridging arrival: the late run ends within a gap
                  // of e AND e is within a gap of the open start, so the
                  // batch rule sessionizes late-run + bridge + open
                  // session as ONE session — merge instead of closing
                  // the late run on its own. (e.us < s here: a late run
                  // ends > gap before s, so a bridge inside the open
                  // span is impossible.)
                  cur = (ls, math.max(l, e.us), n + ln + 1)
                  late = null
                case _ =>
                  flushLate()
                  if (e.us - l > gapUs) {
                    // the in-batch successor proves the gap — close
                    // immediately, no timer needed for this one
                    out ::= ClosedSession(user, s, l, n)
                    cur = (e.us, e.us, 1L)
                  } else cur = (math.min(s, e.us), math.max(l, e.us), n + 1)
              }
            }
        }
      }
      flushLate()
      // one timer per key: re-arm at the open session's horizon
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (cur != null) {
        sess.update(cur)
        getHandle.registerTimer(cur._2 / 1000 + gapUs / 1000 + 1)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    timer: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (sess.exists()) {
        val (s, l, n) = sess.get()
        sess.clear()
        Iterator.single(ClosedSession(user, s, l, n))
      } else Iterator.empty
  }

  /** Closed-session stream: input must carry a watermark on its event-time
    * column before grouping (the timer horizon is watermark-driven). */
  def sessions(ds: Dataset[SessionEvent],
               gapUs: Long = DefaultGapUs): Dataset[ClosedSession] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    ds.groupByKey(_.user_id)
      .transformWithState(new Processor(gapUs), TimeMode.EventTime,
        OutputMode.Append)
  }
}
