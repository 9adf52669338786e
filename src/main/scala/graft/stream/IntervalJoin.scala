package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A page view entering the attribution stream. */
final case class ViewEvt(v_user: Long, view_id: Long, v_ts: Timestamp)

/** A click entering the attribution stream. */
final case class ClickEvt(c_user: Long, click_id: Long, c_ts: Timestamp)

/** Stream-stream interval join: attribute every click to the views by the
  * same user within the preceding attribution window — the canonical
  * two-unbounded-inputs correlation the reference's linear pipeline cannot
  * express at all.
  *
  * Scale contract: watermarks on BOTH inputs bound the join state. Spark
  * derives the retention for each side from the watermark and the interval
  * condition (a view can only ever match clicks up to `windowMinutes`
  * ahead, so view state older than `watermark + window` is evicted; click
  * state is droppable as soon as the view watermark passes it). Without the
  * time bound the state store grows with the full history of both streams —
  * with it, state is O(traffic within one watermark horizon), independent
  * of stream lifetime. The join itself shuffles both sides by user key into
  * the same state-store partitions: an equi-key hash join with a time
  * residual, never a nested loop.
  */
object IntervalJoin {

  /** Streaming attribution. `views`/`clicks` may be streaming or batch
    * frames with [[ViewEvt]]/[[ClickEvt]] columns; on streaming inputs the
    * watermarks make the join's state finite. */
  def attribute(
      views: DataFrame,
      clicks: DataFrame,
      windowMinutes: Int = 10,
      watermark: String = "30 minutes"): DataFrame = {
    val v = views.withWatermark("v_ts", watermark)
    val c = clicks.withWatermark("c_ts", watermark)
    join(v, c, windowMinutes)
  }

  /** Batch twin — the same join predicate with no watermarks; the
    * equivalence spec pins stream==batch on a split replay. */
  def attributeBatch(
      views: DataFrame,
      clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame =
    join(views, clicks, windowMinutes)

  private def join(v: DataFrame, c: DataFrame, windowMinutes: Int): DataFrame =
    c.join(v,
        col("v_user") === col("c_user") &&
          col("v_ts") <= col("c_ts") &&
          col("v_ts") >= col("c_ts") - expr(s"interval $windowMinutes minutes"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
}
