package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — the attribution primitive (click →
  * most-recent-qualifying view, impression → conversion) that completes
  * the engine's streaming surface next to stateful aggs, session/funnel
  * state machines and stream-static joins.
  *
  * Scale contract: the join condition is an EQUI-join on the user key
  * plus a bounded event-time range, so Spark plans a
  * StreamingSymmetricHashJoin keyed on user_id whose buffered state is
  * purged by the watermarks — state is bounded by (events inside the
  * watermark horizon), not stream length. An unbounded-range or
  * non-equi stream-stream join would buffer forever; the range bound is
  * what makes the state finite, the equi key what makes it partitionable.
  */
object JoinStream {

  case class View(user_id: Long, view_id: Long, vts: java.sql.Timestamp)
  case class Click(user_id: Long, click_id: Long, cts: java.sql.Timestamp)

  /** Inner-join clicks to views of the same user with
    * `vts <= cts <= vts + horizon`; both sides watermarked by `delay`.
    * Emits (user_id, view_id, click_id, vts, cts) in append mode.
    */
  def attributedClicks(views: DataFrame, clicks: DataFrame,
                       delay: String, horizon: String): DataFrame = {
    val v = views.withWatermark("vts", delay)
    val c = clicks.select(col("user_id").as("c_user"), col("click_id"), col("cts"))
      .withWatermark("cts", delay)
    v.join(c,
        col("user_id") === col("c_user") &&
          col("cts") >= col("vts") &&
          col("cts") <= col("vts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("vts"), col("cts"))
  }
}
