package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Temporal.ohlc]]: tumbling
  * event-time windows + watermark turn the batch row_number formulation
  * into a pure streaming aggregation.
  *
  * Open/close become `min_by`/`max_by` over the (ts, id) struct — the
  * same (ts, id) total order the batch twin sorts by, expressed as an
  * incrementally-mergeable aggregate (a window's open/close update in
  * O(1) per event; row_number would need the whole window buffered).
  *
  * State: ONE row per (key, open window). The watermark closes windows
  * `delay` behind the max event time, so state is bounded by
  * |keys| × (delay / width + 1) regardless of stream length — the same
  * bounded-state contract as [[SessionStream]]/[[GridStream]], asserted
  * in StreamingSpec.
  */
object BarStream {

  case class Tick(key: String, id: Long, ts: java.sql.Timestamp, value: Double)

  /** ticks: streaming frame with (key, id, ts, value). Emits one bar per
    * (key, window) in append mode once the watermark passes window end.
    */
  def ohlcBars(ticks: DataFrame, width: String, watermark: String): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(col("key"), window(col("ts"), width))
      .agg(
        min_by(col("value"), struct(col("ts"), col("id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("key"), col("window.start").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
}
