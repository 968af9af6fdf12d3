package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (north-star extension over the `events` table).
  *
  * Gap-based sessions: a new session starts when the gap to the user's
  * previous event exceeds `gapMicros`. Classic two-window formulation —
  * lag -> boundary flag -> running sum = session index — then one
  * aggregation per (user, session). Both windows share the same
  * partitioning (user_id), so Spark plans ONE shuffle for the whole query.
  *
  * Timestamps are handled as integer epoch-MICROSECONDS end-to-end: the
  * testdata parquet stores nanosecond timestamps, which Spark 4 reads only
  * as raw longs (spark.sql.legacy.parquet.nanosAsLong) while DuckDB
  * truncates to micros — integer division by 1000 reconciles the two
  * bit-exactly, and all session math stays in exact integer arithmetic.
  */
object Sessions {

  /** events must carry: user_id, event_id, ts_us (long, epoch micros). */
  def sessionize(events: DataFrame, gapMicros: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val flagged = events
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
