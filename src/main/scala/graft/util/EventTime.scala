package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Normalizes the events table's `ts` column to epoch-NANOSECOND longs,
  * whatever the physical parquet type:
  *
  *  - legacy nanos-annotated INT64 read with
  *    `spark.sql.legacy.parquet.nanosAsLong=true` arrives as LongType and
  *    passes through unchanged;
  *  - TIMESTAMP / TIMESTAMP_NTZ (the regenerated micros testdata) is
  *    converted via `unix_micros * 1000`.
  *
  * Downstream query code divides by 1000 once to get epoch micros, which is
  * exactly what DuckDB's `epoch_us(ts)` yields on the same parquet — so the
  * oracle SQL is unaffected by the storage type. The NTZ→TZ cast interprets
  * the wall-clock value in the session timezone; every session in this repo
  * pins `spark.sql.session.timeZone=UTC`, making the cast the identity on
  * the underlying micros value.
  */
object EventTime {
  // the NTZ→TZ cast is micros-identity ONLY under a UTC session timezone;
  // fail fast instead of silently shifting every event timestamp
  private def requireUtc(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT" || tz == "+00:00",
      s"EventTime.tsToNanos requires spark.sql.session.timeZone=UTC " +
        s"(found '$tz'): the TIMESTAMP_NTZ cast would shift every value")
  }

  def tsToNanos(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => df
      case TimestampNTZType =>
        requireUtc(df)
        df.withColumn(tsCol, unix_micros(col(tsCol).cast(TimestampType)) * 1000L)
      case TimestampType =>
        df.withColumn(tsCol, unix_micros(col(tsCol)) * 1000L)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported events.$tsCol type: $other (expected long or timestamp)")
    }
}
