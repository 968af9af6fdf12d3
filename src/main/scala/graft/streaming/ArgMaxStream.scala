package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the [[graft.QueriesX.qDailyPeakHour]] argmax stage —
  * an online running arg-max per key with O(1) state.
  *
  * The batch query picks each day's peak hour with `max_by` over a
  * zero-padded "count|23-hour" ordering key (ties prefer the earliest
  * hour). A monitor wants the same answer LIVE as hourly counts stream in
  * from an upstream windowed aggregation. State per day is just the
  * current best (key, hour, count) triple — constant regardless of how
  * many hours or retractions arrive — and the emitted winner after any
  * prefix equals the batch `max_by` fold over that prefix bit-for-bit,
  * because both sides compare the IDENTICAL padded string
  * (StreamingSpec asserts the parity against the DataFrame twin).
  */
object ArgMaxStream {

  case class HourCount(day: Long, hour: Long, n: Long)
  case class Peak(day: Long, peak_hour: Long, peak_events: Long)
  private[streaming] case class Best(k: String, hour: Long, n: Long)

  /** The exact batch ordering key: larger count wins, ties go to the
    * EARLIER hour via the inverted 23-hour pad.
    */
  private[streaming] def orderKey(n: Long, hour: Long): String =
    f"$n%012d|${23 - hour}%02d"

  /** One Peak row per updated day and micro-batch (update mode): the
    * running arg-max so far. Replays are idempotent — state only moves
    * when a strictly larger ordering key arrives.
    */
  def runningPeak(rows: Dataset[HourCount]): Dataset[Peak] = {
    implicit val enc = Encoders.product[Peak]
    implicit val stEnc = Encoders.product[Best]
    rows.groupByKey(_.day)(Encoders.scalaLong)
      .mapGroupsWithState[Best, Peak](GroupStateTimeout.NoTimeout) {
        (day: Long, it: Iterator[HourCount], state: GroupState[Best]) =>
          var st = state.getOption.getOrElse(Best("", -1L, 0L))
          it.foreach { r =>
            val k = orderKey(r.n, r.hour)
            if (k > st.k) st = Best(k, r.hour, r.n)
          }
          state.update(st)
          Peak(day, st.hour, st.n)
      }
  }
}
