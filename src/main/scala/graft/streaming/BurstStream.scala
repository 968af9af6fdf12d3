package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the `q_burstiness` aggregate: per-user Fano factor
  * (variance/mean) of hourly event counts over COMPLETED hours, with
  * O(1) state per user — (open hour, open count, n_hours, Σc, Σc²), all
  * longs. An hour folds into the exact integer moments when a later
  * hour's first event arrives, so the emitted fano over completed hours
  * equals the batch computation restricted to events strictly before
  * each user's open hour — bit-exactly: the moments are longs and the
  * closing division is the same mirrored expression.
  *
  * Requires per-user hour-ordered arrival ACROSS micro-batches (the
  * append-log shape, same contract as [[EwmaStream]]); rows WITHIN a
  * micro-batch may arrive unordered — they are sorted in state.
  */
object BurstStream {

  case class Ev(user_id: Long, hr: Long, event_id: Long)
  case class FanoRow(user_id: Long, n_hours: Long, n_events: Long, fano: Double)
  private[streaming] case class BState(
    openHr: Long, openCnt: Long, n: Long, s1: Long, s2: Long)

  /** One (user, n_hours, n_events, fano) row per user per micro-batch
    * once ≥ 1 hour has completed; run with output mode "update".
    */
  def runningFano(events: Dataset[Ev]): Dataset[FanoRow] = {
    implicit val enc = Encoders.product[FanoRow]
    implicit val stateEnc = Encoders.product[BState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[BState, FanoRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[BState]) =>
          var st = state.getOption
            .getOrElse(BState(Long.MinValue, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(r => (r.hr, r.event_id)).foreach { r =>
            if (r.hr == st.openHr) st = st.copy(openCnt = st.openCnt + 1L)
            else if (st.openHr == Long.MinValue)
              st = BState(r.hr, 1L, 0L, 0L, 0L)
            else
              st = BState(r.hr, 1L, st.n + 1L, st.s1 + st.openCnt,
                st.s2 + st.openCnt * st.openCnt)
          }
          state.update(st)
          if (st.n > 0L)
            Iterator.single(FanoRow(uid, st.n, st.s1,
              (st.n * st.s2 - st.s1 * st.s1).toDouble /
                (st.n * st.s1).toDouble))
          else Iterator.empty
      }
  }
}
