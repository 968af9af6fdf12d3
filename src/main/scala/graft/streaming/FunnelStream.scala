package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of the batch funnel
  * (graft.operators.Sessions.funnel): a per-user monotone stage machine
  * that emits a record every time a user advances a step.
  *
  * Semantics contract (the standard streaming-funnel approximation):
  * each micro-batch is processed in event-time order per user, and the
  * stage machine only moves FORWARD — an event for step k+1 counts only
  * if it arrives (in event-time order within the batch stream) after
  * step k was reached. Cross-batch event-time reordering beyond that is
  * not un-wound; the batch operator is the exact-replay authority, this
  * is the low-latency view. State is O(1) per user (stage + step
  * times) and is dropped via event-time timeout once a user completes
  * the funnel or goes idle past the watermark.
  */
object FunnelStream {

  final case class FEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  final case class FunnelState(stage: Int, times: Seq[Long])
  final case class StageAdvance(user_id: Long, stage: Int, ts_ms: Long)

  /** Parse a Spark interval string ("1 hour", "30 minutes") to millis so the
    * state timeout below uses the SAME duration as the watermark — a
    * hardcoded constant here (pre-r8 bug) let idleTimeout > 1h admit events
    * after state eviction (silent funnel reset → duplicate stage advances)
    * and idleTimeout < 1h keep state past the documented idle window.
    */
  private def intervalMs(interval: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(interval))
    require(iv.months == 0, s"idleTimeout must be day-time, not months: $interval")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  def statefulFunnel(events: Dataset[FEvent], steps: Seq[String],
                     idleTimeout: String = "1 hour"): Dataset[StageAdvance] = {
    require(steps.nonEmpty)
    val idleMs = intervalMs(idleTimeout)
    require(idleMs > 0, s"idleTimeout must be positive: $idleTimeout")
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[StageAdvance]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", idleTimeout)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[FEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(FunnelState(0, Seq.empty))
            val out = Seq.newBuilder[StageAdvance]
            // secondary key: equal-timestamp events must process in a
            // deterministic order or replays could diverge
            for (e <- batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
                 if st.stage < steps.length && e.event_type == steps(st.stage)) {
              st = FunnelState(st.stage + 1, st.times :+ e.ts.getTime)
              out += StageAdvance(userId, st.stage, e.ts.getTime)
            }
            if (st.stage >= steps.length) state.remove() // funnel done: drop state
            else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.times.lastOption.getOrElse(0L),
                  state.getCurrentWatermarkMs()) + idleMs)
            }
            out.result().iterator
          }
      }
  }
}
