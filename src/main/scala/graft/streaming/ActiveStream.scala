package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the `q_rolling_active_7d` EXACT sliding distinct:
  * each incoming (user, day) activity is fanned out statelessly to the
  * ≤7 sliding windows it belongs to, and per target day the state is the
  * exact sorted user set, emitting the running 7-day active count. State
  * is bounded by the true per-window distinct-user count — the honest
  * cost of exactness ([[SketchStream]]'s HLL is the sublinear
  * alternative when an approximation is acceptable).
  *
  * Observed-day trim (r13 advice): the batch query left-semi-joins the
  * fanned-out windows against the observed day domain, so it never
  * outputs a target day with no activity of its own (including phantom
  * days past the series end). The stream replays that trim in state: the
  * zero-offset fan-out row marks a window's own day as observed, and a
  * window emits nothing until that mark arrives. With the trim in place,
  * once a window's watermark passes, its final count equals the batch
  * `q_rolling_active_7d` row for that day bit-exactly — and days the
  * batch query omits are omitted here too (StreamingSpec checks parity
  * against the real trimmed batch shape).
  */
object ActiveStream {

  case class Ev(user_id: Long, day: Long)
  case class UD(target_day: Long, user_id: Long, own: Boolean)
  case class ActiveRow(day: Long, active_7d: Long)
  private[streaming] case class AState(users: Array[Long], ownSeen: Boolean)

  /** Stateless 7× fan-out: the (user, day) pair contributes to windows
    * ending on day .. day+6 (mirrors the batch `sequence(day, day+6)`);
    * the offset-0 row carries `own = true`, marking the target day as an
    * observed source day for the trim.
    */
  def fanOut(events: Dataset[Ev]): Dataset[UD] = {
    implicit val enc = Encoders.product[UD]
    events.flatMap(e => (0L to 6L).map(d => UD(e.day + d, e.user_id, d == 0L)))
  }

  /** One (day, active_7d-so-far) row per touched OBSERVED window per
    * micro-batch; windows whose own day has not yet been seen stay
    * silent (they may start emitting later if an out-of-order own-day
    * event arrives — the finalized count is unaffected). Run with output
    * mode "update".
    */
  def runningActive(pairs: Dataset[UD]): Dataset[ActiveRow] = {
    implicit val enc = Encoders.product[ActiveRow]
    implicit val stateEnc = Encoders.product[AState]
    pairs.groupByKey(_.target_day)(Encoders.scalaLong)
      .flatMapGroupsWithState[AState, ActiveRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (day: Long, rows: Iterator[UD], state: GroupState[AState]) =>
          val seen = scala.collection.mutable.TreeSet.empty[Long]
          var own = state.getOption.exists(_.ownSeen)
          state.getOption.foreach(s => seen ++= s.users)
          rows.foreach { r => seen += r.user_id; own ||= r.own }
          state.update(AState(seen.toArray, own))
          if (own) Iterator.single(ActiveRow(day, seen.size.toLong))
          else Iterator.empty
      }
  }
}
