package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the `q_rolling_active_7d` EXACT sliding distinct:
  * each incoming (user, day) activity is fanned out statelessly to the
  * ≤7 sliding windows it belongs to, and per target day the state is the
  * exact sorted user set, emitting the running 7-day active count. State
  * is bounded by the true per-window distinct-user count — the honest
  * cost of exactness ([[SketchStream]]'s HLL is the sublinear
  * alternative when an approximation is acceptable). Once a window's
  * watermark passes, its count is final and equals the batch
  * `q_rolling_active_7d` row for that day bit-exactly.
  */
object ActiveStream {

  case class Ev(user_id: Long, day: Long)
  case class UD(target_day: Long, user_id: Long)
  case class ActiveRow(day: Long, active_7d: Long)
  private[streaming] case class AState(users: Array[Long])

  /** Stateless 7× fan-out: the (user, day) pair contributes to windows
    * ending on day .. day+6 (mirrors the batch `sequence(day, day+6)`).
    */
  def fanOut(events: Dataset[Ev]): Dataset[UD] = {
    implicit val enc = Encoders.product[UD]
    events.flatMap(e => (0L to 6L).map(d => UD(e.day + d, e.user_id)))
  }

  /** One (day, active_7d-so-far) row per touched window per micro-batch;
    * run with output mode "update".
    */
  def runningActive(pairs: Dataset[UD]): Dataset[ActiveRow] = {
    implicit val enc = Encoders.product[ActiveRow]
    implicit val stateEnc = Encoders.product[AState]
    pairs.groupByKey(_.target_day)(Encoders.scalaLong)
      .flatMapGroupsWithState[AState, ActiveRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (day: Long, rows: Iterator[UD], state: GroupState[AState]) =>
          val seen = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(s => seen ++= s.users)
          rows.foreach(r => seen += r.user_id)
          state.update(AState(seen.toArray))
          Iterator.single(ActiveRow(day, seen.size.toLong))
      }
  }
}
