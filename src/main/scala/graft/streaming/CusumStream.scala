package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Temporal.cusumChangepoint]] — Page's
  * CUSUM as the ONLINE monitor it was designed to be (Page 1954: sequential
  * detection against a COMMISSIONED reference). The batch operator estimates
  * the level shift retrospectively, deriving the reference mean from the
  * whole series; a stream cannot know its own future mean, so the streaming
  * monitor takes the commissioned reference rate as a parameter — the
  * deployment contract being: batch estimates μ over the training window,
  * streaming watches live traffic against that μ.
  *
  * State is O(1) per key forever: the running prefix P = Σ(vᵢ·den − num)
  * and its running minimum (clamped at 0) — the same
  * S_t = P_t − min(0, min P_i) identity the batch operator uses, over
  * EXACT longs (the reference enters as the rational num/den, so each
  * deviation is the exact integer v·den − num; no float ever enters the
  * path). Alarm when S_t·1 > threshold·den, an exact-integer compare.
  *
  * Same prefix-replay contract as the EWMA/HLL/quantile twins: rows within
  * a micro-batch sort by (seq, id) in state, batches arrive in order, so
  * after every micro-batch the emitted path equals the batch fold over the
  * full prefix bit-for-bit (StreamingSpec asserts it against a direct
  * fold).
  */
object CusumStream {

  case class Sample(key: String, seq: Long, id: Long, value: Long)
  case class CusumRow(key: String, n: Long, cusum_num: Long, alarm: Boolean)
  private[streaming] case class CusumState(n: Long, prefix: Long, runMin: Long)

  /** One (key, n, S_t·den-scaled numerator, alarm) row per key per
    * micro-batch; output mode "update". `refNum/refDen` is the
    * commissioned reference rate; `threshold` is in value units (compared
    * as cusum_num > threshold·refDen, exact).
    */
  def runningCusum(samples: Dataset[Sample], refNum: Long, refDen: Long,
                   threshold: Long): Dataset[CusumRow] = {
    require(refDen > 0)
    implicit val enc = Encoders.product[CusumRow]
    implicit val stateEnc = Encoders.product[CusumState]
    samples.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Sample], state: GroupState[CusumState]) =>
          val st = state.getOption.getOrElse(CusumState(0L, 0L, 0L))
          var n = st.n
          var prefix = st.prefix
          var runMin = st.runMin // min(0, min prefix so far)
          rows.toSeq.sortBy(r => (r.seq, r.id)).foreach { r =>
            prefix += r.value * refDen - refNum
            if (prefix < runMin) runMin = prefix
            n += 1
          }
          state.update(CusumState(n, prefix, runMin))
          val s = prefix - runMin
          Iterator.single(CusumRow(key, n, s, s > threshold * refDen))
      }
  }
}
