package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Temporal.peakDetect]] — online
  * local-peak confirmation. The batch operator compares each day against
  * the key's WHOLE-SERIES mean; a stream cannot know its own future
  * mean, so (the [[CusumStream]] contract) the monitor takes the
  * commissioned reference mean as the rational refNum/refDen — batch
  * estimates the mean over the training window, streaming watches live
  * traffic against it.
  *
  * A peak is confirmed one observation LATE by construction (day d is a
  * peak only once day d+1 arrives and is smaller), so the state is O(1)
  * per key forever: the last two (seq, value) pairs. All tests are exact
  * integer compares (v·refDen > refNum — no float ever enters the path),
  * and rows within a micro-batch sort by seq in state, so the emitted
  * peak set equals the batch fold over the full prefix bit-for-bit
  * (StreamingSpec asserts it against [[graft.operators.Temporal
  * .peakDetect]] on the same series).
  */
object PeakStream {

  case class Sample(key: String, seq: Long, value: Long)
  case class PeakRow(key: String, seq: Long, value: Long,
                     prev_n: Long, next_n: Long)
  private[streaming] case class PeakState(n: Long, seq1: Long, v1: Long,
                                          seq2: Long, v2: Long)

  /** One PeakRow per CONFIRMED peak (append mode): value v2 at seq2 is
    * emitted when its successor arrives with v1 < v2 > successor and
    * v2·refDen > refNum (strictly above the commissioned mean — the
    * exact batch inequality cnt·n_days > total with mean = num/den).
    */
  def confirmedPeaks(samples: Dataset[Sample], refNum: Long, refDen: Long)
      : Dataset[PeakRow] = {
    require(refDen > 0, "refDen must be positive")
    implicit val enc = Encoders.product[PeakRow]
    implicit val stateEnc = Encoders.product[PeakState]
    samples.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[PeakState, PeakRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Sample], state: GroupState[PeakState]) =>
          var st = state.getOption.getOrElse(PeakState(0L, 0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[PeakRow]
          rows.toSeq.sortBy(_.seq).foreach { r =>
            if (st.n >= 2 && st.v2 > st.v1 && st.v2 > r.value &&
              st.v2 * refDen > refNum)
              out += PeakRow(key, st.seq2, st.v2, st.v1, r.value)
            st = PeakState(st.n + 1, st.seq2, st.v2, r.seq, r.value)
          }
          state.update(st)
          out.iterator
      }
  }
}
