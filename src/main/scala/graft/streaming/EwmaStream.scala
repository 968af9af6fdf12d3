package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Temporal.ewmaHalf]]: the running
  * α = 1/2 exponentially-weighted mean per key with O(1) state — two
  * numbers (count, accumulator) per key, forever, regardless of stream
  * length.
  *
  * The batch fold (`acc/2 + v/2` over values ordered by (ts, id)) is a
  * left fold, so it resumes from its accumulator: processing each
  * micro-batch's rows in (ts, id) order on top of the carried accumulator
  * replays the batch fold over the whole prefix EXACTLY — halving doubles
  * is bit-exact IEEE math, and the fold order is identical, so
  * StreamingSpec asserts bit equality with the batch operator after every
  * micro-batch, same contract as the HLL/quantile/CMS twins. Requires the
  * stream to be key-ordered ACROSS micro-batches (each batch's (ts, id)
  * keys follow the previous batch's), the usual append-log shape; rows
  * WITHIN a micro-batch may arrive unordered — they are sorted in state.
  */
object EwmaStream {

  case class Sample(key: String, ts_us: Long, id: Long, value: Double)
  case class EwmaRow(key: String, n: Long, ewma: Double)
  private[streaming] case class EwmaState(n: Long, acc: Double)

  /** One updated (key, n, ewma) row per key per micro-batch; run with
    * output mode "update" — the latest row per key is the answer.
    */
  def runningEwma(samples: Dataset[Sample]): Dataset[EwmaRow] = {
    implicit val enc = Encoders.product[EwmaRow]
    implicit val stateEnc = Encoders.product[EwmaState]
    samples.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Sample], state: GroupState[EwmaState]) =>
          val st = state.getOption.getOrElse(EwmaState(0L, 0.0))
          var n = st.n
          var acc = st.acc
          rows.toSeq.sortBy(r => (r.ts_us, r.id)).foreach { r =>
            acc = acc / 2 + r.value / 2
            n += 1
          }
          state.update(EwmaState(n, acc))
          Iterator.single(EwmaRow(key, n, acc))
      }
  }
}
