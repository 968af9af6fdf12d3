package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.operators.Sketch.hllDistinct]]: a running
  * distinct-cardinality estimate per key with O(1) state.
  *
  * HLL registers are max-folds of a pure value hash, so they are
  * order-insensitive AND prefix-mergeable — which makes the sketch the
  * canonical streaming-state citizen: 256 bytes per key, forever,
  * regardless of stream length (contrast exact streaming distinct, whose
  * state grows with the value universe). Because the registers are the
  * same pure function of the same md5-derived hash, the streaming
  * estimate after any prefix is BIT-IDENTICAL to the batch
  * [[graft.operators.Sketch.hllDistinct]] over that prefix —
  * StreamingSpec asserts exact equality, not approximate agreement.
  */
object SketchStream {

  case class KV(key: String, value: Long)
  case class KeyEstimate(key: String, hll_est: Double)

  private[streaming] def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  private[streaming] def estimate(regs: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < 256) { s += 1L << (25 - regs(i)); i += 1 }
    // same literal expression (and fold order) as the batch estimator —
    // constant-folded identically by scalac and Catalyst
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 33554432.0 / s.toDouble
  }

  case class KeyQuantile(key: String, n: Long, est: Double)

  /** Streaming twin of [[graft.operators.Quantile.logLinearQuantile]]:
    * a running rank-q estimate per key whose state is the log-linear slot
    * histogram — at most 64·k counters (an 8 KB long array at k = 16)
    * per key, forever. Slot counts are additive and order-free, so the
    * streaming estimate after any prefix is BIT-IDENTICAL to the batch
    * sketch over that prefix (same slot arithmetic, same ceil(q·n) rank
    * walk, same midpoint formula — asserted in StreamingSpec).
    */
  def runningQuantile(events: Dataset[KV], q: Double,
                      subBuckets: Int = 16): Dataset[KeyQuantile] = {
    require(subBuckets > 0 && (subBuckets & (subBuckets - 1)) == 0)
    val k = subBuckets
    implicit val enc = Encoders.product[KeyQuantile]
    implicit val stateEnc = Encoders.kryo[Array[Long]]
    events.groupByKey(_.key)(Encoders.STRING)
      .mapGroupsWithState[Array[Long], KeyQuantile](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KV], state: GroupState[Array[Long]]) =>
          val slots = state.getOption.getOrElse(new Array[Long](64 * k))
          rows.foreach { r =>
            val v = r.value
            require(v >= 1, s"log-linear sketch needs v >= 1, got $v")
            val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
            val p = 1L << e
            slots(e * k + ((v - p) * k / p).toInt) += 1L
          }
          state.update(slots)
          val n = slots.sum
          val r = math.ceil(q * n).toLong
          var cum = 0L
          var est = 0.0
          var i = 0
          var found = false
          while (i < slots.length && !found) {
            cum += slots(i)
            if (slots(i) > 0 && cum >= r) {
              val e = i / k; val sub = i % k
              // same expression shape as the batch estimator
              est = (1L << e).toDouble *
                (1.0 + (sub.toDouble + 0.5) / k.toDouble)
              found = true
            }
            i += 1
          }
          KeyQuantile(key, n, est)
      }
  }

  case class Tok(key: String, token: String)
  case class CmsCell(key: String, seed: Int, bucket: Long, cell_cnt: Long)

  /** Streaming twin of [[graft.operators.Sketch.cmsSketchBy]]: a running
    * count-min cell table per key with O(d·w) state (a 16 KB long array
    * at d = 4, w = 512 — per key, forever, regardless of stream length).
    * Cells are additive counters on the same pure md5-derived hash as the
    * batch sketch, so after any prefix the state is BIT-IDENTICAL to the
    * batch cell table over that prefix — and counters only grow, so in
    * update mode the max per (key, seed, bucket) is the final answer
    * (asserted exact in StreamingSpec, same contract as the HLL and
    * quantile twins). Emits only the cells touched by the micro-batch.
    */
  def runningCms(tokens: Dataset[Tok], d: Int = 4, w: Int = 512): Dataset[CmsCell] = {
    implicit val enc = Encoders.product[CmsCell]
    implicit val stateEnc = Encoders.kryo[Array[Long]]
    tokens.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Array[Long], CmsCell](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Tok], state: GroupState[Array[Long]]) =>
          val cells = state.getOption.getOrElse(new Array[Long](d * w))
          val touched = scala.collection.mutable.SortedSet.empty[Int]
          rows.foreach { r =>
            var s = 0
            while (s < d) {
              // same seed-mixing as Portable.hash32(token, seed)
              val i = s * w + (hash32(s.toString + "#" + r.token) % w).toInt
              cells(i) += 1L
              touched += i
              s += 1
            }
          }
          state.update(cells)
          touched.iterator.map(i =>
            CmsCell(key, i / w, (i % w).toLong, cells(i)))
      }
  }

  case class DayValue(day: Long, value: Long)

  /** Streaming twin of [[graft.operators.Sketch.hllSlidingDaily]]: the
    * trailing-`windowDays` sliding distinct series maintained live. The
    * window fan-out is a STATELESS flatMap (each event contributes its
    * value to the `windowDays` windows it falls in) feeding
    * [[runningDistinct]] keyed by window index — so the state is one
    * 256-byte register array per OPEN window, and because registers are
    * order-insensitive max-folds of the same hash, each window's estimate
    * after the full stream is BIT-IDENTICAL to the batch
    * `hllSlidingDaily` over the same data (StreamingSpec asserts exact
    * equality; the stream also emits the `windowDays − 1` trailing
    * windows past the last observed day, which the batch operator
    * suppresses — callers filter by their notion of "now"). A production
    * deployment caps state by expiring windows older than the watermark;
    * register state is per-window-constant either way.
    */
  def slidingDistinct(events: Dataset[DayValue],
                      windowDays: Int): Dataset[KeyEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    runningDistinct(events.flatMap(e =>
      (e.day until e.day + windowDays).map(w => KV(w.toString, e.value))))
  }

  /** One updated (key, estimate) row per key per micro-batch; run with
    * output mode "update". Estimates are monotone non-decreasing (max
    * registers only grow), so the latest row per key is the answer.
    */
  def runningDistinct(events: Dataset[KV]): Dataset[KeyEstimate] = {
    implicit val enc = Encoders.product[KeyEstimate]
    implicit val stateEnc = Encoders.BINARY
    events.groupByKey(_.key)(Encoders.STRING)
      .mapGroupsWithState[Array[Byte], KeyEstimate](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KV], state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](256))
          rows.foreach { r =>
            val h = hash32(r.value.toString)
            val j = (h >>> 24).toInt
            val w = h & 0xFFFFFFL
            val rho =
              if (w == 0L) 25
              else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rho > regs(j)) regs(j) = rho.toByte
          }
          state.update(regs)
          KeyEstimate(key, estimate(regs))
      }
  }
}
