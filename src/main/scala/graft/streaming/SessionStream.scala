package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterpart of the batch sessionizer
  * (graft.operators.Sessions) — the streaming surface the reference lacks
  * (it is pure batch, SURVEY.md §2 "What the reference does NOT have") but a
  * training-data pipeline needs for continuous event feeds.
  *
  * Two formulations:
  * - [[windowedCounts]]: stock watermark + session_window aggregation —
  *   fully declarative, state managed by Spark, the default choice.
  * - [[statefulSessions]]: explicit `flatMapGroupsWithState` with processing
  *   -time timeout — the custom-state escape hatch for semantics the
  *   built-in session window can't express (e.g. emitting a session record
  *   only on close, with custom session metadata).
  *
  * State is partitioned by user_id: at 1000 executors each task owns a hash
  * range of users; state size is O(active users), not O(events).
  */
object SessionStream {

  final case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start_us: Long, end_us: Long, n: Long)
  final case class ClosedSession(user_id: Long, n_events: Long,
                                 start_us: Long, end_us: Long)

  /** Streaming exact dedup: drop duplicate (user_id, event_id) pairs
    * arriving within the watermark — the continuous counterpart of the
    * batch `Dedup.exact` hash-groupBy. State holds one entry per key and
    * expires with the watermark, so memory is bounded by the duplicate
    * window, not the stream's lifetime.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_id")

  /** Streaming incremental exact dedup against a STATIC corpus — the
    * continuous counterpart of `Dedup.dedupIncrement`'s exact tier: new
    * documents arrive on a stream and only those whose content hash is
    * absent from the existing corpus pass through. A stream-static
    * LEFT ANTI join: Spark broadcasts/rescans the static side per
    * micro-batch, no state store involved, so memory is bounded by the
    * static hash projection (one md5 column, not the corpus text).
    */
  def dedupAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
                         textCol: String = "text"): DataFrame =
    newDocs
      .withColumn("_ch", md5(col(textCol)))
      .join(corpus.select(md5(col(textCol)).as("_ch")).distinct(),
        Seq("_ch"), "left_anti")
      .drop("_ch")

  /** Watermarked session-window counts (gap-based, declarative). */
  def windowedCounts(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Custom-state sessionization: one state record per user; a session is
    * emitted when the gap is exceeded within the stream, or when the
    * watermark passes the session's end + gap (event-time timeout) — so the
    * LAST session per idle user is eventually emitted and its state
    * cleared, bounding state size to currently-active users.
    *
    * Event-time (not processing-time) timeout: deterministic under replay,
    * consistent with the batch sessionizer's time axis, and no idle-batch
    * livelock (processing-time timeouts keep scheduling no-data batches,
    * which also makes `processAllAvailable` hang in tests).
    */
  def statefulSessions(events: Dataset[Event], gapMicros: Long,
                       watermarkDelay: Option[String] = None): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    val gapMs = gapMicros / 1000L
    // lateness tolerance is operationally independent of the gap semantics;
    // default it to the gap but let deployments widen it for laggier feeds
    val delay = watermarkDelay.getOrElse(s"$gapMs milliseconds")
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: close and clear — state never grows
            // unboundedly for one-shot users
            val out = state.getOption.map(s =>
              ClosedSession(userId, s.n, s.start_us, s.end_us))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            for (e <- sorted) {
              val us = e.ts.getTime * 1000L
              cur match {
                case Some(s) if us - s.end_us > gapMicros =>
                  closed += ClosedSession(userId, s.n, s.start_us, s.end_us)
                  cur = Some(SessionState(us, us, 1))
                case Some(s) =>
                  // an in-watermark but out-of-order event may EXTEND the
                  // session backwards — min the start, not just max the end
                  cur = Some(SessionState(math.min(s.start_us, us),
                    math.max(s.end_us, us), s.n + 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes end+gap (clamp: the engine
              // rejects timeouts at/behind the current watermark)
              val deadline = s.end_us / 1000L + gapMs
              state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
