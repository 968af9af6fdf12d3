package graft

import graft.streaming.SessionStream
import graft.streaming.SessionStream.{ClosedSession, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Structured Streaming sessionization driven through MemoryStream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("session_window counts sessions per user with gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionStream.windowedCounts(input.toDF(), gap = "30 seconds",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_w")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1L, 1L, ts(0)), Event(1L, 2L, ts(10)),  // session A
        Event(1L, 3L, ts(100)),                        // session B (gap 90s)
        Event(2L, 4L, ts(5)))                          // other user
      q.processAllAvailable()
      val rows = spark.table("sessions_w")
        .select("user_id", "n_events").as[(Long, Long)].collect().sorted
      assert(rows === Array((1L, 1L), (1L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits closed sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionStream.statefulSessions(input.toDS(), gapMicros = 30000000L)
      .writeStream.format("memory").queryName("sessions_s")
      .outputMode("append").start()
    try {
      input.addData(Event(1L, 1L, ts(0)), Event(1L, 2L, ts(10)))
      q.processAllAvailable()
      input.addData(Event(1L, 3L, ts(100))) // closes session A
      q.processAllAvailable()
      val rows = spark.table("sessions_s").as[ClosedSession].collect()
      assert(rows.toSeq === Seq(ClosedSession(1L, 2L, 0L, 10000000L)))
    } finally q.stop()
  }
}
