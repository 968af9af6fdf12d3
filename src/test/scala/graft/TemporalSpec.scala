package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** As-of and binned range joins on hand-built frames. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest ref at-or-before each probe, null before any ref") {
    val probe = Seq((1L, 100L, 10L), (1L, 205L, 11L), (1L, 50L, 12L), (2L, 100L, 13L))
      .toDF("user_id", "ts_us", "event_id")
    val ref = Seq((1L, 100L, 20L), (1L, 200L, 21L), (2L, 300L, 22L))
      .toDF("user_id", "ts_us", "event_id")
    val r = Temporal.asofJoin(probe, ref, Seq("user_id"), "ts_us", "event_id")
      .select("user_id", "event_id", "matched_id").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(r === Set(
      (1L, 10L, Some(20L)),  // ts tie 100: ref wins (<= semantics)
      (1L, 11L, Some(21L)),  // 205 -> latest prior ref at 200
      (1L, 12L, None),       // 50: no ref yet
      (2L, 13L, None)))      // user 2's only ref is later
  }

  test("rangeJoinBinned matches plain containment including boundaries") {
    val probe = Seq((1L, 0L, 1L), (1L, 500L, 2L), (1L, 1000L, 3L), (1L, 1001L, 4L))
      .toDF("user_id", "ts_us", "event_id")
    val iv = Seq((1L, 7L, 0L, 1000L)).toDF("user_id", "interval_id", "start_us", "end_us")
    // bin smaller than the interval: interval spans several bins
    val r = Temporal.rangeJoinBinned(probe, iv, Seq("user_id"),
      "ts_us", "start_us", "end_us", binMicros = 300L)
      .select("event_id").as[Long].collect().sorted
    assert(r === Array(1L, 2L, 3L)) // both boundaries inclusive; 1001 excluded
  }
}
