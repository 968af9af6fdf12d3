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

  test("mergeIntervals consolidates overlapping and touching spans per key") {
    // user 1: [0,10] [5,15] (overlap) [15,20] (touching, start==pmax merges
    // since start > pmax is false) [30,40] (gap) ; user 2: single interval
    val iv = Seq((1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 15L, 20L),
      (1L, 4L, 30L, 40L), (2L, 5L, 0L, 1L))
      .toDF("user_id", "event_id", "s", "e")
    val r = Temporal.mergeIntervals(iv, Seq("user_id"), "s", "e", "event_id")
      .select("user_id", "grp", "span_start", "span_end", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(r === Set(
      (1L, 1L, 0L, 20L, 3L),
      (1L, 2L, 30L, 40L, 1L),
      (2L, 1L, 0L, 1L, 1L)))
  }

  test("scd2 compacts runs into versions; point-in-time lookup reconstructs history") {
    // user 1: A A B A (run-collapse then two changes); user 2: constant C
    val ch = Seq((1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L), (2L, "C", 5L, 5L))
      .toDF("user_id", "attr", "ts_us", "event_id")
    val r = Temporal.scd2(ch, Seq("user_id"), "attr", "ts_us", "event_id")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet
    assert(r === Set(
      (1L, "A", 10L, Some(30L), 1L, false),
      (1L, "B", 30L, Some(40L), 2L, false),
      (1L, "A", 40L, None, 3L, true),
      (2L, "C", 5L, None, 1L, true)))
    // point-in-time: the version covering ts=35 for user 1 is B
    val at35 = r.filter { case (u, _, f, t, _, _) =>
      u == 1L && f <= 35L && t.forall(_ > 35L) }
    assert(at35.map(_._2) === Set("B"))
  }

  test("gapFillDaily fills missing days with 0 and carries the last value") {
    // key "a" active on days 10 and 13 (twice); "b" only on day 11
    val df = Seq(("a", 10L), ("a", 13L), ("a", 13L), ("b", 11L))
      .toDF("k", "day")
    val r = Temporal.gapFillDaily(df, "k", "day")
      .select("k", "day", "n", "locf_n")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r === Set(
      ("a", 10L, 1L, 1L), ("a", 11L, 0L, 1L), ("a", 12L, 0L, 1L), ("a", 13L, 2L, 2L),
      ("b", 10L, 0L, 0L), ("b", 11L, 1L, 1L), ("b", 12L, 0L, 1L), ("b", 13L, 0L, 1L)))
  }

  test("ohlc picks open/close deterministically under timestamp ties") {
    val e = Seq(
      ("t", 0L, 100L, 1L, 5.0), ("t", 0L, 100L, 2L, 9.0), // tie: id orders
      ("t", 0L, 200L, 3L, 1.0), ("t", 0L, 300L, 4L, 7.0),
      ("t", 1L, 400L, 5L, 2.0))
      .toDF("k", "bucket", "ts", "id", "v")
    val r = Temporal.ohlc(e, "k", "bucket", "ts", "id", "v")
      .select("k", "bucket", "open", "high", "low", "close", "n")
      .as[(String, Long, Double, Double, Double, Double, Long)].collect().toSet
    assert(r === Set(
      ("t", 0L, 5.0, 9.0, 1.0, 7.0, 4L), // open = id 1 at the tied ts
      ("t", 1L, 2.0, 2.0, 2.0, 2.0, 1L)))
  }

  test("mergeIntervals matches a sequential sweep reference on random data") {
    val rnd = new scala.util.Random(11)
    val iv = (1 to 300).map { i =>
      val s = rnd.nextInt(2000).toLong
      (rnd.nextInt(5).toLong, i.toLong, s, s + 1 + rnd.nextInt(120))
    }
    val got = Temporal.mergeIntervals(
        iv.toDF("k", "id", "s", "e").repartition(7), Seq("k"), "s", "e", "id")
      .select("k", "span_start", "span_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // reference: per-key sequential sweep over (s, id)-sorted intervals
    val want = iv.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val out = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long)]
      var (cs, ce, cn) = (sorted.head._3, sorted.head._4, 1L)
      for ((_, _, s, e) <- sorted.tail) {
        if (s > ce) { out += ((k, cs, ce, cn)); cs = s; ce = e; cn = 1L }
        else { ce = math.max(ce, e); cn += 1L }
      }
      out += ((k, cs, ce, cn))
      out
    }.toSet
    assert(got === want)
  }

  test("ewmaHalf folds in (ts, id) order and is partition-independent") {
    // e = ((0/2 + 8/2)/2 + 4/2)/2 + 2/2 = ((4)/2+2)/2+1 = 3/2+... replay:
    // acc=0 -> 4 -> 4/2+2=4 -> 4/2+1=3
    val df = Seq((1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0), (1L, 30L, 3L, 2.0))
      .toDF("k", "ts", "id", "v")
    val r = Temporal.ewmaHalf(df, Seq("k"), "ts", "id", "v")
      .select("k", "n", "ewma").as[(Long, Long, Double)].collect()
    assert(r === Array((1L, 3L, 3.0)))
    val big = (1 to 500).map(i => (i % 7L, i.toLong, i.toLong, (i % 13).toDouble))
      .toDF("k", "ts", "id", "v")
    val x = Temporal.ewmaHalf(big, Seq("k"), "ts", "id", "v").collect().toSet
    val y = Temporal.ewmaHalf(big.repartition(11), Seq("k"), "ts", "id", "v")
      .collect().toSet
    assert(x === y, "fold order must come from (ts, id), not partition layout")
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

  test("attribution horizon gates the as-of match; ties attribute; no-click stays null") {
    // user 1: click at t=100, purchases at t=150 (in horizon=100) and
    // t=300 (beyond); user 2: click exactly at the purchase ts (tie ->
    // ref sorts first -> attributes with gap 0); user 3: purchase, no click
    val horizon = 100L
    val clicks = Seq((10L, 1L, 100L), (20L, 2L, 500L)).toDF("event_id", "user_id", "ts_us")
    val purchases = Seq((11L, 1L, 150L), (12L, 1L, 300L), (21L, 2L, 500L),
      (31L, 3L, 50L)).toDF("event_id", "user_id", "ts_us")
    val m = Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts_us", "event_id")
      .select($"event_id",
        when($"ts_us" - $"matched_ts" <= horizon, $"matched_id").as("click_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(m(11L) === Some(10L)) // within horizon
    assert(m(12L) === None)      // same click, beyond horizon
    assert(m(21L) === Some(20L)) // simultaneous click attributes
    assert(m(31L) === None)      // never clicked
  }

  test("cusumChangepoint finds a planted level shift at its onset day") {
    // series A: 10/day for days 0-9, then 30/day for days 10-14; Page's
    // CUSUM path peaks on the LAST day of the elevated run (day 14) —
    // the maximum cumulative exceedance over the series mean
    val a = (0L to 9L).map(d => ("A", d, 10L)) ++
      (10L to 14L).map(d => ("A", d, 30L))
    // series B: flat -> every scaled deviation is 0, path never rises;
    // earliest-day tie-break pins cp_day = first day
    val b = (0L to 9L).map(d => ("B", d, 5L))
    val daily = (a ++ b).toDF("k", "day", "n")
    val r = Temporal.cusumChangepoint(daily, "k", "day", "n")
      .as[(String, Long, Double, Long)].collect().map(t => t._1 -> t).toMap
    // A: mean = 250/15; scaled dev on elevated days = 30*15-250 = 200,
    // on base days 10*15-250 = -100; prefix peaks at day 14 with
    // 10*(-100) + 5*200 = 0 -> hmm prefix at 14 = 0; path max is at the
    // point of largest positive excursion over the running min:
    // runmin = -1000 (after day 9), so S_14 = 0 - (-1000) = 1000
    assert(r("A")._2 === 14L)
    assert(r("A")._3 === 1000.0 / 15.0)
    assert(r("A")._4 === 15L)
    assert(r("B")._2 === 0L)
    assert(r("B")._3 === 0.0)
    // partition invariance
    val again = Temporal.cusumChangepoint(daily.repartition(7), "k", "day", "n")
      .as[(String, Long, Double, Long)].collect().map(t => t._1 -> t).toMap
    assert(again === r)
  }

  test("seasonalAnomaly flags per-cell deviants exactly; zero-variance cells stay silent") {
    // one deviant among D samples can reach z^2 at most D-1 (it inflates
    // the variance it is judged against), so use D=10: nine 10s + one 50
    //   T=140 S2=3400; varI = 10*3400 - 19600 = 14400
    //   dev(50) = 500-140 = 360 -> 129600 > 4*14400 flags, zsq = 9
    //   dev(10) = -40 -> 1600 stays
    // cell Y: constant 7s -> varI = 0, nothing can flag (not even NaN rows)
    val rows = ((1L to 9L).map(d => ("X", d, 10L)) :+ ("X", 10L, 50L)) ++
      Seq(("Y", 1L, 7L), ("Y", 2L, 7L), ("Y", 3L, 7L))
    val df = rows.toDF("k", "day", "v")
    val r = Temporal.seasonalAnomaly(df, Seq("k"), "day", "v", zsq = 4)
      .as[(String, Long, Long, Double)].collect().toList
    assert(r === List(("X", 10L, 50L, 9.0)))
    // tightening the threshold beyond the deviant's z^2 silences it
    assert(Temporal.seasonalAnomaly(df, Seq("k"), "day", "v", zsq = 9)
      .count() === 0L)
  }

  test("kaplanMeier: textbook worked example with censoring, monotone, exact factors") {
    // classic: durations (t, event): 6+,6,6,6,7,9+,10,10+ (+ = censored)
    //   t=6: n=8 d=3  -> S = 1 - 3/8 = 0.625
    //   t=7: n=4 d=1  -> S = 0.625 * 3/4 = 0.46875
    //   t=10: n=2 d=1 -> S = 0.46875 * 1/2 = 0.234375
    // (9 is censor-only: no row; censored units still held the n=4 at 7)
    val units = Seq((6L, false), (6L, true), (6L, true), (6L, true),
      (7L, true), (9L, false), (10L, true), (10L, false))
      .toDF("dur", "ev")
    val r = Temporal.kaplanMeier(units, "dur", "ev")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    assert(r === List((6L, 8L, 3L, 0.625), (7L, 4L, 1L, 0.46875),
      (10L, 2L, 1L, 0.234375)))
    // survival is non-increasing and censor-only times never emit rows
    assert(r.map(_._4) === r.map(_._4).sorted.reverse)
    // partition invariance (the fold order is pinned by the sorted array)
    val again = Temporal.kaplanMeier(units.repartition(7), "dur", "ev")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    assert(again === r)
  }

  test("logRank: null case gives ~0, separated hazards give large chi2, hand math") {
    // identical curves in both groups -> every d1 equals its expectation
    // exactly (balanced design) -> U = 0, chi2 = 0
    val nullCase = Seq(
      (1L, true, true), (1L, true, false),
      (2L, true, true), (2L, true, false),
      (3L, false, true), (3L, false, false)).toDF("dur", "ev", "grp")
    val r0 = Temporal.logRank(nullCase, "dur", "ev", "grp")
      .as[(Long, Double, Double, Double)].head()
    assert(r0._1 === 2L)
    assert(r0._2 === 0.0 && r0._4 === 0.0)
    // group 1 dies strictly earlier than group 0: strong separation
    val sep = ((1L to 20L).map(i => (i, true, true)) ++
      (101L to 120L).map(i => (i, true, false))).toDF("dur", "ev", "grp")
    val rs = Temporal.logRank(sep, "dur", "ev", "grp")
      .as[(Long, Double, Double, Double)].head()
    assert(rs._4 > 10.0, s"separated hazards must reject, chi2=${rs._4}")
    // hand math on one event time: units (1,death,g1),(1,death,g0),
    // (2,censor,g1): at t=1 n=3 n1=2 d=2 d1=1 -> U = 1 - 2*2/3 = -1/3;
    // V = (2*2/3)*(1/3)*(1/2) = 2/9; chi2 = (1/9)/(2/9) = 0.5
    val h = Seq((1L, true, true), (1L, true, false), (2L, false, true))
      .toDF("dur", "ev", "grp")
    val rh = Temporal.logRank(h, "dur", "ev", "grp")
      .as[(Long, Double, Double, Double)].head()
    assert(math.abs(rh._2 - (1.0 - 4.0 / 3.0)) < 1e-15)
    assert(math.abs(rh._3 - 2.0 / 9.0) < 1e-15)
    assert(math.abs(rh._4 - 0.5) < 1e-12)
    // partition invariance (pinned fold order)
    val again = Temporal.logRank(sep.repartition(7), "dur", "ev", "grp")
      .as[(Long, Double, Double, Double)].head()
    assert(again === rs)
  }

  test("decayedSum: whole-halving weights, cutoff, partition invariance") {
    // halfLife=1, K=2: weights by age = 1, 1/2, 1/4, then hard 0
    val rows = Seq(("A", 0L, 8L), ("A", 1L, 8L), ("A", 2L, 8L), ("A", 3L, 8L),
      ("B", 0L, 5L)).toDF("k", "age", "v")
    val r = Temporal.decayedSum(rows, Seq("k"), "age", "v",
      halfLife = 1L, maxHalvings = 2)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r("A") === (("A", 4L, 8.0 + 4.0 + 2.0))) // age-3 row cut to 0
    assert(r("B") === (("B", 1L, 5.0)))
    // half-life bucketing: ages 0 and 6 with halfLife=7 share weight 1
    val bucket = Seq(("C", 0L, 3L), ("C", 6L, 3L), ("C", 7L, 4L))
      .toDF("k", "age", "v")
    val rb = Temporal.decayedSum(bucket, Seq("k"), "age", "v",
      halfLife = 7L, maxHalvings = 10)
      .as[(String, Long, Double)].collect().head
    assert(rb === (("C", 3L, 3.0 + 3.0 + 2.0)))
    val again = Temporal.decayedSum(rows.repartition(7), Seq("k"), "age", "v",
      halfLife = 1L, maxHalvings = 2)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(again === r)
  }

  test("peakDetect: interior strict peaks above the key mean only") {
    // day 2 pops (5 > 1 both sides, 5*5=25 > total 9); boundaries never peak
    val a = Seq(("a", 1L, 1L), ("a", 2L, 5L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("a", 5L, 1L)).toDF("k", "d", "n")
    val r = Temporal.peakDetect(a, "k", "d", "n")
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    assert(r === List(("a", 2L, 5L, 1L, 1L, 25.0 / 9.0)))
    // a local bump below the mean is NOT a peak (2 > 1,1 but 2*5 < 24)
    val b = Seq(("b", 1L, 10L), ("b", 2L, 1L), ("b", 3L, 2L), ("b", 4L, 1L),
      ("b", 5L, 10L)).toDF("k", "d", "n")
    assert(Temporal.peakDetect(b, "k", "d", "n").count() === 0L)
    // boundary maxima (no neighbor on one side) are disqualified
    val c = Seq(("c", 1L, 9L), ("c", 2L, 1L), ("c", 3L, 1L)).toDF("k", "d", "n")
    assert(Temporal.peakDetect(c, "k", "d", "n").count() === 0L)
  }

  test("hampelFilter: exact order-statistic median/MAD, trailing windows only") {
    // days 1..7 = 1,3,5,7,9,11,13; day 8 spikes to 20, day 9 at 18
    val vals = Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L, 20L, 18L)
    val d = vals.zipWithIndex.map { case (v, i) => ("a", i + 1L, v) }
      .toDF("k", "d", "n")
    val r = Temporal.hampelFilter(d, "k", "d", "n")
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(t => t._2 -> t).toMap
    // only full 7-windows emit: days 8 and 9
    assert(r.keySet === Set(8L, 9L))
    // day 8: window [1..13] -> med 7, dev 13, mad 4 -> 13 > 12 flags
    assert(r(8L) === (("a", 8L, 20L, 7L, 13L, 4L, true)))
    // day 9: window [3..13,20] -> med 9, dev 9, mad 4 -> 9 <= 12 clean
    assert(r(9L) === (("a", 9L, 18L, 9L, 9L, 4L, false)))
    val again = Temporal.hampelFilter(d.repartition(5), "k", "d", "n")
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(t => t._2 -> t).toMap
    assert(again === r)
  }
}
