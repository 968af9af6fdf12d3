package graft

import graft.operators.Sessions

/** Growth-accounting ledger invariants: the hand-traced lifecycle of two
  * users, the accounting identities, and partition invariance.
  */
class GrowthSpec extends SparkSpec {
  import spark.implicits._

  test("growthAccounting: hand-traced lifecycle ledger") {
    // u1: w1, w2, w4 (gap at w3); u2: w2 only
    val act = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 2L)).toDF("u", "w")
    val r = Sessions.growthAccounting(act, "u", "w")
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) === ((1L, 1L, 0L, 0L, 0L)))       // u1 new
    assert(r(2L) === ((2L, 1L, 1L, 0L, 0L)))       // u2 new, u1 retained
    assert(r(3L) === ((3L, 0L, 0L, 0L, 2L)))       // both churn at w3
    assert(r(4L) === ((4L, 0L, 0L, 1L, 0L)))       // u1 resurrects
    assert(r(5L) === ((5L, 0L, 0L, 0L, 1L)))       // u1 churns again
    assert(r.size === 5)
  }

  test("growthAccounting: accounting identities hold on pseudo-random data") {
    val act = (1L to 3000L)
      .map(i => ((i * 31) % 97, (i * 7919) % 13)).toDF("u", "w")
    val led = Sessions.growthAccounting(act, "u", "w")
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    val active = act.distinct().groupBy("w").count()
      .as[(Long, Long)].collect().toMap
    for ((w, (_, nw, ret, res, _)) <- led if active.contains(w)) {
      assert(nw + ret + res === active(w), s"active identity at week $w")
      val prevActive = active.getOrElse(w - 1, 0L)
      val churn = led.get(w).map(_._5).getOrElse(0L)
      assert(prevActive - ret === churn,
        s"everyone active at w-1 either retains or churns (week $w)")
    }
    val again = Sessions.growthAccounting(act.repartition(7), "u", "w")
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(again === led)
  }
}
