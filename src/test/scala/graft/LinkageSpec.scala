package graft

import graft.operators.Linkage

/** Fellegi–Sunter linkage invariants: blocking really bounds the
  * comparison space, agreement weights add up as specified, and the
  * block-size cap drops oversized blocks instead of exploding.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def cust(rows: (Long, Int, String, Double, String)*) =
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal", "c_name")

  test("weights sum per comparator; cross-block pairs never compared") {
    val d = cust(
      (1L, 7, "AUTO", 1000.0, "Customer#000000001"),
      (2L, 7, "AUTO", 1050.0, "Customer#000000101"), // close bal, same tail, same band
      (3L, 7, "AUTO", 9500.0, "Customer#000000303"), // far from both
      (4L, 8, "AUTO", 1000.0, "Customer#000000001")) // same fields, other block
    val r = Linkage.scoredPairs(d, maxBlock = 100L, minScore = 20)
      .as[(Long, Long, Int)].collect().toSet
    // (1,2): bal diff 50 -> +24, tails "01"="01" -> +10, band 1==1 -> +6 = 40
    assert(r === Set((1L, 2L, 40)))
    // (1,4) identical fields but different nation: blocked apart, absent.
    // (1,3)/(2,3): -12 -6 -2 = -20 and never reach the threshold.
  }

  test("sub-threshold scores and oversized blocks are dropped") {
    val near = (1L to 5L).map(i =>
      (i, 3, "BULK", 200.0 + i, f"Customer#${i}%09d"))
    val d = cust(near: _*)
    // cap 4 < block size 5: the whole block is skipped -> no pairs at all
    assert(Linkage.scoredPairs(d, maxBlock = 4L).isEmpty)
    // cap lifted: all 10 pairs agree on balance band and proximity
    val r = Linkage.scoredPairs(d, maxBlock = 100L, minScore = 20)
      .as[(Long, Long, Int)].collect()
    assert(r.length === 10)
    // bal diff < 100 (+24) and same band (+6) for every pair; the name
    // tails all differ (-6) => 24 - 6 + 6 = 24
    assert(r.forall(_._3 === 24))
  }

  test("linkage is partition-invariant") {
    val rows = (1L to 40L).map(i =>
      (i, (i % 4).toInt, "SEG", (i % 7) * 300.0, f"Customer#${i % 13}%09d"))
    val d = cust(rows: _*)
    val a = Linkage.scoredPairs(d).as[(Long, Long, Int)].collect().toSet
    val b = Linkage.scoredPairs(d.repartition(7)).as[(Long, Long, Int)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty, "the fixture must actually produce links")
  }

  test("blockingQuality: exact pair accounting and reduction ratio") {
    // blocks: a=3 rows, b=2 rows -> cand_x2 = 6+2 = 8, N(N-1) = 20
    val d = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5))
      .toDF("blk", "id")
    val r = Linkage.blockingQuality(d, Seq("blk"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("a") === (("a", 3L, 6L, 6.0 / 8.0, 1.0 - 8.0 / 20.0)))
    assert(r("b") === (("b", 2L, 2L, 2.0 / 8.0, 1.0 - 8.0 / 20.0)))
    val again = Linkage.blockingQuality(d.repartition(7), Seq("blk"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(again === r)
  }
}
