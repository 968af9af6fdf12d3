package graft

import org.apache.spark.sql.functions.col
import graft.operators.Association

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: hand-counted supports, prune order, presence semantics") {
    // baskets: {m,b}, {m,b}, {m,b,r}, {m}, {r} — m=milk b=bread r=rare
    val rows = Seq(
      (1L, "m"), (1L, "b"),
      (2L, "m"), (2L, "b"),
      (3L, "m"), (3L, "b"), (3L, "r"),
      (4L, "m"), (4L, "m"), // duplicate row: presence, not multiplicity
      (5L, "r")).toDF("bid", "item")
    val r = Association.pairRules(rows, "bid", "item",
        minItemSupport = 2L, minPairSupport = 2L)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect()
    // r (support 2) survives the item cut, but pairs with r have
    // support 1 -> only (b, m) remains
    assert(r.length === 1)
    val p = r.head
    assert((p._1, p._2) === (("b", "m")))
    assert(p._3 === 3L)          // n_ab: baskets 1,2,3
    assert((p._4, p._5) === ((3L, 4L))) // n_b(read)=3, n_m(ilk)=4
    assert(p._6 === 1.0)         // bread -> milk: 3/3
    assert(p._7 === 0.75)        // milk -> bread: 3/4
    assert(p._8 === 3.0 * 5.0 / (3.0 * 4.0)) // lift = n_ab*B/(n_a*n_b)
    // raising the item support cut removes 'r' from the join entirely
    // and leaves the same single rule (downward closure made physical)
    val pruned = Association.pairRules(rows.repartition(7), "bid", "item",
        minItemSupport = 3L, minPairSupport = 2L)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect()
    assert(pruned.toSeq === r.toSeq)
  }

  test("pairRules plans as equi-joins with the support cut before the pair join") {
    val rows = (1L to 200L).flatMap(b => Seq((b, s"i${b % 7}"), (b, s"i${b % 5}")))
      .toDF("bid", "item")
    val plan = Association.pairRules(rows, "bid", "item", 10L, 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only nested loop is the 1-row basket-total broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
  }
}
