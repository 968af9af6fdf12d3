package graft

import graft.operators.Profiling

/** FD discovery and split-balance χ² on hand-built frames: exact
  * textbook cell values and partition invariance (the corpus collapses
  * into hash aggs before any arithmetic).
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("fdProfile: a held FD, a violated FD, exact clean fractions") {
    val d = Seq((1L, "x", 1L, "a"), (2L, "y", 1L, "b"), (3L, "x", 1L, "a"),
      (4L, "z", 2L, "c"))
      .toDF("k", "v", "g", "h")
    val r = Profiling.fdProfile(d, Seq(("k", "v"), ("g", "h")))
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // k unique -> k->v holds on every group
    assert(r("k->v") === (("k->v", 4L, 0L, 1L, 4L, 1.0)))
    // g=1 sees h in {a,b} over 3 rows (violating), g=2 is clean
    assert(r("g->h") === (("g->h", 2L, 1L, 2L, 4L, 0.25)))
    val again = Profiling.fdProfile(d.repartition(7), Seq(("k", "v"), ("g", "h")))
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(again === r)
  }

  test("splitBalance: textbook chi^2 cell contributions") {
    // A: 2+2, B: 1+3 -> N=8, r=4 each, c(s1)=3, c(s2)=5
    val d = Seq(("A", "s1"), ("A", "s1"), ("A", "s2"), ("A", "s2"),
      ("B", "s1"), ("B", "s2"), ("B", "s2"), ("B", "s2"))
      .toDF("cat", "split")
    val r = Profiling.splitBalance(d, "cat", "split")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    // (A,s1): o=2, e=12/8=1.5, contrib=(16-12)^2/(8*4*3)=16/96
    assert(r(("A", "s1")) === (("A", "s1", 2L, 12.0 / 8.0, 16.0 / 96.0)))
    // (B,s2): o=3, e=20/8=2.5, contrib=(24-20)^2/(8*4*5)=16/160
    assert(r(("B", "s2")) === (("B", "s2", 3L, 20.0 / 8.0, 16.0 / 160.0)))
    assert(r.size === 4)
    val again = Profiling.splitBalance(d.repartition(5), "cat", "split")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(again === r)
  }
}
