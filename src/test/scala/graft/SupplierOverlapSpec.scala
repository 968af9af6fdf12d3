package graft

import org.apache.spark.sql.functions._

/** Hub-cap guard on the supplier co-sourcing self-join (r13 verdict
  * item 2): co-occurrence pair counting cannot be shrunk by degree
  * orientation (every pair sharing a part must be counted — unlike
  * triangles), so the scale defense is excluding hub parts whose
  * supplier degree exceeds the cap. These specs prove, with a small test
  * cap, that the guard is (a) a NO-OP below the cap — pair-set equality
  * with the unguarded join — and (b) exact hub exclusion above it, and
  * that the graded query at [[QueriesX.SupplierHubCap]] is unchanged on
  * the TPC-H-shaped testdata (~4 suppliers/part).
  */
class SupplierOverlapSpec extends SparkSpec {
  import spark.implicits._

  // distinct (part, supplier) membership: parts 1..6 each sourced by
  // suppliers {p, p+1, p+2} (degree 3), plus hub part 99 with degree 5
  private def ps = (for {
    p <- 1L to 6L
    s <- p to (p + 2)
  } yield (p, s)).++((1L to 5L).map(s => (99L, s)))
    .toDF("l_partkey", "l_suppkey")

  private def run(cap: Long): Set[(Long, Long, Long)] =
    QueriesX.supplierOverlapTopk(ps, cap)
      .as[(Long, Long, Long)].collect().toSet

  test("guard is a no-op when every part is below the cap") {
    assert(run(cap = 5L) === run(cap = Long.MaxValue))
  }

  test("guard excludes exactly the hub parts' pairs above the cap") {
    val got = run(cap = 4L) // hub part 99 (degree 5) excluded
    val brute = ps.as[(Long, Long)].collect().groupBy(_._1)
      .filter(_._2.length <= 4)
      .iterator.flatMap { case (_, m) =>
        val sup = m.map(_._2).sorted
        for (i <- sup.indices; j <- (i + 1) until sup.length)
          yield (sup(i), sup(j))
      }
      .toSeq.groupBy(identity)
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSet
    assert(got === brute)
    assert(got.nonEmpty)
    // the hub-only pair (1,5) exists solely via part 99 — must be gone
    assert(!got.exists { case (a, b, _) => a == 1L && b == 5L })
    // below-cap co-sourcing survives: parts 1..6 give (p+1, p+2) pairs
    assert(got.exists { case (a, b, _) => a == 2L && b == 3L })
  }

  test("graded query at the production cap is unchanged on testdata") {
    val sf = "/root/testdata/sf0.001"
    val membership = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val maxDeg = membership.groupBy("l_partkey").count()
      .agg(max("count")).as[Long].head()
    assert(maxDeg <= QueriesX.SupplierHubCap,
      "testdata must sit below the cap for this equivalence to be exact")
    val guarded = QueriesX.qSupplierOverlapTopk(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val unguarded = QueriesX.supplierOverlapTopk(membership, Long.MaxValue)
      .as[(Long, Long, Long)].collect().toSeq
    assert(guarded === unguarded)
    assert(guarded.nonEmpty)
  }
}
