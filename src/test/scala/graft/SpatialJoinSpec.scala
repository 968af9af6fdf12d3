package graft

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._

/** Grid-binned spatial join: equality with the naive inequality join on
  * random-ish data (including boxes spanning several bins and boundary
  * points), and the plan guarantee that makes it scale.
  */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = (1 to 400).map(i =>
    ((i * 131) % 200 - 100L, (i * 173) % 160 - 80L, i.toLong))
    .toDF("px", "py", "pid")

  private def boxes = Seq(
    (1L, -100L, -80L, -40L, -20L),  // spans multiple 32-bins
    (2L, -10L, -10L, 10L, 10L),     // straddles the origin bins
    (3L, 50L, 40L, 99L, 79L),
    (4L, 0L, 0L, 0L, 0L))           // degenerate single point
    .toDF("bid", "x0", "y0", "x1", "y1")

  test("binned join equals the naive inequality join, boundaries inclusive") {
    val binned = SpatialJoin.pointInBoxBinned(pts, boxes, binSize = 32L)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    val naive = pts.join(boxes,
        col("px") >= col("x0") && col("px") <= col("x1") &&
          col("py") >= col("y0") && col("py") <= col("y1"))
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(naive.nonEmpty, "fixture must actually produce matches")
    // a point exactly on a corner matches (inclusive bounds)
    val corner = Seq((50L, 40L, 999L)).toDF("px", "py", "pid")
    val hit = SpatialJoin.pointInBoxBinned(corner, boxes, binSize = 32L)
      .select("bid").as[Long].collect().toSet
    assert(hit.contains(3L))
  }

  test("binned join plans as an equi-join, the naive one cannot") {
    val pBinned = SpatialJoin.pointInBoxBinned(pts, boxes, binSize = 32L)
      .queryExecution.executedPlan.toString
    assert(!pBinned.contains("CartesianProduct"))
    assert(!pBinned.contains("BroadcastNestedLoopJoin"))
    val pNaive = pts.join(boxes,
        col("px") >= col("x0") && col("px") <= col("x1") &&
          col("py") >= col("y0") && col("py") <= col("y1"))
      .queryExecution.executedPlan.toString
    // the contrast that motivates the operator
    assert(pNaive.contains("BroadcastNestedLoopJoin") ||
      pNaive.contains("CartesianProduct"))
  }
}
