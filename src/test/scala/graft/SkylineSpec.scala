package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2D matches the naive domination definition on a known frontier") {
    // frontier: (1,9), (5,5), (9,1); dominated: (1,5) by (1,9) via equal-x
    // strict-y, (4,4) by (5,5), (0,0) by everything
    val pts = Seq(
      (1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L),
      (4L, 1L, 5L), (5L, 4L, 4L), (6L, 0L, 0L)).toDF("id", "x", "y")
    val r = Skyline.skyline2D(pts, "id", "x", "y", buckets = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r === List((1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L)))
  }

  test("skyline2D keeps duplicate frontier points and survives one-bucket collapse") {
    // identical points never dominate each other (no strict dimension)
    val dup = Seq((1L, 3L, 3L), (2L, 3L, 3L), (3L, 1L, 1L)).toDF("id", "x", "y")
    val r = Skyline.skyline2D(dup, "id", "x", "y")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(r === List((1L, 3L, 3L), (2L, 3L, 3L)))
    // all x equal -> every point lands in bucket 0 (prefilter is a no-op)
    // and the exact residual alone must produce the answer
    val flat = Seq((1L, 7L, 1L), (2L, 7L, 5L), (3L, 7L, 5L), (4L, 7L, 2L))
      .toDF("id", "x", "y")
    val rf = Skyline.skyline2D(flat, "id", "x", "y")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(rf === List((2L, 7L, 5L), (3L, 7L, 5L)))
  }

  test("skyline2D agrees with a naive cross-join oracle on random data, any partitioning") {
    val n = 400
    val pts = (1 to n).map { i =>
      // deterministic pseudo-random spread
      (i.toLong, (i * 7919L) % 1000L, (i * 104729L) % 1000L)
    }.toDF("id", "x", "y")
    val naive = pts.as("p").join(pts.as("q"),
        col("q.x") >= col("p.x") && col("q.y") >= col("p.y") &&
          (col("q.x") > col("p.x") || col("q.y") > col("p.y")), "left_anti")
      .select("id").as[Long].collect().sorted.toList
    val fast = Skyline.skyline2D(pts.repartition(13), "id", "x", "y")
      .select("id").as[Long].collect().sorted.toList
    assert(fast === naive)
    assert(fast.nonEmpty && fast.length < n)
  }
}
