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

  test("polygonIntersectsBinned equals the naive cross-join at several bin sizes") {
    import graft.functions.Geom
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    def tri(x: Double, y: Double, s: Double): Array[Byte] = Geom.writeWkb(
      gf.createPolygon(Array(
        new org.locationtech.jts.geom.Coordinate(x, y),
        new org.locationtech.jts.geom.Coordinate(x + s, y),
        new org.locationtech.jts.geom.Coordinate(x, y + s),
        new org.locationtech.jts.geom.Coordinate(x, y))))
    // deterministic mix: rectangles of varied extent (some span many bins,
    // some sub-bin), plus triangles whose ENVELOPES overlap a rect but
    // whose shapes may not — exercising the exact-residual filter
    val leftRows = (0 until 25).map { i =>
      val x = (i * 131) % 17 - 8.0; val y = (i * 173) % 13 - 6.0
      (i.toLong, Geom.rectWkb(x, y, x + 0.3 + (i % 5), y + 0.2 + (i % 4)))
    }
    val rightRows = (0 until 25).map { j =>
      val x = (j * 97) % 19 - 9.0; val y = (j * 61) % 11 - 5.0
      if (j % 2 == 0) (j.toLong, tri(x, y, 1.0 + (j % 7)))
      else (j.toLong, Geom.rectWkb(x, y, x + 0.4 + (j % 6), y + 0.5 + (j % 3)))
    }
    val left = leftRows.toDF("a_id", "a_geom")
    val right = rightRows.toDF("b_id", "b_geom")
    val naive = left.crossJoin(right)
      .filter(Geom.stIntersects(col("a_geom"), col("b_geom")))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty, "fixture must actually produce matches")
    for (bin <- Seq(0.7, 1.0, 4.0)) {
      val pairs = SpatialJoin
        .polygonIntersectsBinned(left, right, "a_geom", "b_geom", bin)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      // report-once: no distinct in the operator, so duplicates would
      // surface here as a multiset larger than its set
      assert(pairs.length === pairs.toSet.size, s"duplicate pairs at bin=$bin")
      assert(pairs.toSet === naive, s"mismatch at bin=$bin")
    }
    // plan: candidates meet in an equi-join, never a cartesian
    val plan = SpatialJoin
      .polygonIntersectsBinned(left, right, "a_geom", "b_geom", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
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

  test("nearestNeighborBinned: naive-oracle agreement, ties, radius cut, equi-join plan") {
    import spark.implicits._
    val qs = (1L to 200L).map(i => (i, (i * 37) % 100, (i * 53) % 100))
      .toDF("id", "px", "py")
    val rs = (1L to 20L).map(j => (j, (j * 31) % 100, (j * 17) % 100))
      .toDF("rid", "qx", "qy")
    val fast = SpatialJoin.nearestNeighborBinned(qs.repartition(7), rs, radius = 12L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // naive oracle: min (d2, rid) per query among refs within radius
    val rlist = (1L to 20L).map(j => (j, (j * 31) % 100, (j * 17) % 100))
    val naive = (1L to 200L).flatMap { i =>
      val (px, py) = ((i * 37) % 100, (i * 53) % 100)
      val within = rlist.map { case (rid, qx, qy) =>
        (rid, (px - qx) * (px - qx) + (py - qy) * (py - qy)) }
        .filter(_._2 <= 144)
      if (within.isEmpty) None
      else {
        val (rid, d2) = within.minBy { case (rid, d2) => (d2, rid) }
        Some((i, px, py, rid, d2))
      }
    }.toList
    assert(fast === naive)
    assert(fast.nonEmpty && fast.size < 200, "radius must cut some queries")
    // ties break toward the smaller rid: two refs equidistant from (0,0)
    val tq = Seq((1L, 0L, 0L)).toDF("id", "px", "py")
    val tr = Seq((9L, 3L, 0L), (4L, 0L, 3L), (7L, -3L, 0L)).toDF("rid", "qx", "qy")
    val t = SpatialJoin.nearestNeighborBinned(tq, tr, radius = 5L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(t === ((1L, 0L, 0L, 4L, 9L)))
    // scale shape: cell equi-join, never a distance cross-join
    val plan = SpatialJoin.nearestNeighborBinned(qs, rs, radius = 12L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"must stay an equi-join:\n$plan")
  }

  test("nearestNeighborTiered: row-identical to the single-tier join") {
    import spark.implicits._
    // dense refs (most queries resolve in the fine pass) PLUS a sparse
    // far corner (exercises the residue path) and an empty region
    // (queries with no ref in radius stay absent)
    val qs = ((1L to 300L).map(i => (i, (i * 37) % 100, (i * 53) % 100)) ++
      Seq((900L, 400L, 400L), (901L, 410L, 405L), (902L, 600L, 600L)))
      .toDF("id", "px", "py")
    val rs = ((1L to 40L).map(j => (j, (j * 31) % 100, (j * 17) % 100)) ++
      Seq((800L, 402L, 401L))).toDF("rid", "qx", "qy")
    for (r <- Seq(3L, 8L, 12L)) {
      val one = SpatialJoin.nearestNeighborBinned(qs, rs, radius = r)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      val two = SpatialJoin.nearestNeighborTiered(qs.repartition(5), rs, radius = r)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      assert(two === one, s"tiered must equal single-tier at radius=$r")
    }
    // tie on the fine boundary: winner exactly at d = fine must resolve
    // in pass 1 AND still see an equidistant competitor from pass-1's
    // own neighborhood (both within fine) — smaller rid wins
    val tq = Seq((1L, 0L, 0L)).toDF("id", "px", "py")
    val tr = Seq((9L, 2L, 0L), (4L, 0L, 2L)).toDF("rid", "qx", "qy")
    val t = SpatialJoin.nearestNeighborTiered(tq, tr, radius = 8L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(t === ((1L, 0L, 0L, 4L, 4L)))
  }
}
