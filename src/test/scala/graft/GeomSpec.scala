package graft

import graft.functions.Geom

/** JTS geometry layer: cell rectangles, union aggregate invariants
  * (species_range_etl.py:127,205,227 semantics).
  */
class GeomSpec extends SparkSpec {

  test("cell rect area is cellsize² at binary-exact sizes") {
    val wkb = Geom.cellRectWkb(0, 0, 0.0, 0.0, 0.25, 32)
    assert(Geom.area(wkb) === 0.0625)
  }

  test("union of k distinct cells has area exactly k * cellsize²") {
    val cells = Seq((0, 0), (0, 1), (1, 0), (5, 5), (7, 2))
    val wkbs = cells.map { case (r, c) => Geom.cellRectWkb(r, c, 0.0, 0.0, 0.25, 32) }
    val u = Geom.UnionAgg.finish(wkbs.toVector)
    assert(Geom.area(u) === 5 * 0.0625)
  }

  test("union counts disjoint components") {
    // 3-cell L block + 1 far cell -> 2 components (FIXTURES.md A2 shape)
    val wkbs = Seq((0, 2), (0, 3), (1, 2), (2, 0))
      .map { case (r, c) => Geom.cellRectWkb(r, c, -80.0, 35.0, 0.5, 3) }
    val u = Geom.UnionAgg.finish(wkbs.toVector)
    assert(Geom.numGeometries(u) === 2)
    assert(Geom.area(u) === 4 * 0.25)
  }

  test("union aggregator merge is associative/commutative (area-level)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val cells = Vector.fill(12)((rnd.nextInt(8), rnd.nextInt(8)))
      val split = 1 + rnd.nextInt(11)
      val wkbs = cells.map { case (r, c) => Geom.cellRectWkb(r, c, 0.0, 0.0, 0.5, 8) }
      val (l, r) = wkbs.splitAt(split)
      val viaMerge = Geom.UnionAgg.finish(Geom.UnionAgg.merge(
        l.foldLeft(Geom.UnionAgg.zero)(Geom.UnionAgg.reduce),
        r.foldLeft(Geom.UnionAgg.zero)(Geom.UnionAgg.reduce)))
      val viaMergeSwapped = Geom.UnionAgg.finish(Geom.UnionAgg.merge(
        r.foldLeft(Geom.UnionAgg.zero)(Geom.UnionAgg.reduce),
        l.foldLeft(Geom.UnionAgg.zero)(Geom.UnionAgg.reduce)))
      val direct = Geom.UnionAgg.finish(wkbs)
      assert(Geom.area(viaMerge) === Geom.area(direct))
      assert(Geom.area(viaMergeSwapped) === Geom.area(direct))
      // union is idempotent: area(union) == area(distinct cells)
      assert(Geom.area(direct) === cells.distinct.size * 0.25)
    }
  }

  test("buffer compaction keeps partial buffers bounded") {
    val many = (0 until 300).map(i => Geom.cellRectWkb(i % 17, i / 17, 0.0, 0.0, 0.5, 32))
    val buf = many.foldLeft(Geom.UnionAgg.zero)(Geom.UnionAgg.reduce)
    assert(buf.length < 70) // compacts every 64
    assert(Geom.area(Geom.UnionAgg.finish(buf)) === 300 * 0.25) // 300 distinct cells
  }
}
