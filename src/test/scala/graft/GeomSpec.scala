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

  test("geodesic area: 1°x1° equator cell == exact spherical band area; holes subtract") {
    // exact band area R²·delta_lam·(sin p2 − sin p1) on the authalic sphere
    val R = 6371007.1809
    val exact = R * R * StrictMath.toRadians(1.0) *
      (StrictMath.sin(StrictMath.toRadians(1.0)) - 0.0)
    val cell = Geom.readWkb(Geom.rectWkb(0.0, 0.0, 1.0, 1.0))
    assert(math.abs(Geom.geodesicAreaM2(cell) - exact) / exact < 1e-12)
    // ~12,364 km² sanity (a 1°×1° cell at the equator)
    assert(math.abs(Geom.geodesicAreaM2(cell) / 1e6 - 12364.0) < 5.0)
    // polygon with a hole: outer 2°×2° minus inner 1°×1°
    val outer = Geom.readWkb(Geom.rectWkb(0.0, 0.0, 2.0, 2.0))
    val inner = Geom.readWkb(Geom.rectWkb(0.5, 0.5, 1.5, 1.5))
    val withHole = outer.difference(inner)
    val expected = Geom.geodesicAreaM2(outer) - Geom.geodesicAreaM2(inner)
    assert(math.abs(Geom.geodesicAreaM2(withHole) - expected) / expected < 1e-9)
  }

  test("geodesic area shrinks with latitude (cos-factor sanity)") {
    val eq = Geom.geodesicAreaM2(Geom.readWkb(Geom.rectWkb(0, 0, 1, 1)))
    val mid = Geom.geodesicAreaM2(Geom.readWkb(Geom.rectWkb(0, 45, 1, 46)))
    val hi = Geom.geodesicAreaM2(Geom.readWkb(Geom.rectWkb(0, 80, 1, 81)))
    assert(eq > mid && mid > hi)
    // at 45° the cell is ~cos(45.5°) of the equator cell
    assert(math.abs(mid / eq - StrictMath.cos(StrictMath.toRadians(45.5))) < 0.01)
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
