package graft

import graft.operators.Contiguity

/** Connected-component labeling invariants (O-16 exact half): 4-connectivity
  * only (no diagonals), run compression correctness, and convergence of the
  * large-star/small-star iteration on shapes that defeat naive propagation.
  */
class ContiguitySpec extends SparkSpec {
  import spark.implicits._

  private def label(cells: Seq[(String, Int, Int)]): Map[(String, Int, Int), Long] =
    Contiguity.labelCells(cells.toDF("g", "r", "c"), Seq("g"), "r", "c")
      .collect()
      .map(row => ((row.getString(0), row.getInt(1), row.getInt(2)), row.getLong(3)))
      .toMap

  private def componentsOf(lbl: Map[(String, Int, Int), Long]): Set[Set[(String, Int, Int)]] =
    lbl.groupBy(_._2).values.map(_.keySet).toSet

  test("rowRuns compresses consecutive cells and splits on gaps") {
    val runs = Contiguity.rowRuns(
      Seq(("g", 0, 1), ("g", 0, 2), ("g", 0, 3), ("g", 0, 7), ("g", 1, 0))
        .toDF("g", "r", "c"), Seq("g"), "r", "c")
      .select("r", "col_start", "col_end").as[(Int, Int, Int)].collect().sorted
    assert(runs.toSeq === Seq((0, 1, 3), (0, 7, 7), (1, 0, 0)))
  }

  test("diagonal cells are NOT connected (4-connectivity)") {
    val lbl = label(Seq(("g", 0, 0), ("g", 1, 1)))
    assert(lbl(("g", 0, 0)) !== lbl(("g", 1, 1)))
  }

  test("L-shape and isolated cell label correctly") {
    val L = Seq(("g", 0, 0), ("g", 1, 0), ("g", 2, 0), ("g", 2, 1), ("g", 2, 2))
    val iso = Seq(("g", 0, 5))
    val comps = componentsOf(label(L ++ iso))
    assert(comps === Set(L.toSet, iso.toSet))
  }

  test("serpentine connects into one component (multi-round convergence)") {
    // a 13-row boustrophedon: full rows alternate with single connector
    // cells at alternating ends, so the component spans ~20 runs end to
    // end — naive propagation needs O(runs) rounds, the star iteration
    // converges logarithmically
    val cells = scala.collection.mutable.Set[(Int, Int)]()
    (0 to 12 by 2).foreach(r => (0 to 6).foreach(c => cells += ((r, c))))
    (1 to 11 by 2).foreach(r => cells += ((r, if (r % 4 == 1) 6 else 0)))
    val lbl = label(cells.toSeq.map { case (r, c) => ("g", r, c) })
    assert(componentsOf(lbl).size === 1)
  }

  test("durable LAZY checkpoints (dir configured) label identically") {
    // exercises Checkpoints.truncate(eager = false) -> df.checkpoint(false):
    // the per-round sig() action must still materialize each round exactly
    // once under reliable checkpointing
    val L = Seq(("g", 0, 0), ("g", 1, 0), ("g", 2, 0), ("g", 2, 1), ("g", 0, 5))
    val plain = label(L)
    val durable = SparkSpec.withCheckpointDir(_ => label(L))
    assert(durable === plain)
  }

  test("groups are independent: same coordinates, different keys") {
    val lbl = Contiguity.labelCells(
      Seq(("a", 0, 0), ("a", 0, 1), ("b", 0, 0), ("b", 0, 1)).toDF("g", "r", "c"),
      Seq("g"), "r", "c")
      .select("g", "comp").as[(String, Long)].collect().toSet
    // both groups get their own component label 0 (top-left cell id)
    assert(lbl === Set(("a", 0L), ("b", 0L)))
  }

  test("JTS union geometry count cross-validates star-contraction components") {
    // two INDEPENDENT implementations of region semantics must agree:
    // the JTS union of cell rectangles yields one (Multi)Polygon component
    // per 4-connected region (corner-touching squares stay separate
    // polygons in a valid union — diagonal adjacency splits both ways),
    // and Contiguity labels the same regions by graph contraction.
    val rnd = new scala.util.Random(42)
    val randomCells = Seq.fill(90)((rnd.nextInt(12), rnd.nextInt(12))).distinct
    val trickyCells = Seq((20, 20), (21, 21), (22, 20)) // diagonal chain: 3 regions
    val cells = (randomCells ++ trickyCells).map { case (r, c) => ("g", r, c) }
    val nCc = componentsOf(label(cells)).size
    val geo = graft.operators.Raster.dissolveGeo(
      cells.toDF("g", "r", "c"), keys = Seq("g"), rowCol = "r", colCol = "c",
      xll = 0.0, yll = 0.0, cellsize = 0.5, nrows = 32)
    val nGeoms = geo.select("geometry").collect()
      .map(r => graft.functions.Geom.numGeometries(r.getAs[Array[Byte]](0))).sum
    assert(nGeoms === nCc)
  }

  test("local union-find path and star-contraction path label identically") {
    // the size-adaptive small-graph path (single-task union-find, r16) must
    // produce byte-identical (keys, node, comp) labels to the distributed
    // star fixpoint — compare both on the serpentine that needs multi-round
    // star convergence, plus isolated nodes and two key groups
    val cells = scala.collection.mutable.ListBuffer[(String, Int, Int)]()
    (0 to 12 by 2).foreach(r => (0 to 6).foreach(c => cells += (("g", r, c))))
    (1 to 11 by 2).foreach(r => cells += (("g", r, if (r % 4 == 1) 6 else 0)))
    cells += (("g", 40, 40)); cells += (("h", 0, 0)); cells += (("h", 0, 1))
    val runs = Contiguity.rowRuns(cells.toSeq.toDF("g", "r", "c"), Seq("g"), "r", "c")
    val edges = Contiguity.runEdges(runs, Seq("g"), "r")
    def labels(cutoff: Long) =
      Contiguity.connectedComponents(edges, runs, Seq("g"), localCutoff = cutoff)
        .select("g", "node", "comp").as[(String, Long, Long)].collect().toSet
    assert(labels(Long.MaxValue) === labels(0L)) // local vs star, same rows
  }

  test("two parallel bars joined by a bridge merge into one component") {
    val bars = (0 to 5).flatMap(c => Seq(("g", 0, c), ("g", 2, c)))
    val bridge = Seq(("g", 1, 3))
    val comps = componentsOf(label(bars ++ bridge))
    assert(comps.size === 1)
    val without = componentsOf(label(bars))
    assert(without.size === 2)
  }
}
