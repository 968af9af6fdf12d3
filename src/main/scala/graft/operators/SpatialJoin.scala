package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-binned spatial join — the scalable formulation of
  * point-in-polygon/bbox matching (the same bin-to-equi-join trick as
  * [[Temporal.rangeJoinBinned]], lifted to two dimensions; PostGIS/Sedona
  * call it a grid/tile partitioned join).
  *
  * The naive inequality join (`x0 <= x AND x <= x1 AND ...`) can only
  * plan as a nested-loop/cartesian — quadratic at 100 TB. Instead every
  * box explodes to the grid bins it covers (O(area/bin²) per box, O(1)
  * when `binSize` is near the box size), every point maps to exactly one
  * bin, and the join is an EQUI-join on (bin_x, bin_y) with the exact
  * containment test as a cheap residual filter. Bin size trades box
  * fan-out against bin population, like the 1-D range join's bin width.
  */
object SpatialJoin {

  /** Polygon × polygon INTERSECTS join, grid-binned — the reference's
    * product is polygon layers (species_range_etl.py:199-205: per-species
    * dissolved ranges later overlaid with zone/boundary layers in
    * PostGIS), and the naive formulation is a cartesian with a JTS test
    * per pair. Here each side explodes to the grid cells its ENVELOPE
    * covers (O(area/bin²) per geometry, O(1) when binSize is near the
    * typical extent), candidates meet in an equi-join on (bin_x, bin_y),
    * and the exact JTS `intersects` runs only on candidates.
    *
    * Duplicate suppression is REPORT-ONCE, not distinct: a pair whose
    * envelopes share k cells would surface k times, so only the
    * TOP-LEFT cell of the envelope OVERLAP — (max of the two min-corner
    * bins), a cell both sides are guaranteed to have generated — emits
    * the pair. That removes the post-join `distinct()` exchange that
    * would otherwise shuffle every candidate pair a second time.
    *
    * Both inputs keep all their columns (caller guarantees disjoint
    * names); geometry columns hold WKB. Null/empty geometries drop out
    * (null envelope → no cells).
    */
  def polygonIntersectsBinned(left: DataFrame, right: DataFrame,
                              leftGeom: String, rightGeom: String,
                              binSize: Double): DataFrame = {
    import graft.functions.Geom
    def cover(df: DataFrame, geomCol: String, env: String) =
      df.withColumn(env, Geom.stEnvBounds(col(geomCol)))
        .withColumn("_bx", explode(sequence(
          floor(col(s"$env._1") / binSize).cast("long"),
          floor(col(s"$env._3") / binSize).cast("long"))))
        .withColumn("_by", explode(sequence(
          floor(col(s"$env._2") / binSize).cast("long"),
          floor(col(s"$env._4") / binSize).cast("long"))))
    val a = cover(left, leftGeom, "_env_a")
    val b = cover(right, rightGeom, "_env_b")
    a.join(b, Seq("_bx", "_by"))
      .filter(
        col("_bx") === greatest(
          floor(col("_env_a._1") / binSize),
          floor(col("_env_b._1") / binSize)).cast("long") &&
        col("_by") === greatest(
          floor(col("_env_a._2") / binSize),
          floor(col("_env_b._2") / binSize)).cast("long"))
      .filter(Geom.stIntersects(col(leftGeom), col(rightGeom)))
      .drop("_bx", "_by", "_env_a", "_env_b")
  }

  /** points: (px, py, ...) integer-ish coordinates; boxes: (x0, y0, x1,
    * y1, ...) with x0 <= x1, y0 <= y1 (inclusive bounds). Returns the
    * matched pairs (all point and box columns).
    */
  def pointInBoxBinned(points: DataFrame, boxes: DataFrame,
                       binSize: Long): DataFrame = {
    val binnedBoxes = boxes
      .withColumn("_bx", explode(sequence(
        floor(col("x0") / binSize).cast("long"),
        floor(col("x1") / binSize).cast("long"))))
      .withColumn("_by", explode(sequence(
        floor(col("y0") / binSize).cast("long"),
        floor(col("y1") / binSize).cast("long"))))
    points
      .withColumn("_bx", floor(col("px") / binSize).cast("long"))
      .withColumn("_by", floor(col("py") / binSize).cast("long"))
      .join(binnedBoxes, Seq("_bx", "_by"))
      .filter(col("px") >= col("x0") && col("px") <= col("x1") &&
        col("py") >= col("y0") && col("py") <= col("y1"))
      .drop("_bx", "_by")
  }

  /** Radius-bounded nearest-neighbor join — for each query point the
    * closest reference point within `radius` ("nearest store/station/
    * POI"): the spatial primitive the intersection joins above can't
    * express. Same binned discipline: with cell size = radius, every
    * reference within `radius` of a query lies in the query cell's 3×3
    * NEIGHBORHOOD, so the probe side explodes ×9 into a cell EQUI-join
    * (never a distance cross-join), the exact residual compares the
    * exact-integer squared distance (coords are integer-valued — the
    * quantize-first contract), and the per-query argmin is a map-side-
    * foldable struct-min with (d², rid) ordering — ties break toward the
    * smaller reference id, deterministically. Queries with no reference
    * in radius are absent from the output (the radius IS the contract;
    * an unbounded nearest would degenerate to all-pairs).
    *
    * Scale: probe ×9 explode → cell equi-join (candidate volume = ring
    * populations) → one query-keyed min agg. No window, no cartesian.
    */
  def nearestNeighborBinned(queries: DataFrame, refs: DataFrame,
                            radius: Long): DataFrame = {
    require(radius > 0)
    val (dq, dr) = dedupByCoord(queries, refs)
    joinBack(queries, coordNN(dq, dr, cell = radius, bound = radius))
  }

  /** Coordinate dedup — the reduction that makes densification on a FIXED
    * integer lattice scale-free (the r14 sf10 probe: 100x rows on the
    * same 360x180 domain packed ~15 refs and ~900 queries per lattice
    * point, and the candidate join exploded to ~3x10^10 rows, spilling
    * 78 GiB of disk):
    *  - refs collapse to one row per (qx, qy) keeping min(rid) — for
    *    co-located refs d2 is identical, and the (d2, rid) argmin
    *    tie-break means only the smallest rid can ever win;
    *  - queries collapse to DISTINCT coordinates: the answer is a pure
    *    function of (px, py), so NN runs once per coordinate and joins
    *    back per (id, px, py).
    * On real data with mostly-unique coordinates both reductions are
    * near-no-ops (one exchange each); on quantized/clustered data they
    * bound the join by LATTICE population, not row multiplicity.
    */
  private def dedupByCoord(queries: DataFrame, refs: DataFrame)
      : (DataFrame, DataFrame) = (
    queries.select(col("px"), col("py")).distinct(),
    refs.groupBy(col("qx"), col("qy")).agg(min(col("rid")).as("rid")))

  /** One output row per distinct (id, px, py) input row — identical to
    * the historical groupBy(id, px, py) argmin contract. */
  private def joinBack(queries: DataFrame, perCoord: DataFrame): DataFrame =
    queries.select(col("id"), col("px"), col("py")).distinct()
      .join(perCoord, Seq("px", "py"))
      .select(col("id"), col("px"), col("py"), col("rid"), col("d2"))

  /** Per-coordinate NN core: 3x3 ring equi-join at `cell`, winners kept
    * only when d2 <= bound^2 (Chebyshev: the ring at `cell` contains
    * every ref within Euclidean `cell`, so a winner within `bound` <=
    * `cell` is the global argmin). Inputs must be coordinate-deduped.
    */
  private def coordNN(dq: DataFrame, dr: DataFrame,
                      cell: Long, bound: Long): DataFrame = {
    val cellQ = dq
      .withColumn("_dx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("_dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("_bx", floor(col("px") / cell).cast("long") + col("_dx"))
      .withColumn("_by", floor(col("py") / cell).cast("long") + col("_dy"))
      .drop("_dx", "_dy")
    val cellR = dr
      .withColumn("_bx", floor(col("qx") / cell).cast("long"))
      .withColumn("_by", floor(col("qy") / cell).cast("long"))
    val d2 = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    cellQ.join(cellR, Seq("_bx", "_by"))
      .filter(d2 <= lit(bound * bound))
      .select(col("px"), col("py"),
        struct(d2.cast("long").as("d2"), col("rid"),
          col("qx"), col("qy")).as("_c"))
      .groupBy(col("px"), col("py"))
      .agg(min(col("_c")).as("_m"))
      .select(col("px"), col("py"), col("_m.rid").as("rid"),
        col("_m.d2").as("d2"))
  }

  /** Density-robust exact variant of [[nearestNeighborBinned]]. The
    * single-tier join's candidate volume is `n_q × n_r × (3·radius)²/A`
    * — quadratic in point density on a FIXED coordinate domain, which
    * is exactly how the r14 sf1 probe caught it (55.8× wall at 10×
    * rows: both sides densified, so ring populations grew 10× per
    * query). Two exact tiers fix the shape:
    *
    *  1. a FINE pass at cell `fine = max(1, radius/4)`: the 3×3 fine
    *     neighborhood contains every ref within distance `fine` of the
    *     query (Euclidean ≤ fine ⇒ Chebyshev ≤ fine ⇒ inside), so a
    *     fine-pass winner with `d² ≤ fine²` is the GLOBAL argmin — any
    *     closer-or-tied ref is also within `fine` and was a fine
    *     candidate, and the (d², rid) struct-min tie-break sees it.
    *     Candidate volume shrinks ×(radius/fine)² vs the full ring.
    *  2. only UNRESOLVED queries (no fine candidate, or winner beyond
    *     `fine`) pay the full-radius ring join. The denser the refs,
    *     the fewer survive tier 1 — the residue count is
    *     `n_q · exp(-π·fine²·density)`-ish, so total work now grows
    *     ~linearly where the single tier grew quadratically.
    *
    * Output is row-identical to the single-tier operator (proof above);
    * SpatialJoinSpec asserts the equality. `radius < 4` degenerates to
    * fine = 1; radius = 1 falls back to the single-tier join outright.
    */
  def nearestNeighborTiered(queries: DataFrame, refs: DataFrame,
                            radius: Long): DataFrame = {
    require(radius > 0)
    val fine = math.max(1L, radius / 4)
    val (dq, dr) = dedupByCoord(queries, refs)
    if (fine >= radius) return joinBack(queries, coordNN(dq, dr, radius, radius))
    val firstPass = coordNN(dq, dr, cell = fine, bound = fine)
    val resolved = graft.util.Checkpoints.truncate(firstPass, eager = false)
    val residue = dq.join(resolved.select("px", "py"),
      Seq("px", "py"), "left_anti")
    joinBack(queries,
      resolved.unionByName(coordNN(residue, dr, cell = radius, bound = radius)))
  }
}
