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
}
