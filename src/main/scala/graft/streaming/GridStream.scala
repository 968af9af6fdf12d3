package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the reference's batch raster pipeline: grids arrive
  * continuously (the reference polls and re-runs, species_range_etl.py
  * skip-if-exists O-19; here new cells stream in) and per-
  * (species, threshold) range statistics update incrementally.
  *
  * Shape: threshold explode is the same broadcast cross join as the batch
  * operator — stateless, so it composes with streaming for free; the
  * running aggregation is a streaming stateful agg keyed by
  * (species, threshold). State is one row per key (the dissolve keys are
  * low-cardinality), NOT per cell — a stream of 10^12 cells carries
  * state proportional to |species| × |thresholds|.
  *
  * Area here is the raster-relational form (cell count × cell area, the
  * same identity `q_geo_dissolve`'s oracle uses); the geometric union
  * stays a batch concern (streaming polygons would grow state per cell).
  */
object GridStream {

  /** cells: streaming DataFrame with (species, row, col, prob, cellsize).
    * Emits (species, threshold, n_cells, area) in update mode.
    */
  def runningRangeArea(cells: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val dim = broadcast(thresholds.toDF("threshold"))
    cells
      .crossJoin(dim)
      .filter(col("prob") >= col("threshold"))
      .groupBy(col("species"), col("threshold"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("cellsize") * col("cellsize")).as("area"))
  }
}
