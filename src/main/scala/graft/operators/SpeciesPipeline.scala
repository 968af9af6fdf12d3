package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geom
import graft.sources.EsriAsciiGrid

/** The reference pipeline end-to-end (species_range_etl.py EP-2 + EP-3),
  * composed from the engine's operators into ONE declarative plan:
  *
  *   .asc grids ──readCells──▶ cell table
  *     ──threshold ×3 (broadcast dim, one scan)──▶ thresholded cells
  *     ──cell-rect polygonize + union agg (dissolve)──▶ per-key geometry
  *     ──area + enrichment + surrogate key──▶ `speciesdata`
  *
  * vs the reference's 5 materialized file formats (.txt/.asc/.tif/
  * thresholded .tif/.shp — species_range_etl.py:59-135) and driver-side
  * concat (:219-223): here nothing materializes between stages, the only
  * wide exchange is the dissolve shuffle — surrogate keys default to
  * distributed `monotonically_increasing_id` (the contiguous global
  * ordering is an opt-in for oracle runs, see `stampSid`).
  *
  * Output schema = FIXTURES.md A4 / species_range_etl.py:199-236:
  * (sid, species, geometry WKB, species_id, threshold, source, scenario,
  * year, area planar-deg²).
  */
object SpeciesPipeline {

  /** Build `speciesdata` from a directory of `{species}.asc` grids.
    *
    * `current`-branch metadata defaults apply (species_range_etl.py:191-194):
    * source=vtech, scenario=current, year=2020 — the full filename-token
    * branch is exercised by Raster.parseRasterFilename when shapefile-style
    * names are in play (q_meta_extract).
    */
  def speciesData(spark: SparkSession, gridGlob: String,
                  thresholds: Seq[Double] = Seq(0.25, 0.5, 0.75),
                  globalSidOrder: Boolean = false): DataFrame = {
    val cells = EsriAsciiGrid.readCells(spark, gridGlob)
      .withColumn("species", regexp_extract(col("path"), "([A-Za-z0-9_-]+)\\.[A-Za-z]+$", 1))
    val thresholded = Raster
      .thresholdExplode(cells, "prob", thresholds)
      // reference encodes thresholds as "25"/"50"/"75" strings (etl.py:189-190)
      .withColumn("threshold", (col("threshold") * 100).cast("int").cast("string"))
    val dissolved = thresholded
      .withColumn("cell_geom", Geom.stCellRectFrom(col("row"), col("col"),
        col("xll"), col("yll"), col("cellsize"), col("nrows")))
      .groupBy(col("species"), col("threshold"))
      .agg(Geom.stUnionAgg(col("cell_geom")).as("geometry"))
      .withColumn("area", Geom.stArea(col("geometry")))   // planar deg², etl.py:227
    // arcpy Id analog (etl.py:210): rank over the DISTINCT species dim —
    // the window sort runs over #species rows (a dimension, not the fact
    // table) and joins back broadcast, so no fact-table row ever funnels
    // through a single-task global window
    val speciesDim = dissolved.select(col("species")).distinct()
      .withColumn("species_id", dense_rank().over(Window.orderBy(col("species"))))
    dissolved
      .join(broadcast(speciesDim), Seq("species"))
      .withColumn("source", lit("vtech"))
      .withColumn("scenario", lit("current"))
      .withColumn("year", lit("2020"))
      // O-12: CRS as a queryable column, not just prose — the reference
      // stamps EPSG:4326 on every layer (species_range_etl.py:131-135)
      .withColumn("srid", lit(4326))
      .transform(stampSid(globalSidOrder, Seq(col("species"), col("threshold"))))
      .select("sid", "species", "geometry", "species_id", "threshold",
        "source", "scenario", "year", "srid", "area")
  }

  /** Surrogate key, mirroring `Raster.enrich`'s two modes: the default is
    * `monotonically_increasing_id()` (unique BIGINT, zero exchange — the
    * only formulation that survives 100 TB); `globalSidOrder = true` opts
    * in to a contiguous `row_number` over a total order, which funnels
    * every row through ONE task and exists strictly for bounded
    * oracle-comparability runs.
    */
  private def stampSid(global: Boolean,
                       order: Seq[org.apache.spark.sql.Column])(df: DataFrame): DataFrame =
    if (global) df.withColumn("sid", row_number().over(Window.orderBy(order: _*)).cast("long"))
    else df.withColumn("sid", monotonically_increasing_id())

  /** Exact-contiguity variant (r4): reproduces arcpy RasterToPolygon's
    * REGION semantics (species_range_etl.py:127) — each 4-connected cell
    * region becomes its own row with its own `species_id` (arcpy's
    * per-file gridcode), instead of one dissolved row per
    * (species, threshold). Region labeling is the distributed
    * large-star/small-star pass in [[Contiguity]]; everything else is the
    * same declarative dissolve, now keyed by (species, threshold, region).
    */
  def speciesDataExact(spark: SparkSession, gridGlob: String,
                       thresholds: Seq[Double] = Seq(0.25, 0.5, 0.75),
                       globalSidOrder: Boolean = false): DataFrame = {
    val cells = EsriAsciiGrid.readCells(spark, gridGlob)
      .withColumn("species", regexp_extract(col("path"), "([A-Za-z0-9_-]+)\\.[A-Za-z]+$", 1))
    val thresholded = Raster
      .thresholdExplode(cells, "prob", thresholds)
      .withColumn("threshold", (col("threshold") * 100).cast("int").cast("string"))
    val labeled = Contiguity.labelCells(thresholded, Seq("species", "threshold"), "row", "col")
    val dissolved = thresholded
      .join(labeled, Seq("species", "threshold", "row", "col"))
      .withColumn("cell_geom", Geom.stCellRectFrom(col("row"), col("col"),
        col("xll"), col("yll"), col("cellsize"), col("nrows")))
      .groupBy(col("species"), col("threshold"), col("comp"))
      .agg(Geom.stUnionAgg(col("cell_geom")).as("geometry"))
      .withColumn("area", Geom.stArea(col("geometry")))
    dissolved
      // arcpy Id / gridcode: region number within each species×threshold
      // output file (species_range_etl.py:210) — PARTITIONED window, so it
      // distributes across (species, threshold) groups and is safe at scale
      .withColumn("species_id", dense_rank().over(
        Window.partitionBy(col("species"), col("threshold")).orderBy(col("comp"))))
      .withColumn("source", lit("vtech"))
      .withColumn("scenario", lit("current"))
      .withColumn("year", lit("2020"))
      .withColumn("srid", lit(4326))
      .transform(stampSid(globalSidOrder,
        Seq(col("species"), col("threshold"), col("species_id"))))
      .select("sid", "species", "geometry", "species_id", "threshold",
        "source", "scenario", "year", "srid", "area")
  }
}
