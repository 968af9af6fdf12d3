package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Esri ASCII Grid raster source (reference: species_range_etl.py:59-92).
  *
  * The reference renames downloaded `.txt` grids to `.asc` and converts to
  * GeoTIFF only because arcpy requires TIFF input (species_range_etl.py:78).
  * Spark reads the ASCII text directly and flattens the dense grid into a
  * relational cell table — one row per cell with computed cell-center
  * lon/lat — so every downstream raster op (threshold, polygonize,
  * dissolve) becomes a stock DataFrame operator.
  *
  * Scale design: one grid file = one task (wholetext read); the flatMap
  * parser streams cells without materializing the full grid, NODATA and
  * unparseable files are counted in accumulators rather than failing the
  * job (reference tolerates corrupt inputs, species_range_etl.py:170-171).
  */
object EsriAsciiGrid {

  /** Header of an Esri ASCII grid (.asc). xll/yll = lower-left corner. */
  final case class GridHeader(
      ncols: Int, nrows: Int,
      xllcorner: Double, yllcorner: Double,
      cellsize: Double, nodata: Option[Double])

  /** One raster cell. `row` 0 = northernmost line (file order), matching
    * the raster convention the reference inherits from GDAL. `prob` is
    * None for NODATA cells (FIXTURES.md A2 requires NODATA -> null).
    */
  final case class RasterCell(
      row: Int, col: Int, lon: Double, lat: Double, prob: Option[Double])

  /** Parse header + grid body. Header keys are case-insensitive and may
    * appear in any order; the body is `nrows × ncols` whitespace-separated
    * floats, and a raster row MAY wrap across physical lines (GDAL and
    * other writers wrap wide grids). The body is parsed EAGERLY and its
    * value count validated against the header, so malformed grids fail
    * HERE — inside the caller's corrupt-file guard — rather than later on
    * Spark's task iterator where the error would escape the guard and
    * fail the job (O-3/O-25: tolerate + account, never fail).
    */
  def parse(content: String): (GridHeader, Iterator[RasterCell]) = {
    val lines = content.linesIterator.filter(_.trim.nonEmpty).buffered
    var ncols, nrows = -1
    var xll, yll, cellsize = Double.NaN
    var nodata: Option[Double] = None
    val headerKey = "^([A-Za-z_]+)\\s+(-?[0-9.eE+-]+)\\s*$".r
    var reading = true
    while (reading && lines.hasNext) {
      lines.head.trim match {
        case headerKey(k, v) =>
          k.toLowerCase match {
            case "ncols"        => ncols = v.toDouble.toInt; lines.next()
            case "nrows"        => nrows = v.toDouble.toInt; lines.next()
            case "xllcorner"    => xll = v.toDouble; lines.next()
            case "yllcorner"    => yll = v.toDouble; lines.next()
            case "cellsize"     => cellsize = v.toDouble; lines.next()
            case "nodata_value" => nodata = Some(v.toDouble); lines.next()
            case _              => reading = false // first body line
          }
        case _ => reading = false
      }
    }
    require(ncols > 0 && nrows > 0 && !cellsize.isNaN && !xll.isNaN && !yll.isNaN,
      s"invalid Esri ASCII grid header (ncols=$ncols nrows=$nrows cellsize=$cellsize)")
    val header = GridHeader(ncols, nrows, xll, yll, cellsize, nodata)

    // flatten all body tokens (line boundaries carry no meaning once the
    // header fixes the shape), parse eagerly, validate the count
    val vals = lines.flatMap(_.trim.split("\\s+").iterator.filter(_.nonEmpty))
      .map(_.toDouble).toArray
    require(vals.length == nrows * ncols,
      s"grid body has ${vals.length} values, header says ${nrows}x$ncols")
    val cells = Iterator.tabulate(vals.length) { i =>
      val r = i / ncols
      val c = i % ncols
      val v = vals(i)
      val prob = if (nodata.contains(v)) None else Some(v)
      // cell CENTERS; row 0 is the top (northernmost) line
      val lon = xll + (c + 0.5) * cellsize
      val lat = yll + (nrows - 1 - r + 0.5) * cellsize
      RasterCell(r, c, lon, lat, prob)
    }
    (header, cells)
  }

  /** Read a directory/glob of `.asc`/`.txt` grids into a cell DataFrame:
    * (path, row, col, lon, lat, cellsize, xll, yll, nrows, prob) — the
    * header fields travel per row so downstream polygonization can compute
    * cell CORNERS from the grid origin (bit-identical shared edges between
    * neighbours for any origin) and works across grids with different
    * resolutions. Corrupt files — bad header, unparseable values, value
    * count not matching the header — are skipped and counted (O-3/O-25
    * semantics: tolerate + account, never fail).
    */
  def readCells(spark: SparkSession, pathGlob: String,
                corruptFiles: Option[LongAccumulator] = None): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("path"), $"value")
    raw.as[(String, String)].flatMap { case (path, content) =>
      try {
        val (h, cells) = parse(content)
        cells.map(c => (path, c.row, c.col, c.lon, c.lat,
          h.cellsize, h.xllcorner, h.yllcorner, h.nrows, c.prob))
      } catch {
        case _: Exception =>
          corruptFiles.foreach(_.add(1))
          Iterator.empty
      }
    }.toDF("path", "row", "col", "lon", "lat", "cellsize", "xll", "yll", "nrows", "prob")
  }

  /** O-3 complete — read grids DIRECTLY from zip archives
    * (species_range_etl.py:155-173): one task per archive via
    * `binaryFile`, members selected by extension, member paths normalized
    * by the same prefix-routing rule the reference applies on extraction
    * (member starts with the species name ⇒ top level, else nested under
    * the species — graft.operators.Raster.zipMemberRoute's Scala twin).
    * The extract-to-disk step disappears: members stream straight into
    * the grid parser. Corrupt ARCHIVES and corrupt MEMBERS are both
    * skipped and counted (BadZipFile tolerance, species_range_etl.py:170-171).
    *
    * Output schema matches [[readCells]] with `path` =
    * `archive.zip!normalized/member.asc`.
    */
  def readCellsFromZips(spark: SparkSession, zipGlob: String,
                        corruptInputs: Option[LongAccumulator] = None): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(zipGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (zipPath, bytes) => zipCells(zipPath, bytes, corruptInputs) }
      .toDF("path", "row", "col", "lon", "lat", "cellsize", "xll", "yll", "nrows", "prob")
  }

  private type CellRow =
    (String, Int, Int, Double, Double, Double, Double, Double, Int, Option[Double])

  /** LAZY walk of one archive's grid members: entries advance only as the
    * consumer drains the previous member's cells, so task memory holds ONE
    * parsed grid body at a time — an archive of many (or one huge) grids
    * never accumulates whole-archive cells the way a builder would.
    * Corrupt members are skipped+counted as they are REACHED; a corrupt
    * archive structure stops the walk, counts once, and keeps the members
    * already emitted (species_range_etl.py:170-171 tolerance).
    */
  private[graft] def zipCells(zipPath: String, bytes: Array[Byte],
                                corruptInputs: Option[LongAccumulator]): Iterator[CellRow] = {
    val species = zipPath.split('/').last.stripSuffix(".zip").split('_').head
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val perMember = new Iterator[Iterator[CellRow]] {
      private var pending: Iterator[CellRow] = null
      private var done = false
      private def advance(): Unit =
        while (pending == null && !done) {
          val entry =
            try zin.getNextEntry
            catch { case _: Exception => // bad archive structure
              corruptInputs.foreach(_.add(1)); done = true; null }
          if (entry == null) done = true
          else {
            val name = entry.getName
            if (!entry.isDirectory && (name.endsWith(".asc") || name.endsWith(".txt"))) {
              // the reference's extraction routing (species_range_etl.py:163-169)
              val routed = if (name.startsWith(species)) s"ascii/$name"
                           else s"ascii/$species/$name"
              try {
                val content = new String(zin.readAllBytes(),
                  java.nio.charset.StandardCharsets.UTF_8)
                val (h, cells) = parse(content)
                pending = cells.map(c => (s"$zipPath!$routed", c.row, c.col, c.lon,
                  c.lat, h.cellsize, h.xllcorner, h.yllcorner, h.nrows, c.prob))
              } catch {
                case _: Exception => corruptInputs.foreach(_.add(1)) // bad member
              }
            }
          }
        }
      def hasNext: Boolean = { advance(); pending != null }
      def next(): Iterator[CellRow] = {
        advance()
        if (pending == null) Iterator.empty.next()
        else { val r = pending; pending = null; r }
      }
    }
    perMember.flatten
  }
}
