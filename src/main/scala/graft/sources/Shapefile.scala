package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.{ByteBuffer, ByteOrder}
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import graft.functions.Geom

/** One row per .shp record; geometry re-encoded as WKB (the engine's
  * end-to-end geometry currency) — null for null shapes (type 0) and
  * unsupported types, mirroring the NODATA→null stance of EsriAsciiGrid.
  */
final case class ShpRecord(path: String, record: Int, shape_type: Int,
                           n_points: Int, geometry: Array[Byte])

/** O-5 — thin ESRI Shapefile reader (species_range_etl.py:199
  * `gpd.read_file`): the one reference capability with no engine
  * counterpart until round 4. Parses the public .shp main-file layout
  * (ESRI Shapefile Technical Description, July 1998): a 100-byte header
  * (file code 9994 big-endian at byte 0, file length in 16-bit words at
  * byte 24), then records of (8-byte big-endian record header, little-
  * endian shape content).
  *
  * Supported shape types: 0 (null), 1 (point), 3 (polyline), 5 (polygon)
  * — the types the reference pipeline's shapefiles contain (arcpy
  * RasterToPolygon emits type-5). Polygon ring semantics follow the spec:
  * clockwise rings are shells, counter-clockwise rings are holes; holes
  * attach to the shell containing their first vertex.
  *
  * Scale shape: one task per file via `binaryFile` (shapefiles are
  * standalone per species×scenario×threshold in the reference, so file
  * granularity IS the natural parallelism), parser is a narrow flatMap,
  * truncated/corrupt tails stop the parse of that file without failing
  * the job (records before the corruption are kept).
  */
object Shapefile {

  def readShapes(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => parse(p, b) }
      .toDF()
  }

  /** Pure parser (unit-testable without Spark). */
  def parse(path: String, bytes: Array[Byte]): Iterator[ShpRecord] = {
    if (bytes.length < 100) return Iterator.empty
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (be.getInt(0) != 9994) return Iterator.empty // not a shapefile
    val end = math.min(be.getInt(24).toLong * 2, bytes.length.toLong)
    val gf = new GeometryFactory()
    val out = Vector.newBuilder[ShpRecord]
    var off = 100L
    var ok = true
    while (ok && off + 8 <= end) {
      val recNo = be.getInt(off.toInt)
      val contentLen = be.getInt(off.toInt + 4).toLong * 2
      val start = off + 8
      if (contentLen < 4 || start + contentLen > end) ok = false // truncated tail: keep prior records
      else {
        val shapeType = le.getInt(start.toInt)
        val g = parseShape(le, start.toInt, gf)
        out += ShpRecord(path, recNo, shapeType,
          g.map(_.getNumPoints).getOrElse(0), g.map(Geom.writeWkb).orNull)
        off = start + contentLen
      }
    }
    out.result().iterator
  }

  private def parseShape(le: ByteBuffer, p: Int, gf: GeometryFactory): Option[Geometry] =
    le.getInt(p) match {
      case 1 =>
        Some(gf.createPoint(new Coordinate(le.getDouble(p + 4), le.getDouble(p + 12))))
      case t @ (3 | 5) =>
        // layout (both types): bbox 4×double, numParts, numPoints,
        // parts[numParts], points[numPoints]×(x,y)
        val numParts = le.getInt(p + 36)
        val numPoints = le.getInt(p + 40)
        val partsOff = p + 44
        val ptsOff = partsOff + 4 * numParts
        val parts = Array.tabulate(numParts)(i => le.getInt(partsOff + 4 * i))
        val coords = Array.tabulate(numPoints)(i =>
          new Coordinate(le.getDouble(ptsOff + 16 * i), le.getDouble(ptsOff + 16 * i + 8)))
        val pieces = (0 until numParts).map { i =>
          val s = parts(i)
          val e = if (i + 1 < numParts) parts(i + 1) else numPoints
          coords.slice(s, e)
        }
        if (t == 3) {
          val lines = pieces.filter(_.length >= 2).map(cs => gf.createLineString(cs))
          if (lines.isEmpty) None
          else Some(if (lines.length == 1) lines.head
                    else gf.createMultiLineString(lines.toArray))
        } else {
          val rings = pieces.filter(_.length >= 3).map { cs =>
            val closed = if (cs.head.equals2D(cs.last)) cs else cs :+ new Coordinate(cs.head)
            gf.createLinearRing(closed)
          }
          if (rings.isEmpty) None
          else {
            // spec: CW = shell, CCW = hole
            val (shells, holes) = rings.partition(r => !Orientation.isCCW(r.getCoordinateSequence))
            if (shells.isEmpty) Some(gf.createPolygon(rings.head)) // degenerate record
            else {
              val polys = shells.map { sh =>
                val shellPoly = gf.createPolygon(sh)
                val mine = holes.filter(h =>
                  shellPoly.contains(gf.createPoint(h.getCoordinateN(0))))
                gf.createPolygon(sh, mine.toArray)
              }
              Some(if (polys.length == 1) polys.head
                   else gf.createMultiPolygon(polys.toArray))
            }
          }
        }
      case _ => None // 0 = null shape; unknown types tolerated, not fatal
    }
}
