package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.{ByteBuffer, ByteOrder}
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, GeometryFactory, LineString, MultiLineString, Point, Polygon}
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

  // ------------------------------------------------------------------
  // O-22 — shapefile sink (latent in the reference: the commented-out
  // `all_data.to_file(...'all_species.shp')`, species_range_etl.py:235).
  // Distributed like any Spark sink: each partition writes its own
  // part-NNNNN.shp, which also keeps every file far under the format's
  // 2 GB cap (the .shp length field is a 32-bit word count — a single
  // gigantic file is impossible BY FORMAT, so per-partition part files
  // are the only shape a 100 TB write can take).
  // ------------------------------------------------------------------

  /** Serialize one geometry as .shp record content (little-endian).
    * Ring orientation is normalized to the spec on the way out:
    * shells clockwise, holes counter-clockwise.
    */
  def recordContent(g: Geometry): Array[Byte] = g match {
    case null =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(0).array()
    case p: Point =>
      val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1).putDouble(p.getX).putDouble(p.getY)
      bb.array()
    case l if l.isInstanceOf[LineString] || l.isInstanceOf[MultiLineString] =>
      val parts = (0 until l.getNumGeometries).map(l.getGeometryN(_).getCoordinates)
      partsContent(3, parts)
    case poly => // Polygon / MultiPolygon
      partsContent(5, polygonRings(poly))
  }

  private def polygonRings(g: Geometry): Seq[Array[Coordinate]] =
    (0 until g.getNumGeometries).map(g.getGeometryN(_).asInstanceOf[Polygon]).flatMap { p =>
      val shell0 = p.getExteriorRing.getCoordinates
      val shell = if (Orientation.isCCW(shell0)) shell0.reverse else shell0 // spec: shell CW
      val holes = (0 until p.getNumInteriorRing).map { i =>
        val h = p.getInteriorRingN(i).getCoordinates
        if (Orientation.isCCW(h)) h else h.reverse // spec: hole CCW
      }
      shell +: holes
    }

  private def partsContent(shapeType: Int, parts: Seq[Array[Coordinate]]): Array[Byte] = {
    val numPoints = parts.map(_.length).sum
    val env = new Envelope()
    parts.foreach(_.foreach(c => env.expandToInclude(c)))
    val bb = ByteBuffer.allocate(44 + 4 * parts.length + 16 * numPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(shapeType)
    bb.putDouble(env.getMinX).putDouble(env.getMinY)
      .putDouble(env.getMaxX).putDouble(env.getMaxY)
    bb.putInt(parts.length).putInt(numPoints)
    var s = 0
    parts.foreach { p => bb.putInt(s); s += p.length }
    parts.foreach(_.foreach(c => { bb.putDouble(c.x); bb.putDouble(c.y) }))
    bb.array()
  }

  /** Assemble a complete .shp main file from geometries (header with
    * file length + envelope, then numbered records).
    */
  def buildShp(geoms: Seq[Geometry]): Array[Byte] = {
    val contents = geoms.map(recordContent)
    val total = 100 + contents.map(_.length + 8).sum
    val bb = ByteBuffer.allocate(total)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, total / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000)
    bb.putInt(32, geoms.find(_ != null).map {
      case _: Point => 1
      case g if g.isInstanceOf[LineString] || g.isInstanceOf[MultiLineString] => 3
      case _ => 5
    }.getOrElse(0))
    val env = new Envelope()
    geoms.filter(_ != null).foreach(g => env.expandToInclude(g.getEnvelopeInternal))
    bb.putDouble(36, env.getMinX); bb.putDouble(44, env.getMinY)
    bb.putDouble(52, env.getMaxX); bb.putDouble(60, env.getMaxY)
    var off = 100
    contents.zipWithIndex.foreach { case (c, i) =>
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(off, i + 1)
      bb.putInt(off + 4, c.length / 2)
      System.arraycopy(c, 0, bb.array(), off + 8, c.length)
      off += 8 + c.length
    }
    bb.array()
  }

  /** Distributed sink: one .shp part file per non-empty partition,
    * written through the Hadoop filesystem API (so the same code path
    * works against HDFS/object stores on a real cluster).
    */
  def writeShapes(df: DataFrame, wkbCol: String, dir: String): Unit =
    df.select(col(wkbCol)).foreachPartition { (it: Iterator[Row]) =>
      val geoms = it.map(r => Option(r.getAs[Array[Byte]](0)).map(Geom.readWkb).orNull).toVector
      if (geoms.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.shp")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(path, true)
        try out.write(buildShp(geoms)) finally out.close()
      }
    }
}
