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
  * `srid` is the EPSG code parsed from the `.prj` sidecar (the way
  * `gpd.read_file` carries layer CRS, species_range_etl.py:131-133,199);
  * null when the sidecar is absent or names an unrecognized CRS.
  */
final case class ShpRecord(path: String, record: Int, shape_type: Int,
                           n_points: Int, geometry: Array[Byte],
                           srid: Option[Int])

/** [[ShpRecord]] plus the record's .dbf attribute row (raw trimmed field
  * text keyed by field name; empty map when no .dbf sidecar exists).
  */
final case class ShpAttrRecord(path: String, record: Int, shape_type: Int,
                               n_points: Int, geometry: Array[Byte],
                               attrs: Map[String, String],
                               srid: Option[Int])

/** One .dbf column: 11-char-max name, dBase type char (C/N/F/L/D),
  * fixed byte width, decimal count (N only).
  */
final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

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
    val hconf = new graft.util.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) =>
        parseRecords(p, b, sidecarBytes(p, ".shx", hconf.value),
          sidecarSrid(p, hconf.value))
      }
      .toDF()
  }

  /** EPSG srid from a .prj ESRI-WKT — minimal, like the rest of this
    * reader: an explicit AUTHORITY["EPSG","n"] wins (the OUTERMOST one,
    * which WKT1 nesting puts last in the string); otherwise the WGS-84
    * geographic names arcpy/OGR emit without an authority clause map to
    * 4326. Unrecognized CRSes yield None — surfaced as a null `srid`,
    * never a guess.
    */
  def parsePrj(wkt: String): Option[Int] = {
    val auth = """AUTHORITY\[\s*"EPSG"\s*,\s*"(\d+)"\s*\]""".r
    val hits = auth.findAllMatchIn(wkt).map(_.group(1).toInt).toSeq
    if (hits.nonEmpty) Some(hits.last)
    else if (wkt.contains("GCS_WGS_1984") || wkt.contains("WGS_1984") ||
      wkt.contains("WGS 84")) Some(4326)
    else None
  }

  /** Resolve the sibling .prj of a .shp through the Hadoop FS (same
    * task-side sidecar pattern as the .dbf open in [[readTable]]); absent
    * or unreadable sidecars are a CRS-less layer, not a failure.
    */
  private def sidecarSrid(shpPath: String,
                          hconf: org.apache.hadoop.conf.Configuration): Option[Int] =
    sidecarBytes(shpPath, ".prj", hconf)
      .flatMap(buf => parsePrj(new String(buf, "US-ASCII")))

  /** Full bytes of a .shp sibling sidecar (.prj/.shx/.dbf) through the
    * Hadoop FS; absent or unreadable → None, never a failure.
    */
  private def sidecarBytes(shpPath: String, ext: String,
                           hconf: org.apache.hadoop.conf.Configuration): Option[Array[Byte]] =
    try {
      val p = new org.apache.hadoop.fs.Path(shpPath.replaceAll("\\.shp$", ext))
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0, buf) finally in.close()
        Some(buf)
      } else None
    } catch { case _: Exception => None }

  /** .shp + .dbf joined by record index — the full attribute table the
    * reference sees through `gpd.read_file` (species_range_etl.py:199):
    * arcpy's RasterToPolygon output carries its `Id`/`gridcode` columns in
    * the .dbf sidecar, NOT the .shp (which is geometry-only by format).
    * The .dbf is opened through the Hadoop FS API inside the same task
    * that parses its .shp (sibling path, one extra sequential read), so
    * the 1:1 record alignment the shapefile spec mandates never crosses a
    * shuffle. Attributes surface as a map<string,string> of raw trimmed
    * field text; callers cast what they need (`attrs['Id']::long`).
    */
  def readTable(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    // the session's hadoopConfiguration (not a bare new Configuration()) so
    // spark.hadoop.* settings — object-store credentials, endpoints — reach
    // the task-side .dbf sidecar open
    val hconf = new graft.util.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) =>
        val attrRows: Vector[Map[String, String]] = try {
          val dbfPath = new org.apache.hadoop.fs.Path(p.replaceAll("\\.shp$", ".dbf"))
          val fs = dbfPath.getFileSystem(hconf.value)
          if (fs.exists(dbfPath)) {
            val len = fs.getFileStatus(dbfPath).getLen.toInt
            val buf = new Array[Byte](len)
            val in = fs.open(dbfPath)
            try in.readFully(0, buf) finally in.close()
            parseDbf(buf)._2
          } else Vector.empty
        } catch { case _: Exception => Vector.empty } // corrupt .dbf ⇒ geometry-only
        parseRecords(p, b, sidecarBytes(p, ".shx", hconf.value),
            sidecarSrid(p, hconf.value)).map { r =>
          val attrs = // .shp record numbers are 1-based; .dbf rows 0-based
            if (r.record >= 1 && r.record <= attrRows.length) attrRows(r.record - 1)
            else Map.empty[String, String]
          ShpAttrRecord(r.path, r.record, r.shape_type, r.n_points, r.geometry,
            attrs, r.srid)
        }
      }
      .toDF()
  }

  /** Pure dBase III (.dbf) parser (unit-testable without Spark): 32-byte
    * header (record count LE@4, header size LE@8, record size LE@10),
    * 32-byte field descriptors (name@0 NUL-padded, type@11, width@16,
    * decimals@17) terminated by 0x0D, then fixed-width ASCII records each
    * prefixed by a deletion flag. Deleted rows ('*') yield an EMPTY map —
    * not skipped — because the .shp⇄.dbf contract is positional.
    */
  def parseDbf(bytes: Array[Byte]): (Seq[DbfField], Vector[Map[String, String]]) = {
    if (bytes.length < 33) return (Nil, Vector.empty)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerLen = le.getShort(8) & 0xffff
    val recLen = le.getShort(10) & 0xffff
    if (headerLen < 33 || headerLen > bytes.length || recLen < 1) return (Nil, Vector.empty)
    val fb = Vector.newBuilder[DbfField]
    var off = 32
    while (off + 32 <= headerLen && bytes(off) != 0x0d) {
      val name = new String(bytes, off, 11, "ISO-8859-1").takeWhile(_ != 0).trim
      fb += DbfField(name, bytes(off + 11).toChar, bytes(off + 16) & 0xff, bytes(off + 17) & 0xff)
      off += 32
    }
    val fields = fb.result()
    val rows = Vector.newBuilder[Map[String, String]]
    var pos = headerLen
    var r = 0
    while (r < nRec && pos + recLen <= bytes.length) {
      if (bytes(pos) == '*') rows += Map.empty
      else {
        var fp = pos + 1
        val m = Map.newBuilder[String, String]
        fields.foreach { f =>
          m += f.name -> new String(bytes, fp, f.length, "ISO-8859-1").trim
          fp += f.length
        }
        rows += m.result()
      }
      r += 1; pos += recLen
    }
    (fields, rows.result())
  }

  /** Parse preferring the `.shx` index when present: the index file's
    * per-record (offset, length) table locates every record independently,
    * so (a) a corrupt or truncated record skips ONLY itself — the
    * sequential parse below necessarily stops at the first bad record
    * header because each record's position depends on the previous one's
    * self-reported length — and (b) the offsets are exactly what a
    * record-RANGE split of a very large .shp would hand each task (the
    * format's 2 GB cap makes that a read-side nicety here; per-partition
    * part files remain the write-side scale shape). Invalid/absent .shx
    * falls back to the sequential parse.
    */
  def parseRecords(path: String, bytes: Array[Byte], shx: Option[Array[Byte]],
                   srid: Option[Int] = None): Iterator[ShpRecord] = {
    val idx = shx.map(parseShx).getOrElse(Nil)
    if (idx.isEmpty) parse(path, bytes, srid)
    else parseIndexed(path, bytes, idx, srid)
  }

  /** .shx record index: 100-byte header (same layout as .shp, file code
    * 9994), then per record a big-endian pair (offset, content length) in
    * 16-bit words — offset points at the record HEADER in the .shp (ESRI
    * Shapefile Technical Description, July 1998, "Organization of the
    * Index File"). Returned in bytes. Non-shapefile or undersized input →
    * empty (caller falls back to sequential parse).
    */
  def parseShx(bytes: Array[Byte]): Seq[(Long, Long)] = {
    if (bytes.length < 100) return Nil
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (be.getInt(0) != 9994) return Nil
    val end = math.min(be.getInt(24).toLong * 2, bytes.length.toLong)
    val n = math.max(0L, (end - 100) / 8).toInt
    (0 until n).map { i =>
      (be.getInt(100 + 8 * i).toLong * 2, be.getInt(100 + 8 * i + 4).toLong * 2)
    }
  }

  /** Index-guided record reads: each (offset, length) is validated against
    * the main file independently; records whose extent falls outside the
    * file (truncation) or is degenerate are skipped WITHOUT stopping the
    * scan. Record numbers are positional (1-based index order, as the spec
    * mandates) so a corrupt record header cannot corrupt numbering.
    */
  def parseIndexed(path: String, bytes: Array[Byte], index: Seq[(Long, Long)],
                   srid: Option[Int] = None): Iterator[ShpRecord] = {
    if (bytes.length < 100) return Iterator.empty
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (be.getInt(0) != 9994) return Iterator.empty
    val gf = new GeometryFactory()
    index.iterator.zipWithIndex.collect {
      case ((off, len), i)
          if off >= 100 && len >= 4 && off + 8 + len <= bytes.length =>
        val start = (off + 8).toInt
        val shapeType = le.getInt(start)
        val g = parseShape(le, start, gf)
        ShpRecord(path, i + 1, shapeType,
          g.map(_.getNumPoints).getOrElse(0), g.map(Geom.writeWkb).orNull, srid)
    }
  }

  /** Pure parser (unit-testable without Spark); `srid` is stamped onto
    * every record (the caller resolves it from the .prj sidecar).
    */
  def parse(path: String, bytes: Array[Byte],
            srid: Option[Int] = None): Iterator[ShpRecord] = {
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
          g.map(_.getNumPoints).getOrElse(0), g.map(Geom.writeWkb).orNull, srid)
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

  /** Write the spec's 4-double bbox (Xmin,Ymin,Xmax,Ymax) at `off`. A null
    * envelope — every geometry in the file was null — would read back from
    * JTS as (0, 0, -1, -1), an inverted box external readers reject; the
    * convention for "no extent" is all zeros.
    */
  private def putBbox(bb: ByteBuffer, off: Int, env: Envelope): Unit = {
    val (x0, y0, x1, y1) =
      if (env.isNull) (0.0, 0.0, 0.0, 0.0)
      else (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
    bb.putDouble(off, x0); bb.putDouble(off + 8, y0)
    bb.putDouble(off + 16, x1); bb.putDouble(off + 24, y1)
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
    putBbox(bb, 36, env)
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

  /** .shx index sidecar: same 100-byte header layout as .shp (its own
    * length field), then one (record offset, content length) pair per
    * record, both big-endian 16-bit-word counts. External readers
    * (geopandas/OGR) require it to open a shapefile.
    */
  def buildShx(contentLengths: Seq[Int], shapeType: Int, env: Envelope): Array[Byte] = {
    val total = 100 + 8 * contentLengths.length
    val bb = ByteBuffer.allocate(total)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, total / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000)
    bb.putInt(32, shapeType)
    putBbox(bb, 36, env)
    bb.order(ByteOrder.BIG_ENDIAN)
    var off = 100
    contentLengths.zipWithIndex.foreach { case (len, i) =>
      bb.putInt(100 + 8 * i, off / 2)      // offset of the record HEADER, in words
      bb.putInt(100 + 8 * i + 4, len / 2)  // content length, in words
      off += 8 + len
    }
    bb.array()
  }

  /** dBase III (.dbf) attribute file from fixed-width field specs + rows
    * of pre-rendered text. C fields left-justified, others right-justified,
    * space padding/truncation to the declared width.
    */
  def buildDbf(fields: Seq[DbfField], rows: Seq[Seq[String]]): Array[Byte] = {
    val recLen = 1 + fields.map(_.length).sum
    val headerLen = 32 + 32 * fields.length + 1
    val total = headerLen + recLen * rows.length + 1
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 0x03.toByte)
    // last-update date: fixed (not wall-clock) so output bytes are
    // reproducible run-to-run — required for hash-graded round trips
    bb.put(1, 98.toByte); bb.put(2, 1.toByte); bb.put(3, 1.toByte)
    bb.putInt(4, rows.length)
    bb.putShort(8, headerLen.toShort)
    bb.putShort(10, recLen.toShort)
    var off = 32
    fields.foreach { f =>
      val nb = f.name.getBytes("ISO-8859-1").take(10)
      var i = 0
      while (i < nb.length) { bb.put(off + i, nb(i)); i += 1 }
      bb.put(off + 11, f.ftype.toByte)
      bb.put(off + 16, f.length.toByte)
      bb.put(off + 17, f.decimals.toByte)
      off += 32
    }
    bb.put(off, 0x0d.toByte)
    var pos = headerLen
    rows.foreach { r =>
      bb.put(pos, ' '.toByte)
      var fp = pos + 1
      fields.zip(r).foreach { case (f, v0) =>
        val v = Option(v0).getOrElse("")
        val cell =
          if (f.ftype == 'C') v.padTo(f.length, ' ').take(f.length)
          else {
            val t = if (v.length > f.length) v.take(f.length) else v
            (" " * (f.length - t.length)) + t
          }
        val cb = cell.getBytes("ISO-8859-1")
        var i = 0
        while (i < f.length) { bb.put(fp + i, if (i < cb.length) cb(i) else ' '.toByte); i += 1 }
        fp += f.length
      }
      pos += recLen
    }
    bb.put(total - 1, 0x1a.toByte)
    bb.array()
  }

  /** Render one attribute value + its dBase field spec from a Spark type.
    * Widths are fixed a priori (N 18, F 18.6, C `strWidth`) so the .dbf
    * can be assembled without a second pass over the data.
    */
  private def dbfFieldFor(name: String, dt: org.apache.spark.sql.types.DataType,
                          strWidth: Int): DbfField = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      DbfField(name.take(10), 'N', 18, 0)
    case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType =>
      DbfField(name.take(10), 'N', 18, 6)
    case org.apache.spark.sql.types.BooleanType => DbfField(name.take(10), 'L', 1, 0)
    case _ => DbfField(name.take(10), 'C', strWidth, 0)
  }

  private def renderDbfValue(f: DbfField, v: Any): String = v match {
    case null => ""
    case d: Double => f"$d%.6f"
    case d: Float => f"${d.toDouble}%.6f"
    case b: Boolean => if (b) "T" else "F"
    case x => x.toString
  }

  /** Distributed sink: one part file per non-empty partition, written
    * through the Hadoop filesystem API (same code path against
    * HDFS/object stores on a real cluster), with the .shx index and —
    * when `attrCols` is non-empty — the .dbf attribute sidecar, so
    * external tools (OGR/geopandas) can open the output directly.
    *
    * Streaming, not buffering: record contents spool to executor-local
    * temp disk as they are serialized (one geometry in memory at a time —
    * a partition of millions of polygons never materializes as a Vector),
    * while the envelope, record lengths (→.shx) and attribute rows
    * (→.dbf; small relative to geometry) accumulate incrementally. The
    * header needs the total length and envelope, so the final .shp is
    * header + a chunked copy of the spool — object-store safe (no seek).
    */
  /** ESRI WKT for EPSG:4326 / WGS-84 — the CRS the reference stamps on
    * every vector layer before export (species_range_etl.py:131-133).
    * Shapefiles carry CRS only via this `.prj` sidecar; without it a
    * geopandas/OGR consumer gets a CRS-less layer.
    */
  val Epsg4326Wkt: String =
    "GEOGCS[\"GCS_WGS_1984\",DATUM[\"D_WGS_1984\"," +
      "SPHEROID[\"WGS_1984\",6378137.0,298.257223563]]," +
      "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]"

  def writeShapes(df: DataFrame, wkbCol: String, dir: String,
                  attrCols: Seq[String] = Nil,
                  crsWkt: String = Epsg4326Wkt): Unit = {
    val projected = df.select((wkbCol +: attrCols).map(col): _*)
    val attrTypes = projected.schema.fields.drop(1).map(f => (f.name, f.dataType)).toSeq
    val hconf = new graft.util.SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    projected.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val spool = java.io.File.createTempFile(f"shp-part-$pid%05d", ".tmp")
        val spoolOut = new java.io.BufferedOutputStream(new java.io.FileOutputStream(spool))
        val env = new Envelope()
        val lengths = Vector.newBuilder[Int]
        val attrRows = Vector.newBuilder[Seq[Any]]
        var shapeType = 0
        var recNo = 0
        try {
          while (it.hasNext) {
            val row = it.next()
            val g = Option(row.getAs[Array[Byte]](0)).map(Geom.readWkb).orNull
            val content = recordContent(g)
            if (g != null) {
              env.expandToInclude(g.getEnvelopeInternal)
              val t = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
              // the spec forbids mixing shape types in one file — writing it
              // anyway produces a file external readers misparse, so fail
              // loudly at the offending record instead
              if (shapeType == 0) shapeType = t
              else if (t != 0 && t != shapeType) throw new IllegalArgumentException(
                s"shapefile forbids mixed shape types: record ${recNo + 1} is type $t " +
                  s"but this file is type $shapeType; split by geometry type before writing")
            }
            recNo += 1
            val hdr = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
            hdr.putInt(recNo).putInt(content.length / 2)
            spoolOut.write(hdr.array()); spoolOut.write(content)
            lengths += content.length
            if (attrTypes.nonEmpty) attrRows += (1 to attrTypes.length).map(row.get)
          }
          spoolOut.close()
          val lens = lengths.result()
          val total = 100 + lens.map(_ + 8).sum
          val shpPath = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.shp")
          val fs = shpPath.getFileSystem(hconf.value)
          val out = fs.create(shpPath, true)
          try {
            val head = ByteBuffer.allocate(100)
            head.order(ByteOrder.BIG_ENDIAN)
            head.putInt(0, 9994)
            head.putInt(24, total / 2)
            head.order(ByteOrder.LITTLE_ENDIAN)
            head.putInt(28, 1000)
            head.putInt(32, shapeType)
            putBbox(head, 36, env)
            out.write(head.array())
            val in = new java.io.BufferedInputStream(new java.io.FileInputStream(spool))
            try {
              val buf = new Array[Byte](64 * 1024)
              var n = in.read(buf)
              while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
          } finally out.close()
          val shxPath = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.shx")
          val shxOut = fs.create(shxPath, true)
          try shxOut.write(buildShx(lens, shapeType, env)) finally shxOut.close()
          // .prj is per-basename (readers pair sidecars by file stem), so
          // each part writes its own copy of the constant WKT
          if (crsWkt != null && crsWkt.nonEmpty) {
            val prjPath = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.prj")
            val prjOut = fs.create(prjPath, true)
            try prjOut.write(crsWkt.getBytes("US-ASCII")) finally prjOut.close()
          }
          if (attrTypes.nonEmpty) {
            val rows = attrRows.result()
            val fields = attrTypes.map { case (n, dt) =>
              dbfFieldFor(n, dt, strWidth = 32)
            }
            val rendered = rows.map(r => fields.zip(r).map { case (f, v) => renderDbfValue(f, v) })
            val dbfPath = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.dbf")
            val dbfOut = fs.create(dbfPath, true)
            try dbfOut.write(buildDbf(fields, rendered)) finally dbfOut.close()
          }
        } finally {
          try spoolOut.close() catch { case _: Exception => } // no-op if already closed
          spool.delete(); ()
        }
      }
    }
  }
}
