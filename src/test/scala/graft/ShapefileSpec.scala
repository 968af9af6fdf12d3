package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.functions.Geom
import graft.sources.Shapefile

/** O-5 golden tests: .shp main-file bytes built in-test per the public
  * ESRI Shapefile Technical Description (July 1998) layout, parsed back
  * to WKB and checked via JTS (area / component counts are invariant to
  * vertex order, the right granularity for geometry equality).
  */
class ShapefileSpec extends SparkSpec {

  // --- golden byte builders -------------------------------------------
  private def shpBytes(records: Seq[Array[Byte]]): Array[Byte] = {
    val total = 100 + records.map(_.length + 8).sum
    val bb = ByteBuffer.allocate(total)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)          // file code
    bb.putInt(24, total / 2)    // file length in 16-bit words
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000)         // version
    bb.putInt(32, 5)            // header shape type (advisory)
    var off = 100
    records.zipWithIndex.foreach { case (r, i) =>
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(off, i + 1)           // record number (1-based)
      bb.putInt(off + 4, r.length / 2) // content length in words
      System.arraycopy(r, 0, bb.array(), off + 8, r.length)
      off += 8 + r.length
    }
    bb.array()
  }

  private def polygonContent(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val numPoints = rings.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.length + 16 * numPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(5)
    (0 until 4).foreach(_ => bb.putDouble(0.0)) // bbox (parser skips)
    bb.putInt(rings.length)
    bb.putInt(numPoints)
    var s = 0
    rings.foreach { r => bb.putInt(s); s += r.length }
    rings.flatten.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }

  private def pointContent(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
    bb.array()
  }

  private def polylineContent(parts: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val numPoints = parts.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 32 + 8 + 4 * parts.length + 16 * numPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(3)
    (0 until 4).foreach(_ => bb.putDouble(0.0))
    bb.putInt(parts.length); bb.putInt(numPoints)
    var s = 0
    parts.foreach { p => bb.putInt(s); s += p.length }
    parts.flatten.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }

  // CW = shell, CCW = hole (spec convention)
  private val shellCW = Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
  private val holeCCW = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
  private val shell2CW = Seq((10.0, 0.0), (10.0, 2.0), (12.0, 2.0), (12.0, 0.0), (10.0, 0.0))

  test("polygon with hole: shell CW, hole CCW, area = 16 - 1") {
    val recs = Shapefile.parse("t", shpBytes(Seq(polygonContent(Seq(shellCW, holeCCW))))).toSeq
    assert(recs.length === 1)
    assert(recs.head.shape_type === 5)
    assert(Geom.area(recs.head.geometry) === 15.0)
    assert(Geom.numGeometries(recs.head.geometry) === 1)
  }

  test("two CW shells in one record become a MultiPolygon") {
    val recs = Shapefile.parse("t", shpBytes(Seq(polygonContent(Seq(shellCW, shell2CW))))).toSeq
    assert(recs.length === 1)
    assert(Geom.numGeometries(recs.head.geometry) === 2)
    assert(Geom.area(recs.head.geometry) === 16.0 + 4.0)
  }

  test("polyline record parses single and multi-part lines") {
    val one = Shapefile.parse("t",
      shpBytes(Seq(polylineContent(Seq(Seq((0.0, 0.0), (3.0, 4.0))))))).toSeq
    assert(one.head.shape_type === 3)
    assert(Geom.readWkb(one.head.geometry).getLength === 5.0)
    val two = Shapefile.parse("t", shpBytes(Seq(polylineContent(Seq(
      Seq((0.0, 0.0), (1.0, 0.0)), Seq((0.0, 2.0), (0.0, 5.0))))))).toSeq
    assert(Geom.numGeometries(two.head.geometry) === 2)
    assert(Geom.readWkb(two.head.geometry).getLength === 4.0)
  }

  test("point record round-trips exactly") {
    val recs = Shapefile.parse("t", shpBytes(Seq(pointContent(3.5, 4.25)))).toSeq
    assert(recs.length === 1)
    assert(recs.head.shape_type === 1)
    val p = Geom.readWkb(recs.head.geometry).getCoordinate
    assert(p.x === 3.5 && p.y === 4.25)
  }

  test("truncated tail keeps prior records and does not throw") {
    val full = shpBytes(Seq(polygonContent(Seq(shellCW)), pointContent(1.0, 2.0)))
    val truncated = java.util.Arrays.copyOf(full, full.length - 10)
    val recs = Shapefile.parse("t", truncated).toSeq
    assert(recs.length === 1) // polygon survives, broken point dropped
    assert(Geom.area(recs.head.geometry) === 16.0)
  }

  test("non-shapefile bytes yield zero records") {
    assert(Shapefile.parse("t", Array.fill[Byte](200)(7)).isEmpty)
    assert(Shapefile.parse("t", Array.empty[Byte]).isEmpty)
  }

  // .shx sidecar matching shpBytes' layout: 100-byte header + (offset,
  // content-length) big-endian word pairs per record
  private def shxBytes(contentLens: Seq[Int]): Array[Byte] = {
    val total = 100 + 8 * contentLens.length
    val bb = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, total / 2)
    var off = 100
    contentLens.zipWithIndex.foreach { case (len, i) =>
      bb.putInt(100 + 8 * i, off / 2)          // record-header offset, words
      bb.putInt(100 + 8 * i + 4, len / 2)      // content length, words
      off += 8 + len
    }
    bb.array()
  }

  test("parseShx decodes (offset, length) word pairs to bytes") {
    val idx = Shapefile.parseShx(shxBytes(Seq(20, 36)))
    assert(idx === Seq((100L, 20L), (128L, 36L)))
    assert(Shapefile.parseShx(Array.fill[Byte](50)(1)).isEmpty)
    assert(Shapefile.parseShx(Array.fill[Byte](120)(7)).isEmpty) // bad file code
  }

  test(".shx-guided read survives a lying record-length header that kills the sequential parse") {
    val contents = Seq(pointContent(1.0, 1.0), pointContent(2.0, 2.0), pointContent(3.0, 3.0))
    val shp = shpBytes(contents)
    // corrupt record 2's content-length header field (big-endian at
    // recordStart+4): the sequential parse trusts it to find record 3 and
    // must stop; the .shx locates every record independently
    val corrupted = shp.clone()
    val rec2HeaderOff = 100 + 8 + 20
    ByteBuffer.wrap(corrupted).order(ByteOrder.BIG_ENDIAN)
      .putInt(rec2HeaderOff + 4, 999999)
    assert(Shapefile.parse("t", corrupted).toSeq.map(_.record) === Seq(1))
    val viaShx = Shapefile.parseRecords("t", corrupted,
      Some(shxBytes(contents.map(_.length)))).toSeq
    assert(viaShx.map(_.record) === Seq(1, 2, 3))
    assert(viaShx.map(r => Geom.readWkb(r.geometry).getCoordinate.x) === Seq(1.0, 2.0, 3.0))
  }

  test(".shx entries pointing past a truncated main file skip ONLY those records") {
    val contents = Seq(pointContent(1.0, 1.0), pointContent(2.0, 2.0), pointContent(3.0, 3.0))
    val shp = shpBytes(contents)
    val truncated = java.util.Arrays.copyOf(shp, shp.length - 10) // record 3 cut
    val viaShx = Shapefile.parseRecords("t", truncated,
      Some(shxBytes(contents.map(_.length)))).toSeq
    assert(viaShx.map(_.record) === Seq(1, 2))
  }

  test("parseRecords falls back to sequential parse on absent or invalid .shx") {
    val shp = shpBytes(Seq(pointContent(5.0, 6.0)))
    assert(Shapefile.parseRecords("t", shp, None).toSeq.length === 1)
    assert(Shapefile.parseRecords("t", shp,
      Some(Array.fill[Byte](120)(7))).toSeq.length === 1)
  }

  test("writeShapes sink round-trips through readShapes, normalizing ring orientation") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    def ring(pts: (Double, Double)*) =
      gf.createLinearRing(pts.map { case (x, y) => new Coordinate(x, y) }.toArray)
    // shell CCW and hole CW — both the WRONG orientation for the spec, so
    // the writer must flip them or the parser misclassifies shell/hole
    val withHole = gf.createPolygon(
      ring((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
      Array(ring((1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0))))
    val square = gf.createPolygon(ring((10.0, 0.0), (10.0, 2.0), (12.0, 2.0), (12.0, 0.0), (10.0, 0.0)))
    import spark.implicits._
    val df = Seq(Geom.writeWkb(withHole), Geom.writeWkb(square)).toDF("geometry")
    val dir = java.nio.file.Files.createTempDirectory("graft-shp-sink").toString + "/out"
    Shapefile.writeShapes(df, "geometry", dir)
    val rows = Shapefile.readShapes(spark, dir + "/*.shp").collect()
    val back = rows.map(r => Geom.area(r.getAs[Array[Byte]]("geometry"))).sorted
    assert(back.toSeq === Seq(4.0, 12.0)) // 2×2 square, and 4×4 shell minus 2×2 hole
    // the writer's .prj sidecar survives the round trip as srid=4326 —
    // the CRS carry gpd.read_file gives the reference
    assert(rows.forall(r => r.getAs[Int]("srid") == 4326))
  }

  test("parsePrj: EPSG authority wins, bare WGS-84 names map to 4326, unknown is None") {
    assert(Shapefile.parsePrj(Shapefile.Epsg4326Wkt) === Some(4326))
    // outermost AUTHORITY (last in WKT1) wins over the datum's inner one
    assert(Shapefile.parsePrj(
      """PROJCS["X",GEOGCS["Y",AUTHORITY["EPSG","4326"]],
        |AUTHORITY["EPSG","3857"]]""".stripMargin) === Some(3857))
    assert(Shapefile.parsePrj("""GEOGCS["WGS 84",DATUM["WGS_1984"]]""") === Some(4326))
    assert(Shapefile.parsePrj("""PROJCS["Some_Local_Grid"]""") === None)
  }

  test("dbf codec round-trips N, C, N-decimal and L fields; deleted row stays positional") {
    import graft.sources.DbfField
    val fields = Seq(DbfField("Id", 'N', 18, 0), DbfField("label", 'C', 12, 0),
      DbfField("score", 'N', 18, 6), DbfField("ok", 'L', 1, 0))
    val bytes = Shapefile.buildDbf(fields,
      Seq(Seq("7", "holed", "0.250000", "T"), Seq("-11", "two shells", "-1.500000", "F")))
    val (fs2, rows) = Shapefile.parseDbf(bytes)
    assert(fs2 === fields)
    assert(rows === Vector(
      Map("Id" -> "7", "label" -> "holed", "score" -> "0.250000", "ok" -> "T"),
      Map("Id" -> "-11", "label" -> "two shells", "score" -> "-1.500000", "ok" -> "F")))
    // flag row 2 deleted: it must come back EMPTY, not disappear — the
    // .shp⇄.dbf join is positional
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen = le.getShort(8) & 0xffff
    val recLen = le.getShort(10) & 0xffff
    bytes(headerLen + recLen) = '*'
    val rows2 = Shapefile.parseDbf(bytes)._2
    assert(rows2.length === 2 && rows2(0)("Id") === "7" && rows2(1).isEmpty)
  }

  test("dbf values overflowing their declared width are truncated, not corrupting neighbours") {
    import graft.sources.DbfField
    val fields = Seq(DbfField("a", 'C', 4, 0), DbfField("b", 'N', 3, 0))
    val bytes = Shapefile.buildDbf(fields, Seq(Seq("toolongvalue", "42")))
    val rows = Shapefile.parseDbf(bytes)._2
    assert(rows === Vector(Map("a" -> "tool", "b" -> "42")))
  }

  test("writeShapes with attrCols emits .shx and .dbf sidecars readTable can join back") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    def rect(x: Double, w: Double) = gf.createPolygon(
      Array((x, 0.0), (x + w, 0.0), (x + w, 1.0), (x, 1.0), (x, 0.0))
        .map { case (a, b) => new Coordinate(a, b) })
    import spark.implicits._
    val df = Seq(
      (Geom.writeWkb(rect(0, 2)), 7L, "alpha", 0.5),
      (Geom.writeWkb(rect(10, 3)), 11L, "beta", -1.25)
    ).toDF("geometry", "Id", "label", "score").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft-shp-attrs").toString + "/out"
    Shapefile.writeShapes(df, "geometry", dir, attrCols = Seq("Id", "label", "score"))
    // sidecar layout: every part file has its .shx, .dbf and .prj siblings
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet // Hadoop local FS adds .crc siblings
    assert(names === Set("part-00000.shp", "part-00000.shx", "part-00000.dbf",
      "part-00000.prj"))
    // CRS sidecar carries the reference's EPSG:4326 stamp verbatim
    val prj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.prj")), "US-ASCII")
    assert(prj === Shapefile.Epsg4326Wkt)
    assert(prj.contains("GCS_WGS_1984") && prj.contains("298.257223563"))
    val back = Shapefile.readTable(spark, dir + "/*.shp").orderBy("record").collect()
    assert(back.length === 2)
    val a0 = back(0).getAs[Map[String, String]]("attrs")
    val a1 = back(1).getAs[Map[String, String]]("attrs")
    assert(a0("Id") === "7" && a0("label") === "alpha" && a0("score").toDouble === 0.5)
    assert(a1("Id") === "11" && a1("label") === "beta" && a1("score").toDouble === -1.25)
    assert(Geom.area(back(0).getAs[Array[Byte]]("geometry")) === 2.0)
    // .shx structurally sound: header length field == file size, one
    // 8-byte entry per record, offsets pointing inside the .shp
    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "part-00000.shx"))
    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "part-00000.shp"))
    val be = ByteBuffer.wrap(shx).order(ByteOrder.BIG_ENDIAN)
    assert(be.getInt(0) === 9994)
    assert(be.getInt(24) * 2 === shx.length)
    assert((shx.length - 100) / 8 === 2)
    val off0 = be.getInt(100) * 2
    val len0 = be.getInt(104) * 2
    assert(off0 === 100) // first record header right after the main header
    // the record header at that offset carries the same content length
    assert(ByteBuffer.wrap(shp).order(ByteOrder.BIG_ENDIAN).getInt(off0 + 4) * 2 === len0)
    val off1 = be.getInt(108) * 2
    assert(off1 === off0 + 8 + len0 && off1 < shp.length)
  }

  test("writeShapes: all-null-geometry partition writes a zero bbox, not JTS's inverted null envelope") {
    import spark.implicits._
    val df = Seq(null.asInstanceOf[Array[Byte]], null.asInstanceOf[Array[Byte]])
      .toDF("geometry").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft-shp-nulls").toString + "/out"
    Shapefile.writeShapes(df, "geometry", dir)
    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "part-00000.shp"))
    val le = ByteBuffer.wrap(shp).order(ByteOrder.LITTLE_ENDIAN)
    // JTS's null Envelope reads back (minX=0, maxX=-1) — an inverted box;
    // the header must carry all zeros instead
    (36 to 60 by 8).foreach(off => assert(le.getDouble(off) === 0.0, s"bbox@$off"))
    val back = Shapefile.readShapes(spark, dir + "/*.shp").orderBy("record").collect()
    assert(back.length === 2 && back.forall(_.getAs[Array[Byte]]("geometry") == null))
  }

  test("writeShapes rejects mixed shape types in one partition (spec forbids them)") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    val point = gf.createPoint(new Coordinate(1.0, 2.0))
    val square = gf.createPolygon(Array((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))
      .map { case (x, y) => new Coordinate(x, y) })
    import spark.implicits._
    val df = Seq(Geom.writeWkb(point), Geom.writeWkb(square)).toDF("geometry").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft-shp-mixed").toString + "/out"
    val e = intercept[Exception] {
      Shapefile.writeShapes(df, "geometry", dir)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("mixed shape types")))
  }

  test("SerializableHadoopConf carries session spark.hadoop.* settings across serialization") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.s3a.endpoint", "http://example.internal:9000")
    val wrapped = new graft.util.SerializableHadoopConf(conf)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(wrapped); oos.close()
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[graft.util.SerializableHadoopConf]
    assert(back.value.get("fs.s3a.endpoint") === "http://example.internal:9000")
  }

  test("readTable without a .dbf sidecar yields empty attrs, not a failure") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shp-nodbf")
    java.nio.file.Files.write(dir.resolve("bare.shp"),
      shpBytes(Seq(pointContent(1.0, 2.0))))
    val rows = Shapefile.readTable(spark, dir.toString + "/*.shp").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Map[String, String]]("attrs") === Map.empty)
  }

  test("readShapes: Spark binaryFile path end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shp")
    java.nio.file.Files.write(dir.resolve("golden.shp"),
      shpBytes(Seq(polygonContent(Seq(shellCW, holeCCW)), pointContent(7.0, 8.0))))
    val df = Shapefile.readShapes(spark, dir.toString + "/*.shp")
    val rows = df.orderBy("record").collect()
    assert(rows.length === 2)
    assert(Geom.area(rows(0).getAs[Array[Byte]]("geometry")) === 15.0)
    assert(rows(1).getAs[Int]("shape_type") === 1)
  }
}
