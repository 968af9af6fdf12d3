package graft

import graft.operators.Raster
import graft.sources.EsriAsciiGrid

/** Filename-metadata parser (species_range_etl.py:188-198) and Esri ASCII
  * grid source (species_range_etl.py:59-92) against FIXTURES.md golden cases.
  */
class RasterSpec extends SparkSpec {

  // FIXTURES.md A3 — one case per parse branch
  test("filename parse: current-defaults branch (etl.py:191-194)") {
    assert(Raster.parseRasterFilenameScala("25_current.shp") ===
      ("25", "vtech", "current", "2020"))
  }
  test("filename parse: full-token branch (etl.py:195-198)") {
    assert(Raster.parseRasterFilenameScala("50_gfdl_rcp45_y2050.shp") ===
      ("50", "gfdl", "rcp45", "2050"))
    assert(Raster.parseRasterFilenameScala("75_hadley_rcp85_y2100.shp") ===
      ("75", "hadley", "rcp85", "2100"))
  }
  test("filename parse: Column expression matches the Scala twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val names = Seq("25_current.shp", "50_gfdl_rcp45_y2050.shp", "75_hadley_rcp85_y2100.shp")
    val (t, s, sc, y) = Raster.parseRasterFilename(col("fname"))
    val rows = names.toDF("fname")
      .select(t.as("t"), s.as("s"), sc.as("sc"), y.as("y"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq === names.map(Raster.parseRasterFilenameScala))
  }

  // FIXTURES.md A2 — golden grid
  private val gridA =
    """ncols        4
      |nrows        3
      |xllcorner    -80.0
      |yllcorner    35.0
      |cellsize     0.5
      |NODATA_value -9999
      |0.1 0.3 0.6 0.9
      |0.0 0.5 0.75 -9999
      |0.2 0.25 0.4 0.8
      |""".stripMargin

  test("esri grid: header, cell count, NODATA -> null") {
    val (h, cells) = EsriAsciiGrid.parse(gridA)
    assert(h === EsriAsciiGrid.GridHeader(4, 3, -80.0, 35.0, 0.5, Some(-9999.0)))
    val cs = cells.toVector
    assert(cs.size === 12)
    assert(cs.count(_.prob.isEmpty) === 1)
    val nodata = cs.find(_.prob.isEmpty).get
    assert((nodata.row, nodata.col) === (1, 3))
  }

  test("esri grid: cell centers (row 0 = northernmost)") {
    val (_, cells) = EsriAsciiGrid.parse(gridA)
    val c00 = cells.toVector.find(c => c.row == 0 && c.col == 0).get
    assert(c00.lon === -79.75 && c00.lat === 36.25)
  }

  test("esri grid: threshold >= 0.5 keeps boundary cells (etl.py:123)") {
    val (_, cells) = EsriAsciiGrid.parse(gridA)
    // golden expectation: 4 surviving cells (0.6, 0.9, 0.5, 0.75, 0.8 -> 5?)
    val surv = cells.toVector.filter(_.prob.exists(_ >= 0.5))
    // values >= 0.5: 0.6, 0.9, 0.5, 0.75, 0.8 — boundary 0.5 INCLUDED
    assert(surv.map(_.prob.get).sorted === Vector(0.5, 0.6, 0.75, 0.8, 0.9))
  }

  test("esri grid: malformed header rejected") {
    intercept[IllegalArgumentException] {
      EsriAsciiGrid.parse("ncols 2\nnot a grid")
    }
  }

  test("esri grid: wrapped body lines parse to the header's shape") {
    // one raster row of 4 values written across two physical lines —
    // writers wrap wide grids; line boundaries carry no meaning
    val (h, cells) = EsriAsciiGrid.parse(
      "ncols 4\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1.0\n0.1 0.2\n0.3 0.4\n")
    val v = cells.toVector
    assert(h.ncols === 4)
    assert(v.map(c => (c.row, c.col)) === Vector((0, 0), (0, 1), (0, 2), (0, 3)))
    assert(v.map(_.prob.get) === Vector(0.1, 0.2, 0.3, 0.4))
  }

  test("esri grid: body value-count mismatch and bad tokens are rejected eagerly") {
    // 3 values for a 2x2 header -> corrupt, caught at parse() time
    intercept[IllegalArgumentException] {
      EsriAsciiGrid.parse(
        "ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1.0\n0.1 0.2\n0.3\n")
    }
    // unparseable body value -> corrupt at parse() time, NOT later on the
    // task iterator where it would escape readCells' guard
    intercept[NumberFormatException] {
      EsriAsciiGrid.parse(
        "ncols 2\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1.0\n0.1 oops\n")
    }
  }

  test("corrupt grids are skipped AND counted, good grids still parse (O-3/O-25)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(dir.toPath.resolve("good.asc"),
      "ncols 1\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1.0\n0.5\n")
    java.nio.file.Files.writeString(dir.toPath.resolve("bad.asc"),
      "this is not an esri grid at all\n")
    val acc = spark.sparkContext.longAccumulator("corrupt")
    val cells = EsriAsciiGrid.readCells(spark, s"$dir/*.asc", Some(acc)).collect()
    assert(cells.length === 1)          // the good grid's single cell
    assert(acc.value === 1L)            // the bad grid counted, not fatal
  }

  test("zip member routing matches the prefix rule (etl.py:163-169)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val routed = Seq(
      ("bald-cypress_grid.txt", "bald-cypress"), // starts with species -> ascii/
      ("extras/readme.txt", "bald-cypress"))     // otherwise -> ascii/{species}/
      .toDF("member", "species")
      .select(Raster.zipMemberRoute(col("member"), col("species")).as("dest"))
      .as[String].collect()
    assert(routed === Array(
      "ascii/bald-cypress_grid.txt",
      "ascii/bald-cypress/extras/readme.txt"))
  }

  test("html link extraction takes h4 title + SECOND href (etl.py:142-154)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val html =
      """<div class="thumbnail-file-group"><h4>rcp85</h4><ul>""" +
        """<li><a href="page.html">page</a></li>""" +
        """<li><a href="oak_rcp85.zip">zip</a></li></ul></div>"""
    val r = Raster.htmlLinks(Seq((7L, html)).toDF("k", "html"), "k", "html")
      .as[(Long, String, String)].collect()
    assert(r === Array((7L, "rcp85", "oak_rcp85.zip")))
  }

  test("html link extraction tolerates blocks with a missing zip link (ANSI-safe)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // only ONE href: the reference's scraper would raise IndexError; the
    // engine yields null instead of an ANSI INVALID_ARRAY_INDEX failure
    val html = """<div class="thumbnail-file-group"><h4>rcp45</h4><ul>""" +
      """<li><a href="page.html">page</a></li></ul></div>"""
    val r = Raster.htmlLinks(Seq((1L, html)).toDF("k", "html"), "k", "html")
      .select("scenario", "zip_url").collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "rcp45")
    assert(r(0).isNullAt(1))
  }

  test("O-20 JDBC sink round-trips through embedded Derby, overwrite replaces") {
    import spark.implicits._
    // Derby ships in /opt/spark/jars — the sink is testable offline after
    // all: embedded URL, zero network (species_range_etl.py:230-236's
    // to_postgis analog; WKB geometry travels as BLOB)
    val db = java.nio.file.Files.createTempDirectory("graft-derby").toString + "/sdb"
    val url = s"jdbc:derby:$db;create=true"
    val rows = Seq(
      (1L, "oakx", "25", 0.75, Array[Byte](1, 2, 3)),
      (2L, "pinex", "50", 1.0, Array[Byte](9, 8))
    ).toDF("sid", "species", "threshold", "area", "geometry")
    Raster.writeSpeciesDataJdbc(rows, url, "speciesdata")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "speciesdata").load()
      .orderBy("sid").collect()
    assert(back.length === 2)
    assert(back(0).getAs[String]("species") === "oakx")
    assert(back(0).getAs[Array[Byte]]("geometry").toSeq === Seq[Byte](1, 2, 3))
    assert(back(1).getAs[Double]("area") === 1.0)
    // overwrite: a second load REPLACES (full-replace semantics, etl.py:236)
    Raster.writeSpeciesDataJdbc(rows.filter($"sid" === 1L), url, "speciesdata")
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "speciesdata").load().count() === 1)
  }

  test("O-20 partitioned sink prunes partitions on read (the layout's point)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/sd"
    val rows = (1L to 40L).map(i => (i, s"sp${i % 4}", "25", i.toDouble))
      .toDF("sid", "species", "threshold", "area")
    Raster.writeSpeciesData(rows, out, partitionBy = Seq("species"))
    val read = spark.read.parquet(out).filter(col("species") === "sp1")
    // the predicate must become a PARTITION filter (directory pruning),
    // not a post-scan row filter over all files
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sp1"),
      s"species predicate did not reach the partition filters:\n$plan")
    // pruning is real: the scan selects ONE of the four directories
    // (inputFiles would lie here — it lists the pre-pruning file index)
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    val parts = scan.selectedPartitions
    assert(parts.partitionCount === 1,
      s"expected 1 pruned partition, got ${parts.partitionCount}")
    assert(parts.toPartitionArray.forall(_.filePath.toString.contains("species=sp1")))
    assert(read.count() === 10L)
  }

  test("PostGIS SQL generation: typed DDL, ST_GeomFromWKB insert, ALTER path") {
    import graft.sources.PostGis
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("sid", LongType), StructField("species", StringType),
      StructField("threshold", StringType), StructField("area", DoubleType),
      StructField("srid", IntegerType), StructField("geometry", BinaryType)))
    assert(PostGis.createTableSql(schema, "speciesdata", "geometry") ===
      "CREATE TABLE speciesdata (sid bigint, species text, threshold text, " +
        "area double precision, srid integer, geometry geometry(MultiPolygon,4326))")
    assert(PostGis.insertSql(schema, "speciesdata", "geometry") ===
      "INSERT INTO speciesdata (sid, species, threshold, area, srid, geometry) " +
        "VALUES (?, ?, ?, ?, ?, ST_GeomFromWKB(?, 4326))")
    assert(PostGis.alterToGeometrySql("speciesdata", "geometry") ===
      "ALTER TABLE speciesdata ALTER COLUMN geometry TYPE " +
        "geometry(MultiPolygon,4326) USING ST_GeomFromWKB(geometry, 4326)")
  }

  test("PostGIS typed writer plumbing round-trips through Derby, replace semantics") {
    import spark.implicits._
    import graft.sources.PostGis
    // Derby has neither PostGIS nor text/geometry types: swap the two
    // PostGIS-specific tokens (geomExpr -> plain ?, geometry DDL -> blob)
    // and the remaining statement text + batching + full-replace flow is
    // exactly what a live PostGIS load would execute
    val db = java.nio.file.Files.createTempDirectory("graft-pg").toString + "/pdb"
    val url = s"jdbc:derby:$db;create=true"
    val rows = Seq(
      (1L, 0.75, Array[Byte](1, 2, 3)),
      (2L, 1.5, Array[Byte](9, 8)),
      (3L, 2.25, null.asInstanceOf[Array[Byte]])
    ).toDF("sid", "area", "geometry")
    PostGis.writeTyped(rows, url, "speciesdata", "geometry",
      batchSize = 2, geomExpr = Some("?"), createTypeOverride = Some("blob"))
    // unquoted identifiers come back uppercased from Derby (PostGIS would
    // lowercase them — either way the unquoted DDL is the idiomatic form)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "speciesdata").load()
      .orderBy("SID").collect()
    assert(back.length === 3)
    assert(back(0).getAs[Array[Byte]]("GEOMETRY").toSeq === Seq[Byte](1, 2, 3))
    assert(back(1).getAs[Double]("AREA") === 1.5)
    assert(back(2).getAs[Array[Byte]]("GEOMETRY") === null)
    // second write REPLACES (the reference's if_exists="replace")
    PostGis.writeTyped(rows.filter($"sid" === 1L), url, "speciesdata", "geometry",
      batchSize = 2, geomExpr = Some("?"), createTypeOverride = Some("blob"))
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "speciesdata").load().count() === 1L)
  }

  test("retry-safe PostGIS load: a re-run of a COMMITTED partition does not duplicate") {
    import spark.implicits._
    import graft.sources.PostGis
    val db = java.nio.file.Files.createTempDirectory("graft-pg-retry").toString + "/rdb"
    val url = s"jdbc:derby:$db;create=true"
    val rows = Seq(
      (1L, 0.75, Array[Byte](1, 2, 3)),
      (2L, 1.5, Array[Byte](9, 8)),
      (3L, 2.25, Array[Byte](4))
    ).toDF("sid", "area", "geometry").repartition(2)
    // end-to-end: retrySafe adds the load_part bookkeeping column
    PostGis.writeTyped(rows, url, "speciesdata", "geometry",
      batchSize = 2, geomExpr = Some("?"), createTypeOverride = Some("blob"),
      retrySafe = true)
    def loaded() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "speciesdata").load()
    assert(loaded().count() === 3L)
    assert(loaded().columns.map(_.toLowerCase).contains("load_part"))
    // replay ONE partition's load verbatim — exactly what a Spark task
    // re-run after a lost success message executes (transaction + delete
    // + batched inserts). Rows must be REPLACED, not appended.
    val part0 = loaded().filter($"LOAD_PART" === 0).orderBy("SID").collect()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("area", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("geometry", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("load_part", org.apache.spark.sql.types.IntegerType)))
    val insert = PostGis.insertSql(schema, "speciesdata", "geometry",
      geomExpr = Some("?"))
    val replayRows = part0.map(r => org.apache.spark.sql.Row(
      r.getAs[Long]("SID"), r.getAs[Double]("AREA"),
      r.getAs[Array[Byte]]("GEOMETRY"), 0))
    PostGis.loadPartition(url, "speciesdata", insert, schema.fields.toArray,
      deletePart = Some(0), replayRows.iterator, batchSize = 2)
    // same total, same content — the committed attempt was replaced
    assert(loaded().count() === 3L)
    assert(loaded().select("SID").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // and WITHOUT the delete (legacy non-retry-safe path) the same replay
    // WOULD duplicate — proving the delete is what carries the guarantee
    PostGis.loadPartition(url, "speciesdata", insert, schema.fields.toArray,
      deletePart = None, replayRows.iterator, batchSize = 2)
    assert(loaded().count() === (3L + part0.length))
  }
}
