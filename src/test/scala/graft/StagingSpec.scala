package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import scala.sys.process._
import graft.operators.Raster
import graft.sources.{EsriAsciiGrid, SpeciesCatalog}
import org.apache.spark.sql.functions._

/** End-to-end test of the HTTP acquisition edge (tools/
  * stage_species_inputs.py) against a LOCALHOST replica of the
  * reference-shaped site — the r10 verdict's gap: "the staging script has
  * never run against the live site, so the end-to-end acquisition path is
  * untested by construction". Zero egress: the JDK's built-in HttpServer
  * serves the fixture site on 127.0.0.1, the script fetches from it, and
  * the engine's sources then consume the staged bytes — list TSV →
  * SpeciesCatalog, raw HTML → Raster.htmlLinks, scenario zips →
  * EsriAsciiGrid.readCellsFromZips. Also proves the script's incremental
  * contract: a rerun issues NO further HTTP requests.
  */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  private val Grid =
    """ncols 2
      |nrows 1
      |xllcorner 0.0
      |yllcorner 0.0
      |cellsize 1.0
      |NODATA_value -9999
      |0.5 0.75
      |""".stripMargin

  private def zipBytes(members: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    members.foreach { case (n, c) =>
      zos.putNextEntry(new ZipEntry(n))
      zos.write(c.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  // the reference site's page shape: one good block (h4 scenario, image
  // href first, zip href SECOND) and one "Image not available" block the
  // script must skip (species_range_etl.py:147-149)
  private def page(sp: String): String =
    s"""<html><body>
       |<div class="thumbnail-file-group"><h4>current</h4>
       |<li><a href="climate/species/thumb/$sp.png">img</a></li>
       |<li><a href="climate/species/zips/${sp}_current.zip">zip</a></li>
       |</div>
       |<div class="thumbnail-file-group"><p>Image not available</p></div>
       |</body></html>""".stripMargin

  test("staging script acquires the reference-shaped site end-to-end, offline") {
    val tsv = "grid-a\tcommon a\tsci a\tvtech\ngrid-b\tcommon b\tsci b\tvtech\n"
    val zips = Map(
      "grid-a" -> zipBytes(Seq("grid-a_range.asc" -> Grid)),
      "grid-b" -> zipBytes(Seq("grid-b_range.asc" -> Grid)))
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val path = ex.getRequestURI.getPath
      val body: Array[Byte] =
        if (path.endsWith("/speciesList.txt")) tsv.getBytes(StandardCharsets.UTF_8)
        else if (path.contains("/speciesDist/"))
          page(path.substring(path.lastIndexOf('/') + 1)).getBytes(StandardCharsets.UTF_8)
        else if (path.startsWith("/climate/species/zips/"))
          zips(path.stripPrefix("/climate/species/zips/").stripSuffix("_current.zip"))
        else Array.emptyByteArray
      val code = if (body.isEmpty) 404 else 200
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val out: Path = Files.createTempDirectory("graft-staged")
      def run(): Int = Seq("python3", "/root/repo/tools/stage_species_inputs.py",
        out.toString, "--base-url", s"http://127.0.0.1:$port").!
      assert(run() === 0, "staging script must exit 0")

      // staged layout, byte-verbatim
      assert(new String(Files.readAllBytes(out.resolve("species_list.tsv")),
        StandardCharsets.UTF_8) === tsv)
      assert(Files.readAllBytes(out.resolve("zipfiles/grid-a/current.zip"))
        .sameElements(zips("grid-a")))
      assert(Files.exists(out.resolve("html/grid-b.html")))

      // the engine consumes exactly what the script staged
      val names = SpeciesCatalog.speciesNames(spark,
        out.resolve("species_list.tsv").toString).as[String].collect().sorted
      assert(names === Array("grid-a", "grid-b"))
      val pages = spark.read.option("wholetext", "true")
        .text(out.resolve("html").toString + "/*.html")
        .select(regexp_extract(input_file_name(), "([a-z-]+)\\.html$", 1).as("species"),
          col("value").as("html"))
      // the "Image not available" block surfaces as (scenario="", zip_url
      // null) — htmlLinks defers the skip to the consumer (the script
      // skips it inline); filter exactly as the pipeline does
      val links = Raster.htmlLinks(pages, "species", "html")
        .filter(col("zip_url").isNotNull)
        .as[(String, String, String)].collect().sorted
      assert(links === Array(
        ("grid-a", "current", "climate/species/zips/grid-a_current.zip"),
        ("grid-b", "current", "climate/species/zips/grid-b_current.zip")),
        "engine link extraction must list exactly what the script downloaded")
      val cells = EsriAsciiGrid
        .readCellsFromZips(spark, out.resolve("zipfiles").toString + "/*/*.zip")
        .select("prob").as[Double].collect().sorted
      assert(cells === Array(0.5, 0.5, 0.75, 0.75))

      // incremental contract: a rerun finds every file staged and issues
      // ZERO further HTTP requests
      val before = hits.get()
      assert(run() === 0)
      assert(hits.get() === before, "rerun must not re-download anything")
    } finally server.stop(0)
  }
}
