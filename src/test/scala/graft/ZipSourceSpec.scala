package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.sources.EsriAsciiGrid

/** O-3 zip-archive grid source: member selection, prefix routing, and the
  * reference's corrupt tolerance (species_range_etl.py:155-173) — corrupt
  * archives AND corrupt members are skipped and counted, never job-fatal.
  */
class ZipSourceSpec extends SparkSpec {

  private val GoodGrid =
    """ncols 2
      |nrows 1
      |xllcorner 0.0
      |yllcorner 0.0
      |cellsize 1.0
      |NODATA_value -9999
      |0.5 0.75
      |""".stripMargin

  private def makeZip(path: java.nio.file.Path, members: Seq[(String, String)]): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    members.foreach { case (n, c) =>
      zos.putNextEntry(new ZipEntry(n))
      zos.write(c.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
  }

  test("members route by species prefix; non-grid members are skipped") {
    val dir = Files.createTempDirectory("graft-zip")
    makeZip(dir.resolve("oakx_current.zip"), Seq(
      "oakx_range.asc" -> GoodGrid,   // starts with species -> ascii/ top level
      "extra/notes.asc" -> GoodGrid,  // nested under species
      "readme.txt.md" -> "ignore"))   // wrong extension
    val rows = EsriAsciiGrid.readCellsFromZips(spark, dir.toString + "/*.zip")
      .select("path").distinct().collect().map(_.getString(0)).sorted
    assert(rows.length === 2)
    assert(rows(0).endsWith("!ascii/oakx/extra/notes.asc"))
    assert(rows(1).endsWith("!ascii/oakx_range.asc"))
  }

  test("corrupt archive and corrupt member are counted, not fatal") {
    val dir = Files.createTempDirectory("graft-zip-bad")
    makeZip(dir.resolve("pinex_current.zip"), Seq(
      "pinex_ok.asc" -> GoodGrid,
      "pinex_bad.asc" -> "ncols garbage\n0.5\n"))
    Files.write(dir.resolve("junk_current.zip"), Array.fill[Byte](64)(33)) // not a zip
    val acc = spark.sparkContext.longAccumulator("corrupt")
    val cells = EsriAsciiGrid.readCellsFromZips(spark, dir.toString + "/*.zip", Some(acc))
    assert(cells.count() === 2) // only the good 2-cell grid survives
    assert(acc.value === 1)     // the bad member; the junk "zip" yields no
                                // entries (ZipInputStream streams past garbage)
  }
}
