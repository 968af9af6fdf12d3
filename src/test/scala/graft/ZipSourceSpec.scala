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

  test("zip member walk is lazy: later members are not parsed until reached") {
    val dir = Files.createTempDirectory("graft-zip-lazy")
    val p = dir.resolve("oakx_current.zip")
    makeZip(p, Seq(
      "oakx_a.asc" -> GoodGrid,            // 2 cells
      "oakx_bad.asc" -> "ncols junk\n1\n", // corrupt — parsed only when REACHED
      "oakx_b.asc" -> GoodGrid))
    val bytes = Files.readAllBytes(p)
    // drain only the first member's first cell: with a lazy walk the
    // corrupt second member is never parsed, so the counter stays 0 —
    // the old whole-archive builder would have counted it eagerly
    val acc1 = spark.sparkContext.longAccumulator("lazy1")
    val it = EsriAsciiGrid.zipCells("x/oakx_current.zip", bytes, Some(acc1))
    assert(it.next()._1 === "x/oakx_current.zip!ascii/oakx_a.asc")
    assert(acc1.value === 0)
    // exhausting the walk reaches the corrupt member exactly once and
    // still yields both good grids' cells
    val acc2 = spark.sparkContext.longAccumulator("lazy2")
    val all = EsriAsciiGrid.zipCells("x/oakx_current.zip", bytes, Some(acc2)).toVector
    assert(all.length === 4 && acc2.value === 1)
  }
}
