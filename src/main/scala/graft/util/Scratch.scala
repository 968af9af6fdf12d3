package graft.util

/** Per-JVM scratch warehouse root for LOCAL entrypoints (Bench, Verify,
  * dev tools, tests). `spark.sql.warehouse.dir` defaults to
  * `$PWD/spark-warehouse`, i.e. INSIDE the checkout — round-trip queries
  * (q_csv_roundtrip, q_orc_roundtrip, q_schema_evolution, q_compact,
  * q_bucketed_join) root their scratch there and would fail on a
  * read-only working directory (r7 regression class; r11 ADVICE). Local
  * masters are single-node, so java.io.tmpdir is visible to every
  * "executor" thread; on a real cluster deployers set the warehouse to
  * shared storage themselves and none of these entrypoints run.
  *
  * Lazily created once per JVM; a shutdown hook removes it (best-effort —
  * Bench/Verify sessions already delete their per-query scratch eagerly
  * via withScratch's finally).
  */
object Scratch {
  lazy val warehouseDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-warehouse-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }
}
