package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Mirror Bench: at sf10-scale sweeps the per-partition sort/agg working
    // set must shrink with the data, so the shuffle width is overridable.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // Scan-side twin (see Bench): many-small-file scale layouts need a
    // smaller file-bin so CPU-bound scans get one task per file.
    val maxPartBytes =
      sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.files.maxPartitionBytes", maxPartBytes)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the dump (fast local sweeps of new
    // queries); the driver sets no filter and gets the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // coalesce(1) keeps the driver's one-file-per-query layout, but it is a
    // NARROW dependency: with no shuffle between a join and the write, the
    // whole final stage — the join included — fuses into ONE task. Fine at
    // sf0.01 (driver contract unchanged); at sf10 the 10^8-row ANN outputs
    // would serialize a billion-cosine join, so scale sweeps set
    // SPARK_GRAFT_VERIFY_COALESCE=0 and write natural partitioning
    // (tools/check.py globs part files either way).
    val coalesceOut =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_COALESCE", "1").toInt
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val out = if (coalesceOut > 0) df.coalesce(coalesceOut) else df
        out.write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(
          f"VERIFYQ $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free this query's truncated-lineage blocks at the boundary — the
      // 474-query sweep otherwise accumulates every query's checkpoint
      // blocks for the whole session (see Checkpoints.releaseAll)
      graft.util.Checkpoints.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
