package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    // deterministic execution order (sorted by name) for reproducible timings
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE in the JSON (rows=-1 + errors entry),
      // never a normal-looking timing (r2: q_speciesdata failed silently)
      val (rows, err) =
        try (fn(spark, sfDir).count(), None)
        catch { case e: Throwable =>
          (-1L, Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"))
        }
      (name, (System.nanoTime() - t0) / 1e9, rows, err)
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rows = results.map { case (k, _, r, _) => s"\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) =>
      "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
