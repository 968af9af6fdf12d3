package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump formatted physical plans for scale-critical queries (audit tooling;
  * output reviewed in PLANS.md / OPTIMIZATION_r16.md).
  *
  * Env knobs (all optional):
  *  - GRAFT_PLAN_DIR: data dir (default /root/testdata/sf0.01)
  *  - GRAFT_PLAN_OUT: directory to write one `<query><suffix>.txt` per query
  *    (default: print to stdout)
  *  - GRAFT_PLAN_SUFFIX: filename suffix when writing (e.g. "_before")
  *  - GRAFT_EXTRA_CONF: extra `k=v;k=v` Spark confs (matches tools.One)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_PLAN_DIR", "/root/testdata/sf0.01")
    val out = sys.env.get("GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_threshold_filter", "q_join_enrich", "q_incremental_antijoin",
      "q_geo_dissolve", "q_dedup_minhash", "q_embed_near_dup", "q_similar_topk",
      "q_sessionize", "q_dissolve_area")
    for (n <- names) {
      // queryExecution.explainString, not .explain(), so the text can be
      // captured for the plan artifacts instead of going to stdout only
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out match {
        case Some(d) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$n$suffix.txt"), txt)
          println(s"PLAN $n -> $d/$n$suffix.txt")
        case None =>
          println(s"\n########## $n ##########")
          println(txt)
      }
    }
    spark.stop()
  }
}
