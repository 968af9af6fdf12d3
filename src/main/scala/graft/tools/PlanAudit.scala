package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump formatted physical plans for scale-critical queries (audit tooling;
  * output reviewed in PLANS.md).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_threshold_filter", "q_join_enrich", "q_incremental_antijoin",
      "q_geo_dissolve", "q_dedup_minhash", "q_embed_near_dup", "q_similar_topk",
      "q_sessionize", "q_dissolve_area")
    for (n <- names) {
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
