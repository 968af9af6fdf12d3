package graft.tools
import org.apache.spark.sql.SparkSession
object Seq2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable => println(s"ERR $name ${e.getMessage.take(80)}") }
      (System.nanoTime()-t0)/1e9
    }
    run("q_incremental_antijoin") // warm canary
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      val t = run(name)
      val c = run("q_incremental_antijoin")
      println(f"SEQ $name%-24s sec=$t%7.1f canary=$c%6.1f")
    }
    spark.stop()
  }
}
