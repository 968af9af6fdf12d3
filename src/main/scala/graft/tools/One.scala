package graft.tools
import org.apache.spark.sql.SparkSession
object One {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv => val Array(k, v) = kv.split("="); b.config(k, v) }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(s"ONE $name rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val n2 = fn(spark, dir).count()
    println(s"TWO $name rows=$n2 sec=${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}
