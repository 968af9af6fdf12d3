package graft.tools
import org.apache.spark.sql.SparkSession
object One {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(s"ONE $name rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val n2 = fn(spark, dir).count()
    println(s"TWO $name rows=$n2 sec=${(System.nanoTime()-t1)/1e9}")
    // GRAFT_SHOW=1: dump every row with exact value repr — used to derive
    // golden VALUES oracles for queries DuckDB cannot compute itself.
    if (sys.env.contains("GRAFT_SHOW")) {
      val df = fn(spark, dir)
      println("SCHEMA " + df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      df.collect().foreach { r =>
        println("ROW " + (0 until r.length).map { i =>
          r.get(i) match {
            case null => "NULL"
            case d: Double => d.toString
            case s: String => "'" + s + "'"
            case v => v.toString
          }
        }.mkString(", "))
      }
    }
    spark.stop()
  }
}
