package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for q_containment's stage costs (r13 bisect). */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // stage 1: shingle explosion + truncate
    val sh = time("shingle+truncate") {
      graft.util.Checkpoints.truncate(Dedup.shingleRows(docs, 3, "doc_id", "text"))
    }
    println("PROBE sh_rows " + sh.count())
    val dfc = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val rare = sh.join(dfc.filter(col("df") <= 10 && col("df") >= 2), "shingle")
    val candidates = rare.select(col("shingle"), col("doc_id").as("a_id"))
      .join(rare.select(col("shingle"), col("doc_id").as("b_id")), "shingle")
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
    time("candidates.count")(println("PROBE n_cand " + candidates.count()))
    val full = time("full query") {
      Dedup.containmentPairs(docs, 3, 10, 0.8).count()
    }
    println("PROBE full_rows " + full)
    // re-run warm
    time("full query warm") {
      println("PROBE full2 " + Dedup.containmentPairs(docs, 3, 10, 0.8).count())
    }
    spark.stop()
  }
}
