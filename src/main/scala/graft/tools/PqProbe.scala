package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev-only: PQ recall vs exact L2 across codebook shapes. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i).toDouble - b(i)) * (a(i).toDouble - b(i))).sum
    val exact = (for {
      (qid, qv) <- all.take(8)
      (nid, _) <- all.filter(_._1 != qid).sortBy { case (n, v) => (d2(qv, v), n) }.take(5)
    } yield (qid, nid)).toSet
    for ((m, sd, ks) <- Seq((4, 16, 16), (8, 8, 16), (4, 16, 32), (8, 8, 32), (16, 4, 16))) {
      val pq = Similarity.pqTopK(vecs, m, sd, ks, col("vec_id") < 8, 5)
        .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
      println(f"PQPROBE m=$m sd=$sd ks=$ks recall=${(pq intersect exact).size / 40.0}%.3f")
    }
    spark.stop()
  }
}
