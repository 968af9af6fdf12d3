package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev-only (r14 verdict item 4): measure that the IVF centroid count
  * is the candidate-volume knob at scale. The graded `q_ann_ivf` pins
  * numCentroids=16 for oracle determinism, so its within-cell pair
  * mass grows ~quadratically with rows (121.7M pairs at sf10); a real
  * deployment raises K with N. This probe runs the EXACT assignment
  * `ivfPairs` uses on one embeddings dir at K=16 (the graded pin) and
  * K=floor(√N) (the classic IVF sizing) and prints, per K: the
  * within-cell candidate mass Σ d·(d−1)/2 from [[Similarity
  * .ivfCellSizes]], the ≥0.25-cosine survivor count from the full
  * `ivfPairs` run (the graded threshold), and the wall for each.
  *
  * Usage: runMain graft.tools.AnnKnobProbe <sfDir> [moreKs...]
  */
object AnnKnobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val sqrtK = math.max(16, math.sqrt(n.toDouble).toInt)
    val ks = (Seq(16, sqrtK) ++ args.drop(1).map(_.toInt)).distinct
    for (k <- ks) {
      val t0 = System.nanoTime()
      // d*(d-1) is even, so halving the long sum is exact (a /2 column
      // would be DOUBLE and lose exactness past 2^53 candidates)
      val cand = Similarity.ivfCellSizes(vecs, k)
        .agg(sum(col("d") * (col("d") - 1))).collect()(0).getLong(0) / 2
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val out = Similarity.ivfPairs(vecs, k, minCosine = 0.25).count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      println(f"ANNKNOB dir=$dir n=$n k=$k cand_pairs=$cand out_pairs=$out" +
        f" cand_wall=$tCand%.1f pair_wall=$tPairs%.1f")
    }
    spark.stop()
  }
}
