package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Dev-only (r14 verdict item 5): PairBudget fire drill at scale — run
  * the budget-guarded candidate joins against a corpus big enough that
  * the budget actually BITES, proving the loud-degradation contract
  * under real pressure rather than only in PairBudgetSpec:
  *
  *  - `q_fuzzy_join`'s exact plan (FastSS deletion variants over the
  *    specimen-name population) with a candidate budget;
  *  - `setSimJoin` (PPJoin prefix blocks) with a candidate budget;
  *  - the graded `q_mutual_nn` budget (100M — fires at sf10 where
  *    within-label all-pairs is ~2.0B candidates).
  *
  * Each stage prints rows + wall; the `graft.PairBudget` WARN lines
  * with the dropped-block/pair accounting land on stderr via log4j —
  * the artifact PLANS.md excerpts.
  *
  * Usage: runMain graft.tools.PairDrill <sfDir> <fuzzyBudget> <ssBudget>
  *        [skipUnbudgeted] — the unbudgeted fuzzy stage costs ~7 min at
  *        sf10 (518M pairs); pass any 4th arg to rerun only the budgeted
  *        stages.
  */
object PairDrill {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fuzzyBudget = args(1).toLong
    val ssBudget = args(2).toLong
    val skipUnbudgeted = args.length > 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.warehouse.dir", graft.util.Scratch.warehouseDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(what: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PAIRDRILL $what rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the graded q_fuzzy_join name population, verbatim
    val base = concat(lit("specimen"), expr("doc_id DIV 50").cast("string"))
    val name = when(col("doc_id") % 3 === 0, base)
      .when(col("doc_id") % 3 === 1, base.substr(lit(1), length(base) - 1))
      .otherwise(concat(lit("z"), base.substr(lit(2), length(base) - 1)))
    val strs = docs.select(col("doc_id").as("id"), name.as("s"))
    if (!skipUnbudgeted) timed(s"fuzzy_unbudgeted") {
      Dedup.fuzzyStringJoin(strs, q = 2, maxDist = 1, stopDenom = 8L)
    }
    timed(s"fuzzy_budget=$fuzzyBudget") {
      Dedup.fuzzyStringJoin(strs, q = 2, maxDist = 1, stopDenom = 8L,
        maxPairs = Some(fuzzyBudget))
    }
    timed(s"setsim_budget=$ssBudget") {
      Dedup.setSimJoin(docs, k = 3, num = 3, den = 5,
        maxPairs = Some(ssBudget))
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    timed("mutual_nn_budget=100000000") {
      Similarity.mutualNearestPairs(emb, maxPairs = Some(100000000L))
    }
    spark.stop()
  }
}
