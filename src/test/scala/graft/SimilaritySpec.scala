package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN candidate-generation contracts. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("multi-probe candidates are a strict superset of single-probe") {
    val single = Similarity.lshPairs(vecs, numPlanes = 8, dim = 64,
        minCosine = -1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.multiProbeLshPairs(vecs, numPlanes = 8, dim = 64,
        minCosine = -1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi),
      "hamming-0 pairs must survive multi-probe (f = 0 probe)")
    assert(multi.size > single.size,
      "hamming-1 probes must add candidates on this corpus")
  }

  test("IVF nprobe=2 pair set strictly contains the single-cell pairs") {
    val single = Similarity.ivfPairs(vecs, numCentroids = 16, minCosine = -1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val probe2 = Similarity.ivfPairsProbe2(vecs, numCentroids = 16,
        minCosine = -1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(probe2),
      "a vector always probes its own primary cell (rn <= 2 includes rn = 1)")
    assert(probe2.size > single.size,
      "second-cell probes must recover cell-boundary pairs on this corpus")
  }

  test("multi-probe recall dominates single-probe on the same ground truth") {
    def avgRecall(multi: Boolean): Double =
      Similarity.annRecall(vecs, col("vec_id") < 5, k = 5,
          numPlanes = 8, dim = 64, minCosine = 0.25, multiProbe = multi)
        .agg(avg(col("recall"))).as[Double].head()
    assert(avgRecall(true) >= avgRecall(false),
      "extra probes can only widen the candidate set")
  }
}
