package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-arithmetic statistics. Spark's built-in `corr` sums doubles, so
  * its last bits depend on partition layout (float addition is not
  * associative) — fine for exploration, wrong for a hash-graded,
  * rerun-reproducible pipeline. This variant carries the five moment sums
  * as LONGS (exact, associative, partition-independent) and defers every
  * float op to the final scalar formula — the [[Similarity]] kmeans /
  * [[Graph]] PageRank fixed-point discipline applied to statistics.
  */
object Stats {

  /** Pearson correlation per group over two INTEGER-VALUED columns
    * (callers quantize reals first — money → cents, rates → mills — the
    * [[Quantile.logLinearQuantile]] contract). One hash agg with map-side
    * partials; output is one row per group.
    *
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)),
    * every product exact in long, the division and the (IEEE-correctly-
    * rounded) sqrts in double — bit-identical on any engine.
    */
  def corrExact(df: DataFrame, groupCols: Seq[String],
                xCol: String, yCol: String): DataFrame = {
    val g = groupCols.map(col)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.select(g :+ x.as("_x") :+ y.as("_y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"),
        sum(col("_x") * col("_y")).as("_sxy"))
      .select(g :+ col("n") :+
        ((col("n") * col("_sxy") - col("_sx") * col("_sy")).cast("double") /
          (sqrt((col("n") * col("_sxx") - col("_sx") * col("_sx")).cast("double")) *
            sqrt((col("n") * col("_syy") - col("_sy") * col("_sy")).cast("double"))))
          .as("corr"): _*)
  }
}
