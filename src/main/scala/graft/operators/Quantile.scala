package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile sketch for high-cardinality groups — the scale path behind
  * q_group_median's exact percentile (which sorts each group): a
  * LOG-LINEAR histogram in the HdrHistogram / DDSketch log-linear family
  * (Dunning's t-digest solves the same problem but its centroids depend
  * on merge ORDER, so two runs of the same data can emit different
  * estimates — useless for a hash-graded, cross-engine-reproducible
  * pipeline; this bucketing is a pure function of the VALUE).
  *
  * Bucketing, all exact integer arithmetic (no transcendentals — libm
  * `log` differs in the last ulp across engines, which would flip
  * boundary values into different buckets):
  *  - octave   e   = bitLength(v) - 1     (= floor(log2 v), v ≥ 1)
  *  - sub-slot sub = ((v - 2^e) * k) div 2^e   ∈ [0, k)
  *  - estimate     = 2^e * (1 + (sub + 0.5)/k)  — the slot midpoint; with
  *    k a power of two every term is exact binary, so the estimate is
  *    bit-identical everywhere.
  * Guarantee: the true rank-q value lies in the picked slot, so
  * |est − true| / true ≤ 1/(2k) (slot half-width over the slot's lower
  * edge). k = 16 → ≤ 3.125 % relative error, ~64·16 slots per group max.
  *
  * Scale shape: one (group, slot) hash agg with map-side combine over the
  * fact table — the ONLY pass over the data — then windows over the
  * slot table (≤ ~1k rows per group, partitioned by group, never a
  * single-partition funnel). Contrast q_group_median's exact
  * `percentile`, which buffers each group's values; this never holds
  * more than the slot histogram per group.
  *
  * Rank semantics: nearest-rank, r = ceil(q·n) — the first slot whose
  * cumulative count reaches r.
  */
object Quantile {

  /** @param valueCol positive LONG column (v ≥ 1) — callers scale
    *                  decimals to integer units first (money → cents)
    * @return one row per group: groupCols..., n, est (same units as v)
    */
  def logLinearQuantile(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        q: Double, subBuckets: Int = 16): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1]: $q")
    quantileFromSlots(slotHistogram(df, groupCols, valueCol, subBuckets),
      groupCols, q, subBuckets)
  }

  /** The slot table (groups..., e, sub, cnt) — like the HLL register
    * table ([[Sketch.hllRegisters]]) it is MERGEABLE: slots are a pure
    * function of the VALUE, so the histogram of a union of slices is the
    * per-slot SUM of the slice histograms, and a quantile over any slice
    * union is answerable from precomputed per-slice sketches without
    * rescanning ([[quantileFromSlots]] of the summed slots is EXACTLY
    * what a direct scan would build).
    */
  def slotHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    subBuckets: Int = 16): DataFrame = {
    require(subBuckets > 0 && (subBuckets & (subBuckets - 1)) == 0,
      s"subBuckets must be a power of two for exact midpoint arithmetic: $subBuckets")
    df.select(groupCols.map(col) :+ col(valueCol).cast("long").as("v"): _*)
      .withColumn("e", (length(bin(col("v"))) - 1).cast("int"))
      .withColumn("p", expr("shiftleft(CAST(1 AS BIGINT), e)"))
      .withColumn("sub", expr(s"((v - p) * $subBuckets) div p"))
      .groupBy(groupCols.map(col) :+ col("e") :+ col("sub"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Rank-q estimate from a slot table: cumulative walk to the first slot
    * covering rank ceil(q·n), estimate = the slot midpoint (exact binary
    * arithmetic). Windows partition by group over the SLOT table (≤ ~1k
    * rows per group), never the fact table.
    */
  def quantileFromSlots(slots: DataFrame, groupCols: Seq[String], q: Double,
                        subBuckets: Int = 16): DataFrame = {
    val k = subBuckets
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    slots
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("e"), col("sub"))))
      .withColumn("n", sum(col("cnt")).over(byGroup))
      .withColumn("r", ceil(lit(q) * col("n")).cast("long"))
      .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
      .withColumn("p", expr("shiftleft(CAST(1 AS BIGINT), e)"))
      .select(groupCols.map(col) :+ col("n") :+
        (col("p").cast("double") *
          (lit(1.0) + (col("sub").cast("double") + lit(0.5)) / lit(k.toDouble)))
          .as("est"): _*)
  }
}
