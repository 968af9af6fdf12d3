package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling beyond per-column stats
  * ([[graft.QueriesCore.qProfile]]) and declared-rule checking
  * ([[graft.QueriesCore.qConstraints]]): relationships BETWEEN columns
  * and BETWEEN partitions of the corpus. Everything follows the
  * exact-arithmetic grading discipline — integer counts, DECIMAL(38,0)
  * cross-products, one mirrored double division per reported ratio.
  */
object Profiling {

  /** Functional-dependency check over candidate column pairs (the
    * pair-restricted core of TANE, Huhtala et al. 1999): does lhs → rhs
    * hold, how badly does it fail, and what fraction of rows live in
    * clean groups — the schema-inference probe run before trusting a
    * column as a join key or a dimension hierarchy.
    *
    * Single-scan shape: every (lhs, rhs) candidate melts into one
    * exploded (fd, lhs, rhs) stream (fan-out = |pairs|, a constant),
    * one (fd, lhs)-keyed hash agg computes per-group rhs cardinality,
    * one |pairs|-ary rollup summarizes. No per-pair scan, no window.
    *
    * Output: one row per pair — (fd, n_groups, n_violating, max_card,
    * n_rows, clean_frac).
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    val melted = df.select(explode(array(pairs.map { case (l, r) =>
      struct(lit(s"$l->$r").as("fd"), col(l).cast("string").as("lhs"),
        col(r).cast("string").as("rhs"))
    }: _*)).as("_m")).select(col("_m.*"))
    melted.groupBy(col("fd"), col("lhs"))
      .agg(countDistinct(col("rhs")).as("card"), count(lit(1)).as("nr"))
      .groupBy(col("fd"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("card") > 1L, 1L).otherwise(0L)).as("n_violating"),
        max(col("card")).as("max_card"),
        sum(when(col("card") <= 1L, col("nr")).otherwise(0L)).as("_clean"),
        sum(col("nr")).as("n_rows"))
      .select(col("fd"), col("n_groups"), col("n_violating"),
        col("max_card"), col("n_rows"),
        (col("_clean").cast("double") / col("n_rows").cast("double"))
          .as("clean_frac"))
  }

  /** Split-balance χ² audit: is a categorical composition (language,
    * source, label) independent of the train/val/test assignment? The
    * [[graft.operators.Stats.benfordDigits]] per-cell discipline applied
    * to the contingency table — with observed o, row total r, column
    * total c, grand total N: expected = r·c/N and
    * contrib = (o·N − r·c)² / (N·r·c), numerator exact DECIMAL(38,0),
    * ONE double division each. A content-hash split SHOULD pass; a
    * time- or file-ordered split fails loudly — this is the query that
    * catches it before training does.
    *
    * Shape: the corpus collapses into the (category, split) cell table
    * (one hash agg, checkpointed — marginals reuse it), then bounded
    * marginal aggs broadcast back. Output: one row per cell —
    * (category, split, n_obs, expected, contrib).
    */
  def splitBalance(df: DataFrame, categoryCol: String, splitCol: String)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = graft.util.Checkpoints.truncate(
      df.groupBy(col(categoryCol), col(splitCol))
        .agg(count(lit(1)).as("n_obs")))
    val rows = cells.groupBy(col(categoryCol).as("_cat"))
      .agg(sum(col("n_obs")).cast(dec).as("_r"))
    val cols = cells.groupBy(col(splitCol).as("_sp"))
      .agg(sum(col("n_obs")).cast(dec).as("_c"))
    val tot = cells.agg(sum(col("n_obs")).cast(dec).as("_nn"))
    val diff = col("n_obs").cast(dec) * col("_nn") - col("_r") * col("_c")
    cells
      .join(broadcast(rows), col(categoryCol) === col("_cat"))
      .join(broadcast(cols), col(splitCol) === col("_sp"))
      .crossJoin(broadcast(tot))
      .select(col(categoryCol), col(splitCol), col("n_obs"),
        ((col("_r") * col("_c")).cast("double") /
          col("_nn").cast("double")).as("expected"),
        ((diff * diff).cast("double") /
          (col("_nn") * col("_r") * col("_c")).cast("double")).as("contrib"))
  }
}
