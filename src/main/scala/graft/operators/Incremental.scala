package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the view-maintenance
  * primitive that turns a corpus changelog ([[graft.QueriesExt]]'s
  * `q_corpus_diff` output shape) into an updated rollup WITHOUT
  * rescanning the base data: at 100 TB the nightly diff is GBs while the
  * corpus is the whole lake, so `agg(new) = agg(old) ⊕ delta(changelog)`
  * is the only affordable rebuild. Works for any abelian-group aggregate
  * (count, sum — here both); min/max need the full re-agg on deletes and
  * are deliberately out of scope.
  */
object Incremental {

  /** Apply a per-key (dn, ds) delta to a (key, n, s) materialized
    * aggregate: one key-keyed full-outer equi-join, groups created and
    * retired as counts cross zero. Inputs must carry exactly the columns
    * named (n, s) / (dn, ds) — integer types (exact arithmetic; float
    * aggregates would drift from the recompute under incremental
    * maintenance, which is why the engine's rollups sum longs).
    */
  def applyAggDelta(oldAgg: DataFrame, delta: DataFrame, keyCol: String): DataFrame =
    oldAgg.join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
}
