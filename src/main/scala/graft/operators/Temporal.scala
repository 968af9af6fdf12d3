package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, shaped for scale.
  *
  * Both avoid the naive inequality-join formulation, which Catalyst can
  * only plan as a broadcast-nested-loop/cartesian: the as-of join is a
  * single union + window carry-forward (one shuffle by key, linear in
  * |probe|+|ref|), and the range join buckets intervals into fixed time
  * bins so containment becomes an equi-join on (key, bin) with a cheap
  * residual filter.
  */
object Temporal {

  /** As-of join: for each probe row, the most recent reference row with
    * `ref.ts <= probe.ts` in the same key group (null columns when no
    * reference precedes the probe).
    *
    * Formulation: union both sides tagged `_is_ref`, ONE window ordered by
    * (ts, ref-first, id) carrying the last reference id/ts forward, keep
    * probe rows. At equal timestamps the reference row wins (`<=`
    * semantics); ties within the reference break to the highest id —
    * the same total order the oracle replays.
    */
  def asofJoin(probe: DataFrame, ref: DataFrame, keys: Seq[String],
               tsCol: String, idCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val r = ref.select(keyCols :+ col(tsCol) :+ col(idCol) :+ lit(1).as("_is_ref"): _*)
    val l = probe.select(keyCols :+ col(tsCol) :+ col(idCol) :+ lit(0).as("_is_ref"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol), col("_is_ref").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .select(keyCols :+ col(tsCol) :+ col(idCol) :+ col("_is_ref") :+
        last(when(col("_is_ref") === 1, col(idCol)), ignoreNulls = true)
          .over(w).as("matched_id") :+
        last(when(col("_is_ref") === 1, col(tsCol)), ignoreNulls = true)
          .over(w).as("matched_ts"): _*)
      .filter(col("_is_ref") === 0)
      .drop("_is_ref")
  }

  /** Interval-containment (range) join: probe rows against intervals of
    * the same key with `start <= ts <= end`, binned so it plans as an
    * EQUI-join: each interval explodes to the fixed-size time bins it
    * covers, each probe row maps to its own bin, join on (keys, bin),
    * then the exact BETWEEN filter. Bin size trades interval fan-out
    * against bucket population; at 100 TB pick it near the median
    * interval length so each interval lands in O(1) bins.
    */
  def rangeJoinBinned(probe: DataFrame, intervals: DataFrame, keys: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      binMicros: Long): DataFrame = {
    val binned = intervals.withColumn("_bin",
      explode(sequence(expr(s"$startCol DIV ${binMicros}L"),
        expr(s"$endCol DIV ${binMicros}L"))))
    val probeB = probe.withColumn("_bin", expr(s"$tsCol DIV ${binMicros}L"))
    probeB.join(binned, keys :+ "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
