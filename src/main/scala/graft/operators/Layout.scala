package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-dimension
  * data skipping.
  *
  * At 100 TB the scan is the dominant cost, and min/max footer stats only
  * prune files when the data is CLUSTERED on the filter columns. Sorting
  * on (x, y) clusters x but scatters y; interleaving their bits gives
  * every file a bounded range in BOTH dimensions, so a predicate on
  * either column (or both) skips most files — the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * The z-value is pure per-row integer arithmetic (codegen'd, no shuffle,
  * no UDF); the clustering itself is one range repartition + in-partition
  * sort — exactly the shuffle a plain global sort would cost.
  */
object Layout {

  /** Morton-interleave two `bits`-bit dimensions into a 2·bits-bit
    * z-value: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Built from shift/mask/add on longs — exact integer ops every SQL
    * engine reproduces bit-for-bit.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Compact a small-files table: rewrite `src` (a parquet directory) to
    * `dest` in `numFiles` output files, optionally keeping the rows
    * clustered on `sortCols` within each file (so min/max footer stats
    * stay selective after the rewrite — compaction that destroys
    * clustering trades one read problem for another).
    *
    * The small-files problem is the slow killer of streaming/incremental
    * sinks at scale: every micro-batch/partition append adds files, and
    * a 100 TB table read pays per-file open + footer costs. One range
    * repartition (the same shuffle a sort would cost) rewrites the data
    * at the target granularity. Returns the compacted row count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
              dest: String, numFiles: Int,
              sortCols: Seq[String] = Nil): Long = {
    val df = spark.read.parquet(src)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(numFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(numFiles)
    out.write.mode("overwrite").parquet(dest)
    spark.read.parquet(dest).count()
  }

  /** Physically cluster `df` by the z-value of (xCol mod 2^bits,
    * yCol mod 2^bits): range-partition into `numFiles` output partitions,
    * sort within each. Writing the result produces files whose (x, y)
    * min/max envelopes tile the space — the skip-friendly layout.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
                 numFiles: Int): DataFrame = {
    val mod = lit(1L << bits)
    val z = zValue(col(xCol) % mod, col(yCol) % mod, bits).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
