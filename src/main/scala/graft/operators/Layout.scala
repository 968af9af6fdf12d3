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
