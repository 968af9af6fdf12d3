package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate capabilities (HyperLogLog distinct, quantile
  * sketch). These cannot hash-match a cross-engine oracle (sketch
  * internals differ), so they are verified here against the exact
  * aggregates instead — the standard accuracy contract a 100 TB pipeline
  * relies on when exact distinct/percentile would need a full shuffle.
  */
class SketchSpec extends SparkSpec {

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx_count_distinct within 5% of exact") {
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact drift too large")
  }

  test("percentile_approx brackets the exact median") {
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5, 10000)").as("approx")).collect()(0)
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    // accuracy=10000 on ~6k rows: the sketch must land within one
    // quantity unit of the true median
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }
}
