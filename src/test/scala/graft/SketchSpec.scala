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

  test("logLinearQuantile honors its 1/(2k) relative-error contract at several q") {
    import org.apache.spark.sql.expressions.Window
    val v = li.select(col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val sk = graft.operators.Quantile
        .logLinearQuantile(v, Seq("l_returnflag"), "v", q, subBuckets = 16)
      val byFlag = Window.partitionBy(col("l_returnflag"))
      val exact = v
        .withColumn("rn", row_number().over(byFlag.orderBy(col("v"))).cast("long"))
        .withColumn("n2", count(lit(1)).over(byFlag))
        .filter(col("rn") === ceil(lit(q) * col("n2")).cast("long"))
        .select(col("l_returnflag"), col("v").as("exact_v"))
      val rows = sk.join(exact, "l_returnflag")
        .select(col("est"), col("exact_v").cast("double")).collect()
      assert(rows.length === 3)
      for (r <- rows) {
        val (est, ex) = (r.getDouble(0), r.getDouble(1))
        // slot midpoint vs true slot member: ≤ half a slot, relative to
        // the slot's lower edge → 1/(2·16)
        assert(math.abs(est - ex) / ex <= 1.0 / 32 + 1e-12,
          s"q=$q est=$est exact=$ex")
      }
    }
  }

  test("logLinearQuantile is partition-independent") {
    val v = li.select(col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val a = graft.operators.Quantile
      .logLinearQuantile(v, Seq("l_returnflag"), "v", 0.5).collect().toSet
    val b = graft.operators.Quantile
      .logLinearQuantile(v.repartition(7), Seq("l_returnflag"), "v", 0.5)
      .collect().toSet
    assert(a === b)
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
