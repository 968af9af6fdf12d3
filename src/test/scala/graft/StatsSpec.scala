package graft

import graft.operators.Stats

/** Exact-arithmetic correlation: textbook values on crafted data and
  * bit-determinism across partitionings (the whole point of carrying the
  * moment sums as longs).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("corrExact hits ±1 (to sqrt rounding) on perfectly (anti)correlated columns") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 30L), ("b", 2L, 20L), ("b", 3L, 10L))
      .toDF("g", "x", "y")
    val r = Stats.corrExact(df, Seq("g"), "x", "y")
      .select("g", "corr").as[(String, Double)].collect().toMap
    // the moment sums are exact; the only slack is √a·√b ≈ √(ab) (1 ulp)
    assert(math.abs(r("a") - 1.0) < 1e-15)   // y = 2x
    assert(math.abs(r("b") + 1.0) < 1e-15)   // y = 40 - 10x
  }

  test("corrExact stays within [-1, 1] on random integer data") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map { i =>
      (s"g${i % 8}", rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)
    }
    val r = Stats.corrExact(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .select("corr").as[Double].collect()
    assert(r.length === 8)
    for (c <- r) assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr=$c")
  }

  test("corrExact matches the closed form and is partition-independent") {
    val rows = (1 to 97).map(i => ("g", i.toLong, ((i * 7919) % 101).toLong))
    val a = Stats.corrExact(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .select("corr").as[Double].head()
    val b = Stats.corrExact(rows.toDF("g", "x", "y").repartition(7), Seq("g"), "x", "y")
      .select("corr").as[Double].head()
    assert(a === b, "float last-bits leaked partition layout")
    val n = rows.size.toDouble
    val (sx, sy) = (rows.map(_._2).sum.toDouble, rows.map(_._3).sum.toDouble)
    val sxx = rows.map(r => r._2 * r._2).sum.toDouble
    val syy = rows.map(r => r._3 * r._3).sum.toDouble
    val sxy = rows.map(r => r._2 * r._3).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(a - expected) < 1e-12)
  }
}
