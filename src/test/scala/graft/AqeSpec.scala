package graft

/** AQE at BENCH SCALE (r11 verdict #5): the 100 TB story leans on adaptive
  * coalesce + skew-join re-planning, previously proven only on SkewSpec's
  * synthetic lowered-threshold fixture. Here: real graded queries at
  * sf0.1, run twice — once under the default session, once under a child
  * session with AQE coalesce+skew forced ON and activation thresholds
  * lowered far enough that re-planning actually fires at this SF — and
  * the Bench.materialize (rows, order-insensitive checksum) pair must be
  * BIT-IDENTICAL. That is the property that makes runtime re-partitioning
  * safe to lean on: results cannot depend on how AQE re-split or merged
  * the shuffles.
  *
  * Query choice: q_salted_join (skewed shuffle join + exact integer agg —
  * the skew-split target), q_dissolve_area (decimal-snapped sums over a
  * wide agg — coalesce target), q_sessionize (window over shuffled
  * sessions — partition-order-sensitive if anything is).
  */
class AqeSpec extends SparkSpec {

  test("AQE coalesce+skew ON reproduces bit-identical checksums at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val aqe = spark.newSession()
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    aqe.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    aqe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // a different static partition count on the AQE side: if AQE's
    // re-planning OR the base partitioning leaked into any result, the
    // checksums would diverge twice over
    aqe.conf.set("spark.sql.shuffle.partitions", "13")
    for (name <- Seq("q_salted_join", "q_dissolve_area", "q_sessionize")) {
      val base = Bench.materialize(SparkEntry.queries(name)(spark, dir))
      val adaptive = Bench.materialize(SparkEntry.queries(name)(aqe, dir))
      assert(base === adaptive, s"$name: AQE run diverged from base run")
      assert(base._1 > 0, s"$name: empty result can't prove anything")
    }
  }
}
