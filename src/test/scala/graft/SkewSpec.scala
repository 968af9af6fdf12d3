package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** The salted join must be output-identical to the plain join — salting
  * changes the plan, never the answer.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join under a hot key") {
    // key 1 is hot: 900 of 1000 rows
    val big = (1 to 1000)
      .map(i => (if (i <= 900) 1L else (i % 7).toLong + 2L, i.toLong))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "tag")
    val plain = big.join(small, "k")
      .groupBy("tag").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val salted = Skew.saltedJoin(big, small, "k",
      carriers = Seq($"v"), saltBuckets = 8)
      .groupBy("tag").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted === plain)
  }

  test("AQE splits the skewed partition at runtime (skew=true in the final plan)") {
    // The OTHER half of the skew story: manual salting (above) is the
    // plan-level fix; AQE's skew-join is the runtime fix. Prove the
    // engine's sessions actually get it: a 90%-hot key under lowered
    // skew thresholds must re-plan the SortMergeJoin with skew=true —
    // i.e. the hot partition is split across tasks instead of funneling
    // through one.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      // enough reducers that the median partition is near-empty next to
      // the hot one (with 2 partitions the median IS the hot partition)
      conf.set("spark.sql.shuffle.partitions", "20")
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 64
      val big = spark.range(200000).select(
        when($"id" < 180000L, 0L).otherwise($"id" % 50L).as("k"),
        concat(lit(pad), $"id".cast("string")).as("v"))
      val dim = spark.range(50).select($"id".as("k"), ($"id" * 10).as("w"))
      // the consumer must not REQUIRE the join's hash distribution (a
      // groupBy(k) right above would pin it and veto the skew split);
      // a global aggregate's partial phase is distribution-free
      val joined = big.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(length($"v")).as("s"))
      // execute THIS DataFrame (head()/as[] would build a separate query
      // and leave joined's own adaptive plan unfinalized)
      val row = joined.collect()(0)
      assert(row.getLong(0) === 200000L)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"))
      assert(p.contains("skew=true"),
        s"AQE must mark the hot-key SortMergeJoin side as skewed:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
