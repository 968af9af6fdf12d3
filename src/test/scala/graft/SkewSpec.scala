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

  test("saltedJoin output is salt-invariant (two salt values, same rows)") {
    val big = (1 to 500)
      .map(i => ((i % 5).toLong, i.toLong)).toDF("k", "v")
    val small = (0L to 4L).map(k => (k, s"t$k")).toDF("k", "tag")
    def run(salt: Int) =
      Skew.saltedJoin(big, small, "k", carriers = Seq($"v"), salt)
        .as[(Long, Long, String)].collect().sorted.toSeq
    assert(run(4) === run(32))
    assert(run(1) === run(32))
  }

  test("saltedJoin pins shuffled-hash: the replicated side is never broadcast") {
    // The replicated side is built from explode(sequence(...)) — a
    // Generate node with wrecked size estimates. Left to stats, Catalyst
    // can broadcast the ×salt-replicated side, negating the parallelism
    // fix (the r15 sf10 FastSS stall). The hint must hold in the FINAL
    // adaptive plan.
    val big = (1 to 2000).map(i => ((i % 3).toLong, i.toLong)).toDF("k", "v")
    val small = (0L to 2L).map(k => (k, k * 10)).toDF("k", "w")
    val j = Skew.saltedJoin(big, small, "k", Seq($"v"), 8)
      .agg(count(lit(1)).as("n"), sum($"w").as("s"))
    val n = j.collect()(0).getLong(0)
    assert(n === 2000L)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"saltedJoin must execute as a shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the replicated side must not be broadcast:\n$p")
  }

  test("pairJoinSalt sizes from key cardinality and drops to 1 past saturation") {
    val df = spark.range(1).toDF("x")
    val base = math.max(32, spark.sparkContext.defaultParallelism)
    // unknown cardinality: full base factor
    assert(graft.operators.Similarity.pairJoinSalt(df) === base)
    // 16 cells on this box: ceil(16*base/16) = base, capped at base
    assert(graft.operators.Similarity.pairJoinSalt(df, Some(16)) === base)
    // keys already ≥ 16× base: no replication at all
    assert(graft.operators.Similarity.pairJoinSalt(df, Some(16 * base)) === 1)
    // in between: shrinks proportionally
    val mid = graft.operators.Similarity.pairJoinSalt(df, Some(4 * base))
    assert(mid === 4)
  }
}
