package graft

import org.apache.spark.sql.functions._

/** Round-10 extension queries: brute-force equivalence on sf0.001 where the
  * query has a quadratic ground truth (edit join, BFS, bloom semi-join) and
  * invariant checks where the query is a reshape (unpivot, winsorize,
  * chunk dedup, markov).
  */
class QueriesXSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("qEditDistJoin equals brute-force levenshtein<=1 over all pairs") {
    val got = QueriesX.qEditDistJoin(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("nm"))
    val brute = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.nm"), col("b.nm")) <= 1)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.nm"), col("b.nm")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty) // sequential customer names guarantee distance-1 pairs
  }

  test("qBloomPrefilter equals the exact semi-join (no false negatives survive)") {
    val got = QueriesX.qBloomPrefilter(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val keys = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val exact = orders.join(keys, orders("o_custkey") === keys("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === exact)
    assert(got.nonEmpty)
  }

  test("qBfsDepth matches brute-force path expansion to depth 3") {
    val got = QueriesX.qBfsDepth(spark, sf).as[(Long, Long)].collect().toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val e = li.union(li.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().as[(Long, Long)].collect()
    val adj = e.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    var depth = Map(0L -> 0L)
    var frontier = Set(0L)
    for (d <- 1L to 3L) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(depth.contains)
      depth = depth ++ frontier.map(_ -> d)
    }
    assert(got === depth)
    assert(got(0L) === 0L)
  }

  test("qUnpivot emits one row per (group, metric) and pivots back") {
    val r = QueriesX.qUnpivot(spark, sf)
    val flags = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag").distinct().count()
    assert(r.count() === flags * 3)
    assert(r.columns.toSeq === Seq("l_returnflag", "metric", "value"))
    // melt is lossless: re-pivoting recovers one row per flag with all 3 metrics
    val back = r.groupBy("l_returnflag").pivot("metric").agg(first("value"))
    assert(back.count() === flags)
    assert(back.columns.sorted.toSeq === Seq("disc", "l_returnflag", "price", "qty"))
  }

  test("qChunkDedup: kept <= total, and global distinct chunks == sum of kept") {
    val r = QueriesX.qChunkDedup(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(r.forall { case (_, n, kept) => kept >= 0 && kept <= n })
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val distinctChunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 10)
      .select(explode(transform(
        sequence(lit(0), (size(col("t")) / 10).cast("int") - 1),
        i => array_join(slice(col("t"), i * 10 + 1, lit(10)), " "))).as("c"))
      .distinct().count()
    assert(r.map(_._3).sum === distinctChunks) // each distinct chunk kept exactly once
  }

  test("qMarkov: per-prev probabilities sum to ~1 and counts are conserved") {
    val r = QueriesX.qMarkov(spark, sf)
      .as[(String, String, Long, Double)].collect()
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val nTrans = ev.count() - ev.select("user_id").distinct().count()
    assert(r.map(_._3).sum === nTrans) // one transition per non-final event
  }

  test("qWinsorize matches a collected nearest-rank reference per group") {
    val got = QueriesX.qWinsorize(spark, sf)
      .as[(String, Long, Double)].collect().map(r => (r._1, (r._2, r._3))).toMap
    val byFlag = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect().groupBy(_._1)
    byFlag.foreach { case (flag, rows) =>
      val v = rows.map(_._2).sorted
      val n = v.length
      val lo = v(math.ceil(0.05 * n).toLong.toInt - 1)
      val hi = v(math.ceil(0.95 * n).toLong.toInt - 1)
      val expSum = v.map(x => BigDecimal(math.min(math.max(x, lo), hi))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val (gn, gs) = got(flag)
      assert(gn === n.toLong)
      assert(math.abs(gs - expSum) < 1e-6)
    }
  }
}
