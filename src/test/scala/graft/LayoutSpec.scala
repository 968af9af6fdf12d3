package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-interleave arithmetic against hand-computed
  * values, and the physical clustering contract (disjoint per-partition
  * z-ranges, sorted within — the property that makes file-level min/max
  * stats prune on BOTH dimensions).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: x at even positions, y at odd") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (10L, 5L), (1023L, 1023L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    def ref(x: Long, y: Long): Long =
      (0 until 10).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    for ((x, y) <- cases) assert(got((x, y)) === ref(x, y), s"($x,$y)")
    assert(ref(3, 1) === 7L)            // 0b111: x bits at 0,2; y bit at 1
    assert(ref(1023, 1023) === (1L << 20) - 1)
  }

  test("zValue is invertible: even bits recover x, odd bits recover y") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 500).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    def unzip(z: Long): (Long, Long) = {
      var (x, y, i) = (0L, 0L, 0)
      while (i < 10) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (x, y)
    }
    for ((x, y, z) <- got) assert(unzip(z) === ((x, y)), s"z=$z")
  }

  test("compact rewrites a many-file table to the target file count, clustering kept") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val src = s"$base/src"; val dest = s"$base/dest"
    // simulate an incremental sink: 40 tiny appends -> >= 40 part files
    spark.range(0, 2000).select(col("id"), (col("id") % 40).as("k"))
      .repartition(40).write.parquet(src)
    def parts(p: String) = new java.io.File(p).listFiles
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(src) >= 40)
    val n = Layout.compact(spark, src, dest, numFiles = 4, sortCols = Seq("id"))
    assert(n === 2000L)
    assert(parts(dest) === 4, s"expected 4 compacted files, got ${parts(dest)}")
    // clustering: each output file covers a disjoint id range (footer
    // stats stay selective) — check via per-file min/max
    val ranges = spark.read.parquet(dest)
      .select(col("id"), input_file_name().as("f"))
      .groupBy(col("f")).agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "file id-ranges overlap")
      case _ =>
    }
  }

  test("clusterByZ yields disjoint, sorted z-ranges per partition") {
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val clustered = Layout.clusterByZ(df, "x", "y", 6, numFiles = 8)
    val zs = clustered
      .select(Layout.zValue(col("x") % 64, col("y") % 64, 6).as("z"))
      .select(spark_partition_id().as("pid"), col("z"))
      .as[(Int, Long)]
    // sorted within each partition…
    val perPart = zs.collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((pid, vs) <- perPart) assert(vs === vs.sorted, s"partition $pid not sorted")
    // …and partition ranges do not overlap (range partitioning)
    val ranges = perPart.values.map(vs => (vs.min, vs.max)).toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, "partition z-ranges overlap")
      case _ =>
    }
  }
}
