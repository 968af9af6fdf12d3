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

  test("compact footer stats skip row groups at sf0.1; scattered layout skips none") {
    // r11 verdict: the envelope assertions prove file ranges are disjoint;
    // this proves the thing the 100 TB reader actually pays for — how many
    // parquet ROW GROUPS a mid-range predicate must open, read straight
    // from each footer's min/max statistics (the exact stats any
    // parquet-native engine prunes with).
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    // round-robin scatter = the incremental-sink anti-pattern: every file's
    // [min,max] spans ~the whole key range, so footer stats prune nothing
    li.repartition(24).write.parquet(s"$base/scattered")
    Layout.compact(spark, s"$base/scattered", s"$base/compacted",
      numFiles = 8, sortCols = Seq("l_orderkey"))
    def rowGroupRanges(dir: String): Seq[(Long, Long)] = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles.toSeq
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .flatMap { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val c = b.getColumns.asScala
              .find(_.getPath.toDotString == "l_orderkey").get
            val st = c.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          } finally r.close()
        }
    }
    val Array(kLo, kHi) = li.agg(min(col("l_orderkey")), max(col("l_orderkey")))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    // middle ~10% of the key space — the selective range scan shape
    val qLo = kLo + (kHi - kLo) * 45 / 100
    val qHi = kLo + (kHi - kLo) * 55 / 100
    def mustOpen(rs: Seq[(Long, Long)]) =
      rs.count { case (lo, hi) => hi >= qLo && lo <= qHi }
    val scattered = rowGroupRanges(s"$base/scattered")
    val compacted = rowGroupRanges(s"$base/compacted")
    assert(mustOpen(scattered) === scattered.size,
      "scatter baseline broken: some row group was accidentally selective")
    assert(compacted.nonEmpty)
    assert(mustOpen(compacted) <= math.max(1, compacted.size / 4),
      s"compacted layout must skip >=75% of row groups for a 10% range " +
        s"(opens ${mustOpen(compacted)} of ${compacted.size})")
    // and the pruned layout still returns the identical answer
    val a = spark.read.parquet(s"$base/scattered")
      .filter(col("l_orderkey").between(qLo, qHi)).count()
    val b = spark.read.parquet(s"$base/compacted")
      .filter(col("l_orderkey").between(qLo, qHi)).count()
    assert(a === b && a > 0)
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
