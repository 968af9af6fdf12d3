package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, coalesce, col, count, lit, struct, to_json, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
object Bench {

  /** xxhash64 rejects MapType wherever it appears in the type tree, not just
    * at top level (DataType.existsRecursively is private[spark], hence this).
    */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType      => true
    case a: ArrayType    => containsMap(a.elementType)
    case s: StructType   => s.fields.exists(f => containsMap(f.dataType))
    case _               => false
  }

  /** Materialize EVERY output column, not just the row count: a bare
    * `.count()` lets Catalyst prune unused projections — the JTS union in
    * q_speciesdata and the cosine arithmetic in q_similar_topk are dead
    * code under a count (grouping keys alone fix the row count), so the
    * bench priced the shuffles but not the custom-expression work that is
    * this engine's point. One pass returns (rows, xor-of-row-hashes):
    * bit_xor cannot overflow (sum(xxhash64) throws ARITHMETIC_OVERFLOW
    * under Spark 4's default ANSI mode — xxhash64 is uniform over the full
    * 64-bit range) and is row-order-insensitive, so the checksum is stable
    * across partitionings. Columns containing a MapType ANYWHERE in their
    * type tree (xxhash64 rejects maps even nested in structs/arrays) go
    * through to_json first.
    */
  def materialize(df: DataFrame): (Long, Long) = {
    val cols = df.schema.fields.map { f =>
      if (containsMap(f.dataType)) to_json(col(f.name))
      else col(f.name)
    }
    val row = df
      .agg(count(lit(1)), coalesce(bit_xor(xxhash64(struct(cols: _*))), lit(0L)))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    // deterministic execution order (sorted by name) for reproducible timings
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE in the JSON (rows=-1 + errors entry),
      // never a normal-looking timing (r2: q_speciesdata failed silently)
      val (rows, sum, err) =
        try { val (r, h) = materialize(fn(spark, sfDir)); (r, h, None) }
        catch { case e: Throwable =>
          (-1L, 0L, Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"))
        }
      (name, (System.nanoTime() - t0) / 1e9, rows, sum, err)
    }
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rows = results.map { case (k, _, r, _, _) => s"\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val sums = results.map { case (k, _, _, h, _) => s"\"" + k + "\":" + h }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e)) =>
      "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"checksums":$sums,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
