package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-checkpoint data generator: replicates the driver's sf0.1
  * testdata 10× into a NEW directory (never touching /root/testdata) so the
  * 100×-scale claims, currently plan-audit + spec-asserted, get one real 10×
  * datapoint (r12 verdict item 4).
  *
  * Replication semantics — designed so per-query work scales the way a real
  * 10× corpus would, not the way naive copies would:
  *  - Fact/dimension keys are offset per replica by a constant stride wider
  *    than any sf0.1 key, so FK joins keep exactly 10× the matches and key
  *    cardinalities scale 10×. `region`/`nation` stay fixed (true
  *    dimensions; sf-invariant in TPC-H too).
  *  - `events`: user_id/event_id offset per replica; `ts` KEPT — the day
  *    span is workload shape (windows, retention, seasonality), so 10× data
  *    = 10× users over the same calendar, which is how traffic grows.
  *  - `documents`: text tokens are SALTED per replica (`tok` → `tok_rN`).
  *    Verbatim copies would make every doc a 10-way exact/near duplicate
  *    and near-dup pair output would grow quadratically in the replication
  *    factor — a misleading scale test. Salting keeps each replica's
  *    shingle space disjoint, so dedup/similarity candidate structure
  *    mirrors sf0.1 per replica and output scales ~linearly, like a real
  *    larger crawl. Replica 0 is byte-identical to sf0.1.
  *  - `embeddings`: each replica r > 0 mixes in a neighbor coordinate,
  *    v'ᵢ = vᵢ + 0.03·r·v₍ᵢ₊₁ mod d₎ — deterministic, cheap, and NOT a pure
  *    scaling (cosine would be invariant under scaling), so replicas are
  *    distinct points rather than exact-tie neighbors.
  *
  * Usage: `runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/testdata_sf1 10`
  */
object ScaleUp {

  private val Stride = 100000000L // > any sf0.1 key

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // replica index column; cross join against a literal range
    val r = spark.range(reps).select(col("id").as("rep"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(r))
    def offE(c: String) = col(c) + col("rep") * Stride
    def off(c: String) = offE(c).as(c)

    // Write each table as MANY part files sized ~64 MB: a real 100 TB
    // corpus arrives as thousands of files, and parquet splits at ROW-GROUP
    // granularity — the r15 sf10 layout wrote `documents` as ONE 78 MB
    // file/row group, so every scan-bound query ran its whole scan stage in
    // ONE task regardless of spark.sql.files.maxPartitionBytes (measured
    // 2/32 cores busy in the r16 verify slice). Part count is derived from
    // source bytes × replication so the layout stays honest at any reps.
    def write(df: DataFrame, name: String): Unit = {
      val srcBytes = {
        val p = java.nio.file.Paths.get(s"$src/$name.parquet")
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).mapToLong(java.nio.file.Files.size).sum()
        else java.nio.file.Files.size(p)
      }
      // CPU-bound scans (shingling, hashing) need ≥1 task per core even
      // when the bytes are small, so any table whose replicated size
      // clears 8 MB gets at least 32 parts; beyond that, ~32 MB per part.
      val est = srcBytes * reps
      val parts =
        if (est < (8L << 20)) 1
        else math.max(32, math.min(512, (est / (32L << 20)).toInt))
      df.drop("rep").repartition(parts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"SCALEUP $name parts=$parts rows=" +
        spark.read.parquet(s"$dst/$name.parquet").count())
    }

    // pure dimensions: copy as-is
    write(t("region"), "region")
    write(t("nation"), "nation")

    // c_name/s_name are derived re-renderings of the key ('Customer#%09d');
    // verbatim copies would put 10 identical names in every string-identity
    // block (edit-distance variants, linkage) and square the join products —
    // the r13 sf1 probe measured q_edit_dist_join at 81× before this fix.
    // lpad TRUNCATES strings longer than the pad width — at reps >= 10 the
    // offset keys go 10-digit and lpad(.., 9) silently cut them back to
    // their first 9 chars, giving ~11 customers per name: exactly the
    // string-identity duplicate blocks this re-rendering exists to avoid
    // (the r15 sf10 bench measured q_edit_dist_join's candidate mass at
    // ~1B pairs from those blocks). Pad only when padding is needed.
    def render(prefix: String, key: Column): Column = {
      val s = key.cast("string")
      concat(lit(prefix), when(length(s) <= 9, lpad(s, 9, "0")).otherwise(s))
    }
    write(rep(t("customer")).select(off("c_custkey"),
      render("Customer#", offE("c_custkey")).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"), col("rep")),
      "customer")
    write(rep(t("supplier")).select(off("s_suppkey"),
      render("Supplier#", offE("s_suppkey")).as("s_name"),
      col("s_nationkey"), col("s_acctbal"), col("rep")), "supplier")
    write(rep(t("part")).select(off("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"), col("rep")), "part")
    write(rep(t("orders")).select(off("o_orderkey"), off("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"), col("rep")), "orders")
    write(rep(t("lineitem")).select(off("l_orderkey"), off("l_partkey"),
      off("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate"), col("rep")),
      "lineitem")
    write(rep(t("events")).select(off("event_id"), col("ts"), off("user_id"),
      col("event_type"), col("value"), col("props"), col("rep")), "events")

    write(rep(t("documents")).select(off("doc_id"),
      when(col("rep") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          tok => concat(tok, lit("_r"), col("rep"))), " ")).as("text"),
      col("lang"), col("source"), col("n_chars"), col("rep")), "documents")

    write(rep(t("embeddings")).select(off("vec_id"),
      when(col("rep") === 0, col("embedding")).otherwise(
        zip_with(col("embedding"),
          // neighbor-rotated copy: slice(arr,2,n-1) ++ [head]
          concat(slice(col("embedding"), lit(2), size(col("embedding")) - 1),
            slice(col("embedding"), 1, 1)),
          (v, w) => (v + lit(0.03f) * col("rep").cast("float") * w).cast("float")))
        .as("embedding"),
      col("label"), col("rep")), "embeddings")

    spark.stop()
    println(s"SCALEUP done -> $dst")
  }
}
