package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geom
import graft.operators.{Contiguity, Raster}
import graft.sources.EsriAsciiGrid

/** Reference-shaped query surface (SURVEY.md §2.1): every operator of
  * species_range_etl.py re-expressed over the shared testdata tables, each
  * paired with ANSI SQL the DuckDB oracle replays bit-for-bit.
  *
  * Determinism rules used throughout (oracle hash-compares values):
  * - double sums -> DECIMAL casts internally (exact, associative), then a
  *   final cast to DOUBLE on BOTH sides. Never emit a DECIMAL output
  *   column: the driver's hash renders Decimal('252685.00') differently
  *   from 252685.0, so scale-2 values with trailing zeros hash-mismatch
  *   even when value-equal (r3: 8 queries). The decimal sum is exact, so
  *   the double conversion is bit-identical in Spark and DuckDB;
  * - surrogate keys -> row_number over an explicit total order;
  * - double divisions/folds -> identical operand order in both engines;
  * - int-typed scalars (year/month/row_number/least) cast to BIGINT —
  *   the driver's hash is type-sensitive as well as render-sensitive.
  */
object QueriesCore {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.util.Tables.parquet(s, s"$dir/$name.parquet") // cached RELATION (plan), not data — see Tables

  // ---- O-1/O-6: catalog scan + projection (species_range_etl.py:36-45) ----
  def qCatalogProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(col("p_name").as("hyphenated_name"))

  val oCatalogProject = "SELECT p_name AS hyphenated_name FROM part"

  // ---- O-7: threshold predicate `prob >= t` (species_range_etl.py:101,123) ----
  def qThresholdFilter(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .withColumn("prob", col("l_quantity") / 50)
    Raster.thresholdFilter(cells, "prob", 0.5)
      .select(col("l_orderkey"), col("l_linenumber"), col("prob"))
  }

  val oThresholdFilter =
    """SELECT l_orderkey, l_linenumber, l_quantity / 50 AS prob
      |FROM lineitem WHERE l_quantity / 50 >= 0.5""".stripMargin

  // ---- O-8: filename-metadata extraction (species_range_etl.py:188-198) ----
  // Filenames are synthesized deterministically from `part`, then parsed by
  // the engine's parser — both branches (`current` defaults vs full tokens).
  def qMetaExtract(s: SparkSession, dir: String): DataFrame = {
    val thresholdTok = (lit(25) + (col("p_partkey") % 3) * 25).cast("string")
    val fname = when(col("p_partkey") % 2 === 0,
      concat(thresholdTok, lit("_current.shp")))
      .otherwise(concat(
        thresholdTok, lit("_"),
        lower(regexp_replace(col("p_brand"), "#", "")), lit("_rcp"),
        (lit(45) + (col("p_partkey") % 3) * 20).cast("string"), lit("_y"),
        (lit(2030) + (col("p_partkey") % 4) * 20).cast("string"), lit(".shp")))
    val df = t(s, dir, "part").select(col("p_partkey"), fname.as("fname"))
    val (threshold, source, scenario, year) = Raster.parseRasterFilename(col("fname"))
    df.select(col("p_partkey"), col("fname"), threshold.as("threshold"),
      source.as("source"), scenario.as("scenario"), year.as("year"))
  }

  val oMetaExtract =
    """WITH f AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 2 = 0
      |      THEN CAST(25 + (p_partkey % 3) * 25 AS VARCHAR) || '_current.shp'
      |      ELSE CAST(25 + (p_partkey % 3) * 25 AS VARCHAR) || '_' ||
      |           lower(replace(p_brand, '#', '')) || '_rcp' ||
      |           CAST(45 + (p_partkey % 3) * 20 AS VARCHAR) || '_y' ||
      |           CAST(2030 + (p_partkey % 4) * 20 AS VARCHAR) || '.shp'
      |    END AS fname
      |  FROM part),
      |p AS (SELECT p_partkey, fname,
      |        string_split(regexp_replace(fname, '\.[A-Za-z]+$', ''), '_') AS toks
      |      FROM f)
      |SELECT p_partkey, fname, toks[1] AS threshold,
      |  CASE WHEN toks[2] = 'current' THEN 'vtech' ELSE toks[2] END AS source,
      |  CASE WHEN toks[2] = 'current' THEN 'current' ELSE toks[3] END AS scenario,
      |  CASE WHEN toks[2] = 'current' THEN '2020'
      |       ELSE regexp_replace(toks[4], '^y', '') END AS year
      |FROM p""".stripMargin

  // ---- O-2: HTML link extraction (species_range_etl.py:142-154) —
  //      deterministic HTML synthesized from `part`, then the engine's
  //      block-explode + regexp parser pulls (scenario, zip_url) exactly
  //      like the reference's BeautifulSoup selector ----
  def qHtmlLinks(s: SparkSession, dir: String): DataFrame = {
    val base = lower(regexp_replace(col("p_name"), " ", "-"))
    def grp(scen: String) = concat(
      lit("<div class=\"thumbnail-file-group\"><h4>" + scen +
        "</h4><ul><li><a href=\"page.html\">page</a></li><li><a href=\""),
      base, lit(s"_$scen.zip\">zip</a></li></ul></div>"))
    val pages = t(s, dir, "part")
      .select(col("p_partkey"), concat(grp("current"), grp("rcp45")).as("html"))
    Raster.htmlLinks(pages, "p_partkey", "html")
  }

  val oHtmlLinks =
    """WITH pages AS (
      |  SELECT p_partkey,
      |    '<div class="thumbnail-file-group"><h4>current</h4><ul><li><a href="page.html">page</a></li><li><a href="'
      |      || lower(replace(p_name, ' ', '-')) || '_current.zip">zip</a></li></ul></div>'
      |      || '<div class="thumbnail-file-group"><h4>rcp45</h4><ul><li><a href="page.html">page</a></li><li><a href="'
      |      || lower(replace(p_name, ' ', '-')) || '_rcp45.zip">zip</a></li></ul></div>' AS html
      |  FROM part),
      |b AS (SELECT p_partkey,
      |        unnest(regexp_extract_all(html, '<div class="thumbnail-file-group">(.*?)</div>', 1)) AS block
      |      FROM pages)
      |SELECT p_partkey, regexp_extract(block, '<h4>([^<]*)</h4>', 1) AS scenario,
      |  regexp_extract_all(block, 'href="([^"]*)"', 1)[2] AS zip_url
      |FROM b""".stripMargin

  // ---- O-3: zip member prefix routing (species_range_etl.py:163-169) ----
  def qZipRoute(s: SparkSession, dir: String): DataFrame = {
    val species = lower(regexp_replace(col("p_name"), " ", "-"))
    val member = when(col("p_partkey") % 3 === 0, concat(species, lit("_grid.txt")))
      .when(col("p_partkey") % 3 === 1, lit("extra/readme.txt"))
      .otherwise(concat(lit("grids/"), species, lit(".txt")))
    t(s, dir, "part")
      .select(col("p_partkey"), species.as("species"), member.as("member"))
      .withColumn("dest", Raster.zipMemberRoute(col("member"), col("species")))
  }

  val oZipRoute =
    """WITH m AS (
      |  SELECT p_partkey, lower(replace(p_name, ' ', '-')) AS species,
      |    CASE WHEN p_partkey % 3 = 0 THEN lower(replace(p_name, ' ', '-')) || '_grid.txt'
      |         WHEN p_partkey % 3 = 1 THEN 'extra/readme.txt'
      |         ELSE 'grids/' || lower(replace(p_name, ' ', '-')) || '.txt' END AS member
      |  FROM part)
      |SELECT p_partkey, species, member,
      |  CASE WHEN starts_with(member, species) THEN 'ascii/' || member
      |       ELSE 'ascii/' || species || '/' || member END AS dest
      |FROM m""".stripMargin

  // ---- O-9/O-10/O-13: enrichment + rename + surrogate key
  //      (species_range_etl.py:200-204,210,228) ----
  def qEnrichLiterals(s: SparkSession, dir: String): DataFrame =
    Raster.enrich(t(s, dir, "supplier"),
      lits = Map("source" -> "vtech", "scenario" -> "current"),
      renames = Map("s_name" -> "supplier_name"),
      sidOrder = Seq(col("s_suppkey")), globalSidOrder = true)
      .select("sid", "s_suppkey", "supplier_name", "s_nationkey", "s_acctbal",
        "source", "scenario")

  val oEnrichLiterals =
    """SELECT row_number() OVER (ORDER BY s_suppkey) AS sid, s_suppkey,
      |  s_name AS supplier_name, s_nationkey, s_acctbal,
      |  'vtech' AS source, 'current' AS scenario
      |FROM supplier""".stripMargin

  // ---- O-15 relational half + O-11: dissolve keys + aggregates
  //      (species_range_etl.py:205,227) ----
  def qDissolveArea(s: SparkSession, dir: String): DataFrame =
    Raster.dissolveRelational(
      t(s, dir, "lineitem")
        .withColumnRenamed("l_returnflag", "species")
        .withColumnRenamed("l_linestatus", "scenario"),
      keys = Seq("species", "scenario"),
      aggs = Seq(
        count(lit(1)).as("n_cells"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_price"),
        min(year(col("l_shipdate"))).cast("long").as("min_year")))

  val oDissolveArea =
    """SELECT l_returnflag AS species, l_linestatus AS scenario,
      |  count(*) AS n_cells,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
      |  min(year(l_shipdate)) AS min_year
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  // ---- O-15 first-of-other-columns half: pandas dissolve's default
  //      aggfunc='first' takes non-key columns from the group's FIRST row
  //      in file order (species_range_etl.py:205). File order does not
  //      exist in a distributed engine, so the engine pins "first" to an
  //      EXPLICIT total order — min_by over (l_orderkey, l_linenumber),
  //      unique per lineitem row — making the tie-break deterministic
  //      across partitionings. Non-key columns here genuinely differ
  //      within every group, so a wrong/unstable tie-break cannot
  //      hash-match the oracle (r11 verdict ask). One map-side-folded
  //      hash agg, no window. ----
  def qDissolveFirst(s: SparkSession, dir: String): DataFrame =
    Raster.dissolveRelational(
      t(s, dir, "lineitem").withColumnRenamed("l_returnflag", "species"),
      keys = Seq("species"),
      aggs = Seq(
        min_by(
          struct(col("l_suppkey"), col("l_quantity"), col("l_shipdate")),
          // (orderkey, linenumber) packed into one BIGINT (linenumber is
          // 1..7 < 8) — same total order, and the oracle's arg_min needs
          // a scalar ordering key
          col("l_orderkey") * 8 + col("l_linenumber")).as("_f"),
        count(lit(1)).as("n_rows")))
      .select(col("species"),
        col("_f.l_suppkey").as("first_suppkey"),
        col("_f.l_quantity").cast("double").as("first_qty"),
        date_format(col("_f.l_shipdate"), "yyyy-MM-dd").as("first_shipdate"),
        col("n_rows"))

  val oDissolveFirst =
    """SELECT l_returnflag AS species,
      |  arg_min(l_suppkey, l_orderkey * 8 + l_linenumber) AS first_suppkey,
      |  CAST(arg_min(l_quantity, l_orderkey * 8 + l_linenumber) AS DOUBLE) AS first_qty,
      |  strftime(arg_min(l_shipdate, l_orderkey * 8 + l_linenumber), '%Y-%m-%d') AS first_shipdate,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- O-17/O-18: union-all + empty-input handling
  //      (species_range_etl.py:208-223) ----
  def qUnionAll(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    Raster.unionAll(Seq(
      c.select(col("c_name").as("name"), lit("customer").as("src")),
      t(s, dir, "supplier").select(col("s_name").as("name"), lit("supplier").as("src")),
      // species with no data contribute zero rows (species_range_etl.py:183-185)
      c.filter(col("c_custkey") < 0)
        .select(col("c_name").as("name"), lit("ghost").as("src"))))
  }

  val oUnionAll =
    """SELECT c_name AS name, 'customer' AS src FROM customer
      |UNION ALL SELECT s_name, 'supplier' FROM supplier
      |UNION ALL SELECT c_name, 'ghost' FROM customer WHERE c_custkey < 0""".stripMargin

  // ---- O-19: incremental skip-if-exists as anti-join
  //      (species_range_etl.py:54-57,64-69,118-120) ----
  def qIncrementalAntijoin(s: SparkSession, dir: String): DataFrame =
    Raster.incrementalAntiJoin(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
      t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey")),
      keys = Seq("o_orderkey"))

  val oIncrementalAntijoin =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin

  // ---- O-7 ×3: all thresholds in one scan (species_range_etl.py:101) ----
  def qThresholdCrossjoin(s: SparkSession, dir: String): DataFrame =
    Raster.thresholdExplode(
      t(s, dir, "lineitem").withColumn("prob", col("l_quantity") / 50),
      "prob", Seq(0.25, 0.5, 0.75))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))

  val oThresholdCrossjoin =
    """SELECT t.threshold, count(*) AS n_cells,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem, (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS threshold) t
      |WHERE l_quantity / 50 >= t.threshold GROUP BY 1""".stripMargin

  // ---- O-14: year cast (species_range_etl.py:226) ----
  def qYearCast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("order_year"),
      month(col("o_orderdate")).cast("long").as("order_month"),
      year(col("o_orderdate")).cast("string").as("year_str"))

  val oYearCast =
    """SELECT o_orderkey, year(o_orderdate) AS order_year,
      |  month(o_orderdate) AS order_month,
      |  CAST(year(o_orderdate) AS VARCHAR) AS year_str
      |FROM orders""".stripMargin

  // ---- beyond-reference relational breadth: join + agg over the star
  //      schema (broadcast dims — no shuffle for nation/region) ----
  def qJoinEnrich(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(15,2)")).cast("double").as("sum_total"))

  val oJoinEnrich =
    """SELECT r_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_total
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1""".stripMargin

  // ---- window functions: rank + running total per customer ----
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(w).cast("long").as("rn"),
      sum(col("o_totalprice").cast("decimal(15,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double").as("running"))
  }

  val oWindowRank =
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER w AS rn,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(15,2)))
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ---- grouping sets: rollup ----
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))

  val oRollup =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ---- grouping sets: full cube + grouping_id (bit order: first cube
  //      column = MSB, identical in Spark and DuckDB GROUPING()) ----
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        grouping_id().cast("long").as("gid"))

  val oCube =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ---- pivot: wide conditional aggregation over a fixed value set ----
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")))
      .select(col("l_returnflag"),
        col("F").cast("double").as("qty_f"),
        col("O").cast("double").as("qty_o"))

  val oPivot =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
      |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- bucketed co-located join: both sides written bucketBy the join
  //      key, so the SortMergeJoin needs NO exchange on either side — the
  //      100 TB recipe for repeated fact-fact joins (shuffle paid once at
  //      write time, amortized over every subsequent join) ----
  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val bdir = "/root/repo/.bucketed"
    // repartition by the bucket column BEFORE the bucketed write: the
    // writer hashes rows to buckets with the same Murmur3 the exchange
    // uses, so each task then holds exactly one bucket — 16 parallel
    // write tasks and ONE file per bucket, where the unpartitioned write
    // ran at scan parallelism with every task opening all 16 bucket
    // files (16× the file count for the join to read back) (r16)
    t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
      .repartition(16, col("o_orderkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$bdir/orders").saveAsTable("graft_bucketed_orders")
    t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      .repartition(16, col("l_orderkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$bdir/lineitem").saveAsTable("graft_bucketed_lineitem")
    s.table("graft_bucketed_orders")
      .join(s.table("graft_bucketed_lineitem").hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
  }

  val oBucketedJoin =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1""".stripMargin

  // ---- SQL text interface: the same engine driven entirely from SQL —
  //      temp view + a graft custom function (char_ngrams) inside the
  //      predicate, planned by Catalyst like any built-in ----
  def qSqlText(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_v")
    GraftFunctions.registerAll(s)
    // 4-grams on p_name with threshold 7: selects ~40% of rows at sf0.01,
    // and the DISTINCT-gram count genuinely varies (4..9), so the custom
    // function's dedup semantics are exercised. (r3 used 8-grams on p_type
    // >= 15, which matched ZERO rows at every SF — a vacuously green row.)
    s.sql(
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM part_v
        |WHERE size(char_ngrams(p_name, 4)) >= 7
        |GROUP BY p_brand""".stripMargin)
  }

  val oSqlText =
    """SELECT p_brand, count(*) AS n,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM part
      |WHERE len(list_distinct(list_transform(
      |    range(1, length(p_name) - 2),
      |    i -> substr(p_name, CAST(i AS INT), 4)))) >= 7
      |GROUP BY p_brand""".stripMargin

  // ---- top-k: global sort + limit ----
  def qTopk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  val oTopk =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---- data-profile: per-column counts/nulls/distincts/min/max in ONE
  //      pass (multi-countDistinct via Expand + unpivot via stack) — the
  //      validation step a pipeline runs before/after every rebuild.
  //      Exact distincts are the graded contract; at 100 TB swap in
  //      approx_count_distinct (HLL++) — one Expand branch per column is
  //      the cost either way. min/max computed on the NATIVE type, cast
  //      to string only for the unpivoted output (lexicographic min of a
  //      string-cast would order '10' < '9'). Doubles/timestamps excluded:
  //      their string renderings are engine-specific. ----
  private val ProfileCols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")

  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "lineitem")
    // counts + min/max: ONE narrow agg, no distincts (a multi-
    // countDistinct in the same agg plans an Expand that replicates
    // every row once per column — 6× the scan width; measured 10 s at
    // sf0.1 vs ~2 s for this split formulation)
    val aggs = ProfileCols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__nn"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val stackArgs = ProfileCols
      .map(c => s"'$c', `${c}__nn`, `${c}__mn`, `${c}__mx`")
      .mkString(", ")
    val basic = df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(col("__n").as("n_rows"),
        expr(s"stack(${ProfileCols.size}, $stackArgs) AS " +
          "(col_name, n_non_null, min_val, max_val)"))
    // distincts: unpivot to narrow (col_name, value) rows — the string
    // cast is injective for the profiled long/string columns, so the
    // distinct count is the native one; one hash-partitioned exchange,
    // no Expand over full-width rows
    val distArgs = ProfileCols
      .map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    val dist = df
      .select(expr(s"stack(${ProfileCols.size}, $distArgs) AS (col_name, v)"))
      .groupBy(col("col_name"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    basic.join(broadcast(dist), Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_non_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  val oProfile: String = ProfileCols.map { c =>
    s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count($c) AS BIGINT) AS n_non_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_val,
       |  CAST(max($c) AS VARCHAR) AS max_val FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ---- exact group median (percentile interpolation) — the dynamic-
  //      threshold statistic quality filters cut on. Exact percentile
  //      buffers each group's values (groups here are the 3 return
  //      flags); the 100 TB path for high-cardinality groups is
  //      approx_percentile's t-digest, same plan shape. ----
  def qGroupMedian(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.25)").as("q1_qty"),
        count(lit(1)).as("n"))

  val oGroupMedian: String =
    """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_quantity, 0.25) AS q1_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- quantile SKETCH vs exact (the q_ann_recall pattern: grade the
  //      measurement): the log-linear histogram median per return flag,
  //      joined to the exact nearest-rank value, with the sketch's
  //      relative-error contract as a graded boolean. The sketch side is
  //      the 100 TB path q_group_median's doc note promises (one
  //      (group, slot) hash agg, no per-group value buffering); the
  //      exact side is the measurement, not the scale path. Money scales
  //      to integer cents so bucketing is exact integer math on both
  //      engines. ----
  // ---- quantile-sketch mergeability: per-flag slot histograms summed
  //      into a global sketch, graded EQUAL to the direct global sketch —
  //      the precomputed-slice-union quantile path (q_hll_union's twin
  //      for percentiles) ----
  def qQuantileUnion(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quantile
    val v = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val perFlag = Quantile.slotHistogram(v, Seq("l_returnflag"), "v", 16)
    val merged = perFlag.groupBy(col("e"), col("sub"))
      .agg(sum(col("cnt")).as("cnt"))
    val estMerged = Quantile.quantileFromSlots(merged, Nil, q = 0.5, 16)
      .select(col("n"), col("est").as("est_merged"))
    val estDirect = Quantile
      .logLinearQuantile(v.select(col("v")), Nil, "v", q = 0.5, 16)
      .select(col("est").as("est_direct"))
    estMerged.crossJoin(estDirect)
      .select(col("n"), col("est_merged"), col("est_direct"),
        (col("est_merged") === col("est_direct")).as("merge_lossless"))
  }

  val oQuantileUnion: String =
    """WITH v AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
      |b AS (
      |  SELECT grp, v, CAST(length(bin(v)) - 1 AS INTEGER) AS e FROM v),
      |b2 AS (
      |  SELECT grp, e, ((v - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS sub
      |  FROM b),
      |c AS (SELECT grp, e, sub, CAST(count(*) AS BIGINT) AS cnt
      |      FROM b2 GROUP BY 1, 2, 3),
      |m AS (SELECT e, sub, CAST(sum(cnt) AS BIGINT) AS cnt FROM c GROUP BY 1, 2),
      |d AS (SELECT e, sub, CAST(count(*) AS BIGINT) AS cnt FROM b2 GROUP BY 1, 2),
      |em AS (
      |  SELECT n,
      |    CAST((1::BIGINT << e) AS DOUBLE)
      |      * (1.0::DOUBLE + (CAST(sub AS DOUBLE) + 0.5::DOUBLE) / 16.0::DOUBLE)
      |      AS est
      |  FROM (
      |    SELECT e, sub, cnt,
      |      CAST(sum(cnt) OVER (ORDER BY e, sub) AS BIGINT) AS cum,
      |      CAST(sum(cnt) OVER () AS BIGINT) AS n
      |    FROM m)
      |  WHERE cum >= CAST(ceil(0.5::DOUBLE * n) AS BIGINT)
      |    AND cum - cnt < CAST(ceil(0.5::DOUBLE * n) AS BIGINT)),
      |ed AS (
      |  SELECT
      |    CAST((1::BIGINT << e) AS DOUBLE)
      |      * (1.0::DOUBLE + (CAST(sub AS DOUBLE) + 0.5::DOUBLE) / 16.0::DOUBLE)
      |      AS est
      |  FROM (
      |    SELECT e, sub, cnt,
      |      CAST(sum(cnt) OVER (ORDER BY e, sub) AS BIGINT) AS cum,
      |      CAST(sum(cnt) OVER () AS BIGINT) AS n
      |    FROM d)
      |  WHERE cum >= CAST(ceil(0.5::DOUBLE * n) AS BIGINT)
      |    AND cum - cnt < CAST(ceil(0.5::DOUBLE * n) AS BIGINT))
      |SELECT em.n, em.est AS est_merged, ed.est AS est_direct,
      |  em.est = ed.est AS merge_lossless
      |FROM em CROSS JOIN ed""".stripMargin

  def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val sk = graft.operators.Quantile
      .logLinearQuantile(v, Seq("l_returnflag"), "v", q = 0.5, subBuckets = 16)
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val exact = v
      .withColumn("rn", row_number().over(byFlag.orderBy(col("v"))).cast("long"))
      .withColumn("n2", count(lit(1)).over(byFlag))
      .filter(col("rn") === ceil(lit(0.5) * col("n2")).cast("long"))
      .select(col("l_returnflag"), (col("v").cast("double") / lit(100.0)).as("exact"))
    sk.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        (col("est") / lit(100.0)).as("est"), col("exact"),
        (abs(col("est") / lit(100.0) - col("exact")) / col("exact") <= lit(0.0625))
          .as("within_bound"))
  }

  val oQuantileSketch: String =
    """WITH v AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
      |b AS (
      |  SELECT grp, v, CAST(length(bin(v)) - 1 AS INTEGER) AS e FROM v),
      |b2 AS (
      |  SELECT grp, e, ((v - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS sub
      |  FROM b),
      |c AS (SELECT grp, e, sub, CAST(count(*) AS BIGINT) AS cnt
      |      FROM b2 GROUP BY 1, 2, 3),
      |cum AS (
      |  SELECT grp, e, sub, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY e, sub) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
      |  FROM c),
      |pick AS (
      |  SELECT grp, n, e, sub FROM cum
      |  WHERE cum >= CAST(ceil(0.5::DOUBLE * n) AS BIGINT)
      |    AND cum - cnt < CAST(ceil(0.5::DOUBLE * n) AS BIGINT)),
      |est AS (
      |  SELECT grp, n,
      |    CAST((1::BIGINT << e) AS DOUBLE)
      |      * (1.0::DOUBLE + (CAST(sub AS DOUBLE) + 0.5::DOUBLE) / 16.0::DOUBLE)
      |      AS estc
      |  FROM pick),
      |ex AS (
      |  SELECT grp, CAST(v AS DOUBLE) / 100.0::DOUBLE AS exact FROM (
      |    SELECT grp, v,
      |      CAST(row_number() OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS rn,
      |      CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n2
      |    FROM v) WHERE rn = CAST(ceil(0.5::DOUBLE * n2) AS BIGINT))
      |SELECT e.grp AS l_returnflag, e.n, e.estc / 100.0::DOUBLE AS est,
      |  x.exact,
      |  abs(e.estc / 100.0::DOUBLE - x.exact) / x.exact <= 0.0625::DOUBLE
      |    AS within_bound
      |FROM est e JOIN ex x ON e.grp = x.grp""".stripMargin

  // ---- constraint checks: declarative data-quality rules evaluated in
  //      one conditional-sum pass (plus a distinct-count branch for the
  //      uniqueness rule) — the validation gate a pipeline runs on every
  //      ingest; output is (rule, n_violations) ----
  def qConstraints(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "lineitem")
    val scalarRules = df.agg(
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("r_qty_range"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("r_orderkey_null"),
        sum(when(!col("l_discount").between(0.0, 0.1), 1L).otherwise(0L)).as("r_discount_range"))
      .select(expr("stack(3, 'qty_range', r_qty_range, " +
        "'orderkey_null', r_orderkey_null, " +
        "'discount_range', r_discount_range) AS (rule, n_violations)"))
    val unique = df.agg((count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber"))).as("n_violations"))
      .select(lit("line_key_unique").as("rule"), col("n_violations"))
    scalarRules.unionByName(unique)
  }

  val oConstraints: String =
    """SELECT 'qty_range' AS rule, CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
      |  THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM lineitem
      |UNION ALL
      |SELECT 'orderkey_null', CAST(sum(CASE WHEN l_orderkey IS NULL
      |  THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |UNION ALL
      |SELECT 'discount_range', CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1)
      |  THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |UNION ALL
      |SELECT 'line_key_unique', CAST(count(*) AS BIGINT)
      |  - (SELECT CAST(count(*) AS BIGINT) FROM
      |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
      |FROM lineitem""".stripMargin

  // ---- explicit GROUPING SETS (the general form rollup/cube are sugar
  //      for): a hand-picked lattice — (flag, status), (flag), and the
  //      grand total, skipping the (status) slice a cube would pay for ----
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM li_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |""".stripMargin)
  }

  val oGroupingSets: String =
    """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** Scratch workspace for write→read round-trip queries: a session-scoped
    * directory under the Hadoop-RESOLVED warehouse path (shared storage on
    * a real cluster, unlike the driver's java.io.tmpdir, which executors
    * on other nodes cannot see), torn down eagerly once the body's result
    * is materialized. The result is collected to local rows first — every
    * round-trip query here returns a handful of rows — so the caller's
    * DataFrame never depends on the deleted files. applicationId keeps
    * concurrent verify/bench sessions from clobbering each other.
    */
  private def withScratch(s: SparkSession, tag: String)
                         (body: String => DataFrame): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      s"graft_${tag}_${s.sparkContext.applicationId}")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    try {
      val df = body(root.toString)
      import scala.jdk.CollectionConverters._
      // hard bound on the driver collect: round-trip queries return a
      // handful of rows by design, and this assert keeps a future
      // round-trip over a REAL table from silently becoming an unbounded
      // driver materialization (r11 verdict). limit(N+1) bounds the fetch
      // itself, so even the failing case never ships more than N+1 rows.
      val maxRows = 10000
      val rows = df.limit(maxRows + 1).collect()
      require(rows.length <= maxRows,
        s"withScratch($tag): round-trip result exceeds $maxRows rows — " +
          "this helper is for small write->read proofs, not table-sized " +
          "round trips; stream the result instead of collecting it")
      s.createDataFrame(rows.toSeq.asJava, df.schema)
    } finally fs.delete(root, true)
  }

  // ---- delimited-text round trip (the O-1 TSV source's sink
  //      complement): quotes, embedded commas and nulls survive a
  //      write -> read cycle through Spark's CSV codec; graded against
  //      golden VALUES like the shapefile round trip ----
  def qCsvRoundtrip(s: SparkSession, dir: String): DataFrame = withScratch(s, "csv_rt") { out =>
    import s.implicits._
    import org.apache.spark.sql.types._
    Seq(
      (1L, "plain", "x"),
      (2L, "has,comma", null.asInstanceOf[String]),
      (3L, "has \"quote\" inside", "y"),
      (4L, "trailing space ", "z")
    ).toDF("id", "val", "opt")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true")
      // BOTH sides of the codec default to whitespace-trimming — the
      // writer would silently eat the trailing space before the reader
      // ever saw it
      .option("ignoreTrailingWhiteSpace", "false")
      .option("ignoreLeadingWhiteSpace", "false")
      .csv(out)
    s.read
      .option("header", "true")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("ignoreLeadingWhiteSpace", "false")
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("val", StringType),
        StructField("opt", StringType))))
      .csv(out)
  }

  val oCsvRoundtrip: String =
    """SELECT CAST(id AS BIGINT) AS id, val, opt FROM (VALUES
      |  (1, 'plain', 'x'),
      |  (2, 'has,comma', NULL),
      |  (3, 'has "quote" inside', 'y'),
      |  (4, 'trailing space ', 'z')
      |) t(id, val, opt)""".stripMargin

  // ---- ORC roundtrip: the engine's second columnar format (Spark-native
  //      reader/writer) — orders pushed through the ORC codec and
  //      re-aggregated; the oracle computes the same aggregate straight
  //      from parquet, so any value/timestamp/null corruption in the
  //      ORC path hash-mismatches ----
  def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = withScratch(s, "orc_rt") { out =>
    t(s, dir, "orders").write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("sum_price"),
        // NTZ → LTZ cast is wall-clock-preserving under the session's UTC
        // timezone, so unix_micros here equals DuckDB's epoch_us(naive)
        min(unix_micros(col("o_orderdate").cast("timestamp"))).as("min_date_us"),
        max(unix_micros(col("o_orderdate").cast("timestamp"))).as("max_date_us"),
        sum(col("o_orderkey")).cast("long").as("key_sum"))
  }

  val oOrcRoundtrip: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
      |  min(epoch_us(o_orderdate)) AS min_date_us,
      |  max(epoch_us(o_orderdate)) AS max_date_us,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders GROUP BY 1""".stripMargin

  // ---- JSON-lines round trip: the third text format (after CSV/TSV) —
  //      nested arrays, dropped-null fields, embedded quotes, and
  //      non-ASCII survive write → schema-inferred read. Golden VALUES
  //      like the CSV round trip ----
  def qJsonRoundtrip(s: SparkSession, dir: String): DataFrame =
    withScratch(s, "json_rt") { out =>
      import s.implicits._
      Seq(
        (1L, "plain", Seq(1L, 2L, 3L), "x"),
        (2L, "empty list", Seq.empty[Long], null.asInstanceOf[String]),
        (3L, "has \"quote\"", Seq(7L), "unicode ✓")
      ).toDF("id", "name", "xs", "opt")
        .coalesce(1).write.mode("overwrite").json(out)
      s.read.json(out)
        .select(col("id"), col("name"),
          expr("aggregate(xs, 0L, (a, b) -> a + b)").as("xs_sum"),
          size(col("xs")).cast("long").as("n_xs"), col("opt"))
    }

  val oJsonRoundtrip: String =
    """SELECT CAST(id AS BIGINT) AS id, name,
      |  CAST(xs_sum AS BIGINT) AS xs_sum, CAST(n_xs AS BIGINT) AS n_xs,
      |  opt FROM (VALUES
      |  (1, 'plain', 6, 3, 'x'),
      |  (2, 'empty list', 0, 0, NULL),
      |  (3, 'has "quote"', 7, 1, 'unicode ✓')
      |) t(id, name, xs_sum, n_xs, opt)""".stripMargin

  // ---- schema evolution: two parquet generations of the same table —
  //      the second adds a column — read back together with mergeSchema;
  //      old-generation rows surface NULL for the new column (bucketed
  //      into 'MISSING' here so the drift is visible in the output). The
  //      lakehouse schema-drift primitive: widening a corpus schema must
  //      not require rewriting history. Oracle replays the generation
  //      split straight from the source table. ----
  def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = withScratch(s, "se") { out =>
    val orders = t(s, dir, "orders")
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$out/gen1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/gen2")
    s.read.option("mergeSchema", "true").parquet(s"$out/gen1", s"$out/gen2")
      .groupBy(coalesce(col("o_orderpriority"), lit("MISSING")).as("priority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("long").as("key_sum"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("sum_price"))
  }

  val oSchemaEvolution: String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'MISSING'
      |    ELSE o_orderpriority END AS priority,
      |  count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1""".stripMargin

  // ---- small-files compaction, graded end-to-end: orders fragmented
  //      into 64 shards, rewritten by Layout.compact to 4 range-clustered
  //      files, read back and aggregated. The oracle aggregates the SOURCE
  //      table — any row lost/duplicated/corrupted by the rewrite
  //      hash-mismatches — plus the layout constants the rewrite must
  //      produce: exactly 4 files whose o_orderkey min/max envelopes are
  //      pairwise DISJOINT (the property that keeps footer-stats pruning
  //      selective after compaction). The file-stats window runs over the
  //      4-row per-file table (metadata-sized, like any manifest), never
  //      over data rows. ----
  def qCompact(s: SparkSession, dir: String): DataFrame = withScratch(s, "compact") { out =>
    t(s, dir, "orders").repartition(64).write.parquet(s"$out/frag")
    operators.Layout.compact(s, s"$out/frag", s"$out/compacted",
      numFiles = 4, sortCols = Seq("o_orderkey"))
    val c = s.read.parquet(s"$out/compacted")
    val perFile = c
      .select(col("o_orderkey"), col("_metadata.file_path").as("f"))
      .groupBy(col("f"))
      .agg(min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
    val wf = Window.orderBy(col("mn"))
    val layout = perFile
      .withColumn("prev_mx", lag(col("mx"), 1).over(wf))
      .agg(count(lit(1)).as("n_files"),
        min(col("prev_mx").isNull || col("mn") > col("prev_mx"))
          .as("ranges_disjoint"))
    c.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("long").as("key_sum"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("sum_price"))
      .crossJoin(broadcast(layout))
  }

  val oCompact: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
      |  CAST(4 AS BIGINT) AS n_files, true AS ranges_disjoint
      |FROM orders GROUP BY 1""".stripMargin

  // ---- IQR-fence outlier counts per group (Tukey fences; 1.5 is an
  //      exact binary fraction, quartile interpolation matches
  //      quantile_cont bit-for-bit — see q_group_median). Fences are a
  //      groups-sized table broadcast back over the fact scan. ----
  def qOutliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // Exact quartiles via ONE window sort instead of the `percentile`
    // TypedImperativeAggregate: that agg buffers every group value in a
    // per-partition OpenHashMap and serializes the maps between partial
    // and final (3.3 s at sf0.1); a row_number window is one exchange +
    // one codegen'd sort. Interpolation replays Percentile.getPercentile
    // bit-for-bit: pos = p*(n-1), (ceil(pos)-pos)*lo + (pos-floor(pos))*hi,
    // with the same floor==ceil and equal-endpoint shortcuts. Scale shape
    // is unchanged — exact per-group quantiles need per-group order either
    // way; this version just sorts instead of buffering.
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val wAll = Window.partitionBy("l_returnflag")
    def interp(pos: Column, vLo: Column, vHi: Column): Column =
      when(floor(pos) === ceil(pos) || vLo === vHi, vLo)
        .otherwise((ceil(pos) - pos) * vLo + (pos - floor(pos)) * vHi)
    val ranked = li.select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(wOrd).cast("long") - 1)
      .withColumn("pos25",
        lit(0.25) * (count(lit(1)).over(wAll) - 1).cast("double"))
      .withColumn("pos75",
        lit(0.75) * (count(lit(1)).over(wAll) - 1).cast("double"))
    def at(pos: Column) =
      col("rn") === floor(pos).cast("long") || col("rn") === ceil(pos).cast("long")
    val fences = ranked
      .filter(at(col("pos25")) || at(col("pos75")))
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("rn") === floor(col("pos25")).cast("long"),
          col("l_extendedprice"))).cast("double").as("q1lo"),
        max(when(col("rn") === ceil(col("pos25")).cast("long"),
          col("l_extendedprice"))).cast("double").as("q1hi"),
        max(col("pos25")).as("p25"),
        max(when(col("rn") === floor(col("pos75")).cast("long"),
          col("l_extendedprice"))).cast("double").as("q3lo"),
        max(when(col("rn") === ceil(col("pos75")).cast("long"),
          col("l_extendedprice"))).cast("double").as("q3hi"),
        max(col("pos75")).as("p75"))
      .withColumn("q1", interp(col("p25"), col("q1lo"), col("q1hi")))
      .withColumn("q3", interp(col("p75"), col("q3lo"), col("q3hi")))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .select(col("l_returnflag"), col("lo"), col("hi"))
    li.join(broadcast(fences), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_high"))
  }

  val oOutliers: String =
    """WITH f AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.25) AS q1,
      |    quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem GROUP BY 1),
      |b AS (SELECT l_returnflag, q1 - 1.5 * (q3 - q1) AS lo,
      |             q3 + 1.5 * (q3 - q1) AS hi FROM f)
      |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM lineitem l JOIN b USING (l_returnflag)
      |GROUP BY 1""".stripMargin

  // ---- collect aggregates: deterministic via sort_array before join
  //      (a bare collect_list is order-nondeterministic at scale) ----
  def qCollectList(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n"))

  val oCollectList =
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  count(*) AS n
      |FROM nation GROUP BY 1""".stripMargin

  // ---- window navigation: lag / lead / day-delta per customer ----
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
        .cast("long").as("days_since_prev"))
  }

  val oWindowLag =
    """SELECT o_orderkey, o_custkey,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ---- distinct aggregates ----
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))

  val oDistinctAgg =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- skew-salted aggregation: same result as the plain groupBy (the
  // oracle IS the unsalted SQL), but the hot key's volume spreads over 16
  // salt buckets in the partial phase ----
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAggregate(
      t(s, dir, "lineitem"),
      keys = Seq("l_returnflag"),
      carriers = Seq(col("l_orderkey"), col("l_linenumber")),
      saltBuckets = 16,
      partials = Seq(
        (count(lit(1)), "n", (c: org.apache.spark.sql.Column) => sum(c)),
        (sum(col("l_quantity").cast("decimal(12,2)")), "sum_qty",
          (c: org.apache.spark.sql.Column) => sum(c).cast("double"))))

  val oSaltedAgg =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- skew-salted join: identical result to the plain join+agg (the
  // oracle IS the unsalted SQL); the salt spreads a hot supplier's
  // lineitems over 16 tasks, the supplier dim replicates ×16 ----
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedJoin(
      t(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty")),
      t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
      key = "s_suppkey",
      carriers = Seq(col("l_orderkey"), col("l_linenumber")),
      saltBuckets = 16)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))

  val oSaltedJoin =
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  // ---- the SAME skewed join+agg, handled by AQE instead of manual
  //      salting — the 100 TB story's runtime re-plan path, exercised at
  //      bench scale as a GRADED query (r11 verdict: AQE was previously
  //      proven only in the lowered-threshold SkewSpec). Runs in a child
  //      session (isolated SQLConf, shared SparkContext) with adaptive
  //      coalesce + skew-join ON and activation thresholds lowered so the
  //      skew split actually engages at test SFs; broadcast is disabled so
  //      the join is a real shuffle join AQE can split — the shape the
  //      supplier dim takes when it outgrows the broadcast budget. Every
  //      output cell is an exact integer aggregate over exact group keys,
  //      so any AQE re-partitioning must reproduce the identical hash —
  //      which is precisely what makes AQE safe to lean on at 100 TB. ----
  def qAqeJoin(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t(s2, dir, "lineitem")
      .select(col("l_suppkey").as("s_suppkey"), col("l_quantity").cast("long").as("qty"))
      .join(t(s2, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        Seq("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
  }

  // identical answer to the salted twin — the oracle IS the plain SQL
  val oAqeJoin =
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  // ---- semi-join (EXISTS — complement of the O-19 anti-join) ----
  def qSemijoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      .join(t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_semi")

  val oSemijoin =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin

  // ---- set operations: INTERSECT / EXCEPT (distinct semantics) ----
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    c.intersect(sup).withColumn("op", lit("both"))
      .unionByName(c.except(sup).withColumn("op", lit("customer_only")))
  }

  val oSetOps =
    """SELECT nk, 'both' AS op FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nk, 'customer_only' AS op FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin

  // ---- scalar string-function breadth (identical dialect subset) ----
  def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_brand")).as("lo"),
      length(col("p_type")).cast("long").as("len_type"),
      substring(col("p_name"), 2, 5).as("sub"),
      concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
      trim(col("p_name")).as("trimmed"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))

  val oStringFuncs =
    """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
      |  CAST(length(p_type) AS BIGINT) AS len_type,
      |  substr(p_name, 2, 5) AS sub,
      |  concat_ws('-', p_brand, p_type) AS joined,
      |  trim(p_name) AS trimmed,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      |FROM part""".stripMargin

  // ---- conditionals: case / coalesce / nullif / greatest / least ----
  def qConditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, lit("debt"))
        .when(col("c_acctbal") < 5000, lit("low")).otherwise(lit("high")).as("bal_class"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
      greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
      least(col("c_nationkey"), lit(10)).cast("long").as("capped_nk"))

  val oConditional =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'debt'
      |       WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
      |  greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS pos_bal,
      |  least(c_nationkey, 10) AS capped_nk
      |FROM customer""".stripMargin

  // ---- O-15/O-16/O-11 geometric half: full dissolve with JTS union.
  // Oracle: union of disjoint-or-adjacent cell rectangles has area exactly
  // |distinct cells| × cellsize² (cellsize 0.25 is binary-exact). ----
  def qGeoDissolve(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem").select(
      col("l_returnflag").as("species"),
      (col("l_orderkey") % 32).cast("int").as("r"),
      (col("l_partkey") % 32).cast("int").as("c"),
      (col("l_quantity") / 50).as("prob"))
    Raster.dissolveGeo(
      Raster.thresholdFilter(cells, "prob", 0.5).dropDuplicates("species", "r", "c"),
      keys = Seq("species"), rowCol = "r", colCol = "c",
      xll = 0.0, yll = 0.0, cellsize = 0.25, nrows = 32)
      .select(col("species"), col("area"))
  }

  val oGeoDissolve =
    """SELECT species, count(*) * CAST(0.0625 AS DOUBLE) AS area FROM (
      |  SELECT DISTINCT l_returnflag AS species,
      |    l_orderkey % 32 AS r, l_partkey % 32 AS c
      |  FROM lineitem WHERE l_quantity / 50 >= 0.5)
      |GROUP BY species""".stripMargin

  // ---- geodesic area beside the reference-faithful planar deg²: the same
  // dissolve as q_geo_dissolve with Geom.stAreaKm2 (Chamberlain–Duquette
  // spherical excess on the WGS84 authalic sphere, StrictMath trig) added.
  // Oracle: golden VALUES derived via graft.tools.One at sf0.01 and
  // confirmed bit-identical under shuffle.partitions=17 (no SQL engine
  // replays JVM trig; the planar column IS replayed exactly elsewhere). ----
  def qGeoAreaKm2(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem").select(
      col("l_returnflag").as("species"),
      (col("l_orderkey") % 32).cast("int").as("r"),
      (col("l_partkey") % 32).cast("int").as("c"),
      (col("l_quantity") / 50).as("prob"))
    Raster.dissolveGeo(
      Raster.thresholdFilter(cells, "prob", 0.5).dropDuplicates("species", "r", "c"),
      keys = Seq("species"), rowCol = "r", colCol = "c",
      xll = 0.0, yll = 0.0, cellsize = 0.25, nrows = 32)
      .select(col("species"), col("area"),
        Geom.stAreaKm2(col("geometry")).as("area_km2"))
  }

  // golden VALUES at the grading SF (sf0.01) — re-derive with
  // `graft.tools.One q_geo_area_km2 <sfDir>` after any geometry change
  val oGeoAreaKm2 =
    """SELECT * FROM (VALUES
      |  ('A', CAST(64.0 AS DOUBLE), CAST(788749.0474228152 AS DOUBLE)),
      |  ('N', CAST(64.0 AS DOUBLE), CAST(788749.0474228152 AS DOUBLE)),
      |  ('R', CAST(64.0 AS DOUBLE), CAST(788749.0474228152 AS DOUBLE))
      |) t(species, area, area_km2)""".stripMargin

  // ---- scalar geometry: st_area on per-row rectangles ----
  def qGeoCellArea(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        Geom.stArea(Geom.stRect(lit(0.0), lit(0.0),
          col("l_linenumber").cast("double") * 0.25, lit(0.25))).as("area"))

  val oGeoCellArea =
    """SELECT l_orderkey, l_linenumber,
      |  l_linenumber * CAST(0.0625 AS DOUBLE) AS area
      |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin

  // ---- geometry details (WKB path) — DuckDB cannot compute a JTS union,
  // but the union WKB is bit-deterministic (sorted cell order before the
  // union, canonical JTS ring orientation), so the full geometry bytes are
  // graded via an md5 fingerprint against a golden VALUES oracle derived
  // at the grading SF (sf0.01; re-derive with `graft.tools.One
  // q_geo_union_wkb <sfDir>` after any intentional geometry change).
  // Determinism across partitionings is separately asserted in ScalaTest. ----
  def qGeoUnionWkb(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem").select(
      col("l_returnflag").as("species"),
      (col("l_orderkey") % 32).cast("int").as("r"),
      (col("l_partkey") % 32).cast("int").as("c"),
      (col("l_quantity") / 50).as("prob"))
    Raster.dissolveGeo(
      Raster.thresholdFilter(cells, "prob", 0.75).dropDuplicates("species", "r", "c"),
      keys = Seq("species"), rowCol = "r", colCol = "c",
      xll = 0.0, yll = 0.0, cellsize = 0.25, nrows = 32)
      .select(col("species"), col("area"),
        md5(col("geometry")).as("wkb_md5"),
        Geom.stNumPoints(col("geometry")).as("n_points"),
        Geom.stNumGeoms(col("geometry")).as("n_geoms"))
  }

  // Golden fingerprints of the sf0.01 union geometries (derivation: see
  // qGeoUnionWkb's comment). Areas are exact binary fractions (multiples
  // of 0.0625), so the doubles render identically in both engines.
  val oGeoUnionWkb =
    """SELECT species, CAST(area AS DOUBLE) AS area, wkb_md5,
      |  CAST(n_points AS INT) AS n_points, CAST(n_geoms AS INT) AS n_geoms
      |FROM (VALUES
      |  ('A', 63.5625, '29b1be7083ef790d2a21cfaadb486c3b', 161, 1),
      |  ('N', 63.8125, '60953e50244a744be84dbe2bd56f2c0e', 138, 1),
      |  ('R', 63.75,   '38754afd54b303d6e4bac2bc266cd8ed', 149, 1)
      |) t(species, area, wkb_md5, n_points, n_geoms)""".stripMargin

  // ---- O-4: Esri ASCII grid source, verified against golden fixtures
  // (FIXTURES.md A2) — the oracle is the expected cell VALUES ----
  private val GridA =
    """ncols        4
      |nrows        3
      |xllcorner    -80.0
      |yllcorner    35.0
      |cellsize     0.5
      |NODATA_value -9999
      |0.1 0.3 0.6 0.9
      |0.0 0.5 0.75 -9999
      |0.2 0.25 0.4 0.8
      |""".stripMargin
  private val GridB =
    """ncols 2
      |nrows 2
      |xllcorner 10.0
      |yllcorner 20.0
      |cellsize 1.0
      |NODATA_value -1
      |1.0 -1
      |0.5 0.25
      |""".stripMargin

  def fixtureGridDir(): String = {
    // NOT under target/: sbt clean / recompiles can wipe target mid-run —
    // r2's bench lost the fixtures between writing them and Spark's file
    // listing, silently failing q_speciesdata
    val dir = java.nio.file.Paths.get("/root/repo/.grid-fixtures")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("grid_a.asc"), GridA)
    java.nio.file.Files.writeString(dir.resolve("grid_b.asc"), GridB)
    dir.toString
  }

  // ---- O-16 exact half: connected-component labeling of a sparse
  // synthetic raster (arcpy RasterToPolygon region semantics,
  // species_range_etl.py:127). ~480 regions per species at sf0.01 — the
  // near-percolation sparse regime where contiguity labeling is
  // non-trivial. Oracle: recursive-CTE reachability + min-label in
  // DuckDB; engine: run-compression + large-star/small-star CC
  // (operators/Contiguity.scala). Labels densified per species by the
  // component's top-left cell id, identical on both sides. ----
  def qConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 49)
      .select(col("l_returnflag").as("species"),
        (col("l_orderkey") % 64).cast("int").as("r"),
        (col("l_partkey") % 64).cast("int").as("c"))
      .distinct()
    Contiguity.labelCells(cells, Seq("species"), "r", "c")
      .withColumn("comp_id", dense_rank()
        .over(Window.partitionBy(col("species")).orderBy(col("comp"))).cast("long"))
      .select(col("species"), col("r"), col("c"), col("comp_id"))
  }

  val oConnectedComponents =
    """WITH RECURSIVE
      |cells AS (SELECT DISTINCT l_returnflag AS species, CAST(l_orderkey % 64 AS INT) AS r,
      |            CAST(l_partkey % 64 AS INT) AS c
      |          FROM lineitem WHERE l_quantity >= 49),
      |nodes AS (SELECT species, r, c, r * 4294967296 + c AS id FROM cells),
      |edges AS (
      |  SELECT a.species, a.id AS u, b.id AS v FROM nodes a JOIN nodes b
      |  ON a.species = b.species AND ((b.r = a.r AND b.c = a.c + 1) OR (b.r = a.r + 1 AND b.c = a.c))),
      |sym AS (SELECT species, u, v FROM edges UNION SELECT species, v, u FROM edges),
      |reach(species, id, rid) AS (
      |  SELECT species, id, id FROM nodes
      |  UNION
      |  SELECT s.species, s.u, r.rid FROM sym s JOIN reach r ON r.species = s.species AND r.id = s.v),
      |comp AS (SELECT species, id, min(rid) AS comp FROM reach GROUP BY 1, 2),
      |dense AS (SELECT species, id, dense_rank() OVER (PARTITION BY species ORDER BY comp) AS comp_id FROM comp)
      |SELECT n.species, n.r, n.c, CAST(d.comp_id AS BIGINT) AS comp_id
      |FROM nodes n JOIN dense d ON n.species = d.species AND n.id = d.id""".stripMargin

  // ---- the exact-contiguity flagship: per-REGION speciesdata rows
  // (arcpy gridcode semantics) on the golden grids; region structure and
  // areas are hand-derivable from the fixture probabilities. ----
  def qSpeciesdataExact(s: SparkSession, dir: String): DataFrame = {
    val gdir = fixtureGridDir()
    operators.SpeciesPipeline.speciesDataExact(s, s"$gdir/*.asc", globalSidOrder = true)
      .select(col("sid"), col("species"), col("species_id"), col("threshold"),
        col("source"), col("scenario"), col("year"), col("srid"), col("area"))
  }

  val oSpeciesdataExact =
    """SELECT CAST(sid AS BIGINT) AS sid, species, CAST(species_id AS INT) AS species_id,
      |  threshold, source, scenario, year, CAST(srid AS INT) AS srid,
      |  CAST(area AS DOUBLE) AS area
      |FROM (VALUES
      |  (1, 'grid_a', 1, '25', 'vtech', 'current', '2020', 4326, 2.0),
      |  (2, 'grid_a', 1, '50', 'vtech', 'current', '2020', 4326, 1.0),
      |  (3, 'grid_a', 2, '50', 'vtech', 'current', '2020', 4326, 0.25),
      |  (4, 'grid_a', 1, '75', 'vtech', 'current', '2020', 4326, 0.25),
      |  (5, 'grid_a', 2, '75', 'vtech', 'current', '2020', 4326, 0.25),
      |  (6, 'grid_a', 3, '75', 'vtech', 'current', '2020', 4326, 0.25),
      |  (7, 'grid_b', 1, '25', 'vtech', 'current', '2020', 4326, 3.0),
      |  (8, 'grid_b', 1, '50', 'vtech', 'current', '2020', 4326, 2.0),
      |  (9, 'grid_b', 1, '75', 'vtech', 'current', '2020', 4326, 1.0)
      |) t(sid, species, species_id, threshold, source, scenario, year, srid, area)""".stripMargin

  // ---- polygon × polygon spatial join (grid-binned + exact JTS
  //      residual): the dissolved speciesdata ranges overlaid with a 1°
  //      zone lattice — the reference's downstream overlay shape (ranges
  //      land in PostGIS to be intersected with boundary layers,
  //      species_range_etl.py:199-205,230-236). Candidates meet in a
  //      (bin_x, bin_y) equi-join with report-once dedup (no distinct
  //      exchange); DuckDB has no spatial types, so the oracle is golden
  //      VALUES derived via GRAFT_SHOW at two partition counts. Zone list
  //      includes an empty margin zone (-81, 35) that must NOT appear. ----
  def qSpatialJoinPoly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gdir = fixtureGridDir()
    val species = operators.SpeciesPipeline
      .speciesData(s, s"$gdir/*.asc", globalSidOrder = true)
      .select(col("sid"), col("species"), col("threshold"), col("geometry"))
    val zones = Seq(
      (-81L, 35L), (-80L, 35L), (-80L, 36L), (-79L, 35L), (-79L, 36L),
      (10L, 20L), (10L, 21L), (11L, 20L), (11L, 21L))
      .toDF("zx", "zy")
      .withColumn("zone_geom", Geom.stRect(
        col("zx").cast("double"), col("zy").cast("double"),
        (col("zx") + 1).cast("double"), (col("zy") + 1).cast("double")))
    operators.SpatialJoin
      .polygonIntersectsBinned(species, zones, "geometry", "zone_geom", binSize = 1.0)
      .select(col("sid"), col("species"), col("threshold"), col("zx"), col("zy"))
  }

  // Golden pairs (GRAFT_SHOW at shuffle.partitions 4 and 17, identical):
  // every (species, threshold) range × the 1° zones it touches. Boundary
  // contact COUNTS (JTS intersects = DE-9IM, like PostGIS).
  //
  // HAND-VERIFIED from the GridA header (xll=-80, yll=35, cellsize=0.5,
  // 4×3, rows listed top-down so file row 0 spans y∈[36.0,36.5]) — this
  // breaks the engine-derived-oracle circularity for the sharpest rows
  // (r11 ADVICE). Threshold '75' keeps exactly three cells:
  //   0.9  → col 3, file row 0 → x∈[-78.5,-78.0], y∈[36.0,36.5]
  //   0.75 → col 2, file row 1 → x∈[-79.0,-78.5], y∈[35.5,36.0]
  //   0.8  → col 3, file row 2 → x∈[-78.5,-78.0], y∈[35.0,35.5]
  // so the sid-3 union's leftmost extent is exactly x = -79, and:
  //   (3,'75',-79,35) / (3,'75',-79,36): interior overlap (cells lie
  //     inside those zones) — unambiguous;
  //   (3,'75',-80,35): EDGE-ONLY contact — the segment x=-79,
  //     y∈[35.5,36.0] shared with zone [-80,-79]×[35,36];
  //   (3,'75',-80,36): CORNER-POINT-ONLY contact at (-79, 36) — the
  //     single point shared with zone [-80,-79]×[36,37]; DE-9IM
  //     intersects=true, so the row belongs in the golden set.
  // The margin zone (-81, 35) spans x∈[-81,-80]; even threshold '25''s
  // leftmost kept cell starts at x=-79.5 (col 1 — col 0's values
  // 0.1/0.0/0.2 all fall below every threshold), so no geometry reaches
  // x=-80 and the margin zone appears nowhere. SpatialJoinSpec
  // independently cross-checks polygonIntersectsBinned against a naive
  // JTS cross-join.
  val oSpatialJoinPoly =
    """SELECT CAST(sid AS BIGINT) AS sid, species, threshold,
      |  CAST(zx AS BIGINT) AS zx, CAST(zy AS BIGINT) AS zy
      |FROM (VALUES
      |  (1, 'grid_a', '25', -80, 35), (1, 'grid_a', '25', -80, 36),
      |  (1, 'grid_a', '25', -79, 35), (1, 'grid_a', '25', -79, 36),
      |  (2, 'grid_a', '50', -80, 35), (2, 'grid_a', '50', -80, 36),
      |  (2, 'grid_a', '50', -79, 35), (2, 'grid_a', '50', -79, 36),
      |  (3, 'grid_a', '75', -80, 35), (3, 'grid_a', '75', -80, 36),
      |  (3, 'grid_a', '75', -79, 35), (3, 'grid_a', '75', -79, 36),
      |  (4, 'grid_b', '25', 10, 20), (4, 'grid_b', '25', 10, 21),
      |  (4, 'grid_b', '25', 11, 20), (4, 'grid_b', '25', 11, 21),
      |  (5, 'grid_b', '50', 10, 20), (5, 'grid_b', '50', 10, 21),
      |  (5, 'grid_b', '50', 11, 20), (5, 'grid_b', '50', 11, 21),
      |  (6, 'grid_b', '75', 10, 20), (6, 'grid_b', '75', 10, 21),
      |  (6, 'grid_b', '75', 11, 20), (6, 'grid_b', '75', 11, 21)
      |) t(sid, species, threshold, zx, zy)""".stripMargin

  // ---- O-5 + O-22: shapefile sink -> scan round trip on golden
  // geometries (species_range_etl.py:199,235). The fixture .shp is BUILT
  // by the engine's own writer (ring-orientation normalization included),
  // read back by the engine's parser, and hash-checked against golden
  // VALUES — areas are exact (integer-coordinate rectangles), so the
  // oracle grades the full serialize->parse->JTS chain. ----
  def fixtureShpDir(): String = {
    val dir = java.nio.file.Paths.get("/root/repo/.grid-fixtures")
    java.nio.file.Files.createDirectories(dir)
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    def ring(pts: (Double, Double)*) =
      pts.map { case (x, y) => new org.locationtech.jts.geom.Coordinate(x, y) }.toArray
    val withHole = gf.createPolygon(
      gf.createLinearRing(ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0))),
      Array(gf.createLinearRing(ring((1, 1), (1, 2), (2, 2), (2, 1), (1, 1)))))
    val twoShells = gf.createMultiPolygon(Array(
      gf.createPolygon(gf.createLinearRing(ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)))),
      gf.createPolygon(gf.createLinearRing(ring((10, 0), (12, 0), (12, 2), (10, 2), (10, 0))))))
    val point = gf.createPoint(new org.locationtech.jts.geom.Coordinate(3.5, 4.25))
    java.nio.file.Files.write(dir.resolve("golden_shapes.shp"),
      graft.sources.Shapefile.buildShp(Seq(withHole, twoShells, point)))
    // .dbf attribute sidecar (engine's own dBase writer): the reference's
    // Id column lives HERE, not in the .shp (species_range_etl.py:210
    // renames gpd's `Id` to `species_id`) — plus a C field and an N-with-
    // decimals field so all three dBase render paths round-trip.
    java.nio.file.Files.write(dir.resolve("golden_shapes.dbf"),
      graft.sources.Shapefile.buildDbf(
        Seq(graft.sources.DbfField("Id", 'N', 18, 0),
            graft.sources.DbfField("label", 'C', 12, 0),
            graft.sources.DbfField("score", 'N', 18, 6)),
        Seq(Seq("7", "holed", "0.250000"),
            Seq("11", "two shells", "1.500000"),
            Seq("13", "pt", "-2.125000"))))
    // .prj sidecar: the CRS a gpd.read_file consumer sees — read back as
    // the srid column (species_range_etl.py:131-133,199)
    java.nio.file.Files.write(dir.resolve("golden_shapes.prj"),
      graft.sources.Shapefile.Epsg4326Wkt.getBytes("US-ASCII"))
    dir.toString
  }

  def qShapefileScan(s: SparkSession, dir: String): DataFrame = {
    val gdir = fixtureShpDir()
    graft.sources.Shapefile.readShapes(s, s"$gdir/golden_shapes.shp")
      .select(col("record"), col("shape_type"), col("n_points"),
        Geom.stArea(col("geometry")).as("area"), col("srid"))
  }

  val oShapefileScan =
    """SELECT CAST(record AS INT) AS record, CAST(shape_type AS INT) AS shape_type,
      |  CAST(n_points AS INT) AS n_points, CAST(area AS DOUBLE) AS area,
      |  CAST(srid AS INT) AS srid
      |FROM (VALUES
      |  (1, 5, 10, 15.0, 4326), (2, 5, 10, 20.0, 4326), (3, 1, 1, 0.0, 4326)
      |) t(record, shape_type, n_points, area, srid)""".stripMargin

  // ---- O-5 complete: .dbf attribute table joined to .shp geometry by
  // record index, with the reference's Id→species_id rename
  // (species_range_etl.py:210,224-225) — grades the engine's dBase
  // writer→reader round trip on all three field types (N, C, N-decimal). ----
  def qShapefileAttrs(s: SparkSession, dir: String): DataFrame = {
    val gdir = fixtureShpDir()
    graft.sources.Shapefile.readTable(s, s"$gdir/golden_shapes.shp")
      .select(col("record"),
        element_at(col("attrs"), "Id").cast("long").as("species_id"),
        element_at(col("attrs"), "label").as("label"),
        element_at(col("attrs"), "score").cast("double").as("score"),
        col("n_points"), Geom.stArea(col("geometry")).as("area"))
  }

  val oShapefileAttrs =
    """SELECT CAST(record AS INT) AS record, CAST(species_id AS BIGINT) AS species_id,
      |  label, CAST(score AS DOUBLE) AS score,
      |  CAST(n_points AS INT) AS n_points, CAST(area AS DOUBLE) AS area
      |FROM (VALUES
      |  (1, 7,  'holed',      0.25,   10, 15.0),
      |  (2, 11, 'two shells', 1.5,    10, 20.0),
      |  (3, 13, 'pt',         -2.125, 1,  0.0)
      |) t(record, species_id, label, score, n_points, area)""".stripMargin

  def qRasterCells(s: SparkSession, dir: String): DataFrame = {
    val gdir = fixtureGridDir()
    EsriAsciiGrid.readCells(s, s"$gdir/*.asc")
      .withColumn("gname", regexp_extract(col("path"), "([a-z_]+)\\.asc$", 1))
      .select(col("gname"), col("row"), col("col"), col("lon"), col("lat"), col("prob"))
  }

  // ---- O-3 complete: grids read DIRECTLY from a zip archive — member
  // selection, prefix routing, and corrupt tolerance in-engine
  // (species_range_etl.py:155-173); same golden cells as q_raster_cells,
  // plus a non-grid member and a corrupt member that must be skipped ----
  def fixtureZipDir(): String = {
    val dir = java.nio.file.Paths.get("/root/repo/.grid-fixtures")
    java.nio.file.Files.createDirectories(dir)
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("grids_current.zip")))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    put("grids_a.asc", GridA)          // starts with species "grids" -> top-level route
    put("sub/grid_b.asc", GridB)       // nested route ascii/grids/sub/grid_b.asc
    put("readme.md", "not a grid")     // filtered by extension
    put("broken.asc", "ncols nonsense\n1 2 3\n") // corrupt member: skipped, counted
    zos.close()
    dir.toString
  }

  def qZipGridCells(s: SparkSession, dir: String): DataFrame = {
    val gdir = fixtureZipDir()
    EsriAsciiGrid.readCellsFromZips(s, s"$gdir/grids_current.zip")
      .withColumn("gname", regexp_extract(col("path"), "([a-z_]+)\\.asc$", 1))
      .select(col("gname"), col("row"), col("col"), col("lon"), col("lat"), col("prob"))
  }

  val oZipGridCells =
    """SELECT gname, CAST(row AS INT) AS row, CAST(col AS INT) AS col,
      |  CAST(lon AS DOUBLE) AS lon, CAST(lat AS DOUBLE) AS lat,
      |  CAST(prob AS DOUBLE) AS prob
      |FROM (VALUES
      |  ('grids_a', 0, 0, -79.75, 36.25, 0.1), ('grids_a', 0, 1, -79.25, 36.25, 0.3),
      |  ('grids_a', 0, 2, -78.75, 36.25, 0.6), ('grids_a', 0, 3, -78.25, 36.25, 0.9),
      |  ('grids_a', 1, 0, -79.75, 35.75, 0.0), ('grids_a', 1, 1, -79.25, 35.75, 0.5),
      |  ('grids_a', 1, 2, -78.75, 35.75, 0.75), ('grids_a', 1, 3, -78.25, 35.75, NULL),
      |  ('grids_a', 2, 0, -79.75, 35.25, 0.2), ('grids_a', 2, 1, -79.25, 35.25, 0.25),
      |  ('grids_a', 2, 2, -78.75, 35.25, 0.4), ('grids_a', 2, 3, -78.25, 35.25, 0.8),
      |  ('grid_b', 0, 0, 10.5, 21.5, 1.0), ('grid_b', 0, 1, 11.5, 21.5, NULL),
      |  ('grid_b', 1, 0, 10.5, 20.5, 0.5), ('grid_b', 1, 1, 11.5, 20.5, 0.25)
      |) t(gname, row, col, lon, lat, prob)""".stripMargin

  // ---- the WHOLE reference pipeline end-to-end on golden grids:
  // .asc -> cells -> threshold ×3 -> dissolve -> enrich -> speciesdata.
  // Areas are exact cell-count multiples (binary-friendly cellsizes), so
  // the golden VALUES oracle checks the full chain including JTS union.
  def qSpeciesdata(s: SparkSession, dir: String): DataFrame = {
    val gdir = fixtureGridDir()
    operators.SpeciesPipeline.speciesData(s, s"$gdir/*.asc", globalSidOrder = true)
      .select(col("sid"), col("species"), col("species_id"), col("threshold"),
        col("source"), col("scenario"), col("year"), col("srid"), col("area"))
  }

  val oSpeciesdata =
    """SELECT CAST(sid AS BIGINT) AS sid, species, CAST(species_id AS INT) AS species_id,
      |  threshold, source, scenario, year, CAST(srid AS INT) AS srid,
      |  CAST(area AS DOUBLE) AS area
      |FROM (VALUES
      |  (1, 'grid_a', 1, '25', 'vtech', 'current', '2020', 4326, 2.0),
      |  (2, 'grid_a', 1, '50', 'vtech', 'current', '2020', 4326, 1.25),
      |  (3, 'grid_a', 1, '75', 'vtech', 'current', '2020', 4326, 0.75),
      |  (4, 'grid_b', 2, '25', 'vtech', 'current', '2020', 4326, 3.0),
      |  (5, 'grid_b', 2, '50', 'vtech', 'current', '2020', 4326, 2.0),
      |  (6, 'grid_b', 2, '75', 'vtech', 'current', '2020', 4326, 1.0)
      |) t(sid, species, species_id, threshold, source, scenario, year, srid, area)""".stripMargin

  val oRasterCells =
    """SELECT gname, CAST(row AS INT) AS row, CAST(col AS INT) AS col,
      |  CAST(lon AS DOUBLE) AS lon, CAST(lat AS DOUBLE) AS lat,
      |  CAST(prob AS DOUBLE) AS prob
      |FROM (VALUES
      |  ('grid_a', 0, 0, -79.75, 36.25, 0.1), ('grid_a', 0, 1, -79.25, 36.25, 0.3),
      |  ('grid_a', 0, 2, -78.75, 36.25, 0.6), ('grid_a', 0, 3, -78.25, 36.25, 0.9),
      |  ('grid_a', 1, 0, -79.75, 35.75, 0.0), ('grid_a', 1, 1, -79.25, 35.75, 0.5),
      |  ('grid_a', 1, 2, -78.75, 35.75, 0.75), ('grid_a', 1, 3, -78.25, 35.75, NULL),
      |  ('grid_a', 2, 0, -79.75, 35.25, 0.2), ('grid_a', 2, 1, -79.25, 35.25, 0.25),
      |  ('grid_a', 2, 2, -78.75, 35.25, 0.4), ('grid_a', 2, 3, -78.25, 35.25, 0.8),
      |  ('grid_b', 0, 0, 10.5, 21.5, 1.0), ('grid_b', 0, 1, 11.5, 21.5, NULL),
      |  ('grid_b', 1, 0, 10.5, 20.5, 0.5), ('grid_b', 1, 1, 11.5, 20.5, 0.25)
      |) t(gname, row, col, lon, lat, prob)""".stripMargin
}
