package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QueriesX extension queries, part 4 of the family-boundary split; opens with the
  * "ship-latency SLA percentiles per priority" family. Query/oracle pairs only —
  * shared loaders live in [[QueriesXShared]].
  */
private[graft] trait QueriesXPart4 extends QueriesXShared {

  // ---- ship-latency SLA percentiles per priority: exact p50/p90/p99
  //      crossings of the cumulative over the bounded (priority ×
  //      latency-day) domain — the fact join reduces to that domain
  //      before any window runs ----
  def qLatencyPercentiles(s: SparkSession, dir: String): DataFrame = {
    val lat = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("sday"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("sday") - col("oday")).as("lat"))
      .groupBy(col("o_orderpriority"), col("lat"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("lat"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = lat.groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n_tot"))
    lat.withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(tot), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n_tot")).as("n_lines"),
        min(when(col("cum") * 2 >= col("n_tot"), col("lat"))).as("p50"),
        min(when(col("cum") * 10 >= col("n_tot") * 9, col("lat"))).as("p90"),
        min(when(col("cum") * 100 >= col("n_tot") * 99, col("lat")))
          .as("p99"))
  }

  val oLatencyPercentiles: String =
    """WITH lat AS (
      |  SELECT o_orderpriority,
      |    epoch_us(l_shipdate) // 86400000000 -
      |    epoch_us(o_orderdate) // 86400000000 AS lat,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT o_orderpriority, lat, n,
      |    CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY lat)
      |      AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
      |      AS n_tot
      |  FROM lat)
      |SELECT o_orderpriority, max(n_tot) AS n_lines,
      |  min(CASE WHEN cum * 2 >= n_tot THEN lat END) AS p50,
      |  min(CASE WHEN cum * 10 >= n_tot * 9 THEN lat END) AS p90,
      |  min(CASE WHEN cum * 100 >= n_tot * 99 THEN lat END) AS p99
      |FROM cum GROUP BY 1""".stripMargin

  // ---- portable-hash partition-balance audit: md5-bucket sizes for the
  //      event key (the SAME hash the split/sampling operators use) —
  //      would this key distribute evenly over 32 shuffle partitions?
  //      One summary row with the max-over-mean skew in basis points ----
  def qHashBalance(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select((graft.functions.Portable.hash32(col("event_id")
        .cast("string")) % 32).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_total"),
        min(col("n")).as("min_bucket_n"), max(col("n")).as("max_bucket_n"))
      .select(col("n_buckets"), col("n_total"), col("min_bucket_n"),
        col("max_bucket_n"),
        expr("max_bucket_n * n_buckets * 10000L DIV n_total")
          .as("skew_bp"))

  val oHashBalance: String = {
    val h = H32.format("CAST(event_id AS VARCHAR)")
    s"""WITH b AS (
       |  SELECT $h % 32 AS bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(n) AS BIGINT) AS n_total,
       |  min(n) AS min_bucket_n, max(n) AS max_bucket_n,
       |  CAST(max(n) * count(*) * 10000 // sum(n) AS BIGINT) AS skew_bp
       |FROM b""".stripMargin
  }

  // ---- brand share drift: each brand's revenue share in the first
  //      half of the observed day span vs the second, drift in exact
  //      basis points — the midpoint is a 1-row broadcast, halves and
  //      totals stay integer ----
  def qBrandShareDrift(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
    val mid = li.agg(((min(col("day")) + max(col("day"))) / 2)
      .cast("long").as("mid"))
    val cells = li.crossJoin(broadcast(mid))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(when(col("day") <= col("mid"), col("rev_c")).otherwise(0L))
          .as("rev1_c"),
        sum(when(col("day") > col("mid"), col("rev_c")).otherwise(0L))
          .as("rev2_c"))
    val tot = cells.agg(sum(col("rev1_c")).as("tot1_c"),
      sum(col("rev2_c")).as("tot2_c"))
    cells.crossJoin(broadcast(tot))
      .select(col("p_brand"),
        expr("rev1_c * 10000L DIV tot1_c").as("share1_bp"),
        expr("rev2_c * 10000L DIV tot2_c").as("share2_bp"),
        expr("rev2_c * 10000L DIV tot2_c - rev1_c * 10000L DIV tot1_c")
          .as("drift_bp"))
  }

  val oBrandShareDrift: String =
    """WITH li AS (
      |  SELECT l_partkey, epoch_us(l_shipdate) // 86400000000 AS day,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS rev_c
      |  FROM lineitem),
      |mid AS (SELECT (min(day) + max(day)) // 2 AS mid FROM li),
      |cells AS (
      |  SELECT p_brand,
      |    CAST(sum(CASE WHEN day <= mid THEN rev_c ELSE 0 END) AS BIGINT)
      |      AS rev1_c,
      |    CAST(sum(CASE WHEN day > mid THEN rev_c ELSE 0 END) AS BIGINT)
      |      AS rev2_c
      |  FROM li JOIN part ON l_partkey = p_partkey, mid
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev1_c) AS BIGINT) AS tot1_c,
      |               CAST(sum(rev2_c) AS BIGINT) AS tot2_c FROM cells)
      |SELECT p_brand,
      |  CAST(rev1_c * 10000 // tot1_c AS BIGINT) AS share1_bp,
      |  CAST(rev2_c * 10000 // tot2_c AS BIGINT) AS share2_bp,
      |  CAST(rev2_c * 10000 // tot2_c - rev1_c * 10000 // tot1_c
      |    AS BIGINT) AS drift_bp
      |FROM cells, tot""".stripMargin

  // ---- document first-token census: what a doc opens with — share of
  //      docs per entry token in exact basis points, one narrow scan ----
  def qFirstTokenMix(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "documents")
      .select(element_at(split(col("text"), " "), 1).as("first_tok"))
      .groupBy(col("first_tok"))
      .agg(count(lit(1)).as("n_docs"))
    m.crossJoin(broadcast(m.agg(sum(col("n_docs")).as("n_tot"))))
      .select(col("first_tok"), col("n_docs"),
        expr("n_docs * 10000L DIV n_tot").as("share_bp"))
  }

  val oFirstTokenMix: String =
    """WITH m AS (
      |  SELECT string_split(text, ' ')[1] AS first_tok,
      |    CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot FROM m)
      |SELECT first_tok, n_docs,
      |  CAST(n_docs * 10000 // n_tot AS BIGINT) AS share_bp
      |FROM m, tot""".stripMargin

  // ---- volume-discount curve: revenue-weighted mean discount per
  //      quantity band — the weighted mean is one exact cross-multiply,
  //      Σ(disc·price)·100 / Σprice in basis points ----
  def qVolumeDiscountCurve(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_quantity) AS BIGINT) DIV 10").as("qty_band"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy(col("qty_band"))
      .agg(count(lit(1)).as("n_lines"), sum(col("price_c")).as("rev_c"),
        // Σ disc·price (≤10⁹/row) over unbounded per-band rows wraps a
        // long at ~10¹⁰ rows/group → staged BEFORE the sum
        sum((col("disc_pct") * col("price_c")).cast("decimal(38,0)"))
          .as("wdisc_c"))
      .select(col("qty_band"), col("n_lines"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("CAST(CAST(wdisc_c AS DECIMAL(38,0)) * 100 DIV " +
          "CAST(rev_c AS DECIMAL(38,0)) AS BIGINT)")
          .as("weighted_disc_bp"))

  val oVolumeDiscountCurve: String =
    """WITH m AS (
      |  SELECT CAST(floor(l_quantity) AS BIGINT) // 10 AS qty_band,
      |    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem)
      |SELECT qty_band, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(CAST(sum(disc_pct * price_c) AS HUGEINT) * 100 //
      |    CAST(sum(price_c) AS HUGEINT) AS BIGINT) AS weighted_disc_bp
      |FROM m GROUP BY 1""".stripMargin

  // ---- document-level token co-occurrence top-20 with lift: distinct
  //      (doc, token) membership self-joined on doc_id (fan-out bounded
  //      by per-doc distinct-token count, never vocab²), lift against
  //      the document-frequency marginals in exact basis points ----
  def qDocCooccur(s: SparkSession, dir: String): DataFrame = {
    val dt = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    val b = dt.select(col("doc_id").as("d2"), col("tok").as("tok2"))
    val pairs = dt.join(b, col("doc_id") === col("d2") &&
        col("tok") < col("tok2"))
      .groupBy(col("tok"), col("tok2"))
      .agg(count(lit(1)).as("n_both"))
    val df = dt.groupBy(col("tok")).agg(count(lit(1)).as("n_df"))
    val nDocs = dt.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    pairs
      .join(broadcast(df.select(col("tok"), col("n_df").as("n_a"))),
        Seq("tok"))
      .join(broadcast(df.select(col("tok").as("tok2"),
        col("n_df").as("n_b"))), Seq("tok2"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("tok2"), col("n_both"),
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * " +
          "CAST(n_docs AS DECIMAL(38,0)) * 10000 DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("lift_bp"))
      .orderBy(col("n_both").desc, col("tok").asc, col("tok2").asc)
      .limit(20)
  }

  val oDocCooccur: String =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  WHERE tok <> ''),
      |pairs AS (
      |  SELECT a.tok AS tok, b.tok AS tok2,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_df
      |       FROM dt GROUP BY 1),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |       FROM dt)
      |SELECT p.tok AS tok, p.tok2 AS tok2, p.n_both,
      |  CAST(p.n_both::HUGEINT * nd.n_docs::HUGEINT * 10000 //
      |    (a.n_df::HUGEINT * b.n_df::HUGEINT) AS BIGINT) AS lift_bp
      |FROM pairs p
      |JOIN df a ON p.tok = a.tok JOIN df b ON p.tok2 = b.tok, nd
      |ORDER BY p.n_both DESC, p.tok ASC, p.tok2 ASC LIMIT 20""".stripMargin

  // ---- single-order dependence: how much of each customer's lifetime
  //      revenue their LARGEST order carries — per-customer max/sum
  //      reduction, share banded by thousandths, histogram ----
  def qOrderDependence(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), max(col("price_c")).as("max_c"),
        sum(col("price_c")).as("sum_c"))
      .select(expr("(max_c * 10000L DIV sum_c) DIV 1000").as("band"),
        col("n_orders"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"))

  val oOrderDependence: String =
    """WITH per AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS max_c,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS sum_c
      |  FROM orders GROUP BY 1)
      |SELECT (max_c * 10000 // sum_c) // 1000 AS band,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(n_orders) AS BIGINT) AS n_orders
      |FROM per GROUP BY 1""".stripMargin

  // ---- LTV half-life: days from a customer's first order until their
  //      cumulative spend crosses HALF of lifetime revenue — one
  //      per-customer-partitioned cumulative (deterministic (day,
  //      orderkey) order), first crossing, histogram in 30-day bands ----
  def qLtvHalflife(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val wc = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy(col("o_custkey"))
    o.withColumn("cum", sum(col("price_c")).over(wc))
      .withColumn("tot", sum(col("price_c")).over(wp))
      .withColumn("d0", min(col("day")).over(wp))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("o_custkey"))
      .agg((min(col("day")) - max(col("d0"))).as("halflife_days"))
      .select(expr("halflife_days DIV 30").as("halflife_months"))
      .groupBy(col("halflife_months"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val oLtvHalflife: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |c AS (
      |  SELECT o_custkey, day,
      |    CAST(sum(price_c) OVER (PARTITION BY o_custkey
      |      ORDER BY day, o_orderkey) AS BIGINT) AS cum,
      |    CAST(sum(price_c) OVER (PARTITION BY o_custkey) AS BIGINT)
      |      AS tot,
      |    min(day) OVER (PARTITION BY o_custkey) AS d0
      |  FROM o),
      |h AS (
      |  SELECT o_custkey, min(day) - max(d0) AS halflife_days
      |  FROM c WHERE cum * 2 >= tot GROUP BY 1)
      |SELECT halflife_days // 30 AS halflife_months,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM h GROUP BY 1""".stripMargin

  // ---- per-type exact value percentiles: median and p90 of event value
  //      in cents — cumulative over the reduced (type × cent-value)
  //      domain, first crossings; the fact stream is reduced before any
  //      window runs ----
  def qTypeValueMedian(s: SparkSession, dir: String): DataFrame = {
    val hist = events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy(col("event_type")).agg(sum(col("n")).as("n_tot"))
    hist.withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n_tot")).as("n_events"),
        min(when(col("cum") * 2 >= col("n_tot"), col("v_c")))
          .as("median_c"),
        min(when(col("cum") * 10 >= col("n_tot") * 9, col("v_c")))
          .as("p90_c"))
  }

  val oTypeValueMedian: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v_c,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY v_c)
      |      AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_tot
      |  FROM hist)
      |SELECT event_type, max(n_tot) AS n_events,
      |  min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS median_c,
      |  min(CASE WHEN cum * 10 >= n_tot * 9 THEN v_c END) AS p90_c
      |FROM cum GROUP BY 1""".stripMargin

  // ---- do big orders ship slower? Per-order (line count, summed ship
  //      latency) reduction, mean latency per size band as one exact
  //      cross-multiply in centidays ----
  def qSizeLatencyCurve(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("sday"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("sday") - col("oday")).as("sum_lat"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"), sum(col("sum_lat")).as("tot_lat"),
        sum(col("n_lines")).as("tot_lines"))
      .select(col("n_lines"), col("n_orders"),
        expr("tot_lat * 100L DIV tot_lines").as("mean_latency_cd"))

  val oSizeLatencyCurve: String =
    """WITH per AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(epoch_us(l_shipdate) // 86400000000 -
      |      epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS sum_lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1)
      |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(sum_lat) * 100 // sum(n_lines) AS BIGINT)
      |    AS mean_latency_cd
      |FROM per GROUP BY 1""".stripMargin

  // ---- Heaps-law curve: distinct-token growth against document length
  //      — per-doc (total, distinct) token reduction, mean unique count
  //      (centitokens) and type-token ratio per 20-token length band ----
  def qHeapsCurve(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("tok")).as("n_uniq"))
      .groupBy(expr("n_tok DIV 20").as("len_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tot_tok"),
        sum(col("n_uniq")).as("tot_uniq"))
      .select(col("len_band"), col("n_docs"),
        expr("tot_uniq * 100L DIV n_docs").as("mean_uniq_ct"),
        expr("tot_uniq * 10000L DIV tot_tok").as("ttr_bp"))

  val oHeapsCurve: String =
    """WITH per AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS n_uniq
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY 1)
      |SELECT n_tok // 20 AS len_band, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_uniq) * 100 // count(*) AS BIGINT) AS mean_uniq_ct,
      |  CAST(sum(n_uniq) * 10000 // sum(n_tok) AS BIGINT) AS ttr_bp
      |FROM per GROUP BY 1""".stripMargin

  // ---- header↔line status consistency matrix: every (order status,
  //      line status) combination with its share — the cross-table
  //      state-machine audit, one fact equi-join and a ≤9-cell rollup ----
  def qStatusMatrix(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"))
    cells.crossJoin(broadcast(cells.agg(sum(col("n_lines")).as("n_tot"))))
      .select(col("o_orderstatus"), col("l_linestatus"), col("n_lines"),
        expr("n_lines * 10000L DIV n_tot").as("share_bp"))
  }

  val oStatusMatrix: String =
    """WITH cells AS (
      |  SELECT o_orderstatus, l_linestatus,
      |    CAST(count(*) AS BIGINT) AS n_lines
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(n_lines) AS BIGINT) AS n_tot FROM cells)
      |SELECT o_orderstatus, l_linestatus, n_lines,
      |  CAST(n_lines * 10000 // n_tot AS BIGINT) AS share_bp
      |FROM cells, tot""".stripMargin

  // ---- price-band sale velocity: days from catalog epoch (the global
  //      first ship day, a 1-row broadcast) to each part's FIRST sale,
  //      averaged per retail-price band in exact centidays; parts never
  //      sold are counted separately via the left join ----
  def qPriceVelocity(s: SparkSession, dir: String): DataFrame = {
    val firstSale = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"))
      .groupBy(col("l_partkey")).agg(min(col("day")).as("first_day"))
    val epoch = firstSale.agg(min(col("first_day")).as("day0"))
    t(s, dir, "part")
      .select(col("p_partkey"),
        expr("CAST(floor(p_retailprice) AS BIGINT) DIV 500")
          .as("price_band"))
      .join(firstSale, col("p_partkey") === col("l_partkey"), "left")
      .crossJoin(broadcast(epoch))
      .groupBy(col("price_band"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("first_day").isNull, 1L).otherwise(0L))
          .as("n_never_sold"),
        sum(when(col("first_day").isNotNull,
          col("first_day") - col("day0")).otherwise(0L)).as("sum_days"),
        sum(when(col("first_day").isNotNull, 1L).otherwise(0L))
          .as("n_sold"))
      .select(col("price_band"), col("n_parts"), col("n_never_sold"),
        expr("sum_days * 100L DIV n_sold").as("mean_days_to_sale_cd"))
  }

  val oPriceVelocity: String =
    """WITH fs AS (
      |  SELECT l_partkey,
      |    min(epoch_us(l_shipdate) // 86400000000) AS first_day
      |  FROM lineitem GROUP BY 1),
      |ep AS (SELECT min(first_day) AS day0 FROM fs),
      |j AS (
      |  SELECT CAST(floor(p_retailprice) AS BIGINT) // 500 AS price_band,
      |    fs.first_day, ep.day0
      |  FROM part LEFT JOIN fs ON p_partkey = l_partkey, ep)
      |SELECT price_band, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(CASE WHEN first_day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_never_sold,
      |  CAST(sum(CASE WHEN first_day IS NOT NULL
      |      THEN first_day - day0 ELSE 0 END) * 100 //
      |    sum(CASE WHEN first_day IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS mean_days_to_sale_cd
      |FROM j GROUP BY 1""".stripMargin

  // ---- vocabulary edit-distance matrix: near-miss token pairs at
  //      Levenshtein ≤ 2 via the NATIVE levenshtein on the aggregated
  //      vocabulary (a deliberately bounded vocab² pair set — the
  //      unbounded-corpus regime uses q_edit_dist_join's deletion
  //      neighborhoods instead) ----
  def qTokenEditMatrix(s: SparkSession, dir: String): DataFrame = {
    val vocab = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    vocab.crossJoin(broadcast(vocab.select(col("tok").as("tok2"))))
      .filter(col("tok") < col("tok2") &&
        levenshtein(col("tok"), col("tok2")) <= 2)
      .select(col("tok"), col("tok2"),
        levenshtein(col("tok"), col("tok2")).cast("long").as("dist"))
  }

  val oTokenEditMatrix: String =
    """WITH vocab AS (
      |  SELECT DISTINCT tok FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> '')
      |SELECT a.tok AS tok, b.tok AS tok2,
      |  CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
      |FROM vocab a, vocab b
      |WHERE a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 2"""
      .stripMargin

  // ---- NATIVE week-truncation parity: weekly order rollup through
  //      date_trunc('week', …) — both engines truncate to ISO Monday;
  //      the boundary is graded as epoch days, not a rendered date ----
  def qWeekTruncParity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(expr("CAST(datediff(CAST(date_trunc('week', o_orderdate) " +
        "AS DATE), DATE'1970-01-01') AS BIGINT)").as("week_start_day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("week_start_day"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("price_c")).cast("double") / lit(100.0)).as("revenue"))

  val oWeekTruncParity: String =
    """SELECT epoch_us(date_trunc('week', o_orderdate)) // 86400000000
      |  AS week_start_day,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    ::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM orders GROUP BY 1""".stripMargin

  // ---- embedding dimension correlation: exact Pearson r between the
  //      first two dimensions over 1e-6-quantized components — the
  //      corrMatrix DECIMAL(38,0) per-operand-cast moments, sqrt only at
  //      the closing division (correctly-rounded IEEE in both engines) ----
  def qDimCorr(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    t(s, dir, "embeddings")
      .select(
        expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000.0D) " +
          "AS BIGINT)").as("x"),
        expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0D) " +
          "AS BIGINT)").as("y"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(col("n").cast("long").as("n_vectors"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("r"))
  }

  val oDimCorr: String =
    """WITH q AS (
      |  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0::DOUBLE)
      |      AS BIGINT) AS x,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0::DOUBLE)
      |      AS BIGINT) AS y
      |  FROM embeddings),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x::HUGEINT) AS HUGEINT) AS sx,
      |    CAST(sum(y::HUGEINT) AS HUGEINT) AS sy,
      |    CAST(sum(x::HUGEINT * x::HUGEINT) AS HUGEINT) AS sxx,
      |    CAST(sum(y::HUGEINT * y::HUGEINT) AS HUGEINT) AS syy,
      |    CAST(sum(x::HUGEINT * y::HUGEINT) AS HUGEINT) AS sxy
      |  FROM q)
      |SELECT CAST(n AS BIGINT) AS n_vectors,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
      |FROM m""".stripMargin

  // ---- same-day reorder census: (customer, day) cells with more than
  //      one order — the double-submit signal; per-cell reduction, one
  //      summary row ----
  def qSameDayOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"))
      .groupBy(col("o_custkey"), col("day"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cust_days"),
        sum(when(col("n") > 1L, 1L).otherwise(0L)).as("n_multi"),
        max(col("n")).as("max_orders_one_day"))
      .select(col("n_cust_days"), col("n_multi"),
        col("max_orders_one_day"),
        expr("n_multi * 10000L DIV n_cust_days").as("multi_bp"))

  val oSameDayOrders: String =
    """WITH per AS (
      |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_cust_days,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
      |  max(n) AS max_orders_one_day,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 10000 // count(*)
      |    AS BIGINT) AS multi_bp
      |FROM per""".stripMargin

  // ---- order-lifecycle grid (accumulating-snapshot pattern): days to
  //      FIRST shipment × first-to-last shipping span, both in 30-day
  //      bands — per-order min/max reduction then a bounded 2-D rollup ----
  def qLifecycleGrid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("sday"))
      .groupBy(col("l_orderkey"))
      .agg(min(col("sday")).as("first_ship"), max(col("sday")).as("last_ship"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr("(first_ship - oday) DIV 30").as("lead_band"),
        expr("(last_ship - first_ship) DIV 30").as("span_band"))
      .groupBy(col("lead_band"), col("span_band"))
      .agg(count(lit(1)).as("n_orders"))

  val oLifecycleGrid: String =
    """WITH per AS (
      |  SELECT l_orderkey,
      |    min(epoch_us(l_shipdate) // 86400000000) AS first_ship,
      |    max(epoch_us(l_shipdate) // 86400000000) AS last_ship
      |  FROM lineitem GROUP BY 1)
      |SELECT (first_ship - epoch_us(o_orderdate) // 86400000000) // 30
      |    AS lead_band,
      |  (last_ship - first_ship) // 30 AS span_band,
      |  CAST(count(*) AS BIGINT) AS n_orders
      |FROM per JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2""".stripMargin

  // ---- duplicate-basket census: orders whose EXACT part set matches
  //      another order's — canonical sorted-partkey signature per order
  //      (ordered agg), duplicate-group size histogram ----
  def qBasketDups(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",",
        expr("transform(sort_array(collect_list(l_partkey)), " +
          "x -> CAST(x AS STRING))")).as("sig"))
      .groupBy(col("sig")).agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_signatures"),
        sum(col("group_size")).as("n_orders"))

  val oBasketDups: String =
    """WITH ps AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |sig AS (
      |  SELECT l_orderkey,
      |    string_agg(CAST(l_partkey AS VARCHAR), ','
      |      ORDER BY l_partkey) AS sig
      |  FROM ps GROUP BY 1),
      |g AS (SELECT sig, CAST(count(*) AS BIGINT) AS group_size
      |      FROM sig GROUP BY 1)
      |SELECT group_size, CAST(count(*) AS BIGINT) AS n_signatures,
      |  CAST(sum(group_size) AS BIGINT) AS n_orders
      |FROM g GROUP BY 1""".stripMargin

  // ---- cross-domain vocabulary anti-join: catalog-name tokens that
  //      never appear in the document corpus — two derived distinct
  //      sets, one hash anti-join, one summary row ----
  def qVocabAntijoin(s: SparkSession, dir: String): DataFrame = {
    val ptoks = t(s, dir, "part")
      .select(explode(split(lower(col("p_name")), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    val dvocab = t(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("dtok"))
      .filter(col("dtok") =!= "").distinct()
    val missing = ptoks.join(dvocab, col("tok") === col("dtok"), "left_anti")
      .agg(count(lit(1)).as("n_missing"))
    ptoks.agg(count(lit(1)).as("n_part_tokens"))
      .crossJoin(broadcast(missing))
      .select(col("n_part_tokens"), col("n_missing"),
        expr("n_missing * 10000L DIV n_part_tokens").as("missing_bp"))
  }

  val oVocabAntijoin: String =
    """WITH ptoks AS (
      |  SELECT DISTINCT tok FROM (
      |    SELECT unnest(string_split(lower(p_name), ' ')) AS tok FROM part)
      |  WHERE tok <> ''),
      |dvocab AS (
      |  SELECT DISTINCT tok FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS tok
      |    FROM documents)
      |  WHERE tok <> ''),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_missing
      |  FROM ptoks WHERE NOT EXISTS (
      |    SELECT 1 FROM dvocab WHERE dvocab.tok = ptoks.tok))
      |SELECT CAST((SELECT count(*) FROM ptoks) AS BIGINT)
      |    AS n_part_tokens,
      |  n_missing,
      |  CAST(n_missing * 10000 // (SELECT count(*) FROM ptoks) AS BIGINT)
      |    AS missing_bp
      |FROM m""".stripMargin

  // ---- SKU repeat-purchase gap: mean days between consecutive
  //      repurchases of the same part by the same customer —
  //      (last−first)/(n−1) needs only the per-(customer, part) min/max
  //      reduction, no per-key sequence window; 30-day-band histogram ----
  def qSkuRepeatGap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(count(lit(1)).as("n"), min(col("day")).as("d0"),
        max(col("day")).as("d1"))
      .filter(col("n") >= 2L && col("d1") > col("d0"))
      .select(expr("((d1 - d0) * 100L DIV (n - 1)) DIV 3000")
        .as("gap_month_band"))
      .groupBy(col("gap_month_band"))
      .agg(count(lit(1)).as("n_cust_parts"))

  val oSkuRepeatGap: String =
    """WITH per AS (
      |  SELECT o_custkey, l_partkey, CAST(count(*) AS BIGINT) AS n,
      |    min(epoch_us(o_orderdate) // 86400000000) AS d0,
      |    max(epoch_us(o_orderdate) // 86400000000) AS d1
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT ((d1 - d0) * 100 // (n - 1)) // 3000 AS gap_month_band,
      |  CAST(count(*) AS BIGINT) AS n_cust_parts
      |FROM per WHERE n >= 2 AND d1 > d0
      |GROUP BY 1""".stripMargin

  // ---- growth-streak detection: longest run of consecutive
  //      week-over-week revenue increases — gaps-and-islands (week −
  //      row_number) over the bounded week domain AFTER the up-week
  //      filter; the WoW lag is the cells self-join, not a window ----
  def qGrowthStreak(s: SparkSession, dir: String): DataFrame = {
    val wk = t(s, dir, "orders")
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE'1970-01-01') AS BIGINT) DIV 7").as("wk"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("wk")).agg(sum(col("price_c")).as("rev_c"))
    val prev = wk.select((col("wk") + 1L).as("wk"),
      col("rev_c").as("prev_c"))
    val ups = wk.join(prev, Seq("wk")).filter(col("rev_c") > col("prev_c"))
    val w = Window.orderBy(col("wk"))
    ups.withColumn("island", col("wk") - row_number().over(w))
      .groupBy(col("island")).agg(count(lit(1)).as("run_len"))
      .agg(sum(col("run_len")).as("n_up_weeks"),
        count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"))
  }

  val oGrowthStreak: String =
    """WITH wk AS (
      |  SELECT epoch_us(o_orderdate) // (86400000000 * 7) AS wk,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |ups AS (
      |  SELECT w.wk FROM wk w JOIN wk p ON w.wk = p.wk + 1
      |  WHERE w.rev_c > p.rev_c),
      |runs AS (
      |  SELECT wk - row_number() OVER (ORDER BY wk) AS island
      |  FROM ups),
      |g AS (SELECT island, CAST(count(*) AS BIGINT) AS run_len
      |      FROM runs GROUP BY 1)
      |SELECT CAST(sum(run_len) AS BIGINT) AS n_up_weeks,
      |  CAST(count(*) AS BIGINT) AS n_runs, max(run_len) AS max_run
      |FROM g""".stripMargin

  // ---- portable table fingerprints: bit_xor of the md5-derived key
  //      hash per table — the order-independent checksum a reconciler
  //      compares across systems; three single-scan reductions ----
  def qXorFingerprint(s: SparkSession, dir: String): DataFrame = {
    def fp(name: String, table: String, key: String) =
      t(s, dir, table)
        .select(graft.functions.Portable.hash32(col(key).cast("string"))
          .as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_fp"))
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_fp"))
    fp("orders", "orders", "o_orderkey")
      .unionByName(fp("customer", "customer", "c_custkey"))
      .unionByName(fp("part", "part", "p_partkey"))
  }

  val oXorFingerprint: String = {
    def h(c: String) = H32.format(s"CAST($c AS VARCHAR)")
    s"""SELECT 'orders' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(bit_xor(${h("o_orderkey")}) AS BIGINT) AS xor_fp FROM orders
       |UNION ALL
       |SELECT 'customer', CAST(count(*) AS BIGINT),
       |  CAST(bit_xor(${h("c_custkey")}) AS BIGINT) FROM customer
       |UNION ALL
       |SELECT 'part', CAST(count(*) AS BIGINT),
       |  CAST(bit_xor(${h("p_partkey")}) AS BIGINT) FROM part"""
      .stripMargin
  }

  // ---- stratified median consistency: exact per-bucket medians over
  //      8 portable-hash strata — if sampling by this hash is sound,
  //      the per-bucket medians agree; rank crossings over the reduced
  //      (bucket × cent-value) domain ----
  def qBucketMedianConsistency(s: SparkSession, dir: String): DataFrame = {
    val hist = events(s, dir)
      .select((graft.functions.Portable.hash32(col("event_id")
        .cast("string")) % 8).as("bucket"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("bucket"), col("v_c")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy(col("bucket")).agg(sum(col("n")).as("n_tot"))
    hist.withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(tot), Seq("bucket"))
      .groupBy(col("bucket"))
      .agg(max(col("n_tot")).as("n_events"),
        min(when(col("cum") * 2 >= col("n_tot"), col("v_c")))
          .as("median_c"))
  }

  val oBucketMedianConsistency: String = {
    val h = H32.format("CAST(event_id AS VARCHAR)")
    s"""WITH hist AS (
       |  SELECT $h % 8 AS bucket,
       |    CAST(floor(value * 100) AS BIGINT) AS v_c,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |cum AS (
       |  SELECT bucket, v_c,
       |    CAST(sum(n) OVER (PARTITION BY bucket ORDER BY v_c) AS BIGINT)
       |      AS cum,
       |    CAST(sum(n) OVER (PARTITION BY bucket) AS BIGINT) AS n_tot
       |  FROM hist)
       |SELECT bucket, max(n_tot) AS n_events,
       |  min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS median_c
       |FROM cum GROUP BY 1""".stripMargin
  }

  // ---- engagement mix by intensity decile: users deciled by lifetime
  //      event count (USER-dimension ntile, (n, user_id) total order),
  //      event-type share within each decile in exact basis points ----
  def qIntensityTypeMix(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"))
    val w = Window.orderBy(col("n_u"), col("user_id"))
    val deciles = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_u"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .select(col("user_id"), col("decile"))
    val cells = e.join(deciles, Seq("user_id"))
      .groupBy(col("decile"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("decile")).agg(sum(col("n")).as("n_tot"))
    cells.join(broadcast(tot), Seq("decile"))
      .select(col("decile"), col("event_type"), col("n"),
        expr("n * 10000L DIV n_tot").as("share_bp"))
  }

  val oIntensityTypeMix: String =
    """WITH d AS (
      |  SELECT user_id,
      |    CAST(ntile(10) OVER (ORDER BY count(*), user_id) AS BIGINT)
      |      AS decile
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT d.decile, e.event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events e JOIN d USING (user_id)
      |  GROUP BY 1, 2),
      |tot AS (SELECT decile, CAST(sum(n) AS BIGINT) AS n_tot
      |        FROM cells GROUP BY 1)
      |SELECT c.decile, c.event_type, c.n,
      |  CAST(c.n * 10000 // t.n_tot AS BIGINT) AS share_bp
      |FROM cells c JOIN tot t USING (decile)""".stripMargin

  // ---- regional trade imbalance: each region's share of SUPPLY
  //      revenue (via the supplier dim) vs its share of DEMAND revenue
  //      (via orders→customer), imbalance in basis points — two
  //      dim-broadcast rollups full-outer-merged on the region domain ----
  def qRegionImbalance(s: SparkSession, dir: String): DataFrame = {
    val regionOf = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
      .join(broadcast(t(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
    val supply = li
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(regionOf), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name")).agg(sum(col("rev_c")).as("supply_c"))
    val demand = li
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(regionOf.select(col("n_nationkey").as("cn"),
        col("r_name"))), col("c_nationkey") === col("cn"))
      .groupBy(col("r_name")).agg(sum(col("rev_c")).as("demand_c"))
    val j = supply.join(demand, Seq("r_name"), "full")
      .select(col("r_name"), coalesce(col("supply_c"), lit(0L)).as("s_c"),
        coalesce(col("demand_c"), lit(0L)).as("d_c"))
    val tot = j.agg(sum(col("s_c")).as("st"), sum(col("d_c")).as("dt"))
    j.crossJoin(broadcast(tot))
      .select(col("r_name"),
        expr("s_c * 10000L DIV st").as("supply_share_bp"),
        expr("d_c * 10000L DIV dt").as("demand_share_bp"),
        expr("s_c * 10000L DIV st - d_c * 10000L DIV dt")
          .as("imbalance_bp"))
  }

  val oRegionImbalance: String =
    """WITH ro AS (
      |  SELECT n_nationkey, r_name
      |  FROM nation JOIN region ON n_regionkey = r_regionkey),
      |li AS (SELECT l_orderkey, l_suppkey,
      |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS rev_c
      |  FROM lineitem),
      |supply AS (
      |  SELECT ro.r_name, CAST(sum(rev_c) AS BIGINT) AS s_c
      |  FROM li JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN ro ON s_nationkey = ro.n_nationkey GROUP BY 1),
      |demand AS (
      |  SELECT ro.r_name, CAST(sum(rev_c) AS BIGINT) AS d_c
      |  FROM li JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN ro ON c_nationkey = ro.n_nationkey GROUP BY 1),
      |j AS (
      |  SELECT coalesce(s.r_name, d.r_name) AS r_name,
      |    coalesce(s.s_c, 0) AS s_c, coalesce(d.d_c, 0) AS d_c
      |  FROM supply s FULL JOIN demand d ON s.r_name = d.r_name),
      |tot AS (SELECT CAST(sum(s_c) AS BIGINT) AS st,
      |               CAST(sum(d_c) AS BIGINT) AS dt FROM j)
      |SELECT r_name,
      |  CAST(s_c * 10000 // st AS BIGINT) AS supply_share_bp,
      |  CAST(d_c * 10000 // dt AS BIGINT) AS demand_share_bp,
      |  CAST(s_c * 10000 // st - d_c * 10000 // dt AS BIGINT)
      |    AS imbalance_bp
      |FROM j, tot""".stripMargin

  // ---- top-2 gap per nation: margin between the best and runner-up
  //      supplier balances — rank over the supplier DIMENSION inside
  //      each nation with a (bal desc, suppkey) total order, conditional
  //      min/max pivot of ranks 1 and 2 ----
  def qTop2Gap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("bal_c").desc, col("s_suppkey").asc)
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        floor(col("s_acctbal") * 100).cast("long").as("bal_c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("s_nationkey"))
      .agg(max(when(col("rn") === 1, col("bal_c"))).as("top_bal_c"),
        max(when(col("rn") === 2, col("bal_c"))).as("second_bal_c"))
      .select(col("s_nationkey"), col("top_bal_c"), col("second_bal_c"),
        (col("top_bal_c") - col("second_bal_c")).as("gap_c"))
  }

  val oTop2Gap: String =
    """WITH r AS (
      |  SELECT s_nationkey,
      |    CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_c,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY CAST(floor(s_acctbal * 100) AS BIGINT) DESC,
      |        s_suppkey ASC) AS rn
      |  FROM supplier)
      |SELECT s_nationkey,
      |  max(CASE WHEN rn = 1 THEN bal_c END) AS top_bal_c,
      |  max(CASE WHEN rn = 2 THEN bal_c END) AS second_bal_c,
      |  max(CASE WHEN rn = 1 THEN bal_c END) -
      |    max(CASE WHEN rn = 2 THEN bal_c END) AS gap_c
      |FROM r WHERE rn <= 2 GROUP BY 1""".stripMargin

  // ---- surrogate-key last-digit uniformity: digit census with an
  //      exact scaled χ² against uniform ((10·Σn_d² − n²)·1000/n, all
  //      integer) — the key-generation health check ----
  def qKeyDigitUniformity(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "orders")
      .select((col("o_orderkey") % 10).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
    // n_d ≈ N/10, so n_d² wraps a long at N ≈ 3·10¹⁰ rows → staged
    val summary = d.agg(sum(col("n_d")).as("n"),
        sum(col("n_d").cast("decimal(38,0)") * col("n_d")).as("s2"))
      .select(col("n"),
        expr("CAST((10 * CAST(s2 AS DECIMAL(38,0)) - " +
          "CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))) * 1000 " +
          "DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)").as("chi2_x1000"))
    d.crossJoin(broadcast(summary))
      .select(col("digit"), col("n_d"),
        expr("n_d * 10000L DIV n").as("share_bp"), col("chi2_x1000"))
  }

  val oKeyDigitUniformity: String =
    """WITH d AS (
      |  SELECT o_orderkey % 10 AS digit, CAST(count(*) AS BIGINT) AS n_d
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT CAST(sum(n_d) AS BIGINT) AS n,
      |    CAST((10 * sum(n_d::HUGEINT * n_d) -
      |      CAST(sum(n_d) AS HUGEINT) * CAST(sum(n_d) AS HUGEINT)) * 1000
      |      // CAST(sum(n_d) AS HUGEINT) AS BIGINT) AS chi2_x1000
      |  FROM d)
      |SELECT digit, n_d, CAST(n_d * 10000 // n AS BIGINT) AS share_bp,
      |  chi2_x1000
      |FROM d, s""".stripMargin

  // ---- ordering-rhythm regularity: relative variance of each
  //      customer's inter-order gaps (per-customer sequence lag —
  //      bounded partitions), DECIMAL(38,0)-staged, banded histogram ----
  def qOrderRegularity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"))
      .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col("o_custkey"))
      // gap² ≤ span² (~10⁸) but per-customer order counts are
      // generator-dependent → staged rather than a prose bound
      .agg(count(lit(1)).as("n"), sum(col("gap")).as("s1"),
        sum(col("gap").cast("decimal(38,0)") * col("gap")).as("s2"))
      .filter(col("n") >= 2L && col("s1") > 0L)
      .select(expr("CAST((CAST(n AS DECIMAL(38,0)) * " +
        "CAST(s2 AS DECIMAL(38,0)) - CAST(s1 AS DECIMAL(38,0)) * " +
        "CAST(s1 AS DECIMAL(38,0))) * 10000 DIV " +
        "(CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))) " +
        "AS BIGINT) DIV 5000").as("regularity_band"))
      .groupBy(col("regularity_band"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val oOrderRegularity: String =
    """WITH g AS (
      |  SELECT o_custkey,
      |    epoch_us(o_orderdate) // 86400000000 -
      |    lag(epoch_us(o_orderdate) // 86400000000)
      |      OVER (PARTITION BY o_custkey
      |        ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey)
      |      AS gap
      |  FROM orders),
      |per AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(gap) AS BIGINT) AS s1,
      |    sum(gap::HUGEINT * gap) AS s2
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT CAST((n::HUGEINT * s2::HUGEINT - s1::HUGEINT * s1::HUGEINT)
      |    * 10000 // (s1::HUGEINT * s1::HUGEINT) AS BIGINT) // 5000
      |    AS regularity_band,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM per WHERE n >= 2 AND s1 > 0 GROUP BY 1""".stripMargin

  // ---- are frequent tokens shorter (Zipf's law of abbreviation)?
  //      Exact Pearson r between token length and corpus frequency over
  //      the AGGREGATED vocabulary — DECIMAL(38,0) moments, sqrt only
  //      at the closing division ----
  def qTokenLenFreqCorr(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(length(col("tok")).cast("long").as("x"), col("cnt").as("y"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(col("n").cast("long").as("n_tokens"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("r"))
  }

  val oTokenLenFreqCorr: String =
    """WITH v AS (
      |  SELECT CAST(length(tok) AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY tok),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x::HUGEINT) AS HUGEINT) AS sx,
      |    CAST(sum(y::HUGEINT) AS HUGEINT) AS sy,
      |    CAST(sum(x::HUGEINT * x::HUGEINT) AS HUGEINT) AS sxx,
      |    CAST(sum(y::HUGEINT * y::HUGEINT) AS HUGEINT) AS syy,
      |    CAST(sum(x::HUGEINT * y::HUGEINT) AS HUGEINT) AS sxy
      |  FROM v)
      |SELECT CAST(n AS BIGINT) AS n_tokens,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
      |FROM m""".stripMargin

  // ---- event-stream exact-duplicate audit: identical (user, ts, type,
  //      value) tuples — the double-fire signal; one hash reduction,
  //      one summary row ----
  def qEventDups(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("user_id"), col("ts"), col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_distinct_tuples"),
        sum(when(col("n") > 1L, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(col("n") - 1L).as("n_extra_rows"),
        max(col("n")).as("max_group"))

  val oEventDups: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(floor(value * 100) AS BIGINT) AS v_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2, 3, 4)
      |SELECT CAST(count(*) AS BIGINT) AS n_distinct_tuples,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_groups,
      |  CAST(sum(n - 1) AS BIGINT) AS n_extra_rows,
      |  max(n) AS max_group
      |FROM g""".stripMargin

  // ---- zero-discount census per brand: full-price line share and the
  //      parts NEVER discounted — a per-part max reduction beside the
  //      per-brand line rollup, merged on the brand domain ----
  def qZeroDiscount(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val lines = li.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("disc_pct") === 0L, 1L).otherwise(0L))
          .as("n_full_price"))
    val never = li.groupBy(col("p_brand"), col("l_partkey"))
      .agg(max(col("disc_pct")).as("max_disc"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("max_disc") === 0L, 1L).otherwise(0L))
          .as("n_never_discounted"))
    lines.join(never, Seq("p_brand"))
      .select(col("p_brand"), col("n_lines"), col("n_parts"),
        col("n_never_discounted"),
        expr("n_full_price * 10000L DIV n_lines").as("full_price_bp"))
  }

  val oZeroDiscount: String =
    """WITH li AS (
      |  SELECT p_brand, l_partkey,
      |    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |lines AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(CASE WHEN disc_pct = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_full_price
      |  FROM li GROUP BY 1),
      |nev AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(sum(CASE WHEN max_disc = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_never_discounted
      |  FROM (SELECT p_brand, l_partkey, max(disc_pct) AS max_disc
      |        FROM li GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT l.p_brand, l.n_lines, n.n_parts, n.n_never_discounted,
      |  CAST(l.n_full_price * 10000 // l.n_lines AS BIGINT)
      |    AS full_price_bp
      |FROM lines l JOIN nev n USING (p_brand)""".stripMargin

  // ---- empty-input parity sentinel: a filter that matches NOTHING,
  //      closed with coalesced global aggregates — both engines must
  //      emit exactly one all-zeros row (the qResurrection
  //      empty-input-divergence regression, graded forever) ----
  def qEmptyInputParity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_totalprice") < 0.0)
      .select(floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("price_c")), lit(0L)).as("total_c"),
        coalesce(max(col("price_c")), lit(-1L)).as("max_c"))

  val oEmptyInputParity: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(coalesce(sum(CAST(floor(o_totalprice * 100) AS BIGINT)), 0)
      |    AS BIGINT) AS total_c,
      |  CAST(coalesce(max(CAST(floor(o_totalprice * 100) AS BIGINT)), -1)
      |    AS BIGINT) AS max_c
      |FROM orders WHERE o_totalprice < 0.0::DOUBLE""".stripMargin

  // ---- month-end loading (sales pull-forward audit): share of each
  //      month's revenue booked in its LAST FIVE calendar days, month
  //      length from the NATIVE last_day in both engines ----
  def qMonthEndLoading(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(expr("(CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) - " +
        "1970) * 12 + CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) - 1")
        .as("month_num"),
        dayofmonth(col("o_orderdate").cast("date")).cast("long").as("dom"),
        dayofmonth(last_day(col("o_orderdate").cast("date"))).cast("long")
          .as("last_dom"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("month_num"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_c"),
        sum(when(col("dom") > col("last_dom") - 5L, col("price_c"))
          .otherwise(0L)).as("rev5_c"))
      .select(col("month_num"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("rev5_c * 10000L DIV rev_c").as("last5_share_bp"))

  val oMonthEndLoading: String =
    """WITH m AS (
      |  SELECT (CAST(year(o_orderdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(o_orderdate) AS BIGINT) - 1 AS month_num,
      |    CAST(day(o_orderdate) AS BIGINT) AS dom,
      |    CAST(day(last_day(o_orderdate)) AS BIGINT) AS last_dom,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders)
      |SELECT month_num, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(sum(CASE WHEN dom > last_dom - 5 THEN price_c ELSE 0 END)
      |    * 10000 // sum(price_c) AS BIGINT) AS last5_share_bp
      |FROM m GROUP BY 1""".stripMargin

  // ---- Spearman rank correlation of part price vs size: min-rank
  //      (rank()) assignment over the PART dimension in both engines,
  //      then the exact decimal Pearson moments over the ranks ----
  def qSpearman(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranked = t(s, dir, "part")
      .select(floor(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size").cast("long").as("size"))
      .withColumn("rx", rank().over(Window.orderBy(col("price_c")))
        .cast("long"))
      .withColumn("ry", rank().over(Window.orderBy(col("size")))
        .cast("long"))
    ranked.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("rx").cast(dec)).as("sx"), sum(col("ry").cast(dec)).as("sy"),
        sum(col("rx").cast(dec) * col("rx").cast(dec)).as("sxx"),
        sum(col("ry").cast(dec) * col("ry").cast(dec)).as("syy"),
        sum(col("rx").cast(dec) * col("ry").cast(dec)).as("sxy"))
      .select(col("n").cast("long").as("n_parts"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("rho"))
  }

  val oSpearman: String =
    """WITH ranked AS (
      |  SELECT
      |    CAST(rank() OVER (ORDER BY CAST(floor(p_retailprice * 100)
      |      AS BIGINT)) AS BIGINT) AS rx,
      |    CAST(rank() OVER (ORDER BY CAST(p_size AS BIGINT)) AS BIGINT)
      |      AS ry
      |  FROM part),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(rx::HUGEINT) AS HUGEINT) AS sx,
      |    CAST(sum(ry::HUGEINT) AS HUGEINT) AS sy,
      |    CAST(sum(rx::HUGEINT * rx::HUGEINT) AS HUGEINT) AS sxx,
      |    CAST(sum(ry::HUGEINT * ry::HUGEINT) AS HUGEINT) AS syy,
      |    CAST(sum(rx::HUGEINT * ry::HUGEINT) AS HUGEINT) AS sxy
      |  FROM ranked)
      |SELECT CAST(n AS BIGINT) AS n_parts,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
      |FROM m""".stripMargin

  // ---- exact log2 value bands: the binary-string length of the cent
  //      value (⌊log2 v⌋+1 without any floating log — NATIVE bin() in
  //      both engines), a true log-scale histogram in pure integers ----
  def qLog2ValueBands(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(floor(col("value") * 100).cast("long").as("v_c"))
      .filter(col("v_c") > 0L)
      .select(length(expr("bin(v_c)")).cast("long").as("log2_band"),
        col("v_c"))
      .groupBy(col("log2_band"))
      .agg(count(lit(1)).as("n_events"), min(col("v_c")).as("min_c"),
        max(col("v_c")).as("max_c"))

  val oLog2ValueBands: String =
    """WITH v AS (
      |  SELECT CAST(floor(value * 100) AS BIGINT) AS v_c FROM events
      |  WHERE CAST(floor(value * 100) AS BIGINT) > 0)
      |SELECT CAST(length(bin(v_c)) AS BIGINT) AS log2_band,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(v_c) AS min_c, max(v_c) AS max_c
      |FROM v GROUP BY 1""".stripMargin

  // ---- engagement survival curve: share of users reaching ≥k lifetime
  //      events at the power-of-two ladder — per-user reduction, six
  //      conditional sums, stacked to rows ----
  def qEngagementSurvival(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("n") >= 1L, 1L).otherwise(0L)).as("k1"),
        sum(when(col("n") >= 2L, 1L).otherwise(0L)).as("k2"),
        sum(when(col("n") >= 4L, 1L).otherwise(0L)).as("k4"),
        sum(when(col("n") >= 8L, 1L).otherwise(0L)).as("k8"),
        sum(when(col("n") >= 16L, 1L).otherwise(0L)).as("k16"),
        sum(when(col("n") >= 32L, 1L).otherwise(0L)).as("k32"))
      .select(expr("stack(6, 1L, k1, 2L, k2, 4L, k4, 8L, k8, 16L, k16, " +
        "32L, k32) AS (k, n_users)"), col("total"))
      .select(col("k"), col("n_users"),
        expr("n_users * 10000L DIV total").as("share_bp"))

  val oEngagementSurvival: String =
    """WITH per AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS total,
      |    CAST(sum(CASE WHEN n >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
      |    CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
      |    CAST(sum(CASE WHEN n >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS k4,
      |    CAST(sum(CASE WHEN n >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS k8,
      |    CAST(sum(CASE WHEN n >= 16 THEN 1 ELSE 0 END) AS BIGINT) AS k16,
      |    CAST(sum(CASE WHEN n >= 32 THEN 1 ELSE 0 END) AS BIGINT) AS k32
      |  FROM per),
      |st AS (
      |  SELECT 1 AS k, k1 AS n_users, total FROM a
      |  UNION ALL SELECT 2, k2, total FROM a
      |  UNION ALL SELECT 4, k4, total FROM a
      |  UNION ALL SELECT 8, k8, total FROM a
      |  UNION ALL SELECT 16, k16, total FROM a
      |  UNION ALL SELECT 32, k32, total FROM a)
      |SELECT CAST(k AS BIGINT) AS k, n_users,
      |  CAST(n_users * 10000 // total AS BIGINT) AS share_bp
      |FROM st""".stripMargin

  // ---- top-10 ranking stability: Jaccard overlap (bp) between
  //      consecutive quarters' top-10 brand sets — rank inside the
  //      bounded quarter×brand cell domain, membership equi-join on
  //      (brand, quarter+1) ----
  def qTopkStability(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("((CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) - 1970) " +
          "* 12 + CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) - 1) " +
          "DIV 3").as("q"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("q"), col("p_brand"))
      .agg(sum(col("rev_c")).as("rev_c"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("rev_c").desc, col("p_brand").asc)
    val top = cells.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select(col("q"), col("p_brand"))
    val nxt = top.select((col("q") - 1L).as("q"), col("p_brand"))
    top.join(nxt, Seq("q", "p_brand"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n_common"))
      .select(col("q"), (col("q") + 1L).as("q_next"), col("n_common"),
        expr("n_common * 10000L DIV (20 - n_common)").as("jaccard_bp"))
  }

  val oTopkStability: String =
    """WITH cells AS (
      |  SELECT ((CAST(year(l_shipdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(l_shipdate) AS BIGINT) - 1) // 3 AS q,
      |    p_brand,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT q, p_brand FROM (
      |    SELECT q, p_brand,
      |      row_number() OVER (PARTITION BY q
      |        ORDER BY rev_c DESC, p_brand ASC) AS rn
      |    FROM cells) WHERE rn <= 10),
      |j AS (
      |  SELECT a.q, CAST(count(*) AS BIGINT) AS n_common
      |  FROM top a JOIN top b ON a.p_brand = b.p_brand AND b.q = a.q + 1
      |  GROUP BY 1)
      |SELECT q, q + 1 AS q_next, n_common,
      |  CAST(n_common * 10000 // (20 - n_common) AS BIGINT) AS jaccard_bp
      |FROM j""".stripMargin

  // ---- basket-size trend: monthly lines-per-order and quantity-per-
  //      line means as exact cross-multiplied basis points ----
  def qAvgBasketTrend(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("(CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) - 1970) " +
          "* 12 + CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) - 1")
          .as("month_num"),
        floor(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("month_num"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"), sum(col("qty")).as("tot_qty"))
      .select(col("month_num"), col("n_orders"), col("n_lines"),
        expr("n_lines * 10000L DIV n_orders").as("lines_per_order_bp"),
        expr("tot_qty * 10000L DIV n_lines").as("qty_per_line_bp"))

  val oAvgBasketTrend: String =
    """WITH m AS (
      |  SELECT (CAST(year(l_shipdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(l_shipdate) AS BIGINT) - 1 AS month_num,
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |    CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
      |      AS tot_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT month_num, n_orders, n_lines,
      |  CAST(n_lines * 10000 // n_orders AS BIGINT) AS lines_per_order_bp,
      |  CAST(tot_qty * 10000 // n_lines AS BIGINT) AS qty_per_line_bp
      |FROM m""".stripMargin

  // ---- sign test on monthly revenue direction: up-months vs total
  //      compared months, z = (2·up − n)/√n (one division, one
  //      correctly-rounded sqrt — deterministic in both engines) ----
  def qSignTest(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select(expr("(CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) - " +
        "1970) * 12 + CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) - 1")
        .as("m"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("m")).agg(sum(col("price_c")).as("rev_c"))
    val prev = m.select((col("m") + 1L).as("m"), col("rev_c").as("prev_c"))
    m.join(prev, Seq("m"))
      .agg(count(lit(1)).as("n_compared"),
        sum(when(col("rev_c") > col("prev_c"), 1L).otherwise(0L))
          .as("n_up"))
      .select(col("n_compared"), col("n_up"),
        ((lit(2.0) * col("n_up").cast("double") -
          col("n_compared").cast("double")) /
          sqrt(col("n_compared").cast("double"))).as("z"))
  }

  val oSignTest: String =
    """WITH m AS (
      |  SELECT (CAST(year(o_orderdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(o_orderdate) AS BIGINT) - 1 AS m,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |j AS (
      |  SELECT a.rev_c, p.rev_c AS prev_c
      |  FROM m a JOIN m p ON a.m = p.m + 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_compared,
      |  CAST(sum(CASE WHEN rev_c > prev_c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_up,
      |  (2.0::DOUBLE * sum(CASE WHEN rev_c > prev_c THEN 1 ELSE 0 END)
      |    ::DOUBLE - count(*)::DOUBLE) / sqrt(count(*)::DOUBLE) AS z
      |FROM j""".stripMargin

  // ---- price realization by brand: where in its own part's observed
  //      unit-price range each sale lands ((u−min)·10000/(max−min)),
  //      integer mean per brand — per-part range broadcast back onto
  //      the lines ----
  def qPriceRealization(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(l_extendedprice * 100.0D / l_quantity) AS BIGINT)")
          .as("unit_c"))
    val rng = li.groupBy(col("l_partkey"))
      .agg(min(col("unit_c")).as("mn"), max(col("unit_c")).as("mx"))
      .filter(col("mx") > col("mn"))
      .select(col("l_partkey").as("pk"), col("mn"), col("mx"))
    li.join(rng, col("l_partkey") === col("pk"))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("(unit_c - mn) * 10000L DIV (mx - mn)").as("pos_bp"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        expr("sum(pos_bp) DIV count(1)").as("mean_pos_bp"))
  }

  val oPriceRealization: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(floor(l_extendedprice * 100.0::DOUBLE / l_quantity)
      |      AS BIGINT) AS unit_c
      |  FROM lineitem),
      |rng AS (
      |  SELECT l_partkey AS pk, min(unit_c) AS mn, max(unit_c) AS mx
      |  FROM li GROUP BY 1 HAVING max(unit_c) > min(unit_c))
      |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum((unit_c - mn) * 10000 // (mx - mn)) // count(*)
      |    AS BIGINT) AS mean_pos_bp
      |FROM li JOIN rng ON li.l_partkey = rng.pk
      |JOIN part ON li.l_partkey = p_partkey
      |GROUP BY 1""".stripMargin

  // ---- mean−median gap per event type (Pearson's skew direction
  //      without moments): integer mean by cross-multiply beside the
  //      exact median crossing, both from ONE reduced (type × cent)
  //      histogram ----
  def qMeanMedianGap(s: SparkSession, dir: String): DataFrame = {
    val hist = events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("v_c")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy(col("event_type"))
      // Σ v_c·n ≡ Σ of raw cent values (linear envelope ~N·10⁷ — wraps a
      // long at ~10¹² rows) → DECIMAL(38,0) headroom; DIV stays BIGINT
      .agg(sum(col("n")).as("n_tot"),
        sum(col("v_c").cast("decimal(38,0)") * col("n")).as("sv"))
    hist.withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n_tot")).as("n_events"),
        expr("max(sv) DIV max(n_tot)").as("mean_c"),
        min(when(col("cum") * 2 >= col("n_tot"), col("v_c")))
          .as("median_c"))
      .select(col("event_type"), col("n_events"), col("mean_c"),
        col("median_c"), (col("mean_c") - col("median_c")).as("gap_c"))
  }

  val oMeanMedianGap: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v_c,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY v_c)
      |      AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_tot,
      |    sum(v_c::HUGEINT * n) OVER (PARTITION BY event_type)
      |      AS sv
      |  FROM hist)
      |SELECT event_type, max(n_tot) AS n_events,
      |  CAST(max(sv) // max(n_tot) AS BIGINT) AS mean_c,
      |  min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS median_c,
      |  CAST(max(sv) // max(n_tot) -
      |    min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS BIGINT) AS gap_c
      |FROM cum GROUP BY 1""".stripMargin

  // ---- per-type overdispersion: Fano factor (var/mean) of DAILY event
  //      counts per type in exact scaled integers — (nΣc²−S²)·10000 /
  //      (n·S), DECIMAL(38,0)-staged ----
  def qTypeFano(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"),
        // Σc² of unbounded per-day counts → staged BEFORE the sum
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      .select(col("event_type"), col("n_days"), col("total"),
        expr("CAST((CAST(n_days AS DECIMAL(38,0)) * " +
          "CAST(s2 AS DECIMAL(38,0)) - CAST(total AS DECIMAL(38,0)) * " +
          "CAST(total AS DECIMAL(38,0))) * 10000 DIV " +
          "(CAST(n_days AS DECIMAL(38,0)) * CAST(total AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("fano_bp"))

  val oTypeFano: String =
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |per AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(c) AS BIGINT) AS total,
      |    sum(c::HUGEINT * c) AS s2
      |  FROM d GROUP BY 1)
      |SELECT event_type, n_days, total,
      |  CAST((n_days::HUGEINT * s2::HUGEINT - total::HUGEINT *
      |    total::HUGEINT) * 10000 // (n_days::HUGEINT * total::HUGEINT)
      |    AS BIGINT) AS fano_bp
      |FROM per""".stripMargin

  // ---- customer balance spread per nation: exact p10/p90 crossings of
  //      the cumulative over the reduced (nation × cent-balance)
  //      domain; balances are negative-capable — crossings only compare
  //      counts, no integer division near the sign ----
  def qBalanceSpread(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "customer")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
      .groupBy(col("c_nationkey"), col("bal_c"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("bal_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy(col("c_nationkey"))
      .agg(sum(col("n")).as("n_tot"))
    hist.withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(tot), Seq("c_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(max(col("n_tot")).as("n_customers"),
        min(when(col("cum") * 10 >= col("n_tot"), col("bal_c")))
          .as("p10_c"),
        min(when(col("cum") * 10 >= col("n_tot") * 9, col("bal_c")))
          .as("p90_c"))
      .select(col("c_nationkey"), col("n_customers"), col("p10_c"),
        col("p90_c"), (col("p90_c") - col("p10_c")).as("spread_c"))
  }

  val oBalanceSpread: String =
    """WITH hist AS (
      |  SELECT c_nationkey, CAST(floor(c_acctbal * 100) AS BIGINT)
      |      AS bal_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2),
      |cum AS (
      |  SELECT c_nationkey, bal_c,
      |    CAST(sum(n) OVER (PARTITION BY c_nationkey ORDER BY bal_c)
      |      AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_tot
      |  FROM hist)
      |SELECT c_nationkey, max(n_tot) AS n_customers,
      |  min(CASE WHEN cum * 10 >= n_tot THEN bal_c END) AS p10_c,
      |  min(CASE WHEN cum * 10 >= n_tot * 9 THEN bal_c END) AS p90_c,
      |  min(CASE WHEN cum * 10 >= n_tot * 9 THEN bal_c END) -
      |    min(CASE WHEN cum * 10 >= n_tot THEN bal_c END) AS spread_c
      |FROM cum GROUP BY 1""".stripMargin

  // ---- Laspeyres price index: monthly price level against the base
  //      month's quantity basket — per-(part, month) mean unit price
  //      (integer div), base = each part's FIRST month, index =
  //      Σ(q₀·p_t)·10000 / Σ(q₀·p₀) with DECIMAL-staged products ----
  def qPriceIndex(s: SparkSession, dir: String): DataFrame = {
    val pm = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("(CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) - 1970) " +
          "* 12 + CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) - 1")
          .as("m"),
        expr("CAST(floor(l_extendedprice * 100.0D / l_quantity) " +
          "AS BIGINT)").as("unit_c"),
        floor(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_partkey"), col("m"))
      .agg(expr("sum(unit_c) DIV count(1)").as("p"),
        sum(col("qty")).as("q"))
    val base = pm.groupBy(col("l_partkey"))
      .agg(min(col("m")).as("m0"))
      .select(col("l_partkey").as("bpk"), col("m0"))
    val b = pm.join(base,
        col("l_partkey") === col("bpk") && col("m") === col("m0"))
      .select(col("bpk").as("pk"), col("p").as("p0"), col("q").as("q0"))
    pm.join(b, col("l_partkey") === col("pk"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_parts"),
        expr("CAST(sum(CAST(q0 AS DECIMAL(38,0)) * " +
          "CAST(p AS DECIMAL(38,0))) * 10000 DIV " +
          "sum(CAST(q0 AS DECIMAL(38,0)) * CAST(p0 AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("index_bp"))
  }

  val oPriceIndex: String =
    """WITH pm AS (
      |  SELECT l_partkey,
      |    (CAST(year(l_shipdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(l_shipdate) AS BIGINT) - 1 AS m,
      |    CAST(sum(CAST(floor(l_extendedprice * 100.0::DOUBLE /
      |      l_quantity) AS BIGINT)) AS BIGINT) // count(*) AS p,
      |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |base AS (
      |  SELECT l_partkey AS pk, arg_min(p, m) AS p0, arg_min(q, m) AS q0
      |  FROM pm GROUP BY 1)
      |SELECT m, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(q0::HUGEINT * p::HUGEINT) * 10000 //
      |    sum(q0::HUGEINT * p0::HUGEINT) AS BIGINT) AS index_bp
      |FROM pm JOIN base ON pm.l_partkey = base.pk
      |GROUP BY 1""".stripMargin

  // ---- supplier k-90: how many suppliers (largest first) carry 90% of
  //      line volume — cumulative over the supplier DIMENSION in
  //      (volume desc, suppkey) order, first crossing ----
  def qSupplierK90(s: SparkSession, dir: String): DataFrame = {
    val vol = t(s, dir, "lineitem").groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("v"))
    val w = Window.orderBy(col("v").desc, col("l_suppkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vol.withColumn("cum", sum(col("v")).over(w))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").desc, col("l_suppkey").asc)).cast("long"))
      .crossJoin(broadcast(vol.agg(sum(col("v")).as("tot"),
        count(lit(1)).as("n_suppliers"))))
      .filter(col("cum") * 10 >= col("tot") * 9)
      .agg(max(col("n_suppliers")).as("n_suppliers"),
        min(col("rn")).as("k90"))
      .select(col("n_suppliers"), col("k90"),
        expr("k90 * 10000L DIV n_suppliers").as("k90_share_bp"))
  }

  val oSupplierK90: String =
    """WITH vol AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT CAST(sum(v) OVER (ORDER BY v DESC, l_suppkey ASC)
      |      AS BIGINT) AS cum,
      |    CAST(row_number() OVER (ORDER BY v DESC, l_suppkey ASC)
      |      AS BIGINT) AS rn,
      |    CAST(sum(v) OVER () AS BIGINT) AS tot,
      |    CAST(count(*) OVER () AS BIGINT) AS n_suppliers
      |  FROM vol)
      |SELECT max(n_suppliers) AS n_suppliers, min(rn) AS k90,
      |  CAST(min(rn) * 10000 // max(n_suppliers) AS BIGINT)
      |    AS k90_share_bp
      |FROM c WHERE cum * 10 >= tot * 9""".stripMargin

  // ---- does a big first basket predict repeat buying? First order
  //      pinned by the padded (date, orderkey) min_by key, its line
  //      count banded, repeat share per band in basis points ----
  def qFirstBasketRepeat(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        format_string("%010d|%012d",
          expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
            "DATE'1970-01-01') AS BIGINT)"), col("o_orderkey")).as("k"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        min_by(col("o_orderkey"), col("k")).as("first_orderkey"))
    val sizes = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("first_size"))
    per.join(sizes, col("first_orderkey") === col("l_orderkey"), "left")
      .select(coalesce(col("first_size"), lit(0L)).as("first_size"),
        (col("n_orders") >= 2L).as("repeated"))
      .groupBy(col("first_size"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("repeated"), 1L).otherwise(0L)).as("n_repeat"))
      .select(col("first_size"), col("n_customers"), col("n_repeat"),
        expr("n_repeat * 10000L DIV n_customers").as("repeat_bp"))
  }

  val oFirstBasketRepeat: String =
    """WITH per AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |    arg_min(o_orderkey, printf('%010d|%012d',
      |      epoch_us(o_orderdate) // 86400000000, o_orderkey))
      |      AS first_orderkey
      |  FROM orders GROUP BY 1),
      |sz AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS first_size
      |       FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT coalesce(sz.first_size, 0) AS first_size,
      |    per.n_orders >= 2 AS repeated
      |  FROM per LEFT JOIN sz ON per.first_orderkey = sz.l_orderkey)
      |SELECT first_size, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CASE WHEN repeated THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeat,
      |  CAST(sum(CASE WHEN repeated THEN 1 ELSE 0 END) * 10000 //
      |    count(*) AS BIGINT) AS repeat_bp
      |FROM j GROUP BY 1""".stripMargin

  // ---- underwater runs: how long daily revenue stays below its
  //      running peak — gaps-and-islands over the POSITION index of the
  //      bounded day series (day gaps don't break runs incorrectly) ----
  def qUnderwaterRuns(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE'1970-01-01') AS BIGINT)").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("day")).agg(sum(col("price_c")).as("rev_c"))
    val w = Window.orderBy(col("day"))
    val flagged = daily
      .withColumn("run_max", max(col("rev_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("rev_c") < col("run_max"))
    flagged
      .withColumn("island", col("pos") - row_number().over(
        Window.orderBy(col("pos"))))
      .groupBy(col("island")).agg(count(lit(1)).as("run_len"))
      .agg(sum(col("run_len")).as("n_underwater_days"),
        count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"))
  }

  val oUnderwaterRuns: String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |f AS (
      |  SELECT day, rev_c,
      |    CAST(max(rev_c) OVER (ORDER BY day) AS BIGINT) AS run_max,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS pos
      |  FROM daily),
      |u AS (
      |  SELECT pos - row_number() OVER (ORDER BY pos) AS island
      |  FROM f WHERE rev_c < run_max),
      |g AS (SELECT island, CAST(count(*) AS BIGINT) AS run_len
      |      FROM u GROUP BY 1)
      |SELECT CAST(sum(run_len) AS BIGINT) AS n_underwater_days,
      |  CAST(count(*) AS BIGINT) AS n_runs, max(run_len) AS max_run
      |FROM g""".stripMargin

  // ---- exclusive vocabulary: tokens only ONE source ever uses — per-
  //      token distinct-source reduction, exclusive share per source ----
  def qExclusiveVocab(s: SparkSession, dir: String): DataFrame = {
    val st = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    val perTok = st.groupBy(col("tok"))
      .agg(count(lit(1)).as("n_sources"), min(col("source")).as("only_src"))
    val excl = perTok.filter(col("n_sources") === 1L)
      .groupBy(col("only_src").as("source"))
      .agg(count(lit(1)).as("n_exclusive"))
    st.groupBy(col("source")).agg(count(lit(1)).as("n_vocab"))
      .join(excl, Seq("source"), "left")
      .select(col("source"), col("n_vocab"),
        coalesce(col("n_exclusive"), lit(0L)).as("n_exclusive"),
        expr("coalesce(n_exclusive, 0L) * 10000L DIV n_vocab")
          .as("exclusive_bp"))
  }

  val oExclusiveVocab: String =
    """WITH st AS (
      |  SELECT DISTINCT source, tok FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  WHERE tok <> ''),
      |pt AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS n_sources,
      |    min(source) AS only_src
      |  FROM st GROUP BY 1),
      |ex AS (
      |  SELECT only_src AS source, CAST(count(*) AS BIGINT) AS n_exclusive
      |  FROM pt WHERE n_sources = 1 GROUP BY 1),
      |v AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vocab
      |      FROM st GROUP BY 1)
      |SELECT v.source, v.n_vocab,
      |  coalesce(ex.n_exclusive, 0) AS n_exclusive,
      |  CAST(coalesce(ex.n_exclusive, 0) * 10000 // v.n_vocab AS BIGINT)
      |    AS exclusive_bp
      |FROM v LEFT JOIN ex ON v.source = ex.source""".stripMargin

  // ---- weekend-order latency: do weekend-placed orders ship slower?
  //      Two-cohort mean latency in exact centidays from ONE scan of
  //      the joined facts, plus the difference ----
  def qWeekendLatency(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("sday"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("sday") - col("oday")).as("lat"),
        expr("((oday + 4) % 7) IN (0, 6)").as("weekend"))
      .agg(sum(when(col("weekend"), 1L).otherwise(0L)).as("n_we"),
        sum(when(col("weekend"), col("lat")).otherwise(0L)).as("lat_we"),
        sum(when(!col("weekend"), 1L).otherwise(0L)).as("n_wd"),
        sum(when(!col("weekend"), col("lat")).otherwise(0L)).as("lat_wd"))
      .select(col("n_we"), col("n_wd"),
        expr("lat_we * 100L DIV n_we").as("we_mean_cd"),
        expr("lat_wd * 100L DIV n_wd").as("wd_mean_cd"),
        expr("lat_we * 100L DIV n_we - lat_wd * 100L DIV n_wd")
          .as("diff_cd"))

  val oWeekendLatency: String =
    """WITH j AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 -
      |    epoch_us(o_orderdate) // 86400000000 AS lat,
      |    ((epoch_us(o_orderdate) // 86400000000 + 4) % 7) IN (0, 6)
      |      AS weekend
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT
      |  CAST(sum(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
      |  CAST(sum(CASE WHEN NOT weekend THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_wd,
      |  CAST(sum(CASE WHEN weekend THEN lat ELSE 0 END) * 100 //
      |    sum(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT)
      |    AS we_mean_cd,
      |  CAST(sum(CASE WHEN NOT weekend THEN lat ELSE 0 END) * 100 //
      |    sum(CASE WHEN NOT weekend THEN 1 ELSE 0 END) AS BIGINT)
      |    AS wd_mean_cd,
      |  CAST(sum(CASE WHEN weekend THEN lat ELSE 0 END) * 100 //
      |    sum(CASE WHEN weekend THEN 1 ELSE 0 END) -
      |    sum(CASE WHEN NOT weekend THEN lat ELSE 0 END) * 100 //
      |    sum(CASE WHEN NOT weekend THEN 1 ELSE 0 END) AS BIGINT)
      |    AS diff_cd
      |FROM j""".stripMargin

  // ---- timestamp-precision audit: how precise are event timestamps —
  //      whole-second / whole-millisecond / sub-millisecond census over
  //      the normalized epoch-nanos (exercises the EventTime
  //      normalization the events() loaders share) ----
  def qTsPrecision(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(expr("(ts DIV 1000) % 1000000").as("micro_rem"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("micro_rem") === 0L, 1L).otherwise(0L))
          .as("n_whole_second"),
        sum(when(col("micro_rem") % 1000L === 0L &&
          col("micro_rem") =!= 0L, 1L).otherwise(0L)).as("n_whole_ms"),
        sum(when(col("micro_rem") % 1000L =!= 0L, 1L).otherwise(0L))
          .as("n_sub_ms"))
      .select(col("n_events"), col("n_whole_second"), col("n_whole_ms"),
        col("n_sub_ms"),
        expr("n_whole_second * 10000L DIV n_events")
          .as("whole_second_bp"))

  val oTsPrecision: String =
    """WITH e AS (
      |  SELECT epoch_us(ts) % 1000000 AS micro_rem FROM events)
      |SELECT CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN micro_rem = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_whole_second,
      |  CAST(sum(CASE WHEN micro_rem % 1000 = 0 AND micro_rem <> 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_ms,
      |  CAST(sum(CASE WHEN micro_rem % 1000 <> 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_sub_ms,
      |  CAST(sum(CASE WHEN micro_rem = 0 THEN 1 ELSE 0 END) * 10000 //
      |    count(*) AS BIGINT) AS whole_second_bp
      |FROM e""".stripMargin

  // ---- monthly ARPU: event value per distinct active user per month,
  //      exact cents ----
  def qMonthlyArpu(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(expr("ts DIV (86400000000000 * 30)").as("period"),
        col("user_id"), floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_active"),
        sum(col("v_c")).as("v_c"))
      .select(col("period"), col("n_events"), col("n_active"),
        (col("v_c").cast("double") / lit(100.0)).as("value_sum"),
        expr("v_c DIV n_active").as("arpu_c"))

  val oMonthlyArpu: String =
    """WITH e AS (
      |  SELECT epoch_us(ts) // (86400000000 * 30) AS period, user_id,
      |    CAST(floor(value * 100) AS BIGINT) AS v_c
      |  FROM events)
      |SELECT period, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
      |  CAST(sum(v_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS value_sum,
      |  CAST(sum(v_c) // count(DISTINCT user_id) AS BIGINT) AS arpu_c
      |FROM e GROUP BY 1""".stripMargin

  // ---- non-positive value census per event type: the refund/garbage
  //      signal — counts, share, and the negative mass in exact cents ----
  def qNonpositiveValues(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("v_c") <= 0L, 1L).otherwise(0L)).as("n_nonpos"),
        sum(when(col("v_c") <= 0L, col("v_c")).otherwise(0L))
          .as("nonpos_mass_c"))
      .select(col("event_type"), col("n_events"), col("n_nonpos"),
        col("nonpos_mass_c"),
        expr("n_nonpos * 10000L DIV n_events").as("nonpos_bp"))

  val oNonpositiveValues: String =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN v_c <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_nonpos,
      |  CAST(sum(CASE WHEN v_c <= 0 THEN v_c ELSE 0 END) AS BIGINT)
      |    AS nonpos_mass_c,
      |  CAST(sum(CASE WHEN v_c <= 0 THEN 1 ELSE 0 END) * 10000 //
      |    count(*) AS BIGINT) AS nonpos_bp
      |FROM e GROUP BY 1""".stripMargin

  // ---- revenue-decile mobility: customers deciled by first-half and
  //      second-half spend (two USER-dimension ntiles, (rev, custkey)
  //      total orders), 10×10 transition matrix — the rank-mobility
  //      census ----
  def qDecileMobility(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val mid = o.agg(((min(col("day")) + max(col("day"))) / 2)
      .cast("long").as("mid"))
    val per = o.crossJoin(broadcast(mid))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("day") <= col("mid"), col("price_c"))
          .otherwise(0L)).as("rev1"),
        sum(when(col("day") > col("mid"), col("price_c"))
          .otherwise(0L)).as("rev2"))
    per
      .withColumn("d1", ntile(10).over(
        Window.orderBy(col("rev1"), col("o_custkey"))).cast("long"))
      .withColumn("d2", ntile(10).over(
        Window.orderBy(col("rev2"), col("o_custkey"))).cast("long"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val oDecileMobility: String =
    """WITH o AS (
      |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |mid AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o),
      |per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CASE WHEN day <= mid THEN price_c ELSE 0 END)
      |      AS BIGINT) AS rev1,
      |    CAST(sum(CASE WHEN day > mid THEN price_c ELSE 0 END)
      |      AS BIGINT) AS rev2
      |  FROM o, mid GROUP BY 1),
      |d AS (
      |  SELECT
      |    CAST(ntile(10) OVER (ORDER BY rev1, o_custkey) AS BIGINT) AS d1,
      |    CAST(ntile(10) OVER (ORDER BY rev2, o_custkey) AS BIGINT) AS d2
      |  FROM per)
      |SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_customers
      |FROM d GROUP BY 1, 2""".stripMargin

  // ---- brand rank trajectory: each brand's best/worst quarterly
  //      revenue rank and the range — ranks inside the bounded
  //      quarter×brand cell domain ----
  def qBrandRankRange(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("((CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) - 1970) " +
          "* 12 + CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) - 1) " +
          "DIV 3").as("q"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("q"), col("p_brand"))
      .agg(sum(col("rev_c")).as("rev_c"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("rev_c").desc, col("p_brand").asc)
    cells.withColumn("rank", row_number().over(w).cast("long"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_quarters"), min(col("rank")).as("best_rank"),
        max(col("rank")).as("worst_rank"))
      .select(col("p_brand"), col("n_quarters"), col("best_rank"),
        col("worst_rank"),
        (col("worst_rank") - col("best_rank")).as("rank_range"))
  }

  val oBrandRankRange: String =
    """WITH cells AS (
      |  SELECT ((CAST(year(l_shipdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(l_shipdate) AS BIGINT) - 1) // 3 AS q,
      |    p_brand,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
      |r AS (
      |  SELECT p_brand,
      |    CAST(row_number() OVER (PARTITION BY q
      |      ORDER BY rev_c DESC, p_brand ASC) AS BIGINT) AS rank
      |  FROM cells)
      |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_quarters,
      |  min(rank) AS best_rank, max(rank) AS worst_rank,
      |  max(rank) - min(rank) AS rank_range
      |FROM r GROUP BY 1""".stripMargin

  // ---- part price drift: first-vs-last observed unit price per part
  //      (min_by/max_by over the padded (day, orderkey, line) total
  //      order — no per-part sequence window), drift banded ----
  def qPartPriceDrift(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(l_extendedprice * 100.0D / l_quantity) " +
          "AS BIGINT)").as("unit_c"),
        format_string("%010d|%012d|%04d",
          expr("CAST(datediff(CAST(l_shipdate AS DATE), " +
            "DATE'1970-01-01') AS BIGINT)"),
          col("l_orderkey"), col("l_linenumber")).as("k"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        min_by(col("unit_c"), col("k")).as("first_c"),
        max_by(col("unit_c"), col("k")).as("last_c"))
      .filter(col("n") >= 2L && col("first_c") > 0L)
      .select(expr("((last_c - first_c) * 10000L DIV first_c) DIV 1000")
        .as("drift_band"))
      .groupBy(col("drift_band"))
      .agg(count(lit(1)).as("n_parts"))

  val oPartPriceDrift: String =
    """WITH per AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
      |    arg_min(CAST(floor(l_extendedprice * 100.0::DOUBLE /
      |      l_quantity) AS BIGINT), printf('%010d|%012d|%04d',
      |      epoch_us(l_shipdate) // 86400000000, l_orderkey,
      |      l_linenumber)) AS first_c,
      |    arg_max(CAST(floor(l_extendedprice * 100.0::DOUBLE /
      |      l_quantity) AS BIGINT), printf('%010d|%012d|%04d',
      |      epoch_us(l_shipdate) // 86400000000, l_orderkey,
      |      l_linenumber)) AS last_c
      |  FROM lineitem GROUP BY 1)
      |SELECT ((last_c - first_c) * 10000 // first_c) // 1000
      |    AS drift_band,
      |  CAST(count(*) AS BIGINT) AS n_parts
      |FROM per WHERE n >= 2 AND first_c > 0
      |GROUP BY 1""".stripMargin

  // ---- week-over-week active retention: share of each week's active
  //      users who were also active the PREVIOUS week — distinct
  //      (user, week) membership self-joined on (user, wk+1) ----
  def qWauRetention(s: SparkSession, dir: String): DataFrame = {
    val uw = events(s, dir)
      .select(col("user_id"), expr("ts DIV (86400000000000 * 7)").as("wk"))
      .distinct()
    val cur = uw.groupBy(col("wk")).agg(count(lit(1)).as("n_active"))
    val prev = uw.select(col("user_id"), (col("wk") + 1L).as("wk"))
    val ret = uw.join(prev, Seq("user_id", "wk"), "left_semi")
      .groupBy(col("wk")).agg(count(lit(1)).as("n_returning"))
    cur.join(ret, Seq("wk"), "left")
      .select(col("wk"), col("n_active"),
        coalesce(col("n_returning"), lit(0L)).as("n_returning"),
        expr("coalesce(n_returning, 0L) * 10000L DIV n_active")
          .as("retention_bp"))
  }

  val oWauRetention: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // (86400000000 * 7) AS wk
      |  FROM events),
      |cur AS (SELECT wk, CAST(count(*) AS BIGINT) AS n_active
      |        FROM uw GROUP BY 1),
      |ret AS (
      |  SELECT a.wk, CAST(count(*) AS BIGINT) AS n_returning
      |  FROM uw a SEMI JOIN uw p
      |    ON a.user_id = p.user_id AND a.wk = p.wk + 1
      |  GROUP BY 1)
      |SELECT cur.wk, cur.n_active,
      |  coalesce(ret.n_returning, 0) AS n_returning,
      |  CAST(coalesce(ret.n_returning, 0) * 10000 // cur.n_active
      |    AS BIGINT) AS retention_bp
      |FROM cur LEFT JOIN ret ON cur.wk = ret.wk""".stripMargin

  // ---- exact-duplicate rate by length band: are short or long docs
  //      the dup-heavy ones — group sizes on text content joined back
  //      (content-keyed equi), 100-char band rollup ----
  def qDupByLength(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("text"), col("n_chars"))
    val g = d.groupBy(col("text")).agg(count(lit(1)).as("sz"))
      .select(col("text").as("gtext"), col("sz"))
    d.join(g, col("text") === col("gtext"))
      .select(expr("n_chars DIV 100").as("len_band"),
        (col("sz") > 1L).as("is_dup"))
      .groupBy(col("len_band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .select(col("len_band"), col("n_docs"), col("n_dup"),
        expr("n_dup * 10000L DIV n_docs").as("dup_bp"))
  }

  val oDupByLength: String =
    """WITH g AS (
      |  SELECT text AS gtext, CAST(count(*) AS BIGINT) AS sz
      |  FROM documents GROUP BY 1)
      |SELECT n_chars // 100 AS len_band, CAST(count(*) AS BIGINT)
      |    AS n_docs,
      |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) * 10000 // count(*)
      |    AS BIGINT) AS dup_bp
      |FROM documents JOIN g ON text = gtext
      |GROUP BY 1""".stripMargin

  // ---- spend escalation: is each customer's LARGEST order also their
  //      LAST? Two max_by reductions over padded deterministic keys —
  //      no per-customer sequence window; one summary row over the
  //      ≥2-order cohort ----
  def qPeakIsLast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        format_string("%010d|%012d",
          expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
            "DATE'1970-01-01') AS BIGINT)"), col("o_orderkey")).as("tk"),
        format_string("%012d|%012d",
          floor(col("o_totalprice") * 100).cast("long"),
          col("o_orderkey")).as("vk"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max_by(col("o_orderkey"), col("tk")).as("last_ok"),
        max_by(col("o_orderkey"), col("vk")).as("biggest_ok"))
      .filter(col("n_orders") >= 2L)
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("last_ok") === col("biggest_ok"), 1L).otherwise(0L))
          .as("n_peak_last"))
      .select(col("n_customers"), col("n_peak_last"),
        expr("n_peak_last * 10000L DIV n_customers").as("peak_last_bp"))

  val oPeakIsLast: String =
    """WITH per AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |    arg_max(o_orderkey, printf('%010d|%012d',
      |      epoch_us(o_orderdate) // 86400000000, o_orderkey)) AS last_ok,
      |    arg_max(o_orderkey, printf('%012d|%012d',
      |      CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey))
      |      AS biggest_ok
      |  FROM orders GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CASE WHEN last_ok = biggest_ok THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_peak_last,
      |  CAST(sum(CASE WHEN last_ok = biggest_ok THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS BIGINT) AS peak_last_bp
      |FROM per WHERE n_orders >= 2""".stripMargin

  // ---- monthly peak-day concentration: the largest single day's share
  //      of each month's revenue — two nested bounded-domain reductions,
  //      exact basis points ----
  def qMonthPeakShare(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(expr("(CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) - " +
        "1970) * 12 + CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) - 1")
        .as("month_num"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("month_num"), col("day"))
      .agg(sum(col("price_c")).as("day_c"))
      .groupBy(col("month_num"))
      .agg(count(lit(1)).as("n_days"), max(col("day_c")).as("peak_c"),
        sum(col("day_c")).as("month_c"))
      .select(col("month_num"), col("n_days"),
        expr("peak_c * 10000L DIV month_c").as("peak_share_bp"))

  val oMonthPeakShare: String =
    """WITH d AS (
      |  SELECT (CAST(year(o_orderdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(o_orderdate) AS BIGINT) - 1 AS month_num,
      |    epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS day_c
      |  FROM orders GROUP BY 1, 2)
      |SELECT month_num, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(max(day_c) * 10000 // sum(day_c) AS BIGINT)
      |    AS peak_share_bp
      |FROM d GROUP BY 1""".stripMargin

  // ---- ordering-day-of-week preference: how concentrated each
  //      customer's orders are on their favourite weekday — per-
  //      (customer, dow) reduction, max-share banded histogram over the
  //      ≥3-order cohort ----
  def qDowPreference(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("((CAST(datediff(CAST(o_orderdate AS DATE), " +
          "DATE'1970-01-01') AS BIGINT)) + 4) % 7").as("dow"))
      .groupBy(col("o_custkey"), col("dow"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("c")).as("n"), max(col("c")).as("maxc"))
      .filter(col("n") >= 3L)
      .select(expr("(maxc * 10000L DIV n) DIV 1000").as("pref_band"))
      .groupBy(col("pref_band"))
      .agg(count(lit(1)).as("n_customers"))

  val oDowPreference: String =
    """WITH cd AS (
      |  SELECT o_custkey,
      |    (epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS dow,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2),
      |per AS (
      |  SELECT o_custkey, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(max(c) AS BIGINT) AS maxc
      |  FROM cd GROUP BY 1)
      |SELECT (maxc * 10000 // n) // 1000 AS pref_band,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM per WHERE n >= 3 GROUP BY 1""".stripMargin

  // ---- part-vintage revenue: revenue by the age of the part at sale
  //      time (years since the part's FIRST shipment) — the item-cohort
  //      ("vintage") decomposition; first-ship years equi-join back ----
  def qPartVintageRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        year(col("l_shipdate").cast("date")).cast("long").as("yr"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
    val intro = li.groupBy(col("l_partkey")).agg(min(col("yr")).as("yr0"))
      .select(col("l_partkey").as("ipk"), col("yr0"))
    val cells = li.join(intro, col("l_partkey") === col("ipk"))
      .select((col("yr") - col("yr0")).as("age_years"), col("rev_c"))
      .groupBy(col("age_years"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_c")).as("rev_c"))
    cells.crossJoin(broadcast(cells.agg(sum(col("rev_c")).as("tot_c"))))
      .select(col("age_years"), col("n_lines"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("rev_c * 10000L DIV tot_c").as("share_bp"))
  }

  val oPartVintageRevenue: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS rev_c
      |  FROM lineitem),
      |intro AS (SELECT l_partkey AS ipk, min(yr) AS yr0
      |          FROM li GROUP BY 1),
      |cells AS (
      |  SELECT yr - yr0 AS age_years, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(rev_c) AS BIGINT) AS rev_c
      |  FROM li JOIN intro ON l_partkey = ipk
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c FROM cells)
      |SELECT age_years, n_lines,
      |  rev_c::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(rev_c * 10000 // tot_c AS BIGINT) AS share_bp
      |FROM cells, tot""".stripMargin

  // ---- per-weekday exact value median: the crossing selection over
  //      the reduced (dow × cent-value) domain — does weekend activity
  //      carry different value? ----
  def qDowValueMedian(s: SparkSession, dir: String): DataFrame = {
    val hist = events(s, dir)
      .select(expr("((ts DIV 86400000000000) + 4) % 7").as("dow"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("dow"), col("v_c")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("dow")).orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy(col("dow")).agg(sum(col("n")).as("n_tot"))
    hist.withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(tot), Seq("dow"))
      .groupBy(col("dow"))
      .agg(max(col("n_tot")).as("n_events"),
        min(when(col("cum") * 2 >= col("n_tot"), col("v_c")))
          .as("median_c"))
  }

  val oDowValueMedian: String =
    """WITH hist AS (
      |  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
      |    CAST(floor(value * 100) AS BIGINT) AS v_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT dow, v_c,
      |    CAST(sum(n) OVER (PARTITION BY dow ORDER BY v_c) AS BIGINT)
      |      AS cum,
      |    CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS n_tot
      |  FROM hist)
      |SELECT dow, max(n_tot) AS n_events,
      |  min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS median_c
      |FROM cum GROUP BY 1""".stripMargin

  // ---- do low-balance suppliers ship slower? Mean ship latency in
  //      exact centidays per supplier balance band — the supplier-band
  //      dim broadcasts onto the joined facts ----
  def qBalanceLatency(s: SparkSession, dir: String): DataFrame = {
    val band = t(s, dir, "supplier")
      .select(col("s_suppkey"),
        expr("CAST(floor(s_acctbal) AS BIGINT) DIV 2000").as("bal_band"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("sday"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("oday")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(band), col("l_suppkey") === col("s_suppkey"))
      .select(col("bal_band"), (col("sday") - col("oday")).as("lat"))
      .groupBy(col("bal_band"))
      .agg(count(lit(1)).as("n_lines"), sum(col("lat")).as("sum_lat"))
      .select(col("bal_band"), col("n_lines"),
        expr("sum_lat * 100L DIV n_lines").as("mean_latency_cd"))
  }

  val oBalanceLatency: String =
    """WITH band AS (
      |  SELECT s_suppkey, CAST(floor(s_acctbal) AS BIGINT) // 2000
      |    AS bal_band
      |  FROM supplier),
      |j AS (
      |  SELECT band.bal_band,
      |    epoch_us(l_shipdate) // 86400000000 -
      |    epoch_us(o_orderdate) // 86400000000 AS lat
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN band ON l_suppkey = band.s_suppkey)
      |SELECT bal_band, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(lat) * 100 // count(*) AS BIGINT) AS mean_latency_cd
      |FROM j GROUP BY 1""".stripMargin
}
