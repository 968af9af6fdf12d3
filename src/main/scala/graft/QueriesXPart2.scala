package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QueriesX extension queries, part 2 of the family-boundary split; opens with the
  * "new-vs-returning revenue split" family. Query/oracle pairs only —
  * shared loaders live in [[QueriesXShared]].
  */
private[graft] trait QueriesXPart2 extends QueriesXShared {

  // ---- new-vs-returning revenue split: per month, revenue from
  //      customers in their FIRST month vs returning customers - the
  //      growth-accounting ledger weighted by money. Cents-exact ----
  def qRevSplit(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders").select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"),
      floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val first = ord.groupBy(col("o_custkey")).agg(min(col("m")).as("fm"))
    ord.join(first, Seq("o_custkey"))
      .groupBy(col("m"))
      .agg(
        sum(when(col("m") === col("fm"), col("price_c")).otherwise(0L))
          .as("rev_new_c"),
        sum(when(col("m") =!= col("fm"), col("price_c")).otherwise(0L))
          .as("rev_ret_c"),
        sum(when(col("m") === col("fm"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("m") =!= col("fm"), 1L).otherwise(0L)).as("n_ret"))
      .select(col("m"), col("n_new"), col("n_ret"),
        (col("rev_new_c").cast("double") / lit(100.0)).as("rev_new"),
        (col("rev_ret_c").cast("double") / lit(100.0)).as("rev_returning"))
  }

  val oRevSplit: String =
    """WITH ord AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS m,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |f AS (SELECT o_custkey, min(m) AS fm FROM ord GROUP BY 1)
      |SELECT ord.m,
      |  CAST(sum(CASE WHEN ord.m = f.fm THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(sum(CASE WHEN ord.m <> f.fm THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_ret,
      |  CAST(sum(CASE WHEN ord.m = f.fm THEN price_c ELSE 0 END)
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS rev_new,
      |  CAST(sum(CASE WHEN ord.m <> f.fm THEN price_c ELSE 0 END)
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS rev_returning
      |FROM ord JOIN f ON ord.o_custkey = f.o_custkey
      |GROUP BY 1""".stripMargin

  // ---- shipping SLA attainment: share of orders whose FIRST shipment
  //      left within 30 days, by priority - exact interval compare,
  //      one mirrored division ----
  def qSlaAttainment(s: SparkSession, dir: String): DataFrame = {
    val firstShip = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship0"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("ship0") <=
          col("o_orderdate") + expr("INTERVAL 30 DAYS"), 1L).otherwise(0L))
          .as("n_within_sla"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_within_sla"),
        (col("n_within_sla").cast("double") /
          col("n_orders").cast("double")).as("attainment"))
  }

  val oSlaAttainment: String =
    """WITH fs AS (
      |  SELECT l_orderkey, min(l_shipdate) AS ship0
      |  FROM lineitem GROUP BY 1)
      |SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN fs.ship0 <= o.o_orderdate + INTERVAL 30 DAY
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_sla,
      |  CAST(sum(CASE WHEN fs.ship0 <= o.o_orderdate + INTERVAL 30 DAY
      |    THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS attainment
      |FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey
      |GROUP BY 1""".stripMargin

  // ---- peak concurrency: max simultaneous (30-min-gap) sessions per
  //      day at hour granularity - each session explodes into its
  //      covered hour buckets (fan-out bounded by session duration),
  //      one hour-keyed count, one day-keyed max. No sweep-line sort ----
  def qPeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.operators.Sessions.sessionize(
      events(s, dir).select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("ts_us")),
      gapMicros = 1800000000L)
    sess
      .select(explode(sequence(expr("start_us DIV 3600000000"),
        expr("end_us DIV 3600000000"))).as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n_concurrent"))
      .groupBy(expr("hr DIV 24").as("day"))
      .agg(max(col("n_concurrent")).as("peak_concurrent"),
        count(lit(1)).as("n_active_hours"))
  }

  val oPeakConcurrency: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END
      |      AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT user_id, session_idx, min(ts_us) AS start_us,
      |    max(ts_us) AS end_us
      |  FROM (SELECT user_id, event_id, ts_us,
      |          sum(is_new) OVER (PARTITION BY user_id
      |            ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS session_idx
      |        FROM flagged)
      |  GROUP BY 1, 2),
      |hours AS (
      |  SELECT unnest(range(start_us // 3600000000,
      |    end_us // 3600000000 + 1)) AS hr
      |  FROM sess),
      |hc AS (SELECT hr, CAST(count(*) AS BIGINT) AS n_concurrent
      |       FROM hours GROUP BY 1)
      |SELECT hr // 24 AS day,
      |  CAST(max(n_concurrent) AS BIGINT) AS peak_concurrent,
      |  CAST(count(*) AS BIGINT) AS n_active_hours
      |FROM hc GROUP BY 1""".stripMargin

  // ---- brand markup: sold value vs catalog value per brand - the
  //      ratio of two exact integer sums, never per-row division ----
  def qBrandMarkup(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
      floor(col("p_retailprice") * 100).cast("long").as("retail_c"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      // qty·retail_c (≤10⁷/row) over unbounded per-brand row counts →
      // DECIMAL(38,0) staging (q_monthly_hhi class); sold_c rides along
      // for one consistent schema in the ratio
      .agg(sum(col("price_c").cast("decimal(38,0)")).as("sold_c"),
        sum((col("qty") * col("retail_c")).cast("decimal(38,0)"))
          .as("catalog_c"),
        count(lit(1)).as("n_lines"))
      .select(col("p_brand"), col("n_lines"),
        (col("sold_c").cast("double") / lit(100.0)).as("sold_value"),
        (col("catalog_c").cast("double") / lit(100.0)).as("catalog_value"),
        (col("sold_c").cast("double") / col("catalog_c").cast("double"))
          .as("markup_ratio"))
  }

  val oBrandMarkup: String =
    """SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_lines,
      |  sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    ::DOUBLE / 100.0::DOUBLE AS sold_value,
      |  sum(CAST(l.l_quantity AS HUGEINT) *
      |    CAST(floor(p.p_retailprice * 100) AS BIGINT))
      |    ::DOUBLE / 100.0::DOUBLE AS catalog_value,
      |  sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    ::DOUBLE /
      |  sum(CAST(l.l_quantity AS HUGEINT) *
      |    CAST(floor(p.p_retailprice * 100) AS BIGINT))
      |    ::DOUBLE AS markup_ratio
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1""".stripMargin

  // ---- type-token ratio by document-length bucket: the lexical-
  //      diversity curve corpus curation reads before length-filtering.
  //      Per-doc distinct is a two-phase (partial-aggregable) count;
  //      the bucket ratio is the ONLY float op, a ratio of exact sums ----
  def qTtr(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("token")).as("n_typ"))
    per.groupBy(expr("n_tok DIV 20").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens"), sum(col("n_typ")).as("types"))
      .select(col("len_bucket"), col("n_docs"), col("tokens"), col("types"),
        (col("types").cast("double") / col("tokens").cast("double")).as("ttr"))
  }

  val oTtr: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |per AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |    CAST(count(DISTINCT token) AS BIGINT) AS n_typ
      |  FROM tok GROUP BY 1)
      |SELECT n_tok // 20 AS len_bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS tokens,
      |  CAST(sum(n_typ) AS BIGINT) AS types,
      |  CAST(sum(n_typ) AS BIGINT)::DOUBLE /
      |    CAST(sum(n_tok) AS BIGINT)::DOUBLE AS ttr
      |FROM per GROUP BY 1""".stripMargin

  // ---- hapax legomena share per source: fraction of each source's
  //      vocabulary occurring exactly once — the classic "how much
  //      long-tail noise does this domain carry" curation signal ----
  def qHapax(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("f"))
    tf.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("vocab"), col("hapax"),
        (col("hapax").cast("double") / col("vocab").cast("double"))
          .as("hapax_share"))
  }

  val oHapax: String =
    """WITH tf AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS f FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token
      |    FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
      |  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS hapax_share
      |FROM tf GROUP BY 1""".stripMargin

  // ---- token document-frequency histogram: for each df value, how many
  //      distinct tokens carry it — the cost planner every shingle-keyed
  //      dedup/join reads first (the df≤10 rare-shingle cutoffs, stop-gram
  //      caps, and CMS widths all come from this curve). Two hash aggs ----
  def qTokenDfHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_tokens"))

  val oTokenDfHist: String =
    """WITH d AS (
      |  SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |    FROM documents)),
      |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
      |       FROM d GROUP BY 1)
      |SELECT df, CAST(count(*) AS BIGINT) AS n_tokens
      |FROM df GROUP BY 1""".stripMargin

  // ---- vocabulary-growth (Heaps' law) curve: cumulative distinct-type
  //      count at doc-id checkpoints, over word BIGRAMS (the unigram
  //      vocabulary saturates in the first few docs — bigrams carry the
  //      growth signal). Each type contributes at its FIRST doc (one
  //      min-agg); buckets cumulate over the bounded checkpoint domain
  //      (n_docs/25 rows) — the window-discipline regime. Bigram rows
  //      come from arrays_zip of the two shifted slices (codegen-friendly,
  //      the collocations idiom) ----
  def qVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val toksP = split(col("text"), " ")
    val nP = size(toksP) - 1
    val firstDoc = t(s, dir, "documents")
      .select(col("doc_id"), explode(arrays_zip(
        slice(toksP, lit(1), nP), slice(toksP, lit(2), nP))).as("p"))
      .select(col("doc_id"),
        concat(col("p.0"), lit(" "), col("p.1")).as("bigram"))
      .groupBy(col("bigram")).agg(min(col("doc_id")).as("fd"))
    val perBucket = firstDoc
      .groupBy(expr("fd DIV 25").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    perBucket.select(col("bucket"), col("new_types"),
      sum(col("new_types")).over(Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("vocab"))
  }

  val oVocabGrowth: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |fd AS (
      |  SELECT bigram, min(doc_id) AS fd FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |      i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |    FROM toks)
      |  GROUP BY 1),
      |b AS (
      |  SELECT fd // 25 AS bucket, CAST(count(*) AS BIGINT) AS new_types
      |  FROM fd GROUP BY 1)
      |SELECT bucket, new_types,
      |  CAST(sum(new_types) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS vocab
      |FROM b""".stripMargin

  // ---- return rate per supplier nation and ship year: the supplier
  //      quality scorecard — exact counts, one broadcast dim join, one
  //      mirrored division ----
  def qReturnRate(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), year(col("l_shipdate")).cast("long").as("yr"),
        col("l_returnflag"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("yr"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"))
      .select(col("s_nationkey"), col("yr"), col("n_lines"), col("n_returned"),
        (col("n_returned").cast("double") / col("n_lines").cast("double"))
          .as("return_rate"))
  }

  val oReturnRate: String =
    """SELECT s.s_nationkey, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_returned,
      |  CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE
      |    AS return_rate
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY 1, 2""".stripMargin

  // ---- repeat-purchase rate per market segment: share of customers
  //      with >= 2 orders — includes order-less customers via the left
  //      join + coalesce(0) (the empty-cohort parity discipline) ----
  def qRepeatRate(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_ord"))
    t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), coalesce(col("n_ord"), lit(0L)).as("n_ord"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_ord") >= 2L, 1L).otherwise(0L)).as("n_repeat"))
      .select(col("c_mktsegment"), col("n_customers"), col("n_repeat"),
        (col("n_repeat").cast("double") / col("n_customers").cast("double"))
          .as("repeat_rate"))
  }

  val oRepeatRate: String =
    """WITH cnt AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT c_mktsegment, coalesce(cnt.n_ord, 0) AS n_ord
      |  FROM customer LEFT JOIN cnt ON c_custkey = o_custkey)
      |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeat,
      |  CAST(sum(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
      |    / CAST(count(*) AS BIGINT)::DOUBLE AS repeat_rate
      |FROM c GROUP BY 1""".stripMargin

  // ---- mean local clustering coefficient by degree (the C(d) curve;
  //      Watts-Strogatz per node, aggregated): same co-purchase
  //      projection as q_triangles/q_transitivity, per-node triangle
  //      counts from the degree-ordered wedge enumeration. Within a
  //      degree class the denominator d(d-1)/2 is constant, so the
  //      ratio of exact sums IS the exact mean of per-node ratios ----
  def qLocalClustering(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 26)
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    // truncate the co-purchase edge set once, AFTER the distinct (r17;
    // the r16 form truncated the raw pair expansion — a strictly larger
    // table — and still paid the distinct in each consumer; the driver
    // bench measured it slower than the untruncated r15 shape). Both
    // consumers want the distinct set: deg directly, and triangleCounts'
    // internal canonicalize is a no-op re-distinct over it.
    val pairs = li.select(col("k"), col("l_partkey").as("a"))
      .join(li.select(col("k"), col("l_partkey").as("b")), "k")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    val und = graft.util.Checkpoints.truncate(pairs.distinct())
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    deg.join(graft.operators.Graph.triangleCounts(und), Seq("node"), "left")
      .select(col("d"), coalesce(col("n_triangles"), lit(0L)).as("tri"))
      .filter(col("d") >= 2L)
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("tri")).as("tri_sum"))
      .select(col("d"), col("n_nodes"), col("tri_sum"),
        ((lit(2L) * col("tri_sum")).cast("double") /
          (col("n_nodes") * col("d") * (col("d") - 1L)).cast("double"))
          .as("mean_cc"))
  }

  val oLocalClustering: String =
    """WITH e0 AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  WHERE a.l_quantity >= 26 AND b.l_quantity >= 26),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS d
      |  FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      |  GROUP BY 1),
      |o AS (
      |  SELECT
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
      |         THEN e0.u ELSE e0.v END AS src,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
      |         THEN e0.v ELSE e0.u END AS dst,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
      |         THEN dv.d ELSE du.d END AS ddst
      |  FROM e0 JOIN deg du ON e0.u = du.node JOIN deg dv ON e0.v = dv.node),
      |w AS (
      |  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      |  FROM o e1 JOIN o e2 ON e1.src = e2.src
      |  WHERE e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
      |tri AS (
      |  SELECT w.x, w.y, w.z
      |  FROM w JOIN o ON w.y = o.src AND w.z = o.dst),
      |pern AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
      |    SELECT x AS node FROM tri
      |    UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri)
      |  GROUP BY 1),
      |nd AS (
      |  SELECT deg.d, coalesce(pern.tri, 0) AS tri
      |  FROM deg LEFT JOIN pern ON deg.node = pern.node
      |  WHERE deg.d >= 2)
      |SELECT d, CAST(count(*) AS BIGINT) AS n_nodes,
      |  CAST(sum(tri) AS BIGINT) AS tri_sum,
      |  CAST(2 * sum(tri) AS DOUBLE) /
      |    CAST(count(*) * d * (d - 1) AS DOUBLE) AS mean_cc
      |FROM nd GROUP BY 1""".stripMargin

  // ---- per-user burstiness: Fano factor (variance/mean) of hourly
  //      event counts over the user's ACTIVE hours — 1.0 = Poisson,
  //      higher = bursty. Three exact long moments, one mirrored
  //      division: fano = (n*s2 - s1^2) / (n*s1) ----
  def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    val c = events(s, dir)
      .select(col("user_id"), expr("ts DIV 1000 DIV 3600000000").as("hr"))
      .groupBy(col("user_id"), col("hr")).agg(count(lit(1)).as("c"))
    // c² of an unbounded per-hour count and the n·s2 / n_events² fano
    // products are the q_monthly_hhi overflow class → DECIMAL(38,0)
    // staging end to end; output schema unchanged (n_* stay BIGINT)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    c.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("n_events"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("_s2"))
      .select(col("user_id"), col("n_hours"), col("n_events"),
        ((col("n_hours").cast(dec) * col("_s2") -
          col("n_events").cast(dec) * col("n_events").cast(dec))
          .cast("double") /
          (col("n_hours").cast(dec) * col("n_events").cast(dec))
            .cast("double")).as("fano"))
  }

  val oBurstiness: String =
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
      |    CAST(sum(c) AS BIGINT) AS n_events,
      |    sum(c::HUGEINT * c) AS s2
      |  FROM c GROUP BY 1)
      |SELECT user_id, n_hours, n_events,
      |  CAST(n_hours::HUGEINT * s2 - n_events::HUGEINT * n_events AS DOUBLE) /
      |    CAST(n_hours::HUGEINT * n_events AS DOUBLE) AS fano
      |FROM p""".stripMargin

  // ---- session-depth histogram: for each session size (events per
  //      30-min-gap session), how many sessions and their mean duration
  //      — the engagement-shape profile. Depth domain is bounded, the
  //      mean is a ratio of exact long sums ----
  def qSessionDepthHist(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessions.sessionize(
        events(s, dir).select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("ts_us")),
        gapMicros = 1800000000L)
      .groupBy(col("n_events").as("depth"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("duration_us")).as("dur_sum_us"))
      .select(col("depth"), col("n_sessions"),
        (col("dur_sum_us").cast("double") /
          col("n_sessions").cast("double")).as("mean_duration_us"))

  val oSessionDepthHist: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END
      |      AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
      |    max(ts_us) - min(ts_us) AS dur
      |  FROM (SELECT user_id, event_id, ts_us,
      |          sum(is_new) OVER (PARTITION BY user_id
      |            ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS session_idx
      |        FROM flagged)
      |  GROUP BY 1, 2)
      |SELECT n_events AS depth, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(sum(dur) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_duration_us
      |FROM sess GROUP BY 1""".stripMargin

  // ---- local-trade share per order year: revenue where the supplier
  //      and the ordering customer sit in the SAME nation vs cross-
  //      border — supplier broadcasts (a true dim); customer⋈orders
  //      stays a key-partitioned hash join (customer is fact-sized at
  //      scale, NOT broadcastable). Exact cents, one mirrored division ----
  def qLocalTrade(s: SparkSession, dir: String): DataFrame = {
    val custNation = t(s, dir, "orders")
      .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"), col("c_nationkey"))
    val supNation = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(custNation, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("yr"))
      .agg(
        sum(when(col("c_nationkey") === col("s_nationkey"), col("price_c"))
          .otherwise(0L)).as("local_c"),
        sum(col("price_c")).as("total_c"),
        count(lit(1)).as("n_lines"))
      .select(col("yr"), col("n_lines"),
        (col("local_c").cast("double") / lit(100.0)).as("local_rev"),
        (col("total_c").cast("double") / lit(100.0)).as("total_rev"),
        (col("local_c").cast("double") / col("total_c").cast("double"))
          .as("local_share"))
  }

  val oLocalTrade: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem),
      |j AS (
      |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    CASE WHEN c.c_nationkey = s.s_nationkey THEN li.price_c
      |         ELSE 0 END AS local_c,
      |    li.price_c
      |  FROM li
      |  JOIN supplier s ON li.l_suppkey = s.s_suppkey
      |  JOIN orders o ON li.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT yr, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(local_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS local_rev,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS total_rev,
      |  CAST(sum(local_c) AS BIGINT)::DOUBLE /
      |    CAST(sum(price_c) AS BIGINT)::DOUBLE AS local_share
      |FROM j GROUP BY 1""".stripMargin

  // ---- order-size histogram: lines-per-order distribution plus the
  //      mean order value at each size — two hash aggs, exact cents ----
  def qOrderSizeHist(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("val_c"))
    per.groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"), sum(col("val_c")).as("sum_c"))
      .select(col("n_lines"), col("n_orders"),
        (col("sum_c").cast("double") /
          (col("n_orders") * lit(100L)).cast("double")).as("mean_order_value"))
  }

  val oOrderSizeHist: String =
    """WITH per AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS val_c
      |  FROM lineitem GROUP BY 1)
      |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(val_c) AS BIGINT)::DOUBLE /
      |    CAST(count(*) * 100 AS BIGINT)::DOUBLE AS mean_order_value
      |FROM per GROUP BY 1""".stripMargin

  // ---- discount-band lift: mean quantity and revenue per discount
  //      percent band — the "does a deeper discount move volume" curve.
  //      Quantity is integer-valued in the data; the band mean is a
  //      ratio of exact sums ----
  def qDiscountLift(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy(col("disc_pct"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("qty_sum"),
        sum(col("price_c")).as("rev_c"))
      .select(col("disc_pct"), col("n_lines"),
        (col("qty_sum").cast("double") / col("n_lines").cast("double"))
          .as("mean_qty"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"))

  val oDiscountLift: String =
    """SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM lineitem GROUP BY 1""".stripMargin

  // ---- embedding normalization-error histogram: buckets of 1e-7 in
  //      (norm² − 1) — the "are these vectors EXACTLY unit-normalized"
  //      sanity profile before cosine = dot-product shortcuts. The fold
  //      runs in ARRAY ORDER with per-element double casts on both
  //      engines (the identical-operand-order float discipline), so the
  //      bucket edge is deterministic ----
  def qEmbedNormHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(expr(
        """CAST(floor((aggregate(embedding, CAST(0.0 AS DOUBLE),
          |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) - 1.0)
          |* 10000000.0) AS BIGINT)""".stripMargin.replace("\n", " "))
        .as("err_1e7"))
      .groupBy(col("err_1e7")).agg(count(lit(1)).as("n_vectors"))

  val oEmbedNormHist: String =
    """SELECT CAST(floor((list_reduce(list_prepend(0.0::DOUBLE,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (a, b) -> a + b) - 1.0) * 10000000.0) AS BIGINT) AS err_1e7,
      |  CAST(count(*) AS BIGINT) AS n_vectors
      |FROM embeddings GROUP BY 1""".stripMargin

  // ---- prefix-duplication audit: how many docs share their first 32
  //      chars with how many others — the cheap "templated boilerplate"
  //      detector run before any shingle-level dedup. Two hash aggs ----
  def qPrefixDup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(substring(col("text"), 1, 32).as("prefix"))
      .agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        (count(lit(1)) * col("group_size")).as("n_docs"))

  val oPrefixDup: String =
    """WITH g AS (
      |  SELECT substr(text, 1, 32) AS prefix,
      |    CAST(count(*) AS BIGINT) AS group_size
      |  FROM documents GROUP BY 1)
      |SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(count(*) * group_size AS BIGINT) AS n_docs
      |FROM g GROUP BY 1""".stripMargin

  // ---- bigram coverage by frequency threshold: what share of all
  //      bigram OCCURRENCES is covered by types with freq >= F, for a
  //      literal threshold ladder — the vocabulary-truncation planning
  //      curve (how much text a top-of-the-distribution vocab explains).
  //      One freq agg; thresholds evaluate against the bounded type
  //      table, never re-scanning the corpus ----
  def qNgramCoverage(s: SparkSession, dir: String): DataFrame = {
    val toksP = split(col("text"), " ")
    val nP = size(toksP) - 1
    val freq = t(s, dir, "documents")
      .select(explode(arrays_zip(
        slice(toksP, lit(1), nP), slice(toksP, lit(2), nP))).as("p"))
      .select(concat(col("p.0"), lit(" "), col("p.1")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("f"))
    freq
      .select(col("f"),
        explode(array(Seq(2L, 5L, 10L, 20L).map(lit): _*)).as("f_min"))
      .groupBy(col("f_min"))
      .agg(sum(when(col("f") >= col("f_min"), 1L).otherwise(0L)).as("n_types"),
        sum(when(col("f") >= col("f_min"), col("f")).otherwise(0L))
          .as("covered"),
        sum(col("f")).as("total"))
      .select(col("f_min"), col("n_types"), col("covered"), col("total"),
        (col("covered").cast("double") / col("total").cast("double"))
          .as("coverage"))
  }

  val oNgramCoverage: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS ts FROM documents),
      |f AS (
      |  SELECT bigram, CAST(count(*) AS BIGINT) AS f FROM (
      |    SELECT unnest(list_transform(range(1, len(ts)),
      |      i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |    FROM toks)
      |  GROUP BY 1),
      |x AS (
      |  SELECT f.f, t.f_min
      |  FROM f CROSS JOIN
      |    (SELECT unnest([2, 5, 10, 20]::BIGINT[]) AS f_min) t)
      |SELECT f_min,
      |  CAST(sum(CASE WHEN f >= f_min THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_types,
      |  CAST(sum(CASE WHEN f >= f_min THEN f ELSE 0 END) AS BIGINT)
      |    AS covered,
      |  CAST(sum(f) AS BIGINT) AS total,
      |  CAST(sum(CASE WHEN f >= f_min THEN f ELSE 0 END) AS BIGINT)::DOUBLE
      |    / CAST(sum(f) AS BIGINT)::DOUBLE AS coverage
      |FROM x GROUP BY 1""".stripMargin

  // ---- DAU/MAU stickiness per 30-day bucket: mean daily active share
  //      of the bucket's active users — the engagement ratio every
  //      product ledger tracks. Two distinct aggs, exact counts, one
  //      mirrored division ----
  def qStickiness(s: SparkSession, dir: String): DataFrame = {
    val du = events(s, dir)
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .distinct()
    val daily = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .groupBy(expr("day DIV 30").as("m"))
      .agg(sum(col("dau")).as("dau_sum"), count(lit(1)).as("n_days"))
    val monthly = du.select(expr("day DIV 30").as("m"), col("user_id"))
      .distinct()
      .groupBy(col("m")).agg(count(lit(1)).as("mau"))
    daily.join(monthly, Seq("m"))
      .select(col("m"), col("n_days"), col("dau_sum"), col("mau"),
        (col("dau_sum").cast("double") /
          (col("n_days") * col("mau")).cast("double")).as("stickiness"))
  }

  val oStickiness: String =
    """WITH du AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |daily AS (
      |  SELECT day // 30 AS m, CAST(sum(dau) AS BIGINT) AS dau_sum,
      |    CAST(count(*) AS BIGINT) AS n_days
      |  FROM (SELECT day, CAST(count(*) AS BIGINT) AS dau
      |        FROM du GROUP BY 1)
      |  GROUP BY 1),
      |monthly AS (
      |  SELECT m, CAST(count(*) AS BIGINT) AS mau FROM (
      |    SELECT DISTINCT day // 30 AS m, user_id FROM du)
      |  GROUP BY 1)
      |SELECT daily.m, n_days, dau_sum, mau,
      |  CAST(dau_sum AS DOUBLE) / CAST(n_days * mau AS DOUBLE)
      |    AS stickiness
      |FROM daily JOIN monthly ON daily.m = monthly.m""".stripMargin

  // ---- cross-language near-dup matrix: sampled char-3-gram Jaccard
  //      pairs (the q_dedup_sweep sampling shape) whose two docs carry
  //      DIFFERENT lang tags, counted per (lang_a, lang_b) — the
  //      machine-translation-contamination detector. Pair stage is the
  //      documented bounded-sample regime; lang attachment is two
  //      id-keyed equi-joins ----
  def qCrossLangDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val lang = docs.select(col("doc_id"), col("lang"))
    graft.operators.Dedup.ngramJaccardSample(
        docs, n = 3, targetSample = 60, minJaccard = 0.2, hashedIds = true)
      .join(lang.select(col("doc_id").as("a_id"), col("lang").as("lang_a")),
        Seq("a_id"))
      .join(lang.select(col("doc_id").as("b_id"), col("lang").as("lang_b")),
        Seq("b_id"))
      .filter(col("lang_a") =!= col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val oCrossLangDup: String =
    """WITH m AS (
      |  SELECT greatest(1, CAST(ceil(count(*) / 60.0) AS BIGINT)) AS mod
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, lang, list_distinct(list_transform(
      |    range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS g
      |  FROM documents, m
      |  WHERE ('0x' || substr(md5('7#' || CAST(doc_id AS VARCHAR)), 1, 8))
      |          ::BIGINT % m.mod = 0)
      |SELECT a.lang AS lang_a, b.lang AS lang_b,
      |  CAST(count(*) AS BIGINT) AS n_pairs
      |FROM g a, g b
      |WHERE a.doc_id < b.doc_id AND a.lang <> b.lang
      |  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
      |      len(list_distinct(a.g || b.g)) >= 0.2
      |GROUP BY 1, 2""".stripMargin

  // ---- order backlog by month: open orders (placed, not yet fully
  //      shipped) at each month boundary — each order explodes into its
  //      open months (fan-out bounded by order lifetime), one month-
  //      keyed count. The q_peak_concurrency interval shape on the
  //      commerce ledger ----
  def qOrderBacklog(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m0"))
    val ls = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .select(col("l_orderkey"),
        (year(col("last_ship")) * 12 + month(col("last_ship")) - 1)
          .cast("long").as("m1"))
    o.join(ls, col("o_orderkey") === col("l_orderkey"))
      .filter(col("m1") > col("m0"))
      .select(explode(sequence(col("m0"), col("m1") - 1L)).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("n_open"))
  }

  val oOrderBacklog: String =
    """WITH o AS (
      |  SELECT o_orderkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS m0
      |  FROM orders),
      |ls AS (
      |  SELECT l_orderkey,
      |    CAST(year(max(l_shipdate)) * 12 + month(max(l_shipdate)) - 1
      |      AS BIGINT) AS m1
      |  FROM lineitem GROUP BY 1),
      |x AS (
      |  SELECT unnest(range(o.m0, ls.m1)) AS m
      |  FROM o JOIN ls ON o.o_orderkey = ls.l_orderkey)
      |SELECT m, CAST(count(*) AS BIGINT) AS n_open
      |FROM x GROUP BY 1""".stripMargin

  // ---- supplier concentration (HHI) per nation: Σ share² of supplier
  //      revenue — the antitrust-style "is this nation's supply chain
  //      one vendor" audit. Revenue squares ride DECIMAL(38,0) (the
  //      linregExact overflow discipline); hhi = Σr²/(Σr)² is the one
  //      mirrored float op ----
  def qSupplierHhi(s: SparkSession, dir: String): DataFrame = {
    // HHI over basis-point-TRUNCATED shares: share_bp = (rev·1e4) DIV S
    // per supplier, hhi = Σ share_bp² / 1e8. Pure long arithmetic until
    // one division by a CONSTANT — a big exact decimal cast to double
    // rounds differently in the two engines (ulp drift, observed), so
    // no corpus-derived integer ever crosses 2^53 here: share_bp ≤ 1e4,
    // Σbp² ≤ 1e8, and rev·1e4 fits a long to ~9e14 dollars/nation
    val rev = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("l_suppkey"))
      .agg(sum(col("price_c")).as("rev"))
    val tot = rev.groupBy(col("s_nationkey")).agg(sum(col("rev")).as("s1"))
    rev.join(tot, Seq("s_nationkey"))
      .select(col("s_nationkey"),
        expr("(rev * 10000) DIV s1").as("share_bp"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("share_bp") * col("share_bp")).as("ss_bp"))
      .select(col("s_nationkey"), col("n_suppliers"), col("ss_bp"),
        (col("ss_bp").cast("double") / lit(1.0e8)).as("hhi"))
  }

  val oSupplierHhi: String =
    """WITH r AS (
      |  SELECT s.s_nationkey, l.l_suppkey,
      |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT s_nationkey, CAST(sum(rev) AS BIGINT) AS s1
      |  FROM r GROUP BY 1),
      |sh AS (
      |  SELECT r.s_nationkey, (r.rev * 10000) // tot.s1 AS share_bp
      |  FROM r JOIN tot ON r.s_nationkey = tot.s_nationkey)
      |SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(share_bp * share_bp) AS BIGINT) AS ss_bp,
      |  CAST(sum(share_bp * share_bp) AS BIGINT)::DOUBLE /
      |    100000000.0::DOUBLE AS hhi
      |FROM sh GROUP BY 1""".stripMargin

  // ---- per-dimension embedding moments: mean and variance of every
  //      coordinate in 1e-7 fixed point — the "is a dimension dead or
  //      exploding" feature-health audit. Scaled longs sum exactly;
  //      squares ride DECIMAL(38,0); the two closing expressions are
  //      the only float ops, mirrored ----
  def qDimMoments(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos0", "x")))
      .select((col("pos0") + 1).cast("long").as("pos"),
        expr("CAST(round(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)")
          .as("xs"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("xs").cast(dec)).as("s1"),
        sum(col("xs").cast(dec) * col("xs").cast(dec)).as("s2"))
      .select(col("pos"), col("n"),
        (col("s1").cast("double") /
          (col("n").cast("double") * lit(1.0e7))).as("mean"),
        ((col("n").cast(dec) * col("s2") - col("s1") * col("s1"))
          .cast("double") /
          ((col("n") * col("n")).cast("double") * lit(1.0e14))).as("variance"))
  }

  val oDimMoments: String =
    """WITH e AS (
      |  SELECT generate_subscripts(embedding, 1) AS pos,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000000.0)
      |      AS BIGINT) AS xs
      |  FROM embeddings),
      |p AS (
      |  SELECT CAST(pos AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(xs AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(xs AS DECIMAL(38,0)) * CAST(xs AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS s2
      |  FROM e GROUP BY 1)
      |SELECT pos, n,
      |  CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 10000000.0::DOUBLE)
      |    AS mean,
      |  CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE) /
      |    (CAST(n * n AS DOUBLE) * 100000000000000.0::DOUBLE) AS variance
      |FROM p""".stripMargin

  // ---- user-lifespan histogram: active span (last − first active
  //      day) per user, bucketed — the tenure distribution behind
  //      every retention model. Two hash aggs, exact day arithmetic ----
  def qUserLifespan(s: SparkSession, dir: String): DataFrame = {
    val span = events(s, dir)
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("user_id"))
      .agg((max(col("day")) - min(col("day"))).cast("long")
        .as("span_days"), count(lit(1)).as("n_events"))
    span.groupBy(col("span_days"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("events"))
      .select(col("span_days"), col("n_users"), col("events"),
        (col("events").cast("double") / col("n_users").cast("double"))
          .as("mean_events"))
  }

  val oUserLifespan: String =
    """WITH span AS (
      |  SELECT user_id,
      |    max(epoch_us(ts) // 86400000000) -
      |     min(epoch_us(ts) // 86400000000) AS span_days,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1)
      |SELECT span_days, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(n_events) AS BIGINT) AS events,
      |  CAST(sum(n_events) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_events
      |FROM span GROUP BY 1""".stripMargin

  // ---- nation trade balance: export value (as supplier nation) vs
  //      import value (as ordering customer's nation) per nation — two
  //      fact aggregates full-outer-joined on the bounded nation domain,
  //      exact cents ----
  def qTradeBalance(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val exp = li
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nation"))
      .agg(sum(col("price_c")).as("export_c"))
    val imp = li
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(sum(col("price_c")).as("import_c"))
    exp.join(imp, Seq("nation"), "full_outer")
      .select(col("nation"),
        (coalesce(col("export_c"), lit(0L)).cast("double") / lit(100.0))
          .as("exports"),
        (coalesce(col("import_c"), lit(0L)).cast("double") / lit(100.0))
          .as("imports"),
        ((coalesce(col("export_c"), lit(0L)) -
          coalesce(col("import_c"), lit(0L))).cast("double") / lit(100.0))
          .as("balance"))
  }

  val oTradeBalance: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem),
      |exp AS (
      |  SELECT s.s_nationkey AS nation,
      |    CAST(sum(li.price_c) AS BIGINT) AS export_c
      |  FROM li JOIN supplier s ON li.l_suppkey = s.s_suppkey
      |  GROUP BY 1),
      |imp AS (
      |  SELECT c.c_nationkey AS nation,
      |    CAST(sum(li.price_c) AS BIGINT) AS import_c
      |  FROM li
      |  JOIN orders o ON li.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1)
      |SELECT coalesce(exp.nation, imp.nation) AS nation,
      |  coalesce(export_c, 0)::DOUBLE / 100.0::DOUBLE AS exports,
      |  coalesce(import_c, 0)::DOUBLE / 100.0::DOUBLE AS imports,
      |  (coalesce(export_c, 0) - coalesce(import_c, 0))::DOUBLE /
      |    100.0::DOUBLE AS balance
      |FROM exp FULL OUTER JOIN imp ON exp.nation = imp.nation""".stripMargin

  // ---- basket brand diversity: mean distinct brands per order, by
  //      order size — "do bigger baskets spread across brands". The
  //      per-order distinct is partial-aggregable; the bucket mean is
  //      a ratio of exact sums ----
  def qBasketDiversity(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("p_brand")).as("n_brands"))
    per.groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"), sum(col("n_brands")).as("brands"))
      .select(col("n_lines"), col("n_orders"),
        (col("brands").cast("double") / col("n_orders").cast("double"))
          .as("mean_brands"))
  }

  val oBasketDiversity: String =
    """WITH per AS (
      |  SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1)
      |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(n_brands) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_brands
      |FROM per GROUP BY 1""".stripMargin

  // ---- return-value impact per brand: value-weighted return share —
  //      which brands LOSE the most revenue to returns (complements
  //      q_return_rate's count view by nation/year). Exact cents ----
  def qReturnImpact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("l_returnflag") === "R", col("price_c")).otherwise(0L))
          .as("returned_c"),
        sum(col("price_c")).as("total_c"))
      .select(col("p_brand"),
        (col("returned_c").cast("double") / lit(100.0)).as("returned_value"),
        (col("total_c").cast("double") / lit(100.0)).as("total_value"),
        (col("returned_c").cast("double") / col("total_c").cast("double"))
          .as("return_share"))

  val oReturnImpact: String =
    """SELECT p.p_brand,
      |  CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |    THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT)
      |    ELSE 0 END) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS returned_value,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS total_value,
      |  CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |    THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT)
      |    ELSE 0 END) AS BIGINT)::DOUBLE /
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE AS return_share
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY 1""".stripMargin

  // ---- effective tax take per ship year: gross, tax, and the
  //      value-weighted effective rate — per-row tax cents floor the
  //      same double product in both engines, then exact sums ----
  def qTaxImpact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(year(col("l_shipdate")).cast("long").as("yr"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"),
        floor(col("l_extendedprice") * col("l_tax") * 100).cast("long")
          .as("tax_c"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_lines"), sum(col("price_c")).as("gross_c"),
        sum(col("tax_c")).as("tax_sum_c"))
      .select(col("yr"), col("n_lines"),
        (col("gross_c").cast("double") / lit(100.0)).as("gross"),
        (col("tax_sum_c").cast("double") / lit(100.0)).as("tax_take"),
        (col("tax_sum_c").cast("double") / col("gross_c").cast("double"))
          .as("effective_rate"))

  val oTaxImpact: String =
    """WITH li AS (
      |  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    CAST(floor(l_extendedprice * l_tax * 100) AS BIGINT) AS tax_c
      |  FROM lineitem)
      |SELECT yr, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS gross,
      |  CAST(sum(tax_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS tax_take,
      |  CAST(sum(tax_c) AS BIGINT)::DOUBLE /
      |    CAST(sum(price_c) AS BIGINT)::DOUBLE AS effective_rate
      |FROM li GROUP BY 1""".stripMargin

  // ---- nation part-set overlap: pairwise Jaccard of the part sets
  //      each nation's suppliers ship — the q_source_overlap shape on
  //      the commerce graph; pair fan-out per part bounded by the
  //      25-nation domain ----
  def qNationPartOverlap(s: SparkSession, dir: String): DataFrame = {
    val np = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nation"), col("l_partkey").as("part"))
      .distinct()
    val sizes = np.groupBy(col("nation")).agg(count(lit(1)).as("n"))
    np.select(col("nation").as("a_nat"), col("part"))
      .join(np.select(col("nation").as("b_nat"), col("part")), "part")
      .filter(col("a_nat") < col("b_nat"))
      .groupBy(col("a_nat"), col("b_nat"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("nation").as("a_nat"), col("n").as("n_a")), "a_nat")
      .join(sizes.select(col("nation").as("b_nat"), col("n").as("n_b")), "b_nat")
      .select(col("a_nat"), col("b_nat"), col("n_inter"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          .as("jaccard"))
  }

  val oNationPartOverlap: String =
    """WITH np AS (
      |  SELECT DISTINCT s.s_nationkey AS nation, l.l_partkey AS part
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |sizes AS (SELECT nation, CAST(count(*) AS BIGINT) AS n
      |          FROM np GROUP BY 1),
      |i AS (
      |  SELECT a.nation AS a_nat, b.nation AS b_nat,
      |    CAST(count(*) AS BIGINT) AS n_inter
      |  FROM np a JOIN np b ON a.part = b.part AND a.nation < b.nation
      |  GROUP BY 1, 2)
      |SELECT a_nat, b_nat, n_inter,
      |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
      |    AS jaccard
      |FROM i
      |JOIN sizes sa ON i.a_nat = sa.nation
      |JOIN sizes sb ON i.b_nat = sb.nation""".stripMargin

  // ---- hour-of-day activity profile: events and active-user share per
  //      hour 0-23 — q_dow_effect's intra-day sibling. Exact counts
  //      over the bounded 24-hour domain ----
  def qHourProfile(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"),
      expr("(ts DIV 1000 DIV 3600000000) % 24").as("hour"))
    val tot = e.agg(count(lit(1)).as("n_all"))
    e.groupBy(col("hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("hour"), col("n_events"), col("n_users"),
        (col("n_events").cast("double") / col("n_all").cast("double"))
          .as("share"))
  }

  val oHourProfile: String =
    """WITH e AS (
      |  SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hour
      |  FROM events),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM e)
      |SELECT hour, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(count(*) AS BIGINT)::DOUBLE / CAST(n_all AS BIGINT)::DOUBLE
      |    AS share
      |FROM e CROSS JOIN tot GROUP BY hour, n_all""".stripMargin

  // ---- time-decay attribution: every view/click touch in the 7 days
  //      before a purchase earns weight 2^(7−days_before) — EXACT long
  //      weights (dyadic, so no float sum anywhere), credit shares per
  //      channel are ratios of exact Σw and Σ(value_cents·w). The
  //      q_attribution_linear rangeJoinBinned shape at a day bin ----
  def qAttributionDecay(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Temporal
    val horizonUs = 7L * 86400L * 1000000L
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("event_type"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        (col("ts_us") - horizonUs).as("start_us"), col("ts_us").as("end_us"),
        floor(col("value") * 100).cast("long").as("value_c"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"), col("ts_us"),
        col("event_type").as("channel"))
    val pairs = Temporal.rangeJoinBinned(touches, purchases,
        keys = Seq("user_id"), tsCol = "ts_us",
        startCol = "start_us", endCol = "end_us",
        binMicros = 86400L * 1000000L)
      .select(col("channel"), col("value_c"),
        expr("(end_us - ts_us) DIV 86400000000").as("k"))
      .select(col("channel"), col("value_c"),
        expr("CAST(shiftleft(1L, CAST(7 - k AS INT)) AS BIGINT)").as("w"))
    // value_c·w (cents × ≤2⁷ decay weight, ≤1.3·10⁹/row) summed over
    // unbounded touch counts → DECIMAL(38,0) staging (q_monthly_hhi class)
    val tot = pairs.agg(sum(col("w")).as("w_all"),
      sum((col("value_c") * col("w")).cast("decimal(38,0)")).as("vw_all"))
    pairs.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("w")).as("w_sum"),
        sum((col("value_c") * col("w")).cast("decimal(38,0)")).as("vw_sum"))
      .crossJoin(broadcast(tot))
      .select(col("channel"), col("n_touches"), col("w_sum"),
        (col("w_sum").cast("double") / col("w_all").cast("double"))
          .as("credit_share"),
        (col("vw_sum").cast("double") / col("vw_all").cast("double"))
          .as("value_share"))
  }

  val oAttributionDecay: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |    ts_us - 604800000000 AS start_us, ts_us AS end_us,
      |    CAST(floor(value * 100) AS BIGINT) AS value_c
      |  FROM e WHERE event_type = 'purchase'),
      |tch AS (
      |  SELECT user_id, event_id AS touch_id, ts_us, event_type AS channel
      |  FROM e WHERE event_type IN ('view', 'click')),
      |pairs AS (
      |  SELECT tch.channel, p.value_c,
      |    1 << CAST(7 - (p.end_us - tch.ts_us) // 86400000000 AS INT) AS w
      |  FROM tch JOIN p ON tch.user_id = p.user_id
      |    AND tch.ts_us BETWEEN p.start_us AND p.end_us),
      |tot AS (
      |  SELECT CAST(sum(w) AS BIGINT) AS w_all,
      |    sum(value_c::HUGEINT * w) AS vw_all
      |  FROM pairs)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(sum(w) AS BIGINT) AS w_sum,
      |  CAST(sum(w) AS BIGINT)::DOUBLE / CAST(w_all AS BIGINT)::DOUBLE
      |    AS credit_share,
      |  sum(value_c::HUGEINT * w)::DOUBLE /
      |    vw_all::DOUBLE AS value_share
      |FROM pairs CROSS JOIN tot GROUP BY channel, w_all, vw_all""".stripMargin

  // ---- monthly seasonality index: each calendar month's revenue share
  //      vs the uniform 1/12 — the "is December real" decomposition on
  //      the commerce ledger (q_dow_effect's calendar sibling). Exact
  //      cents over the bounded 12-month domain ----
  def qSeasonalRevenue(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select(month(col("o_orderdate")).cast("long").as("cal_month"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val tot = m.agg(sum(col("price_c")).as("total_c"))
    m.groupBy(col("cal_month"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_c"))
      .crossJoin(broadcast(tot))
      .select(col("cal_month"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        ((col("rev_c") * lit(12L)).cast("double") /
          col("total_c").cast("double")).as("seasonality_index"))
  }

  val oSeasonalRevenue: String =
    """WITH m AS (
      |  SELECT CAST(month(o_orderdate) AS BIGINT) AS cal_month,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |tot AS (SELECT CAST(sum(price_c) AS BIGINT) AS total_c FROM m)
      |SELECT cal_month, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(sum(price_c) * 12 AS BIGINT)::DOUBLE /
      |    CAST(total_c AS BIGINT)::DOUBLE AS seasonality_index
      |FROM m CROSS JOIN tot GROUP BY cal_month, total_c""".stripMargin

  // ---- week-over-week revenue growth: weekly totals + the growth vs
  //      the PREVIOUS week via a shifted self-equi-join on the bounded
  //      week domain (the growth-accounting join-not-window rule) ----
  def qWowGrowth(s: SparkSession, dir: String): DataFrame = {
    val wk = t(s, dir, "orders")
      .select(expr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)" +
          " DIV 7").as("wk"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_c"))
    wk.join(wk.select((col("wk") + 1L).as("wk"),
        col("rev_c").as("prev_rev_c")), Seq("wk"), "left")
      .select(col("wk"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        (col("rev_c") - coalesce(col("prev_rev_c"), lit(0L))).cast("double")
          ./(lit(100.0)).as("delta"),
        when(col("prev_rev_c").isNotNull,
          col("rev_c").cast("double") / col("prev_rev_c").cast("double"))
          .as("wow_ratio"))
  }

  val oWowGrowth: String =
    """WITH wk AS (
      |  SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 // 7 AS wk,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1)
      |SELECT a.wk, a.n_orders,
      |  a.rev_c::DOUBLE / 100.0::DOUBLE AS revenue,
      |  (a.rev_c - coalesce(b.rev_c, 0))::DOUBLE / 100.0::DOUBLE AS delta,
      |  CASE WHEN b.rev_c IS NOT NULL
      |    THEN a.rev_c::DOUBLE / b.rev_c::DOUBLE END AS wow_ratio
      |FROM wk a LEFT JOIN wk b ON a.wk = b.wk + 1""".stripMargin

  // ---- z-score outlier census per event type: |z| > 3 flags via the
  //      EXACT integer cross-multiply (n·x − s1)² > 9·(n·s2 − s1²) — no
  //      float mean/stdev ever computed (the q_peaks/linregExact
  //      discipline); moments ride DECIMAL(38,0), one mirrored closing
  //      division for the flag rate ----
  def qZscoreFlags(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = events(s, dir).select(col("event_type"),
      floor(col("value") * 100).cast("long").as("v_c"))
    val mom = v.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v_c").cast(dec)).as("s1"),
        sum(col("v_c").cast(dec) * col("v_c").cast(dec)).as("s2"))
    v.join(mom, Seq("event_type"))
      .select(col("event_type"), col("n"),
        when((col("n").cast(dec) * col("v_c") - col("s1")) *
          (col("n").cast(dec) * col("v_c") - col("s1")) >
          lit(9L).cast(dec) * (col("n").cast(dec) * col("s2") -
            col("s1") * col("s1")), 1L).otherwise(0L).as("is_out"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_events"), sum(col("is_out")).as("n_flagged"))
      .select(col("event_type"), col("n_events"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("n_events").cast("double"))
          .as("flag_rate"))
  }

  val oZscoreFlags: String =
    """WITH v AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c
      |  FROM events),
      |mom AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(v_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(v_c AS DECIMAL(38,0)) * CAST(v_c AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS s2
      |  FROM v GROUP BY 1),
      |f AS (
      |  SELECT v.event_type, mom.n,
      |    CASE WHEN (CAST(mom.n AS DECIMAL(38,0)) * v.v_c - mom.s1) *
      |              (CAST(mom.n AS DECIMAL(38,0)) * v.v_c - mom.s1) >
      |              9 * (CAST(mom.n AS DECIMAL(38,0)) * mom.s2 -
      |                   mom.s1 * mom.s1)
      |         THEN 1 ELSE 0 END AS is_out
      |  FROM v JOIN mom ON v.event_type = mom.event_type)
      |SELECT event_type, CAST(min(n) AS BIGINT) AS n_events,
      |  CAST(sum(is_out) AS BIGINT) AS n_flagged,
      |  CAST(sum(is_out) AS BIGINT)::DOUBLE /
      |    CAST(min(n) AS BIGINT)::DOUBLE AS flag_rate
      |FROM f GROUP BY 1""".stripMargin

  // ---- dead-stock audit: catalog parts with ZERO lineitem sales, per
  //      brand — the left-anti census with catalog value at risk.
  //      Exact cents, one mirrored division ----
  def qDeadStock(s: SparkSession, dir: String): DataFrame = {
    val sold = t(s, dir, "lineitem").select(col("l_partkey")).distinct()
    val parts = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
      floor(col("p_retailprice") * 100).cast("long").as("retail_c"))
    val dead = parts.join(sold, col("p_partkey") === col("l_partkey"),
        "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_dead"), sum(col("retail_c")).as("dead_c"))
    parts.groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
      .join(dead, Seq("p_brand"), "left")
      .select(col("p_brand"), col("n_parts"),
        coalesce(col("n_dead"), lit(0L)).as("n_dead"),
        (coalesce(col("dead_c"), lit(0L)).cast("double") / lit(100.0))
          .as("dead_value"),
        (coalesce(col("n_dead"), lit(0L)).cast("double") /
          col("n_parts").cast("double")).as("dead_share"))
  }

  val oDeadStock: String =
    """WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
      |parts AS (
      |  SELECT p_partkey, p_brand,
      |    CAST(floor(p_retailprice * 100) AS BIGINT) AS retail_c
      |  FROM part),
      |dead AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_dead,
      |    CAST(sum(retail_c) AS BIGINT) AS dead_c
      |  FROM parts ANTI JOIN sold ON p_partkey = l_partkey
      |  GROUP BY 1),
      |tot AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
      |        FROM parts GROUP BY 1)
      |SELECT tot.p_brand, tot.n_parts,
      |  coalesce(dead.n_dead, 0) AS n_dead,
      |  coalesce(dead.dead_c, 0)::DOUBLE / 100.0::DOUBLE AS dead_value,
      |  coalesce(dead.n_dead, 0)::DOUBLE / tot.n_parts::DOUBLE
      |    AS dead_share
      |FROM tot LEFT JOIN dead ON tot.p_brand = dead.p_brand""".stripMargin

  // ---- exclusive-supply census: parts shipped by exactly ONE nation,
  //      per that nation — the single-source supply-chain risk count
  //      (complement of q_nation_part_overlap). Two hash aggs ----
  def qExclusiveParts(s: SparkSession, dir: String): DataFrame = {
    val np = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nation"), col("l_partkey").as("part"))
      .distinct()
    val excl = np.groupBy(col("part"))
      .agg(count(lit(1)).as("n_nations"), min(col("nation")).as("nation"))
      .filter(col("n_nations") === 1L)
      .groupBy(col("nation")).agg(count(lit(1)).as("n_exclusive"))
    np.groupBy(col("nation")).agg(count(lit(1)).as("n_parts"))
      .join(excl, Seq("nation"), "left")
      .select(col("nation"), col("n_parts"),
        coalesce(col("n_exclusive"), lit(0L)).as("n_exclusive"),
        (coalesce(col("n_exclusive"), lit(0L)).cast("double") /
          col("n_parts").cast("double")).as("exclusive_share"))
  }

  val oExclusiveParts: String =
    """WITH np AS (
      |  SELECT DISTINCT s.s_nationkey AS nation, l.l_partkey AS part
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |excl AS (
      |  SELECT nation, CAST(count(*) AS BIGINT) AS n_exclusive FROM (
      |    SELECT part, min(nation) AS nation
      |    FROM np GROUP BY part HAVING count(*) = 1)
      |  GROUP BY 1),
      |tot AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_parts
      |        FROM np GROUP BY 1)
      |SELECT tot.nation, tot.n_parts,
      |  coalesce(excl.n_exclusive, 0) AS n_exclusive,
      |  coalesce(excl.n_exclusive, 0)::DOUBLE / tot.n_parts::DOUBLE
      |    AS exclusive_share
      |FROM tot LEFT JOIN excl ON tot.nation = excl.nation""".stripMargin

  // ---- LSH band-load histogram: bucket-size distribution per band of
  //      the SAME minhash banding q_dedup_minhash joins on — the skew
  //      diagnostic that predicts the candidate join's cost (a hot
  //      bucket of size s costs s² pairs) BEFORE paying for it ----
  def qLshBandLoad(s: SparkSession, dir: String): DataFrame = {
    val sig = graft.operators.Dedup.minhashSignature(
      t(s, dir, "documents"), k = 3, numHashes = 8)
    graft.operators.Dedup.minhashBands(sig, numHashes = 8, bandSize = 2)
      .groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("band"), col("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
  }

  val oLshBandLoad: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(tk) - 1),
      |    i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
      |  FROM toks WHERE len(tk) >= 3),
      |minh AS (
      |  SELECT doc_id, seed,
      |    min(('0x' || substr(md5(CAST(seed AS VARCHAR) || '#' || shingle),
      |      1, 8))::BIGINT) AS minhash
      |  FROM sh, (SELECT unnest(range(0, 8)) AS seed) s
      |  GROUP BY 1, 2),
      |bands AS (
      |  SELECT doc_id, seed // 2 AS band,
      |    list_reduce(list_prepend(0::BIGINT, list_sort(list(minhash))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS band_key
      |  FROM minh GROUP BY doc_id, seed // 2),
      |bl AS (
      |  SELECT band, band_key, CAST(count(*) AS BIGINT) AS bucket_size
      |  FROM bands GROUP BY 1, 2)
      |SELECT CAST(band AS INT) AS band, bucket_size,
      |  CAST(count(*) AS BIGINT) AS n_buckets
      |FROM bl GROUP BY 1, 2""".stripMargin

  // ---- pairwise-cosine histogram over a bounded hash sample: the
  //      "has the embedding space collapsed" diagnostic (mass piling at
  //      cos≈1 means every ANN bucket goes hot). Sampled-pair regime;
  //      per-pair cosine is an array-order double fold on both engines,
  //      bucketed at 0.05 ----
  def qCosineHist(s: SparkSession, dir: String): DataFrame = {
    val sampled = graft.operators.Dedup.boundedHashSample(
        t(s, dir, "embeddings"), "vec_id", 60)
      .select(col("vec_id"), col("embedding"))
    val a = sampled.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = sampled.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(expr(
        s"CAST(floor((${dot("ea", "eb")} / (sqrt(${dot("ea", "ea")}) * " +
          s"sqrt(${dot("eb", "eb")}))) * 20.0) AS BIGINT)").as("cos_bucket"))
      .groupBy(col("cos_bucket")).agg(count(lit(1)).as("n_pairs"))
  }

  val oCosineHist: String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), " +
        s"i -> $x[i]::DOUBLE * $y[i]::DOUBLE)), (acc, v) -> acc + v)"
    s"""WITH m AS (
       |  SELECT greatest(1, CAST(ceil(count(*) / 60.0) AS BIGINT)) AS mod
       |  FROM embeddings),
       |g AS (
       |  SELECT vec_id, embedding FROM embeddings, m
       |  WHERE ('0x' || substr(md5('7#' || CAST(vec_id AS VARCHAR)), 1, 8))
       |          ::BIGINT % m.mod = 0),
       |p AS (
       |  SELECT CAST(floor((${dot("a.embedding", "b.embedding")} /
       |      (sqrt(${dot("a.embedding", "a.embedding")}) *
       |       sqrt(${dot("b.embedding", "b.embedding")}))) * 20.0) AS BIGINT)
       |    AS cos_bucket
       |  FROM g a, g b WHERE a.vec_id < b.vec_id)
       |SELECT cos_bucket, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM p GROUP BY 1""".stripMargin
  }

  // ---- keyword burst census: BIGRAM types whose share in the RECENT
  //      quarter of the corpus (by doc_id) exceeds 1.5× their overall
  //      share — the exact cross-multiply 2·rc·T_tot > 3·tc·T_rec, no
  //      float shares until the mirrored output ratio. (Unigrams in
  //      this corpus are share-stable; bigrams carry the burst.) ----
  def qKeywordBurst(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = docs.agg(expr("CAST(max(doc_id) * 3 DIV 4 AS BIGINT)").as("cut"))
    val toksP = split(col("text"), " ")
    val nP = size(toksP) - 1
    val tok = docs.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("cut"), explode(arrays_zip(
        slice(toksP, lit(1), nP), slice(toksP, lit(2), nP))).as("p"))
      .select(col("doc_id"), col("cut"),
        concat(col("p.0"), lit(" "), col("p.1")).as("token"))
    val per = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("tc"),
        sum(when(col("doc_id") > col("cut"), 1L).otherwise(0L)).as("rc"))
    val tots = per.agg(sum(col("tc")).as("t_tot"), sum(col("rc")).as("t_rec"))
    per.crossJoin(broadcast(tots))
      .filter(lit(2L) * col("rc") * col("t_tot") >
        lit(3L) * col("tc") * col("t_rec"))
      .select(col("token"), col("tc"), col("rc"),
        ((col("rc") * col("t_tot")).cast("double") /
          (col("tc") * col("t_rec")).cast("double")).as("burst_ratio"))
  }

  val oKeywordBurst: String =
    """WITH cut AS (
      |  SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cut FROM documents),
      |toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> ts[i] || ' ' || ts[i+1])) AS token
      |  FROM toks),
      |per AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS tc,
      |    CAST(sum(CASE WHEN doc_id > cut.cut THEN 1 ELSE 0 END) AS BIGINT)
      |      AS rc
      |  FROM tok CROSS JOIN cut GROUP BY 1),
      |tots AS (
      |  SELECT CAST(sum(tc) AS BIGINT) AS t_tot,
      |    CAST(sum(rc) AS BIGINT) AS t_rec
      |  FROM per)
      |SELECT token, tc, rc,
      |  CAST(rc * t_tot AS BIGINT)::DOUBLE /
      |    CAST(tc * t_rec AS BIGINT)::DOUBLE AS burst_ratio
      |FROM per CROSS JOIN tots
      |WHERE 2 * rc * t_tot > 3 * tc * t_rec""".stripMargin

  // ---- per-brand quantity↔discount correlation: does discounting move
  //      volume per brand — Pearson r from DECIMAL(38,0) moments per
  //      group (the corrMatrix discipline, keyed), closing expression
  //      the only float math ----
  def qGroupCorr(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("x"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("y"))
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(col("p_brand"), col("n").cast("long").as("n_lines"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("r"))
  }

  val oGroupCorr: String =
    """WITH b AS (
      |  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS x,
      |    CAST(round(l.l_discount * 100) AS BIGINT) AS y
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |m AS (
      |  SELECT p_brand, CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS sxy
      |  FROM b GROUP BY 1)
      |SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
      |FROM m""".stripMargin

  // ---- part repurchase rate per brand: share of (customer, part)
  //      relationships with >= 2 purchases — loyalty at the SKU level
  //      (q_repeat_rate's part-grained sibling). Exact counts ----
  def qReorderRate(s: SparkSession, dir: String): DataFrame = {
    val cp = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(count(lit(1)).as("n_buys"))
    cp.join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("n_buys") >= 2L, 1L).otherwise(0L)).as("n_repeat"))
      .select(col("p_brand"), col("n_pairs"), col("n_repeat"),
        (col("n_repeat").cast("double") / col("n_pairs").cast("double"))
          .as("reorder_rate"))
  }

  val oReorderRate: String =
    """WITH cp AS (
      |  SELECT o.o_custkey, l.l_partkey, CAST(count(*) AS BIGINT) AS n_buys
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2)
      |SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN cp.n_buys >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeat,
      |  CAST(sum(CASE WHEN cp.n_buys >= 2 THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE
      |    AS reorder_rate
      |FROM cp JOIN part p ON cp.l_partkey = p.p_partkey
      |GROUP BY 1""".stripMargin

  // ---- edge triangle-support histogram: for each co-purchase edge,
  //      how many triangles contain it (the k-truss support statistic);
  //      histogram over support values. Same degree-ordered wedge
  //      enumeration as q_local_clustering, credit to the three edges
  //      of each closed triangle, zero-support edges kept via the
  //      left join ----
  def qEdgeSupport(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 26)
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("a"))
      .join(li.select(col("k"), col("l_partkey").as("b")), "k")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    // NOT truncated (unlike triangleCounts): this is a single-action plan
    // whose repeated subtrees Catalyst already dedupes via ReusedExchange —
    // a truncate experiment here measured 2.39 s -> 3.00 s, the three extra
    // materialization jobs costing more than the (already-reused) recompute
    // they removed (r16)
    val und = pairs.distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("d").as("du")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("dv")), "b")
      .select(when(uFirst, col("a")).otherwise(col("b")).as("src"),
        when(uFirst, col("b")).otherwise(col("a")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    val wedges = oriented
      .select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
      .join(oriented.select(col("src"), col("dst").as("z"),
        col("ddst").as("dz")), "src")
      .filter(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
      .select(col("src").as("x"), col("y"), col("z"))
    val tri = wedges.join(
      oriented.select(col("src").as("y"), col("dst").as("z")),
      Seq("y", "z"), "left_semi")
    val support = tri.select(explode(array(
        struct(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v")),
        struct(least(col("x"), col("z")).as("u"),
          greatest(col("x"), col("z")).as("v")),
        struct(least(col("y"), col("z")).as("u"),
          greatest(col("y"), col("z")).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
    und.select(col("a").as("u"), col("b").as("v"))
      .join(support, Seq("u", "v"), "left")
      .select(coalesce(col("support"), lit(0L)).as("support"))
      .groupBy(col("support")).agg(count(lit(1)).as("n_edges"))
  }

  val oEdgeSupport: String =
    """WITH e0 AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  WHERE a.l_quantity >= 26 AND b.l_quantity >= 26),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS d
      |  FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      |  GROUP BY 1),
      |o AS (
      |  SELECT
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
      |         THEN e0.u ELSE e0.v END AS src,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
      |         THEN e0.v ELSE e0.u END AS dst,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e0.u < e0.v)
      |         THEN dv.d ELSE du.d END AS ddst
      |  FROM e0 JOIN deg du ON e0.u = du.node JOIN deg dv ON e0.v = dv.node),
      |w AS (
      |  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      |  FROM o e1 JOIN o e2 ON e1.src = e2.src
      |  WHERE e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
      |tri AS (
      |  SELECT w.x, w.y, w.z
      |  FROM w JOIN o ON w.y = o.src AND w.z = o.dst),
      |sup AS (
      |  SELECT u, v, CAST(count(*) AS BIGINT) AS support FROM (
      |    SELECT least(x, y) AS u, greatest(x, y) AS v FROM tri
      |    UNION ALL SELECT least(x, z), greatest(x, z) FROM tri
      |    UNION ALL SELECT least(y, z), greatest(y, z) FROM tri)
      |  GROUP BY 1, 2)
      |SELECT coalesce(sup.support, 0) AS support,
      |  CAST(count(*) AS BIGINT) AS n_edges
      |FROM e0 LEFT JOIN sup ON e0.u = sup.u AND e0.v = sup.v
      |GROUP BY 1""".stripMargin

  // ---- supplier balance quartiles per nation (ntile): window over the
  //      per-nation bounded domain with a (bal, suppkey) total order so
  //      the tile assignment is deterministic in both engines ----
  def qWindowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("bal_c"), col("s_suppkey"))
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        floor(col("s_acctbal") * 100).cast("long").as("bal_c"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("s_nationkey"), col("quartile"))
      .agg(count(lit(1)).as("n_suppliers"),
        (sum(col("bal_c")).cast("double") / lit(100.0)).as("total_bal"))
  }

  val oWindowNtile: String =
    """WITH q AS (
      |  SELECT s_nationkey, s_suppkey,
      |    CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_c,
      |    CAST(ntile(4) OVER (PARTITION BY s_nationkey
      |      ORDER BY CAST(floor(s_acctbal * 100) AS BIGINT), s_suppkey)
      |      AS BIGINT) AS quartile
      |  FROM supplier)
      |SELECT s_nationkey, quartile, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(bal_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS total_bal
      |FROM q GROUP BY 1, 2""".stripMargin

  // ---- discount × tax revenue matrix: the 2-D pricing-mix profile —
  //      one hash agg to the bounded ~11×9 band domain, exact cents ----
  def qHist2d(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "lineitem")
      .select(expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("tax_pct"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val tot = m.agg(sum(col("price_c")).as("total_c"))
    m.groupBy(col("disc_pct"), col("tax_pct"))
      .agg(count(lit(1)).as("n_lines"), sum(col("price_c")).as("rev_c"))
      .crossJoin(broadcast(tot))
      .select(col("disc_pct"), col("tax_pct"), col("n_lines"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        (col("rev_c").cast("double") / col("total_c").cast("double"))
          .as("share"))
  }

  val oHist2d: String =
    """WITH m AS (
      |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |    CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem),
      |tot AS (SELECT CAST(sum(price_c) AS BIGINT) AS total_c FROM m)
      |SELECT disc_pct, tax_pct, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE /
      |    CAST(total_c AS BIGINT)::DOUBLE AS share
      |FROM m CROSS JOIN tot GROUP BY disc_pct, tax_pct, total_c""".stripMargin

  // ---- daily abandonment: users who viewed but did not purchase that
  //      day — two distinct sets left-joined on (user, day), exact
  //      counts, one mirrored division ----
  def qDailyAbandonment(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"),
      expr("ts DIV 1000 DIV 86400000000").as("day"))
    val viewers = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("day")).distinct()
    val buyers = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("day")).distinct()
      .withColumn("bought", lit(1L))
    viewers.join(buyers, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_viewers"),
        sum(when(col("bought").isNull, 1L).otherwise(0L)).as("n_abandoned"))
      .select(col("day"), col("n_viewers"), col("n_abandoned"),
        (col("n_abandoned").cast("double") / col("n_viewers").cast("double"))
          .as("abandonment_rate"))
  }

  val oDailyAbandonment: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |v AS (SELECT DISTINCT user_id, day FROM e WHERE event_type = 'view'),
      |b AS (SELECT DISTINCT user_id, day FROM e
      |      WHERE event_type = 'purchase')
      |SELECT v.day, CAST(count(*) AS BIGINT) AS n_viewers,
      |  CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_abandoned,
      |  CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE
      |    AS abandonment_rate
      |FROM v LEFT JOIN b ON v.user_id = b.user_id AND v.day = b.day
      |GROUP BY 1""".stripMargin

  // ---- tainted-order share per year: orders with >= 1 returned line —
  //      order-level quality complement of the line-level return rate ----
  def qTaintedOrders(s: SparkSession, dir: String): DataFrame = {
    val tainted = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
        .as("n_ret"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
      .join(tainted, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("n_ret") > 0L, 1L).otherwise(0L)).as("n_tainted"))
      .select(col("yr"), col("n_orders"), col("n_tainted"),
        (col("n_tainted").cast("double") / col("n_orders").cast("double"))
          .as("tainted_share"))
  }

  val oTaintedOrders: String =
    """WITH t AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_ret
      |  FROM lineitem GROUP BY 1)
      |SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN t.n_ret > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_tainted,
      |  CAST(sum(CASE WHEN t.n_ret > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE
      |    AS tainted_share
      |FROM orders o JOIN t ON o.o_orderkey = t.l_orderkey
      |GROUP BY 1""".stripMargin

  // ---- part-type prefix rollup: p_type's first word is a category
  //      prefix ("STANDARD ANODIZED BRASS" → STANDARD) — parse + sold
  //      revenue per category, exact cents ----
  def qTypeRollup(s: SparkSession, dir: String): DataFrame = {
    val pt = t(s, dir, "part").select(col("p_partkey"),
      element_at(split(col("p_type"), " "), 1).as("category"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("price_c")).cast("double") / lit(100.0)).as("revenue"))
  }

  val oTypeRollup: String =
    """WITH pt AS (
      |  SELECT p_partkey, string_split(p_type, ' ')[1] AS category
      |  FROM part)
      |SELECT pt.category, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM lineitem l JOIN pt ON l.l_partkey = pt.p_partkey
      |GROUP BY 1""".stripMargin

  // ---- day-of-week × hour activity heatmap: the full weekly texture
  //      (q_dow_effect × q_hour_profile in one 7×24 bounded matrix) ----
  def qDowHourHeatmap(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(
      expr("((ts DIV 86400000000000) + 4) % 7").as("dow"),
      expr("(ts DIV 1000 DIV 3600000000) % 24").as("hour"))
    val tot = e.agg(count(lit(1)).as("n_all"))
    e.groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n_events"),
        (col("n_events").cast("double") / col("n_all").cast("double"))
          .as("share"))
  }

  val oDowHourHeatmap: String =
    """WITH e AS (
      |  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
      |    (epoch_us(ts) // 3600000000) % 24 AS hour
      |  FROM events),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM e)
      |SELECT dow, hour, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(*) AS BIGINT)::DOUBLE / CAST(n_all AS BIGINT)::DOUBLE
      |    AS share
      |FROM e CROSS JOIN tot GROUP BY dow, hour, n_all""".stripMargin

  // ---- conversion by session start hour: purchases landing per
  //      session-start-hour over sessions started that hour — two
  //      independent exact counts joined on the bounded 24-hour domain ----
  def qHourlyConversion(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.operators.Sessions.sessionize(
        events(s, dir).select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("ts_us")),
        gapMicros = 1800000000L)
      .groupBy(expr("(start_us DIV 3600000000) % 24").as("hour"))
      .agg(count(lit(1)).as("n_sessions"))
    val buys = events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("(ts DIV 1000 DIV 3600000000) % 24").as("hour"))
      .agg(count(lit(1)).as("n_purchases"))
    sess.join(buys, Seq("hour"), "left")
      .select(col("hour"), col("n_sessions"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        (coalesce(col("n_purchases"), lit(0L)).cast("double") /
          col("n_sessions").cast("double")).as("purchases_per_session"))
  }

  val oHourlyConversion: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END
      |      AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT min(ts_us) AS start_us
      |  FROM (SELECT user_id, ts_us,
      |          sum(is_new) OVER (PARTITION BY user_id
      |            ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS session_idx
      |        FROM flagged)
      |  GROUP BY user_id, session_idx),
      |sh AS (
      |  SELECT (start_us // 3600000000) % 24 AS hour,
      |    CAST(count(*) AS BIGINT) AS n_sessions
      |  FROM sess GROUP BY 1),
      |b AS (
      |  SELECT (ts_us // 3600000000) % 24 AS hour,
      |    CAST(count(*) AS BIGINT) AS n_purchases
      |  FROM e WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT sh.hour, sh.n_sessions,
      |  coalesce(b.n_purchases, 0) AS n_purchases,
      |  coalesce(b.n_purchases, 0)::DOUBLE / sh.n_sessions::DOUBLE
      |    AS purchases_per_session
      |FROM sh LEFT JOIN b ON sh.hour = b.hour""".stripMargin

  // ---- price-endings audit: cents-digit distribution of order totals
  //      (the .99 pricing-psychology / fabrication screen beside
  //      q_benford's first-digit law). One hash agg to the 100-cell
  //      cents domain ----
  def qPriceEndings(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select((floor(col("o_totalprice") * 100).cast("long") % 100L)
        .as("cents"))
    val tot = m.agg(count(lit(1)).as("n_all"))
    m.groupBy(col("cents")).agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot))
      .select(col("cents"), col("n_orders"),
        (col("n_orders").cast("double") / col("n_all").cast("double"))
          .as("share"))
  }

  val oPriceEndings: String =
    """WITH m AS (
      |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) % 100 AS cents
      |  FROM orders),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM m)
      |SELECT cents, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(count(*) AS BIGINT)::DOUBLE / CAST(n_all AS BIGINT)::DOUBLE
      |    AS share
      |FROM m CROSS JOIN tot GROUP BY cents, n_all""".stripMargin

  // ---- activity-streak histogram: longest run of CONSECUTIVE active
  //      days per user (gaps-and-islands via day − row_number over the
  //      per-user bounded domain), then the tenure-quality histogram ----
  def qActivityStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = events(s, dir)
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("max_streak"))
    streaks.groupBy(col("max_streak")).agg(count(lit(1)).as("n_users"))
  }

  val oActivityStreaks: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |g AS (
      |  SELECT user_id,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS grp
      |  FROM days),
      |st AS (
      |  SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak FROM (
      |    SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      |    FROM g GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
      |FROM st GROUP BY 1""".stripMargin

  // ---- first-order value vs lifetime value: Pearson r over customers
  //      (does a big first basket predict a big lifetime?) — the first
  //      order is pinned by the (date, orderkey) total order, moments
  //      ride DECIMAL(38,0), closing expression is the only float ----
  def qFirstorderLtvCorr(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
      expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
        "AS BIGINT)").as("d"),
      floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val firstKey = o.groupBy(col("o_custkey"))
      .agg(min(struct(col("d"), col("o_orderkey"))).as("fk"),
        sum(col("price_c")).as("ltv_c"))
      .select(col("o_custkey"), col("fk.o_orderkey").as("first_key"),
        col("ltv_c"))
    val xy = firstKey.join(
        o.select(col("o_orderkey").as("first_key"),
          col("price_c").as("first_c")), Seq("first_key"))
      .select(col("first_c").as("x"), col("ltv_c").as("y"))
    xy.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(col("n").cast("long").as("n_customers"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("r"))
  }

  val oFirstorderLtvCorr: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS d,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |fk AS (
      |  SELECT o_custkey,
      |    min({'d': d, 'k': o_orderkey}) AS mk,
      |    CAST(sum(price_c) AS BIGINT) AS ltv_c
      |  FROM o GROUP BY 1),
      |xy AS (
      |  SELECT o.price_c AS x, fk.ltv_c AS y
      |  FROM fk JOIN o ON fk.mk.k = o.o_orderkey),
      |m AS (
      |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS sxy
      |  FROM xy)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
      |FROM m""".stripMargin

  // ---- session entry/exit matrix: which event type OPENS a session vs
  //      which CLOSES it — the landing/drop-off profile. First/last event
  //      per session via lexicographic struct min/max (ts, id unique →
  //      the type field never decides), so the per-session reduction is
  //      partial-aggregable: no per-session sort, no collect_list ----
  def qEntryExit(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("event_type"))
    e.withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs,
          1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("event_type"))).as("fst"),
        max(struct(col("ts_us"), col("event_id"), col("event_type"))).as("lst"))
      .select(col("fst.event_type").as("entry_type"),
        col("lst.event_type").as("exit_type"))
      .groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  val oEntryExit: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events),
      |w AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER win IS NULL
      |      OR ts_us - lag(ts_us) OVER win > 1800000000 THEN 1 ELSE 0 END
      |      AS is_new
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM w),
      |p AS (
      |  SELECT user_id, session_idx,
      |    min({'t': ts_us, 'k': event_id, 'e': event_type}) AS fst,
      |    max({'t': ts_us, 'k': event_id, 'e': event_type}) AS lst
      |  FROM s GROUP BY 1, 2)
      |SELECT fst.e AS entry_type, lst.e AS exit_type,
      |  CAST(count(*) AS BIGINT) AS n_sessions
      |FROM p GROUP BY 1, 2""".stripMargin

  // ---- ship-latency by order priority: does URGENT actually ship
  //      sooner? Delay in exact epoch-days (integer), one fact⋈fact hash
  //      join on orderkey + one hash agg to the 5-row priority domain;
  //      only the terminal mean divides ----
  def qPriorityLatency(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
      expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
        "AS BIGINT)").as("od"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("sd"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("sd") - col("od")).as("delay_d"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        min(col("delay_d")).as("min_delay_d"),
        max(col("delay_d")).as("max_delay_d"),
        sum(col("delay_d")).as("sum_delay_d"))
      .select(col("o_orderpriority"), col("n_lines"),
        col("min_delay_d"), col("max_delay_d"),
        (col("sum_delay_d").cast("double") /
          col("n_lines").cast("double")).as("mean_delay_d"))
  }

  val oPriorityLatency: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS od
      |  FROM orders),
      |j AS (
      |  SELECT o.o_orderpriority,
      |    CAST(epoch(l.l_shipdate) AS BIGINT) // 86400 - o.od AS delay_d
      |  FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey)
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(min(delay_d) AS BIGINT) AS min_delay_d,
      |  CAST(max(delay_d) AS BIGINT) AS max_delay_d,
      |  CAST(sum(delay_d) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_delay_d
      |FROM j GROUP BY 1""".stripMargin

  // ---- inter-order gap histogram: days between a customer's consecutive
  //      orders, bucketed to weeks — the purchase-cadence profile behind
  //      churn models. Per-customer lag window (key-partitioned, scales),
  //      integer week buckets, exact distinct customers per bucket ----
  def qInterorderGap(s: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("d"))
      .withColumn("gap_d", col("d") - lag(col("d"), 1).over(byCust))
      .where(col("gap_d").isNotNull)
      .select(expr("gap_d DIV 7").as("gap_wk"), col("o_custkey"))
      .groupBy(col("gap_wk"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  val oInterorderGap: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS d
      |  FROM orders),
      |g AS (
      |  SELECT o_custkey,
      |    d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      |      AS gap_d
      |  FROM o)
      |SELECT gap_d // 7 AS gap_wk, CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      |FROM g WHERE gap_d IS NOT NULL GROUP BY 1""".stripMargin

  // ---- market-segment × order-priority mix: order counts and exact-cents
  //      revenue per cell, plus each cell's share of its segment in basis
  //      points. customer⋈orders is the key-partitioned fact join; the
  //      25-row segment-total side of the share join broadcasts ----
  def qMktsegPriorityMix(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_c"))
    val segTotals = cells.groupBy(col("c_mktsegment"))
      .agg(sum(col("rev_c")).as("seg_c"))
    cells.join(broadcast(segTotals), Seq("c_mktsegment"))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("rev_c * 10000L DIV seg_c").as("share_bp"))
  }

  val oMktsegPriorityMix: String =
    """WITH cells AS (
      |  SELECT c.c_mktsegment, o.o_orderpriority,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |seg AS (
      |  SELECT c_mktsegment, CAST(sum(rev_c) AS BIGINT) AS seg_c
      |  FROM cells GROUP BY 1)
      |SELECT cells.c_mktsegment, cells.o_orderpriority, cells.n_orders,
      |  CAST(cells.rev_c AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(cells.rev_c * 10000 // seg.seg_c AS BIGINT) AS share_bp
      |FROM cells JOIN seg USING (c_mktsegment)""".stripMargin

  // ---- part catalog lattice: counts and exact-cents price stats on the
  //      (p_type, p_size) grid — the assortment-coverage audit. Single
  //      dimension-table scan, one hash agg to a ~7.5k-cell domain; the
  //      partial aggregate collapses map-side ----
  def qPartTypeSizeGrid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_type"), col("p_size").cast("long").as("p_size"),
        floor(col("p_retailprice") * 100).cast("long").as("price_c"))
      .groupBy(col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("price_c")).as("min_price_c"),
        max(col("price_c")).as("max_price_c"),
        (sum(col("price_c")).cast("double") /
          (count(lit(1)) * lit(100)).cast("double")).as("mean_price"))

  val oPartTypeSizeGrid: String =
    """WITH p AS (
      |  SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
      |    CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c
      |  FROM part)
      |SELECT p_type, p_size, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(min(price_c) AS BIGINT) AS min_price_c,
      |  CAST(max(price_c) AS BIGINT) AS max_price_c,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE /
      |    CAST(count(*) * 100 AS BIGINT)::DOUBLE AS mean_price
      |FROM p GROUP BY 1, 2""".stripMargin

  // ---- supplier workload: line count, distinct parts and orders served,
  //      exact-cents revenue per supplier, plus each supplier's share of
  //      total revenue in basis points. One fact-scan hash agg keyed by
  //      suppkey, the supplier-name dim broadcast in, and the 1-row grand
  //      total broadcast into the share join — no fact-side shuffle beyond
  //      the agg itself ----
  def qSupplierWorkload(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"), col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("price_c")).as("rev_c"))
    val total = per.agg(sum(col("rev_c")).as("tot_c"))
    per.join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(total))
      .select(col("s_name"), col("n_lines"), col("n_parts"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("rev_c * 10000L DIV tot_c").as("share_bp"))
  }

  val oSupplierWorkload: String =
    """WITH per AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c FROM per)
      |SELECT s.s_name, per.n_lines, per.n_parts, per.n_orders,
      |  per.rev_c::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(per.rev_c * 10000 // tot.tot_c AS BIGINT) AS share_bp
      |FROM per JOIN supplier s ON per.l_suppkey = s.s_suppkey, tot""".stripMargin

  // ---- quantity × discount grid: line counts and exact-cents revenue on
  //      the (integer quantity, discount-in-percent) lattice — the pricing
  //      surface behind discount-policy audits. Pure single-scan hash agg
  //      to a ~550-cell domain ----
  def qQtyDiscountGrid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("qty"),
        floor(col("l_discount") * 100).cast("long").as("disc_pct"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy(col("qty"), col("disc_pct"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("price_c")).cast("double") / lit(100.0)).as("revenue"))

  val oQtyDiscountGrid: String =
    """SELECT CAST(l_quantity AS BIGINT) AS qty,
      |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    ::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  // ---- character-class profile: per-source ASCII letter/digit/space/other
  //      composition of the corpus — the encoding-sanity audit a crawl
  //      pipeline runs before tokenization. Counts via length deltas of
  //      replace-all (both engines replace every match), exact integers,
  //      one scan, one hash agg ----
  def qCharClassProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"),
        length(col("text")).cast("long").as("n_all"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[A-Za-z]", "")))
          .cast("long").as("n_letter"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"),
        (length(col("text")) -
          length(regexp_replace(col("text"), " ", "")))
          .cast("long").as("n_space"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_all")).as("n_chars"),
        sum(col("n_letter")).as("n_letters"),
        sum(col("n_digit")).as("n_digits"),
        sum(col("n_space")).as("n_spaces"),
        sum(col("n_all") - col("n_letter") - col("n_digit") - col("n_space"))
          .as("n_other"))

  val oCharClassProfile: String =
    """WITH d AS (
      |  SELECT source, CAST(length(text) AS BIGINT) AS n_all,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
      |      AS BIGINT) AS n_letter,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
      |      AS BIGINT) AS n_digit,
      |    CAST(length(text) - length(replace(text, ' ', ''))
      |      AS BIGINT) AS n_space
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_all) AS BIGINT) AS n_chars,
      |  CAST(sum(n_letter) AS BIGINT) AS n_letters,
      |  CAST(sum(n_digit) AS BIGINT) AS n_digits,
      |  CAST(sum(n_space) AS BIGINT) AS n_spaces,
      |  CAST(sum(n_all - n_letter - n_digit - n_space) AS BIGINT) AS n_other
      |FROM d GROUP BY 1""".stripMargin

  // ---- vector sparsity histogram: how many dimensions per embedding are
  //      near zero (|x| < 0.05) — the rep-collapse / dead-dimension audit.
  //      A codegen'd lambda fold per row (no explode: the array never
  //      leaves the scan row), then a hash agg onto the ≤dim+1 domain.
  //      Float→double casts are exact, so the threshold compare is
  //      bit-identical across engines ----
  def qVectorSparsity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(expr("aggregate(embedding, 0L, (acc, x) -> acc + " +
        "CASE WHEN abs(CAST(x AS DOUBLE)) < 0.05 THEN 1L ELSE 0L END)")
        .as("n_small"))
      .groupBy(col("n_small"))
      .agg(count(lit(1)).as("n_vecs"))

  val oVectorSparsity: String =
    """SELECT CAST(len(list_filter(embedding,
      |    x -> abs(CAST(x AS DOUBLE)) < 0.05)) AS BIGINT) AS n_small,
      |  CAST(count(*) AS BIGINT) AS n_vecs
      |FROM embeddings GROUP BY 1""".stripMargin
}
