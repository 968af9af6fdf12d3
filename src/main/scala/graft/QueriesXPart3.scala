package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QueriesX extension queries, part 3 of the family-boundary split; opens with the
  * "token-length histogram" family. Query/oracle pairs only —
  * shared loaders live in [[QueriesXShared]].
  */
private[graft] trait QueriesXPart3 extends QueriesXShared {

  // ---- token-length histogram: corpus-wide word-length distribution plus
  //      how many documents contain a word of each length — the
  //      tokenizer-sanity profile. Explode is the only row expansion; the
  //      agg collapses map-side onto a ~20-row domain ----
  def qWordLenHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(length(col("tok")).cast("long").as("tok_len"), col("doc_id"))
      .groupBy(col("tok_len"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))

  val oWordLenHist: String =
    """SELECT CAST(length(tok) AS BIGINT) AS tok_len,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |      FROM documents)
      |GROUP BY 1""".stripMargin

  // ---- event-property mix: the JSON props key `k` bucketed by decade ×
  //      event type, with counts, distinct users, and exact-cents value
  //      sums — the instrumentation-payload audit. JSON extraction stays
  //      inside the scan projection; one hash agg to a ~50-cell domain ----
  def qPropsKeyMix(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), col("user_id"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10")
          .as("k_decade"),
        floor(col("value") * 100).cast("long").as("value_c"))
      .groupBy(col("event_type"), col("k_decade"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(col("value_c")).cast("double") / lit(100.0)).as("value_sum"))

  val oPropsKeyMix: String =
    """SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decade,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)::DOUBLE
      |    / 100.0::DOUBLE AS value_sum
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---- language × source matrix: document counts and exact char mass per
  //      (declared lang, source) cell, with each cell's share of its
  //      language in basis points — the corpus-mix dashboard. One scan,
  //      one hash agg; the ≤|langs| totals side broadcasts ----
  def qLangSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val langTotals = cells.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("lang_docs"))
    cells.join(broadcast(langTotals), Seq("lang"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_chars"),
        expr("n_docs * 10000L DIV lang_docs").as("share_bp"))
  }

  val oLangSourceMatrix: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY 1, 2),
      |lt AS (
      |  SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_docs
      |  FROM cells GROUP BY 1)
      |SELECT cells.lang, cells.source, cells.n_docs, cells.n_chars,
      |  CAST(cells.n_docs * 10000 // lt.lang_docs AS BIGINT) AS share_bp
      |FROM cells JOIN lt USING (lang)""".stripMargin

  // ---- customer tenure histogram: lifespan between a customer's first
  //      and last order, bucketed to 4-week blocks — the account-age mix
  //      behind retention targets. Per-customer min/max (one partial-agg
  //      reduction, no window), then a hash agg onto the bucket domain ----
  def qCustomerTenureHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("d"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (max(col("d")) - min(col("d"))).as("span_d"))
      .select(expr("span_d DIV 28").as("tenure_4wk"), col("n_orders"))
      .groupBy(col("tenure_4wk"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        (sum(col("n_orders")).cast("double") /
          count(lit(1)).cast("double")).as("mean_orders"))

  val oCustomerTenureHist: String =
    """WITH per AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(max(epoch(o_orderdate)) // 86400
      |      - min(epoch(o_orderdate)) // 86400 AS BIGINT) AS span_d
      |  FROM orders GROUP BY 1)
      |SELECT span_d // 28 AS tenure_4wk,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
      |  CAST(sum(n_orders) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_orders
      |FROM per GROUP BY 1""".stripMargin

  // ---- balance-sign mix by nation and role: negative/zero/positive
  //      account-balance composition for customers vs suppliers in one
  //      matrix — the credit-exposure audit. Union-all of the two scans
  //      (schema aligned in the projection), exact-cents sums, broadcast
  //      nation-name dim ----
  def qAcctbalSignMix(s: SparkSession, dir: String): DataFrame = {
    def side(tbl: String, key: String, bal: String, role: String) =
      t(s, dir, tbl).select(
        col(key).as("nationkey"), lit(role).as("role"),
        floor(col(bal) * 100).cast("long").as("bal_c"))
    val u = side("customer", "c_nationkey", "c_acctbal", "customer")
      .unionAll(side("supplier", "s_nationkey", "s_acctbal", "supplier"))
    u.groupBy(col("nationkey"), col("role"))
      .agg(count(lit(1)).as("n_accounts"),
        sum(when(col("bal_c") < 0, 1L).otherwise(0L)).as("n_negative"),
        sum(col("bal_c")).as("bal_sum_c"),
        min(col("bal_c")).as("min_bal_c"),
        max(col("bal_c")).as("max_bal_c"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("role"), col("n_accounts"), col("n_negative"),
        (col("bal_sum_c").cast("double") / lit(100.0)).as("bal_sum"),
        col("min_bal_c"), col("max_bal_c"))
  }

  val oAcctbalSignMix: String =
    """WITH u AS (
      |  SELECT c_nationkey AS nationkey, 'customer' AS role,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer
      |  UNION ALL
      |  SELECT s_nationkey, 'supplier',
      |    CAST(floor(s_acctbal * 100) AS BIGINT) FROM supplier),
      |per AS (
      |  SELECT nationkey, role, CAST(count(*) AS BIGINT) AS n_accounts,
      |    CAST(sum(CASE WHEN bal_c < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_negative,
      |    CAST(sum(bal_c) AS BIGINT) AS bal_sum_c,
      |    CAST(min(bal_c) AS BIGINT) AS min_bal_c,
      |    CAST(max(bal_c) AS BIGINT) AS max_bal_c
      |  FROM u GROUP BY 1, 2)
      |SELECT n.n_name, per.role, per.n_accounts, per.n_negative,
      |  per.bal_sum_c::DOUBLE / 100.0::DOUBLE AS bal_sum,
      |  per.min_bal_c, per.max_bal_c
      |FROM per JOIN nation n ON per.nationkey = n.n_nationkey""".stripMargin

  // ---- order-priority drift: the priority mix per order year, each cell's
  //      share of its year in basis points — is URGENT usage growing? One
  //      scan, one hash agg; the ≤|years| totals side broadcasts ----
  def qPriorityDrift(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .select(year(col("o_orderdate").cast("date")).cast("long").as("yr"),
        col("o_orderpriority"))
      .groupBy(col("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    val yearTotals = cells.groupBy(col("yr"))
      .agg(sum(col("n_orders")).as("yr_orders"))
    cells.join(broadcast(yearTotals), Seq("yr"))
      .select(col("yr"), col("o_orderpriority"), col("n_orders"),
        expr("n_orders * 10000L DIV yr_orders").as("share_bp"))
  }

  val oPriorityDrift: String =
    """WITH cells AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1, 2),
      |yt AS (SELECT yr, CAST(sum(n_orders) AS BIGINT) AS yr_orders
      |       FROM cells GROUP BY 1)
      |SELECT cells.yr, cells.o_orderpriority, cells.n_orders,
      |  CAST(cells.n_orders * 10000 // yt.yr_orders AS BIGINT) AS share_bp
      |FROM cells JOIN yt USING (yr)""".stripMargin

  // ---- part-name vocabulary: token frequency across part names with
  //      brand spread and exact-cents mean retail price per token — the
  //      catalog-taxonomy profile. Explode on a dimension table (tiny
  //      relative to facts), one hash agg ----
  def qPartNameVocab(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_brand"),
        floor(col("p_retailprice") * 100).cast("long").as("price_c"),
        explode(split(col("p_name"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("p_brand")).as("n_brands"),
        (sum(col("price_c")).cast("double") /
          (count(lit(1)) * lit(100)).cast("double")).as("mean_price"))

  val oPartNameVocab: String =
    """WITH tok AS (
      |  SELECT p_brand, CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c,
      |    unnest(string_split(p_name, ' ')) AS token
      |  FROM part)
      |SELECT token, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE /
      |    CAST(count(*) * 100 AS BIGINT)::DOUBLE AS mean_price
      |FROM tok GROUP BY 1""".stripMargin

  // ---- first-vs-last order delta: did a customer's order value grow or
  //      decline between their first and last order? Deterministic
  //      first/last via min_by/max_by over a zero-padded "date|orderkey"
  //      string key (DuckDB's arg_min needs a scalar ordering key, so both
  //      engines sort the identical padded string — ties break on
  //      orderkey). One partial-aggregable reduction per customer, then a
  //      3-row direction rollup; no window, no join ----
  def qFirstLastDelta(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"),
        format_string("%010d|%012d",
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
            "AS BIGINT)"),
          col("o_orderkey")).as("k"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        min_by(col("price_c"), col("k")).as("first_c"),
        max_by(col("price_c"), col("k")).as("last_c"))
      .filter(col("n_orders") >= 2)
    per.select(
        when(col("last_c") > col("first_c"), lit("grew"))
          .when(col("last_c") < col("first_c"), lit("declined"))
          .otherwise(lit("flat")).as("direction"),
        (col("last_c") - col("first_c")).as("delta_c"))
      .groupBy(col("direction"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("delta_c")).as("delta_sum_c"),
        (sum(col("delta_c")).cast("double") /
          (count(lit(1)) * lit(100)).cast("double")).as("mean_delta"))
  }

  val oFirstLastDelta: String =
    """WITH per AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |    arg_min(CAST(floor(o_totalprice * 100) AS BIGINT),
      |      printf('%010d|%012d', epoch_us(o_orderdate) // 86400000000,
      |        o_orderkey)) AS first_c,
      |    arg_max(CAST(floor(o_totalprice * 100) AS BIGINT),
      |      printf('%010d|%012d', epoch_us(o_orderdate) // 86400000000,
      |        o_orderkey)) AS last_c
      |  FROM orders GROUP BY 1 HAVING count(*) >= 2)
      |SELECT CASE WHEN last_c > first_c THEN 'grew'
      |            WHEN last_c < first_c THEN 'declined'
      |            ELSE 'flat' END AS direction,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(last_c - first_c) AS BIGINT) AS delta_sum_c,
      |  CAST(sum(last_c - first_c) AS BIGINT)::DOUBLE /
      |    CAST(count(*) * 100 AS BIGINT)::DOUBLE AS mean_delta
      |FROM per GROUP BY 1""".stripMargin

  // ---- top supplier per nation: the highest-balance supplier (ties →
  //      lowest suppkey, encoded as an inverted zero-padded key so plain
  //      max_by is deterministic), alongside nation totals. One hash agg
  //      over supplier + a broadcast of the 25-row nation dim ----
  def qNationTopSupplier(s: SparkSession, dir: String): DataFrame = {
    val offset = 100000000L // acctbal cents are > -1e8; keeps the key non-negative
    val sup = t(s, dir, "supplier").select(
      col("s_nationkey").cast("long").as("nationkey"), col("s_name"),
      floor(col("s_acctbal") * 100).cast("long").as("bal_c"),
      col("s_suppkey"))
    val keyed = sup.select(col("nationkey"), col("s_name"), col("bal_c"),
      format_string("%020d|%012d", col("bal_c") + lit(offset),
        lit(999999999999L) - col("s_suppkey")).as("k"))
    keyed.groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        max_by(col("s_name"), col("k")).as("top_supplier"),
        max_by(col("bal_c"), col("k")).as("top_bal_c"),
        sum(col("bal_c")).as("bal_sum_c"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("nationkey"),
          col("n_name"))), Seq("nationkey"))
      .select(col("n_name"), col("n_suppliers"), col("top_supplier"),
        (col("top_bal_c").cast("double") / lit(100.0)).as("top_bal"),
        (col("bal_sum_c").cast("double") / lit(100.0)).as("bal_sum"))
  }

  val oNationTopSupplier: String =
    """WITH keyed AS (
      |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, s_name,
      |    CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_c,
      |    printf('%020d|%012d',
      |      CAST(floor(s_acctbal * 100) AS BIGINT) + 100000000,
      |      999999999999 - s_suppkey) AS k
      |  FROM supplier),
      |per AS (
      |  SELECT nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
      |    arg_max(s_name, k) AS top_supplier,
      |    arg_max(bal_c, k) AS top_bal_c,
      |    CAST(sum(bal_c) AS BIGINT) AS bal_sum_c
      |  FROM keyed GROUP BY 1)
      |SELECT n.n_name, per.n_suppliers, per.top_supplier,
      |  per.top_bal_c::DOUBLE / 100.0::DOUBLE AS top_bal,
      |  per.bal_sum_c::DOUBLE / 100.0::DOUBLE AS bal_sum
      |FROM per JOIN nation n ON per.nationkey = CAST(n.n_nationkey AS BIGINT)""".stripMargin

  // ---- daily peak hour: which hour of the day carries each day's
  //      traffic peak (ties → earliest hour via an inverted pad), rolled
  //      into a peak-hour histogram — the load-shape profile capacity
  //      planning reads. Two hash aggs over the bounded day×hour domain;
  //      no window ----
  def qDailyPeakHour(s: SparkSession, dir: String): DataFrame = {
    val hourly = events(s, dir)
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("((ts DIV 1000) DIV 3600000000) % 24").as("hour"))
      .groupBy(col("day"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
    hourly
      .select(col("day"), col("hour"), col("n_events"),
        format_string("%012d|%02d", col("n_events"),
          lit(23L) - col("hour")).as("k"))
      .groupBy(col("day"))
      .agg(max_by(col("hour"), col("k")).as("peak_hour"),
        max_by(col("n_events"), col("k")).as("peak_events"),
        sum(col("n_events")).as("day_events"))
      .groupBy(col("peak_hour"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("peak_events")).as("peak_events"),
        expr("CAST(sum(peak_events) * 10000L AS BIGINT) DIV sum(day_events)")
          .as("peak_share_bp"))
  }

  val oDailyPeakHour: String =
    """WITH hourly AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    (epoch_us(ts) // 3600000000) % 24 AS hour,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |daily AS (
      |  SELECT day,
      |    arg_max(hour, printf('%012d|%02d', n_events, 23 - hour))
      |      AS peak_hour,
      |    arg_max(n_events, printf('%012d|%02d', n_events, 23 - hour))
      |      AS peak_events,
      |    CAST(sum(n_events) AS BIGINT) AS day_events
      |  FROM hourly GROUP BY 1)
      |SELECT peak_hour, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(peak_events) AS BIGINT) AS peak_events,
      |  CAST(sum(peak_events) * 10000 // sum(day_events) AS BIGINT)
      |    AS peak_share_bp
      |FROM daily GROUP BY 1""".stripMargin

  // ---- order value concentration: how much of each order rides on its
  //      single largest line, banded by share decile — flags orders whose
  //      value is one big-ticket line vs evenly spread baskets. Per-order
  //      partial-agg reduction, then a ≤11-row band rollup ----
  def qOrderTopLineShare(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("p_c"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), max(col("p_c")).as("max_c"),
        sum(col("p_c")).as("sum_c"))
      .select(expr("(max_c * 10000L DIV sum_c) DIV 1000").as("share_band"),
        col("n_lines"))
      .groupBy(col("share_band"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("n_lines")).cast("double") /
          count(lit(1)).cast("double")).as("mean_lines"))

  val oOrderTopLineShare: String =
    """WITH per AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(max(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS max_c,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS sum_c
      |  FROM lineitem GROUP BY 1)
      |SELECT (max_c * 10000 // sum_c) // 1000 AS share_band,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(n_lines) AS BIGINT)::DOUBLE /
      |    CAST(count(*) AS BIGINT)::DOUBLE AS mean_lines
      |FROM per GROUP BY 1""".stripMargin

  // ---- cross-language vocabulary overlap: token-set Jaccard for every
  //      language pair — how much surface vocabulary two language slices
  //      share (loanwords, code, named entities). distinct (lang, token)
  //      set, token-keyed self equi-join (lang_a < lang_b), then the
  //      ≤|langs| vocab-size side broadcasts. The join fan-out per token
  //      is bounded by |langs|², never corpus-sized ----
  def qLangVocabJaccard(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val sizes = toks.groupBy(col("lang")).agg(count(lit(1)).as("vocab"))
    val common = toks.as("a")
      .join(toks.as("b"), col("a.token") === col("b.token") &&
        col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("lang").as("lang_a"),
        col("vocab").as("vocab_a"))), Seq("lang_a"))
      .join(broadcast(sizes.select(col("lang").as("lang_b"),
        col("vocab").as("vocab_b"))), Seq("lang_b"))
      .select(col("lang_a"), col("lang_b"), col("vocab_a"), col("vocab_b"),
        col("n_common"),
        expr("n_common * 10000L DIV (vocab_a + vocab_b - n_common)")
          .as("jaccard_bp"))
  }

  val oLangVocabJaccard: String =
    """WITH toks AS (
      |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tok2 AS (SELECT lang, token FROM toks WHERE token <> ''),
      |sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab
      |          FROM tok2 GROUP BY 1),
      |common AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b,
      |    CAST(count(*) AS BIGINT) AS n_common
      |  FROM tok2 a JOIN tok2 b
      |    ON a.token = b.token AND a.lang < b.lang
      |  GROUP BY 1, 2)
      |SELECT c.lang_a, c.lang_b, sa.vocab AS vocab_a, sb.vocab AS vocab_b,
      |  c.n_common,
      |  CAST(c.n_common * 10000 // (sa.vocab + sb.vocab - c.n_common)
      |    AS BIGINT) AS jaccard_bp
      |FROM common c
      |JOIN sizes sa ON c.lang_a = sa.lang
      |JOIN sizes sb ON c.lang_b = sb.lang""".stripMargin

  // ---- user lifetime-value bands: per-user total event value in cents,
  //      banded into $1000 buckets (non-positive totals pinned to band
  //      -1 so the floor-div/truncation divergence between engines on
  //      negatives never fires). One per-user reduction, one small band
  //      rollup ----
  def qUserValueBands(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("user_id"))
      .agg(sum(col("v_c")).as("total_c"))
      .select(
        when(col("total_c") <= 0, lit(-1L))
          .otherwise(expr("total_c DIV 100000")).as("band"),
        col("total_c"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"),
        (sum(col("total_c")).cast("double") / lit(100.0)).as("value_sum"),
        (sum(col("total_c")).cast("double") /
          (count(lit(1)) * lit(100)).cast("double")).as("mean_value"))

  val oUserValueBands: String =
    """WITH per AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_c
      |  FROM events GROUP BY 1),
      |banded AS (
      |  SELECT CASE WHEN total_c <= 0 THEN -1
      |              ELSE total_c // 100000 END AS band, total_c
      |  FROM per)
      |SELECT band, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(total_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS value_sum,
      |  CAST(sum(total_c) AS BIGINT)::DOUBLE /
      |    CAST(count(*) * 100 AS BIGINT)::DOUBLE AS mean_value
      |FROM banded GROUP BY 1""".stripMargin

  // ---- priority×weekday independence lift: is URGENT ordering a weekday
  //      phenomenon? Observed cell share vs the product of the marginals,
  //      in basis points. Weekday from pure epoch-day arithmetic
  //      ((days+4) % 7, 0=Sunday) so both engines agree without calendar
  //      functions. All divisions are staged BIGINT floor-divs — exact,
  //      overflow-free at any scale, and identical in both engines. One
  //      scan; marginals are ≤7- and ≤5-row broadcasts ----
  def qPriorityDowLift(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .select(expr("(CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE'1970-01-01') AS BIGINT) + 4) % 7").as("dow"),
        col("o_orderpriority"))
      .groupBy(col("dow"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_cell"))
    val dowTot = cells.groupBy(col("dow")).agg(sum(col("n_cell")).as("n_dow"))
    val prioTot = cells.groupBy(col("o_orderpriority"))
      .agg(sum(col("n_cell")).as("n_prio"))
    val total = cells.agg(sum(col("n_cell")).as("n_total"))
    cells
      .join(broadcast(dowTot), Seq("dow"))
      .join(broadcast(prioTot), Seq("o_orderpriority"))
      .crossJoin(broadcast(total))
      .select(col("dow"), col("o_orderpriority"), col("n_cell"),
        expr("n_cell * 10000L DIV n_dow").as("obs_share_bp"),
        expr("n_prio * 10000L DIV n_total").as("exp_share_bp"),
        expr("(n_cell * 10000L DIV n_dow) * 10000L DIV " +
          "(n_prio * 10000L DIV n_total)").as("lift_bp"))
  }

  val oPriorityDowLift: String =
    """WITH cells AS (
      |  SELECT (epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS dow,
      |    o_orderpriority, CAST(count(*) AS BIGINT) AS n_cell
      |  FROM orders GROUP BY 1, 2),
      |dt AS (SELECT dow, CAST(sum(n_cell) AS BIGINT) AS n_dow
      |       FROM cells GROUP BY 1),
      |pt AS (SELECT o_orderpriority, CAST(sum(n_cell) AS BIGINT) AS n_prio
      |       FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n_total FROM cells)
      |SELECT cells.dow, cells.o_orderpriority, cells.n_cell,
      |  CAST(cells.n_cell * 10000 // dt.n_dow AS BIGINT) AS obs_share_bp,
      |  CAST(pt.n_prio * 10000 // tot.n_total AS BIGINT) AS exp_share_bp,
      |  CAST((cells.n_cell * 10000 // dt.n_dow) * 10000 //
      |    (pt.n_prio * 10000 // tot.n_total) AS BIGINT) AS lift_bp
      |FROM cells JOIN dt USING (dow)
      |JOIN pt USING (o_orderpriority), tot""".stripMargin

  // ---- bipartite degree histograms: the part↔supplier sourcing graph
  //      from lineitem — how many suppliers serve a part, how many parts
  //      a supplier carries, both degree distributions union-all'd with a
  //      side tag. distinct pair set once, two degree reductions, two
  //      ≤degree-domain histograms — no windows, no joins ----
  def qBipartiteDegreeHist(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    def hist(key: String, side: String) = pairs
      .groupBy(col(key)).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(side).as("side"), col("degree"), col("n_nodes"))
    hist("l_partkey", "suppliers_per_part")
      .unionAll(hist("l_suppkey", "parts_per_supplier"))
  }

  val oBipartiteDegreeHist: String =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |pd AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS degree
      |       FROM pairs GROUP BY 1),
      |sd AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS degree
      |       FROM pairs GROUP BY 1)
      |SELECT 'suppliers_per_part' AS side, degree,
      |  CAST(count(*) AS BIGINT) AS n_nodes FROM pd GROUP BY 2
      |UNION ALL
      |SELECT 'parts_per_supplier' AS side, degree,
      |  CAST(count(*) AS BIGINT) AS n_nodes FROM sd GROUP BY 2""".stripMargin

  // ---- top-10 value concentration: what share of all event value the
  //      ten highest-value users carry. Per-user reduction, then a
  //      TakeOrdered(10) over (total desc, user_id asc — deterministic at
  //      ties) instead of a rank window: the executor-side top-k heap
  //      ships 10 rows per partition to the driver regardless of user
  //      count. One output row ----
  def qTop10UserShare(s: SparkSession, dir: String): DataFrame = {
    val per = events(s, dir)
      .select(col("user_id"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("user_id"))
      .agg(sum(col("v_c")).as("total_c"))
    val top = per.orderBy(col("total_c").desc, col("user_id").asc).limit(10)
      .agg(count(lit(1)).as("top_n"), sum(col("total_c")).as("top_c"))
    val all = per.agg(count(lit(1)).as("n_users"),
      sum(col("total_c")).as("all_c"))
    top.crossJoin(broadcast(all))
      .select(col("n_users"), col("top_n"),
        (col("top_c").cast("double") / lit(100.0)).as("top_value"),
        (col("all_c").cast("double") / lit(100.0)).as("total_value"),
        expr("top_c * 10000L DIV all_c").as("top_share_bp"))
  }

  val oTop10UserShare: String =
    """WITH per AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_c
      |  FROM events GROUP BY 1),
      |top AS (
      |  SELECT CAST(count(*) AS BIGINT) AS top_n,
      |    CAST(sum(total_c) AS BIGINT) AS top_c
      |  FROM (SELECT total_c FROM per
      |        ORDER BY total_c DESC, user_id ASC LIMIT 10)),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
      |        CAST(sum(total_c) AS BIGINT) AS all_c FROM per)
      |SELECT a.n_users, top.top_n,
      |  top.top_c::DOUBLE / 100.0::DOUBLE AS top_value,
      |  a.all_c::DOUBLE / 100.0::DOUBLE AS total_value,
      |  CAST(top.top_c * 10000 // a.all_c AS BIGINT) AS top_share_bp
      |FROM top, a""".stripMargin

  // ---- new-vs-returning revenue: each order classified by whether it is
  //      the customer's FIRST (deterministic min_by over the padded
  //      date|orderkey string), revenue split per order year. The
  //      first-order side is a per-customer reduction (customer-sized,
  //      not order-sized) equi-joined back on custkey ----
  def qNewVsReturning(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate").cast("date")).cast("long").as("yr"),
      floor(col("o_totalprice") * 100).cast("long").as("price_c"),
      format_string("%010d|%012d",
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)"),
        col("o_orderkey")).as("k"))
    val firsts = o.groupBy(col("o_custkey"))
      .agg(min_by(col("o_orderkey"), col("k")).as("first_orderkey"))
    o.join(firsts, Seq("o_custkey"))
      .select(col("yr"),
        when(col("o_orderkey") === col("first_orderkey"), lit("new"))
          .otherwise(lit("returning")).as("cohort"),
        col("price_c"))
      .groupBy(col("yr"), col("cohort"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("price_c")).cast("double") / lit(100.0)).as("revenue"))
  }

  val oNewVsReturning: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
      |    printf('%010d|%012d', epoch_us(o_orderdate) // 86400000000,
      |      o_orderkey) AS k
      |  FROM orders),
      |firsts AS (
      |  SELECT o_custkey, arg_min(o_orderkey, k) AS first_orderkey
      |  FROM o GROUP BY 1)
      |SELECT o.yr,
      |  CASE WHEN o.o_orderkey = f.first_orderkey THEN 'new'
      |       ELSE 'returning' END AS cohort,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(o.price_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM o JOIN firsts f USING (o_custkey)
      |GROUP BY 1, 2""".stripMargin

  // ---- Lorenz deciles: user-value concentration as a 10-row curve —
  //      per-user reduction (events → user dimension), then a decile
  //      assignment with a (total, user_id) total order so ties break
  //      identically in both engines, then cumulative share in exact
  //      basis points. The global ntile window runs over the USER
  //      dimension (already reduced from events), the one regime where
  //      a single-partition window is acceptable; the events-sized scan
  //      never sees a window ----
  def qLorenzDeciles(s: SparkSession, dir: String): DataFrame = {
    val per = events(s, dir)
      .select(col("user_id"),
        floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("user_id"))
      .agg(sum(col("v_c")).as("total_c"))
    val w = Window.orderBy(col("total_c"), col("user_id"))
    val dec = per.withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("total_c")).as("dec_c"))
    val tot = dec.agg(sum(col("dec_c")).as("all_c"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.withColumn("cum_c", sum(col("dec_c")).over(cum))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"),
        (col("dec_c").cast("double") / lit(100.0)).as("value_sum"),
        expr("dec_c * 10000L DIV all_c").as("share_bp"),
        expr("cum_c * 10000L DIV all_c").as("cum_share_bp"))
  }

  val oLorenzDeciles: String =
    """WITH per AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_c
      |  FROM events GROUP BY 1),
      |dec AS (
      |  SELECT CAST(ntile(10) OVER (ORDER BY total_c, user_id) AS BIGINT)
      |    AS decile, total_c
      |  FROM per),
      |agg AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(total_c) AS BIGINT) AS dec_c
      |  FROM dec GROUP BY 1),
      |tot AS (SELECT CAST(sum(dec_c) AS BIGINT) AS all_c FROM agg),
      |cum AS (
      |  SELECT decile, n_users, dec_c,
      |    CAST(sum(dec_c) OVER (ORDER BY decile) AS BIGINT) AS cum_c
      |  FROM agg)
      |SELECT decile, n_users,
      |  dec_c::DOUBLE / 100.0::DOUBLE AS value_sum,
      |  CAST(dec_c * 10000 // all_c AS BIGINT) AS share_bp,
      |  CAST(cum_c * 10000 // all_c AS BIGINT) AS cum_share_bp
      |FROM cum, tot""".stripMargin

  // ---- per-language length five-number summary (min/Q1/median/Q3/max)
  //      by EXACT rank selection, not approx percentiles: row_number
  //      inside each lang partition over (n_chars, doc_id), pick the row
  //      at rank 1 + (n-1)*k/4. Partitioned window — each language sorts
  //      independently, no global order. The quartile targets are a
  //      lang-dimension × 5 broadcast ----
  def qLangLenQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val r = t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w).cast("long"))
    val targets = r.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .select(col("lang").as("tlang"), col("n_docs"),
        explode(array((0 to 4).map(k => lit(k.toLong)): _*)).as("quartile"))
      .withColumn("target_rn",
        lit(1L) + expr("(n_docs - 1) * quartile DIV 4"))
    r.join(broadcast(targets),
        col("lang") === col("tlang") && col("rn") === col("target_rn"))
      .select(col("lang"), col("quartile"), col("n_docs"),
        col("n_chars").as("value"))
  }

  val oLangLenQuartiles: String =
    """WITH r AS (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS rn
      |  FROM documents),
      |cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      |        FROM r GROUP BY 1),
      |targets AS (
      |  SELECT lang, n_docs, q.quartile,
      |    1 + (n_docs - 1) * q.quartile // 4 AS target_rn
      |  FROM cnt, (SELECT unnest([0,1,2,3,4]) AS quartile) q)
      |SELECT r.lang, CAST(t.quartile AS BIGINT) AS quartile, t.n_docs,
      |  r.n_chars AS value
      |FROM r JOIN targets t ON r.lang = t.lang AND r.rn = t.target_rn"""
      .stripMargin

  // ---- orders-per-customer histogram INCLUDING the zero-order
  //      customers (the left join from the customer dimension is what
  //      q_repeat_rate's orders-only view can't see). Degree reduction
  //      on orders, left join from customer, ≤degree-domain rollup ----
  def qCustOrderHist(s: SparkSession, dir: String): DataFrame = {
    val deg = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("deg"))
    t(s, dir, "customer").select(col("c_custkey"))
      .join(deg, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val oCustOrderHist: String =
    """WITH deg AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS deg
      |  FROM orders GROUP BY 1)
      |SELECT coalesce(deg.deg, 0) AS n_orders,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer LEFT JOIN deg ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin

  // ---- brand revenue share within each supplier nation: lineitem
  //      equi-joined to the supplier→nation dim (broadcast) and to part
  //      on partkey, reduced to the nation×brand cell domain, shares in
  //      exact basis points against nation totals (a ≤nation-domain
  //      broadcast) ----
  def qBrandNationShare(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val cells = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_c")).as("rev_c"))
    val natTot = cells.groupBy(col("n_name")).agg(sum(col("rev_c")).as("nat_c"))
    cells.join(broadcast(natTot), Seq("n_name"))
      .select(col("n_name"), col("p_brand"), col("n_lines"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("rev_c * 10000L DIV nat_c").as("share_bp"))
  }

  val oBrandNationShare: String =
    """WITH cells AS (
      |  SELECT n.n_name, p.p_brand, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |nt AS (SELECT n_name, CAST(sum(rev_c) AS BIGINT) AS nat_c
      |       FROM cells GROUP BY 1)
      |SELECT c.n_name, c.p_brand, c.n_lines,
      |  c.rev_c::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(c.rev_c * 10000 // nt.nat_c AS BIGINT) AS share_bp
      |FROM cells c JOIN nt USING (n_name)""".stripMargin

  // ---- market-segment year-over-year revenue growth: orders joined to
  //      the customer dim, reduced to the segment×year cell domain, YoY
  //      via a cells-to-cells (yr = yr+1) equi-join on the TINY cell
  //      table (the q_wow_growth discipline — no window, no sort). The
  //      growth ratio is ONE double division of two exact cent-longs,
  //      bit-deterministic in both engines; first year emits NULL ----
  def qMktsegYoy(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "orders")
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("date")).cast("long").as("yr"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("yr"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_c"))
    val prev = cells.select(col("c_mktsegment"), (col("yr") + 1L).as("yr"),
      col("rev_c").as("prev_c"))
    cells.join(prev, Seq("c_mktsegment", "yr"), "left")
      .select(col("c_mktsegment"), col("yr"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        ((col("rev_c") - col("prev_c")).cast("double") /
          col("prev_c").cast("double")).as("yoy"))
  }

  val oMktsegYoy: String =
    """WITH cells AS (
      |  SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT c.c_mktsegment, c.yr, c.n_orders,
      |  c.rev_c::DOUBLE / 100.0::DOUBLE AS revenue,
      |  (c.rev_c - p.rev_c)::DOUBLE / p.rev_c::DOUBLE AS yoy
      |FROM cells c LEFT JOIN cells p
      |  ON c.c_mktsegment = p.c_mktsegment AND c.yr = p.yr + 1"""
      .stripMargin

  // ---- supplier quadrant census: every supplier classified against the
  //      EXACT median account balance and median line volume (lower
  //      median by rank selection over (value, suppkey) — deterministic
  //      at ties), 2×2 rollup. The rank windows run over the SUPPLIER
  //      dimension (lineitem is pre-reduced to per-supplier counts);
  //      medians travel as a 1-row broadcast ----
  def qSupplierQuadrants(s: SparkSession, dir: String): DataFrame = {
    val vol = t(s, dir, "lineitem").groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("v"))
    val base = t(s, dir, "supplier")
      .select(col("s_suppkey"), floor(col("s_acctbal") * 100).cast("long")
        .as("bal_c"))
      .join(vol, col("s_suppkey") === col("l_suppkey"), "left")
      .select(col("s_suppkey"), col("bal_c"),
        coalesce(col("v"), lit(0L)).as("vol"))
    val wb = Window.orderBy(col("bal_c"), col("s_suppkey"))
    val wv = Window.orderBy(col("vol"), col("s_suppkey"))
    val ranked = base
      .withColumn("rb", row_number().over(wb).cast("long"))
      .withColumn("rv", row_number().over(wv).cast("long"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
    val meds = ranked
      .agg(max(when(col("rb") === expr("(n + 1) DIV 2"), col("bal_c")))
          .as("med_bal"),
        max(when(col("rv") === expr("(n + 1) DIV 2"), col("vol")))
          .as("med_vol"))
    ranked.crossJoin(broadcast(meds))
      .select(
        when(col("bal_c") > col("med_bal"), lit("high")).otherwise(lit("low"))
          .as("bal_side"),
        when(col("vol") > col("med_vol"), lit("high")).otherwise(lit("low"))
          .as("vol_side"),
        col("vol"))
      .groupBy(col("bal_side"), col("vol_side"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("vol")).as("total_vol"))
  }

  val oSupplierQuadrants: String =
    """WITH vol AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |base AS (
      |  SELECT s_suppkey, CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_c,
      |    coalesce(v, 0) AS vol
      |  FROM supplier LEFT JOIN vol ON s_suppkey = l_suppkey),
      |ranked AS (
      |  SELECT *,
      |    CAST(row_number() OVER (ORDER BY bal_c, s_suppkey) AS BIGINT) AS rb,
      |    CAST(row_number() OVER (ORDER BY vol, s_suppkey) AS BIGINT) AS rv,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM base),
      |meds AS (
      |  SELECT max(CASE WHEN rb = (n + 1) // 2 THEN bal_c END) AS med_bal,
      |    max(CASE WHEN rv = (n + 1) // 2 THEN vol END) AS med_vol
      |  FROM ranked)
      |SELECT CASE WHEN bal_c > med_bal THEN 'high' ELSE 'low' END AS bal_side,
      |  CASE WHEN vol > med_vol THEN 'high' ELSE 'low' END AS vol_side,
      |  CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(vol) AS BIGINT) AS total_vol
      |FROM ranked, meds GROUP BY 1, 2""".stripMargin

  // ---- Zipf head profile: the 50 most frequent tokens with their rank
  //      and the rank×frequency product (constant under an ideal Zipf
  //      law). Token counts are one hash agg; the top-50 is a
  //      TakeOrdered over (count desc, token asc) — 50 rows per
  //      partition to the driver, never a full vocabulary sort ----
  def qZipfTopk(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val top = cnt.orderBy(col("n").desc, col("tok").asc).limit(50)
    val w = Window.orderBy(col("n").desc, col("tok").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("tok"), col("n"),
        expr("rank * n").as("zipf_k"))
  }

  val oZipfTopk: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |cnt AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS n
      |  FROM toks WHERE tok <> '' GROUP BY 1),
      |top AS (
      |  SELECT tok, n,
      |    CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS BIGINT)
      |      AS rank
      |  FROM cnt ORDER BY n DESC, tok ASC LIMIT 50)
      |SELECT rank, tok, n, rank * n AS zipf_k FROM top""".stripMargin

  // ---- token positional bias: do the 20 most frequent tokens lead or
  //      trail their documents? Mean relative position in exact basis
  //      points (per-occurrence floor-div against the doc's token span,
  //      then an integer mean — no doubles anywhere). Positions come
  //      from ONE posexplode pass; the top-20 set is a broadcast ----
  def qTokenPosition(s: SparkSession, dir: String): DataFrame = {
    val pos = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(size(col("arr")).cast("long").as("len"),
        posexplode(col("arr")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "" && col("len") > 1)
    val top = pos.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(20)
      .select(col("tok").as("ttok"))
    pos.join(broadcast(top), col("tok") === col("ttok"))
      .select(col("tok"),
        expr("CAST(pos AS BIGINT) * 10000L DIV (len - 1)").as("p_bp"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occ"), sum(col("p_bp")).as("sum_bp"))
      .select(col("tok"), col("n_occ"),
        expr("sum_bp DIV n_occ").as("mean_pos_bp"))
  }

  val oTokenPosition: String =
    """WITH raw AS (
      |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
      |pos AS (
      |  SELECT CAST(len(arr) AS BIGINT) AS l,
      |    unnest(range(0, len(arr))) AS pos, unnest(arr) AS tok
      |  FROM raw),
      |p2 AS (SELECT tok, pos, l FROM pos WHERE tok <> '' AND l > 1),
      |top AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS n FROM p2 GROUP BY 1)
      |  ORDER BY n DESC, tok ASC LIMIT 20),
      |sc AS (
      |  SELECT p2.tok, CAST(pos * 10000 // (l - 1) AS BIGINT) AS p_bp
      |  FROM p2 SEMI JOIN top ON p2.tok = top.tok)
      |SELECT tok, CAST(count(*) AS BIGINT) AS n_occ,
      |  CAST(sum(p_bp) // count(*) AS BIGINT) AS mean_pos_bp
      |FROM sc GROUP BY 1""".stripMargin

  // ---- daily revenue drawdown: running peak and gap-to-peak per day in
  //      exact cents. The raw scan reduces to the bounded DAY domain
  //      first; the running-max window then runs over a few-thousand-row
  //      series regardless of input scale (the same bounded-domain
  //      discipline as q_wow_growth). Day keys are unique, so ROWS and
  //      RANGE frames agree across engines ----
  def qDrawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE'1970-01-01') AS BIGINT)").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("day")).agg(sum(col("price_c")).as("rev_c"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("run_max_c", max(col("rev_c")).over(w))
      .select(col("day"), col("rev_c"), col("run_max_c"),
        (col("run_max_c") - col("rev_c")).as("drawdown_c"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"))
  }

  val oDrawdown: String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1)
      |SELECT day, rev_c,
      |  CAST(max(rev_c) OVER (ORDER BY day) AS BIGINT) AS run_max_c,
      |  CAST(max(rev_c) OVER (ORDER BY day) - rev_c AS BIGINT)
      |    AS drawdown_c,
      |  rev_c::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM daily""".stripMargin

  // ---- order shipping-span histogram: days between the first and last
  //      shipped line of each order (per-order min/max reduction — no
  //      window), rolled up to the bounded span domain ----
  def qShipSpanHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"))
      .groupBy(col("l_orderkey"))
      .agg((max(col("day")) - min(col("day"))).as("span_days"))
      .groupBy(col("span_days"))
      .agg(count(lit(1)).as("n_orders"))

  val oShipSpanHist: String =
    """WITH per AS (
      |  SELECT l_orderkey,
      |    max(epoch_us(l_shipdate) // 86400000000) -
      |    min(epoch_us(l_shipdate) // 86400000000) AS span_days
      |  FROM lineitem GROUP BY 1)
      |SELECT span_days, CAST(count(*) AS BIGINT) AS n_orders
      |FROM per GROUP BY 1""".stripMargin

  // ---- price-weighted median quantity: the quantity value at which
  //      half the revenue mass sits below. Reduction to the bounded
  //      quantity domain, one ≤domain-row cumulative window, first
  //      crossing of 2·cum ≥ total — all exact cents, no sort of the
  //      fact table ----
  def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "lineitem")
      .select(floor(col("l_quantity")).cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("w_c"))
      .groupBy(col("qty")).agg(sum(col("w_c")).as("w_c"))
    val w = Window.orderBy(col("qty"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum_c", sum(col("w_c")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("w_c")).as("total_c"))))
      .filter(col("cum_c") * 2 >= col("total_c"))
      .agg(min(col("qty")).as("weighted_median_qty"),
        min_by(col("cum_c"), col("qty")).as("cum_at_median_c"),
        max(col("total_c")).as("total_c"))
  }

  val oWeightedMedian: String =
    """WITH hist AS (
      |  SELECT CAST(floor(l_quantity) AS BIGINT) AS qty,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS w_c
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT qty, w_c,
      |    CAST(sum(w_c) OVER (ORDER BY qty) AS BIGINT) AS cum_c,
      |    CAST(sum(w_c) OVER () AS BIGINT) AS total_c
      |  FROM hist)
      |SELECT min(qty) AS weighted_median_qty,
      |  arg_min(cum_c, qty) AS cum_at_median_c,
      |  max(total_c) AS total_c
      |FROM cum WHERE cum_c * 2 >= total_c""".stripMargin

  // ---- exact-duplicate embedding census: vectors quantized to 1e-6
  //      longs (float→double cast is exact; one IEEE multiply + floor is
  //      bit-identical in both engines) and grouped BY THE ARRAY ITSELF
  //      — a hash agg on the quantized key, the same plan exact text
  //      dedup uses, reported as a cluster-size histogram ----
  def qEmbedExactDup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(expr("transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D) AS BIGINT))").as("qv"))
      .groupBy(col("qv")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_vectors"))

  val oEmbedExactDup: String =
    """WITH q AS (
      |  SELECT list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0::DOUBLE) AS BIGINT))
      |    AS qv
      |  FROM embeddings),
      |cl AS (SELECT qv, CAST(count(*) AS BIGINT) AS cluster_size
      |       FROM q GROUP BY 1)
      |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(sum(cluster_size) AS BIGINT) AS n_vectors
      |FROM cl GROUP BY 1""".stripMargin

  // ---- event-type affinity: which behaviors co-occur within a user —
  //      distinct (user, type) pairs self-joined on user_id with a
  //      type_a < type_b total order (the candidate join is user-keyed,
  //      its fan-out bounded by the squared TYPE domain, not users²);
  //      support and lift in exact basis points ----
  def qEventTypeAffinity(s: SparkSession, dir: String): DataFrame = {
    val ut = events(s, dir).select(col("user_id"), col("event_type"))
      .distinct()
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id").as("uid_b"), col("event_type").as("type_b"))
    val pairs = a.join(b,
        col("user_id") === col("uid_b") && col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
    val tot = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    pairs
      .join(broadcast(tot.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), Seq("type_a"))
      .join(broadcast(tot.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"),
        expr("n_both * 10000L DIV n_users").as("support_bp"),
        // lift numerator scales as users² (n_both·n_users·10⁴): staged
        // through DECIMAL(38,0) like qDocCooccur — a raw 64-bit product
        // silently wraps under Spark's non-ANSI arithmetic while DuckDB's
        // BIGINT raises, so overflow would split engine/oracle behavior
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * " +
          "CAST(n_users AS DECIMAL(38,0)) * 10000 DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("lift_bp"))
  }

  val oEventTypeAffinity: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
      |        FROM ut GROUP BY 1),
      |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |      FROM ut)
      |SELECT p.type_a, p.type_b, p.n_both, ta.n_t AS n_a, tb.n_t AS n_b,
      |  CAST(p.n_both * 10000 // u.n_users AS BIGINT) AS support_bp,
      |  CAST(p.n_both::HUGEINT * u.n_users::HUGEINT * 10000 //
      |    (ta.n_t::HUGEINT * tb.n_t::HUGEINT) AS BIGINT) AS lift_bp
      |FROM pairs p
      |JOIN tot ta ON p.type_a = ta.event_type
      |JOIN tot tb ON p.type_b = tb.event_type, u""".stripMargin

  // ---- part cold-start curve: month each part FIRST ships (per-part
  //      min reduction), new-part count per month, cumulative catalog
  //      size over the bounded month domain ----
  def qPartColdStart(s: SparkSession, dir: String): DataFrame = {
    val firstMonth = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("(CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) - 1970) * 12" +
          " + CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) - 1")
          .as("m"))
      .groupBy(col("l_partkey")).agg(min(col("m")).as("m0"))
    val monthly = firstMonth.groupBy(col("m0"))
      .agg(count(lit(1)).as("n_new_parts"))
    val w = Window.orderBy(col("m0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.withColumn("cum_parts", sum(col("n_new_parts")).over(w))
      .select(col("m0").as("month_num"), col("n_new_parts"), col("cum_parts"))
  }

  val oPartColdStart: String =
    """WITH fm AS (
      |  SELECT l_partkey,
      |    min((CAST(year(l_shipdate) AS BIGINT) - 1970) * 12 +
      |        CAST(month(l_shipdate) AS BIGINT) - 1) AS m0
      |  FROM lineitem GROUP BY 1),
      |monthly AS (
      |  SELECT m0, CAST(count(*) AS BIGINT) AS n_new_parts
      |  FROM fm GROUP BY 1)
      |SELECT m0 AS month_num, n_new_parts,
      |  CAST(sum(n_new_parts) OVER (ORDER BY m0) AS BIGINT) AS cum_parts
      |FROM monthly""".stripMargin

  // ---- penny-drift audit: does rounding tax per line reconcile with
  //      rounding the gross? floor(gross)−floor(net)−floor(tax) per line
  //      (identical IEEE expression both engines — the doubles never
  //      differ), drift mass rolled up per returnflag ----
  def qPennyDrift(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        (expr("CAST(floor(l_extendedprice * (1.0D + l_tax) * 100.0D) " +
          "AS BIGINT)") -
          expr("CAST(floor(l_extendedprice * 100.0D) AS BIGINT)") -
          expr("CAST(floor(l_extendedprice * l_tax * 100.0D) AS BIGINT)"))
          .as("drift_c"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("drift_c")).as("total_drift_c"),
        sum(when(col("drift_c") =!= 0L, 1L).otherwise(0L))
          .as("n_drifting"))

  val oPennyDrift: String =
    """WITH d AS (
      |  SELECT l_returnflag,
      |    CAST(floor(l_extendedprice * (1.0::DOUBLE + l_tax) * 100.0::DOUBLE)
      |      AS BIGINT) -
      |    CAST(floor(l_extendedprice * 100.0::DOUBLE) AS BIGINT) -
      |    CAST(floor(l_extendedprice * l_tax * 100.0::DOUBLE) AS BIGINT)
      |      AS drift_c
      |  FROM lineitem)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(drift_c) AS BIGINT) AS total_drift_c,
      |  CAST(sum(CASE WHEN drift_c <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_drifting
      |FROM d GROUP BY 1""".stripMargin

  // ---- unit-price dispersion: the 20 parts whose realized per-unit
  //      price varies most (relative spread in basis points over the
  //      per-part min/max reduction — no window), TakeOrdered on
  //      (spread desc, partkey) ----
  def qPriceDispersion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(l_extendedprice * 100.0D / l_quantity) AS BIGINT)")
          .as("unit_c"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"), min(col("unit_c")).as("min_unit_c"),
        max(col("unit_c")).as("max_unit_c"))
      .filter(col("n_lines") >= 2L)
      .select(col("l_partkey"), col("n_lines"), col("min_unit_c"),
        col("max_unit_c"),
        expr("(max_unit_c - min_unit_c) * 10000L DIV min_unit_c")
          .as("spread_bp"))
      .orderBy(col("spread_bp").desc, col("l_partkey").asc)
      .limit(20)

  val oPriceDispersion: String =
    """WITH per AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    min(CAST(floor(l_extendedprice * 100.0::DOUBLE / l_quantity)
      |      AS BIGINT)) AS min_unit_c,
      |    max(CAST(floor(l_extendedprice * 100.0::DOUBLE / l_quantity)
      |      AS BIGINT)) AS max_unit_c
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey, n_lines, min_unit_c, max_unit_c,
      |  CAST((max_unit_c - min_unit_c) * 10000 // min_unit_c AS BIGINT)
      |    AS spread_bp
      |FROM per WHERE n_lines >= 2
      |ORDER BY spread_bp DESC, l_partkey ASC LIMIT 20""".stripMargin

  // ---- per-language top-5 tokens: token counts reduced to the
  //      (lang, token) domain first, then a rank window PARTITIONED by
  //      lang over that already-aggregated domain (vocabulary-sized, not
  //      corpus-sized), (count desc, token asc) deterministic at ties ----
  def qLangTopTokens(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("tok").asc)
    cnt.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5L)
      .select(col("lang"), col("rank"), col("tok"), col("n"))
  }

  val oLangTopTokens: String =
    """WITH cnt AS (
      |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, tok, n,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY n DESC, tok ASC) AS BIGINT) AS rank
      |  FROM cnt)
      |SELECT lang, rank, tok, n FROM r WHERE rank <= 5""".stripMargin

  // ---- daily event-mix stability: L1 distance (in basis points)
  //      between each day's event-type share vector and the previous
  //      day's. Counts reduce to the day×type cell domain; the dense
  //      grid comes from day × (≤type-domain broadcast) so silent type
  //      dropouts count as share 0, and "previous" is a cells-to-cells
  //      (day = day+1) equi-join — no windows ----
  def qMixStability(s: SparkSession, dir: String): DataFrame = {
    val cells = events(s, dir)
      .select(expr("ts DIV 86400000000000").as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("n"))
    val dayTot = cells.groupBy(col("day")).agg(sum(col("n")).as("tot"))
    val types = cells.select(col("event_type")).distinct()
    val grid = dayTot.crossJoin(broadcast(types))
      .join(cells, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        expr("coalesce(n, 0L) * 10000L DIV tot").as("share_bp"))
    val prev = grid.select((col("day") + 1L).as("day"), col("event_type"),
      col("share_bp").as("prev_bp"))
    grid.join(prev, Seq("day", "event_type"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_types"),
        sum(abs(col("share_bp") - col("prev_bp"))).as("l1_bp"))
  }

  val oMixStability: String =
    """WITH cells AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |dt AS (SELECT day, CAST(sum(n) AS BIGINT) AS tot
      |       FROM cells GROUP BY 1),
      |ty AS (SELECT DISTINCT event_type FROM cells),
      |grid AS (
      |  SELECT dt.day, ty.event_type,
      |    CAST(coalesce(c.n, 0) * 10000 // dt.tot AS BIGINT) AS share_bp
      |  FROM dt CROSS JOIN ty
      |  LEFT JOIN cells c ON c.day = dt.day AND c.event_type = ty.event_type)
      |SELECT g.day, CAST(count(*) AS BIGINT) AS n_types,
      |  CAST(sum(abs(g.share_bp - p.share_bp)) AS BIGINT) AS l1_bp
      |FROM grid g JOIN grid p
      |  ON g.day = p.day + 1 AND g.event_type = p.event_type
      |GROUP BY 1""".stripMargin

  // ---- brand loyalty: how many distinct part brands each customer
  //      buys (lineitem→orders on orderkey, →part on partkey — two fact
  //      equi-joins, then a per-customer distinct reduction), reported
  //      as a brand-count histogram ----
  def qBrandLoyalty(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("p_brand")).as("n_brands"))
      .groupBy(col("n_brands"))
      .agg(count(lit(1)).as("n_customers"))

  val oBrandLoyalty: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |SELECT n_brands, CAST(count(*) AS BIGINT) AS n_customers
      |FROM per GROUP BY 1""".stripMargin

  // ---- label cohesion: mean squared distance of each embedding to its
  //      label centroid, all in exact integer math — components quantize
  //      to 1e-6 longs SHIFTED to non-negative (+1e7, valid for |x| ≤ 10)
  //      so every floor-div sees non-negative operands (both engines
  //      truncate toward zero — verified — but non-negative operands
  //      make the invariant self-evident). One
  //      posexplode pass, centroid as a (label×dim)-domain broadcast ----
  def qLabelCohesion(s: SparkSession, dir: String): DataFrame = {
    val qv = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D) AS BIGINT) " +
          "+ 10000000L)")).as(Seq("dim", "q")))
    val cent = qv.groupBy(col("label"), col("dim"))
      .agg(expr("sum(q) DIV count(1)").as("c"))
    qv.join(broadcast(cent), Seq("label", "dim"))
      .select(col("vec_id"), col("label"),
        ((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("d2")).as("sqdist"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        expr("sum(sqdist) DIV count(1)").as("mean_sqdist"))
  }

  val oLabelCohesion: String =
    """WITH qv AS (
      |  SELECT vec_id, label,
      |    unnest(range(0, len(embedding))) AS dim,
      |    unnest(list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 1000000.0::DOUBLE) AS BIGINT)
      |      + 10000000)) AS q
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, dim,
      |    CAST(sum(q) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
      |  FROM qv GROUP BY 1, 2),
      |per AS (
      |  SELECT qv.vec_id, qv.label,
      |    CAST(sum((qv.q - cent.c) * (qv.q - cent.c)) AS BIGINT) AS sqdist
      |  FROM qv JOIN cent ON qv.label = cent.label AND qv.dim = cent.dim
      |  GROUP BY 1, 2)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
      |  CAST(sum(sqdist) AS BIGINT) // CAST(count(*) AS BIGINT)
      |    AS mean_sqdist
      |FROM per GROUP BY 1""".stripMargin

  // ---- per-user behavioral concentration (Simpson index) histogram:
  //      Σnᵢ²·10000 / n² per user in exact basis points (10000 = all
  //      events one type), banded by hundredths. Two nested reductions,
  //      no windows, no joins ----
  def qUserSimpsonHist(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_i"))
      .groupBy(col("user_id"))
      // Σnᵢ² and the n² denominator square unbounded per-user counts →
      // DECIMAL(38,0) staging (q_monthly_hhi class); DIV stays exact
      // integral division over decimals (the q_monthly_hhi pattern)
      .agg(sum(col("n_i")).as("n"),
        sum(col("n_i").cast("decimal(38,0)") * col("n_i")).as("ssum"))
      .select(expr("CAST((ssum * 10000 DIV (CAST(n AS DECIMAL(38,0)) * n))" +
          " DIV 100 AS BIGINT)").as("band"),
        col("n"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))

  val oUserSimpsonHist: String =
    """WITH per AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_i
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, CAST(sum(n_i) AS BIGINT) AS n,
      |    sum(n_i::HUGEINT * n_i) AS ssum
      |  FROM per GROUP BY 1)
      |SELECT CAST((ssum * 10000 // (n::HUGEINT * n)) // 100 AS BIGINT)
      |    AS band,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(n) AS BIGINT) AS n_events
      |FROM u GROUP BY 1""".stripMargin

  // ---- EXACT 7-day rolling active users (the precise counterpart of
  //      the HLL sliding sketch): each (user, day) pair fans out to the
  //      ≤7 windows it belongs to — a BOUNDED 7× row expansion plus one
  //      distinct count per day, never a range join or a window over the
  //      event stream. Phantom days past the series end are trimmed by
  //      the day-domain semi join ----
  def qRollingActive7d(s: SparkSession, dir: String): DataFrame = {
    val ud = events(s, dir)
      .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
      .distinct()
    val expanded = ud.select(col("user_id"),
      explode(expr("sequence(day, day + 6L)")).as("target_day"))
    val days = ud.select(col("day").as("target_day")).distinct()
    expanded.join(days, Seq("target_day"), "left_semi")
      .groupBy(col("target_day").as("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
  }

  val oRollingActive7d: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |exp AS (
      |  SELECT user_id, unnest(range(day, day + 7)) AS target_day
      |  FROM ud),
      |days AS (SELECT DISTINCT day FROM ud)
      |SELECT target_day AS day,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
      |FROM exp SEMI JOIN days ON exp.target_day = days.day
      |GROUP BY 1""".stripMargin

  // ---- cross-table referential integrity audit: orphan lineitems,
  //      childless orders, orderless customers, and orders pointing at
  //      missing customers — four hash anti-joins, each reduced to one
  //      violation count, unioned into a rule scorecard ----
  def qRefIntegrity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey"))
    def cnt(df: DataFrame, rule: String) =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(rule).as("rule"), col("n_violations"))
    cnt(li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti"),
        "lines_without_order")
      .unionByName(cnt(
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti"),
        "orders_without_lines"))
      .unionByName(cnt(
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti"),
        "customers_without_orders"))
      .unionByName(cnt(
        o.join(c, col("o_custkey") === col("c_custkey"), "left_anti"),
        "orders_without_customer"))
  }

  val oRefIntegrity: String =
    """SELECT 'lines_without_order' AS rule, CAST(count(*) AS BIGINT)
      |  AS n_violations
      |FROM lineitem WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL
      |SELECT 'orders_without_lines', CAST(count(*) AS BIGINT)
      |FROM orders WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |UNION ALL
      |SELECT 'customers_without_orders', CAST(count(*) AS BIGINT)
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'orders_without_customer', CAST(count(*) AS BIGINT)
      |FROM orders WHERE NOT EXISTS (
      |  SELECT 1 FROM customer WHERE c_custkey = o_custkey)""".stripMargin

  // ---- argmax-dimension census: which embedding dimension dominates
  //      each vector (first index of the max — float equality is exact,
  //      ties resolve to the smallest index in both engines), rolled up
  //      to a dimension histogram. Pure narrow scan + one hash agg ----
  def qArgmaxDimHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(expr("CAST(array_position(embedding, array_max(embedding)) " +
        "AS BIGINT)").as("argmax_dim"))
      .groupBy(col("argmax_dim"))
      .agg(count(lit(1)).as("n_vectors"))

  val oArgmaxDimHist: String =
    """SELECT CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
      |  AS argmax_dim, CAST(count(*) AS BIGINT) AS n_vectors
      |FROM embeddings GROUP BY 1""".stripMargin

  // ---- supplier co-sourcing top-20: supplier pairs sharing the most
  //      parts — the classic co-occurrence self-join, keyed on partkey
  //      (fan-out bounded by per-part supplier degree, never suppliers²),
  //      then a bounded top-k heap over (shared desc, s1, s2). A
  //      collect_set + in-group pair-expansion variant was measured
  //      2× SLOWER (nested array transforms fall out of whole-stage
  //      codegen); the codegen'd hash self-join wins.
  //
  //      Hub guard (r13 verdict): unlike triangle counting, degree-
  //      orienting the emission cannot shrink a co-occurrence join — every
  //      pair sharing a part must still be counted, so pairs-per-part is
  //      inherently degree²; the scale defense is therefore a HUB CAP.
  //      Parts whose supplier degree exceeds SupplierHubCap are excluded
  //      from pair generation (a part sourced by hundreds of suppliers
  //      carries ~zero co-sourcing signal — it co-occurs with everything —
  //      while contributing degree²/2 join rows). The cap is a named,
  //      documented constant replayed verbatim in the oracle SQL, far
  //      above TPC-H's ~4 suppliers/part, so graded results are unchanged
  //      while worst-case per-part fan-out is bounded at Cap²/2 on any
  //      skewed catalog. Not a silent cap: SupplierOverlapSpec proves
  //      pair-set equality below the cap and exclusion above it ----
  val SupplierHubCap = 1000L

  /** Cap-parameterized core (SupplierOverlapSpec proves pair-set equality
    * below the cap and hub exclusion above it with a small test cap).
    * `ps` = distinct (l_partkey, l_suppkey) membership.
    */
  private[graft] def supplierOverlapTopk(ps: DataFrame, cap: Long): DataFrame = {
    val kept = ps
      .withColumn("df", count(lit(1))
        .over(Window.partitionBy(col("l_partkey"))))
      .filter(col("df") <= lit(cap)).drop("df")
    val b = kept.select(col("l_partkey").as("pk_b"),
      col("l_suppkey").as("s2"))
    kept.join(b, col("l_partkey") === col("pk_b") &&
        col("l_suppkey") < col("s2"))
      .groupBy(col("l_suppkey").as("s1"), col("s2"))
      .agg(count(lit(1)).as("n_shared_parts"))
      .orderBy(col("n_shared_parts").desc, col("s1").asc, col("s2").asc)
      .limit(20)
  }

  def qSupplierOverlapTopk(s: SparkSession, dir: String): DataFrame =
    supplierOverlapTopk(
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct(),
      SupplierHubCap)

  val oSupplierOverlapTopk: String =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |kept AS (
      |  SELECT l_partkey, l_suppkey FROM (
      |    SELECT l_partkey, l_suppkey,
      |      count(*) OVER (PARTITION BY l_partkey) AS df
      |    FROM ps)
      |  WHERE df <= 1000)
      |SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
      |  CAST(count(*) AS BIGINT) AS n_shared_parts
      |FROM kept a JOIN kept b
      |  ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
      |GROUP BY 1, 2
      |ORDER BY n_shared_parts DESC, s1 ASC, s2 ASC LIMIT 20""".stripMargin

  // ---- order line-signature census: the ordered line-number list of
  //      each order as a canonical string (numeric sort BEFORE
  //      stringify — ordered aggregation parity between engines), rolled
  //      up to a signature histogram ----
  def qLineSignature(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",",
        expr("transform(sort_array(collect_list(l_linenumber)), " +
          "x -> CAST(x AS STRING))")).as("signature"))
      .groupBy(col("signature"))
      .agg(count(lit(1)).as("n_orders"))

  val oLineSignature: String =
    """WITH per AS (
      |  SELECT l_orderkey,
      |    string_agg(CAST(l_linenumber AS VARCHAR), ','
      |      ORDER BY l_linenumber) AS signature
      |  FROM lineitem GROUP BY 1)
      |SELECT signature, CAST(count(*) AS BIGINT) AS n_orders
      |FROM per GROUP BY 1""".stripMargin

  // ---- weekly event-type combination census via bitmasks: each type
  //      gets a stable bit (rank over the ≤type-domain dictionary), each
  //      (user, week) folds to ONE long with bit_or, combos roll up to a
  //      mask histogram with popcount — set-valued grouping without any
  //      collect_set/array shuffle ----
  def qTypeBitmaskHist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("event_type"))
    val dict = events(s, dir).select(col("event_type")).distinct()
      .withColumn("idx", (row_number().over(w) - 1).cast("int"))
    events(s, dir).select(col("user_id"), col("event_type"),
        expr("ts DIV (86400000000000 * 7)").as("wk"))
      .join(broadcast(dict), Seq("event_type"))
      .groupBy(col("user_id"), col("wk"))
      .agg(expr("bit_or(shiftleft(1L, idx))").as("mask"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n_user_weeks"))
      .select(col("mask"), expr("CAST(bit_count(mask) AS BIGINT)")
        .as("n_types"), col("n_user_weeks"))
  }

  val oTypeBitmaskHist: String =
    """WITH dict AS (
      |  SELECT event_type,
      |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT) AS idx
      |  FROM (SELECT DISTINCT event_type FROM events)),
      |masks AS (
      |  SELECT user_id, epoch_us(ts) // (86400000000 * 7) AS wk,
      |    CAST(bit_or(1::BIGINT << idx) AS BIGINT) AS mask
      |  FROM events JOIN dict USING (event_type)
      |  GROUP BY 1, 2)
      |SELECT mask, CAST(bit_count(mask) AS BIGINT) AS n_types,
      |  CAST(count(*) AS BIGINT) AS n_user_weeks
      |FROM masks GROUP BY 1""".stripMargin

  // ---- wealth-to-spend curve: customers deciled by account balance
  //      (a customer-DIMENSION window with a (bal, custkey) total
  //      order), joined to their order-revenue reduction; per-decile
  //      order counts and revenue ----
  def qAcctbalDecileRev(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("bal_c"), col("c_custkey"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), floor(col("c_acctbal") * 100).cast("long")
        .as("bal_c"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
    val rev = t(s, dir, "orders")
      .select(col("o_custkey"), floor(col("o_totalprice") * 100)
        .cast("long").as("price_c"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_o"), sum(col("price_c")).as("rev_c"))
    cust.join(rev, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(coalesce(col("n_o"), lit(0L))).as("n_orders"),
        (sum(coalesce(col("rev_c"), lit(0L))).cast("double") / lit(100.0))
          .as("revenue"))
  }

  val oAcctbalDecileRev: String =
    """WITH cust AS (
      |  SELECT c_custkey,
      |    CAST(ntile(10) OVER (ORDER BY
      |      CAST(floor(c_acctbal * 100) AS BIGINT), c_custkey) AS BIGINT)
      |      AS decile
      |  FROM customer),
      |rev AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_o,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1)
      |SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(coalesce(n_o, 0)) AS BIGINT) AS n_orders,
      |  CAST(sum(coalesce(rev_c, 0)) AS BIGINT)::DOUBLE / 100.0::DOUBLE
      |    AS revenue
      |FROM cust LEFT JOIN rev ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin

  // ---- year-coverage census (relational division): how many order
  //      years each customer spans, flagged where the span covers EVERY
  //      year in the data — "customers who ordered in all years" is the
  //      classic division operator, done as two distinct reductions and
  //      a 1-row broadcast, never a nested NOT EXISTS ----
  def qYearCoverageHist(s: SparkSession, dir: String): DataFrame = {
    val cy = t(s, dir, "orders")
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("date")).cast("long").as("yr"))
      .distinct()
    val perCust = cy.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_years_active"))
    val totalYears = cy.select(col("yr")).distinct()
      .agg(count(lit(1)).as("n_years_total"))
    perCust.crossJoin(broadcast(totalYears))
      .select(col("n_years_active"),
        (col("n_years_active") === col("n_years_total")).as("is_full"))
      .groupBy(col("n_years_active"), col("is_full"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val oYearCoverageHist: String =
    """WITH cy AS (
      |  SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr
      |  FROM orders),
      |pc AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_years_active
      |  FROM cy GROUP BY 1),
      |ty AS (SELECT CAST(count(DISTINCT yr) AS BIGINT) AS n_years_total
      |       FROM cy)
      |SELECT n_years_active, n_years_active = n_years_total AS is_full,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM pc, ty GROUP BY 1, 2""".stripMargin

  // ---- per-nation interpolated median balance via the NATIVE exact
  //      percentile functions (Spark `percentile` ↔ DuckDB
  //      `quantile_cont`, both (n−1)·p linear interpolation over sorted
  //      exact cent-longs — one interpolation per group, deterministic
  //      doubles) ----
  def qMedianInterpByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        expr("percentile(bal_c, 0.5D)").as("median_bal_c"))

  val oMedianInterpByNation: String =
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
      |  quantile_cont(CAST(floor(c_acctbal * 100) AS BIGINT), 0.5)
      |    AS median_bal_c
      |FROM customer GROUP BY 1""".stripMargin

  // ---- part-name collision census: how many catalog entries share an
  //      exact name, and across how many brands — per-name reduction,
  //      rolled up to the (n_parts, n_brands) grid ----
  def qPartNameCollisions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("p_brand")).as("n_brands"))
      .groupBy(col("n_parts"), col("n_brands"))
      .agg(count(lit(1)).as("n_names"))

  val oPartNameCollisions: String =
    """WITH per AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
      |  FROM part GROUP BY 1)
      |SELECT n_parts, n_brands, CAST(count(*) AS BIGINT) AS n_names
      |FROM per GROUP BY 1, 2""".stripMargin

  // ---- weekday activity profile with EXACT distinct users per day of
  //      week (pure epoch-day arithmetic, (days+4) % 7, 0=Sunday) and
  //      the events-per-active-user intensity in basis points ----
  def qDowActives(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(expr("((ts DIV 86400000000000) + 4) % 7").as("dow"),
        col("user_id"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_active_users"))
      .select(col("dow"), col("n_events"), col("n_active_users"),
        expr("n_events * 10000L DIV n_active_users")
          .as("events_per_user_bp"))

  val oDowActives: String =
    """WITH e AS (
      |  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, user_id
      |  FROM events)
      |SELECT dow, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users,
      |  CAST(count(*) * 10000 // count(DISTINCT user_id) AS BIGINT)
      |    AS events_per_user_bp
      |FROM e GROUP BY 1""".stripMargin

  // ---- skip-gram co-occurrence top-20: ordered token pairs within a
  //      ±2 position window. The window is FIXED, so pair generation is
  //      pure per-row array algebra — each position looks ahead at
  //      offsets +1/+2 inside its own token array — and the only
  //      exchange is the final groupBy over the (small) vocabulary².
  //      The r15 sf10 bench measured the previous shape — a (doc,
  //      position) self-equi-join — at 240× for 100× data: two exploded
  //      position tables (3N rows) sort-merged and spilled for what a
  //      per-document window never needed. Zero joins now; identical
  //      output (empty tokens skipped on both sides of a pair, gaps
  //      preserve positions, exactly as before) ----
  def qSkipgramTopk(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    // Offset-o pairs as two zipped SLICES of the token array: slice /
    // arrays_zip / concat are ordinary codegen'd expressions, where the
    // earlier per-position HOF (flatten∘transform∘sequence with nested
    // element_at lambdas) was interpreted per token — 11.1 s vs 0.9 s at
    // sf0.1 for identical output. Join-free either way: the only exchange
    // is the final vocab² groupBy with map-side partials.
    def zipAt(o: Int) = arrays_zip(
      slice(toks, lit(1), greatest(n - o, lit(0))),
      slice(toks, lit(o + 1), greatest(n - o, lit(0))))
    t(s, dir, "documents")
      .select(explode(concat(zipAt(1), zipAt(2))).as("pr"))
      // arrays_zip names non-attribute inputs positionally ("0", "1")
      .select(col("pr").getField("0").as("tok"),
        col("pr").getField("1").as("tok2"))
      .filter(col("tok") =!= "" && col("tok2") =!= "")
      .groupBy(col("tok"), col("tok2"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("tok").asc, col("tok2").asc)
      .limit(20)
  }

  val oSkipgramTopk: String =
    """WITH pos AS (
      |  SELECT doc_id, unnest(range(0, len(string_split(text, ' ')))) AS pos,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |p2 AS (SELECT doc_id, pos, tok FROM pos WHERE tok <> ''),
      |lft AS (
      |  SELECT doc_id, tok, unnest([pos + 1, pos + 2]) AS tp
      |  FROM p2)
      |SELECT l.tok AS tok, r.tok AS tok2, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM lft l JOIN p2 r ON l.doc_id = r.doc_id AND l.tp = r.pos
      |GROUP BY 1, 2
      |ORDER BY n_pairs DESC, l.tok ASC, tok2 ASC LIMIT 20""".stripMargin

  // ---- supplier volume volatility: relative variance of monthly line
  //      volumes in exact basis points — n·Σv²/(Σv)² − 1, every product
  //      staged through DECIMAL(38,0) BEFORE multiplying (the
  //      linregExact overflow discipline; a long product of two ~3e9
  //      moments would wrap silently), floor-div at the end, top-20
  //      most erratic suppliers ----
  def qSupplierVolatility(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        expr("(CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) - 1970) * 12" +
          " + CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) - 1").as("m"))
      .groupBy(col("l_suppkey"), col("m"))
      .agg(count(lit(1)).as("v"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_months"), sum(col("v")).as("sv"),
        // Σv² of unbounded per-month counts → staged BEFORE the sum too
        sum(col("v").cast("decimal(38,0)") * col("v")).as("sv2"))
      .filter(col("n_months") >= 3L)
      .select(col("l_suppkey"), col("n_months"), col("sv").as("total_lines"),
        expr("CAST((CAST(n_months AS DECIMAL(38,0)) * " +
          "CAST(sv2 AS DECIMAL(38,0)) - CAST(sv AS DECIMAL(38,0)) * " +
          "CAST(sv AS DECIMAL(38,0))) * 10000 DIV " +
          "(CAST(sv AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("rel_var_bp"))
      .orderBy(col("rel_var_bp").desc, col("l_suppkey").asc)
      .limit(20)

  val oSupplierVolatility: String =
    """WITH mv AS (
      |  SELECT l_suppkey,
      |    (CAST(year(l_shipdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(l_shipdate) AS BIGINT) - 1 AS m,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1, 2),
      |per AS (
      |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_months,
      |    CAST(sum(v) AS BIGINT) AS sv, sum(v::HUGEINT * v) AS sv2
      |  FROM mv GROUP BY 1)
      |SELECT l_suppkey, n_months, sv AS total_lines,
      |  CAST((n_months::HUGEINT * sv2::HUGEINT - sv::HUGEINT * sv::HUGEINT)
      |    * 10000 // (sv::HUGEINT * sv::HUGEINT) AS BIGINT) AS rel_var_bp
      |FROM per WHERE n_months >= 3
      |ORDER BY rel_var_bp DESC, l_suppkey ASC LIMIT 20""".stripMargin

  // ---- surrogate-key gap audit: key-space density of the three
  //      unique-keyed tables — min/max/count and the implied missing-key
  //      count, three single-scan reductions unioned ----
  def qKeyGapAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(name: String, table: String, key: String) =
      t(s, dir, table).agg(min(col(key)).as("min_key"),
          max(col(key)).as("max_key"), count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("min_key"), col("max_key"),
          col("n_rows"),
          (col("max_key") - col("min_key") + 1L - col("n_rows"))
            .as("n_missing"))
    audit("orders", "orders", "o_orderkey")
      .unionByName(audit("customer", "customer", "c_custkey"))
      .unionByName(audit("part", "part", "p_partkey"))
  }

  val oKeyGapAudit: String =
    """SELECT 'orders' AS table_name, min(o_orderkey) AS min_key,
      |  max(o_orderkey) AS max_key, CAST(count(*) AS BIGINT) AS n_rows,
      |  max(o_orderkey) - min(o_orderkey) + 1 - count(*) AS n_missing
      |FROM orders
      |UNION ALL
      |SELECT 'customer', min(c_custkey), max(c_custkey),
      |  CAST(count(*) AS BIGINT),
      |  max(c_custkey) - min(c_custkey) + 1 - count(*)
      |FROM customer
      |UNION ALL
      |SELECT 'part', min(p_partkey), max(p_partkey),
      |  CAST(count(*) AS BIGINT),
      |  max(p_partkey) - min(p_partkey) + 1 - count(*)
      |FROM part""".stripMargin

  // ---- boolean retrieval 2×2: conjunctive token search ("join" AND
  //      "hash") as a contingency census over EXACT token membership
  //      (array containment, not substring match) — one narrow scan,
  //      one 4-cell rollup ----
  def qAndSearch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(expr("array_contains(split(text, ' '), 'join')")
          .as("has_join"),
        expr("array_contains(split(text, ' '), 'hash')").as("has_hash"),
        col("n_chars"))
      .groupBy(col("has_join"), col("has_hash"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  val oAndSearch: String =
    """SELECT list_contains(string_split(text, ' '), 'join') AS has_join,
      |  list_contains(string_split(text, ' '), 'hash') AS has_hash,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1, 2""".stripMargin

  // ---- Freedman–Diaconis adaptive histogram: bin width derived from
  //      the EXACT interquartile range (first crossings of the
  //      cumulative over the reduced price-cent domain — the ks_drift
  //      value-domain discipline, no fact-table sort), width =
  //      ⌊2·IQR/∛n⌋ as one deterministic double expression, then a
  //      re-bin of the same reduced domain. Output carries the width so
  //      the grading pins the whole derivation ----
  def qFdHistogram(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "orders")
      .select(floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("price_c")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("price_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("n")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("n")).as("n_tot"))))
    // binw = ⌊2·IQR/∛n⌋ exactly: unlike sqrt, cbrt is NOT required by
    // IEEE-754 to be correctly rounded, so Java's Math.cbrt and DuckDB's
    // libm cbrt may differ in the last ulp — and the result feeds floor(),
    // where 1 ulp can re-bin the whole histogram. The double cbrt is kept
    // only as a hint c0; the true floor F satisfies b ≤ 2·IQR/∛n ⟺
    // b³·n ≤ (2·IQR)³ (all non-negative) and |F−c0| ≤ 1, so F is recovered
    // exactly by testing c0+1 and c0 in DECIMAL(38,0) integer space
    // (max ~(4e7)³·1e6 ≈ 6e28 ≪ 10³⁸; the oracle replays it in HUGEINT).
    val params = cum.agg(
        min(when(col("cum") * 4 >= col("n_tot"), col("price_c"))).as("q1_c"),
        min(when(col("cum") * 4 >= col("n_tot") * 3, col("price_c")))
          .as("q3_c"),
        max(col("n_tot")).as("n_tot"))
      .withColumn("c0", expr("CAST(floor(2.0D * (q3_c - q1_c) / " +
        "cbrt(CAST(n_tot AS DOUBLE))) AS BIGINT)"))
      .withColumn("k3", expr("8 * CAST(q3_c - q1_c AS DECIMAL(38,0)) * " +
        "(q3_c - q1_c) * (q3_c - q1_c)"))
      .select(col("q1_c"), col("q3_c"), col("n_tot"),
        greatest(expr("CASE WHEN CAST(c0 + 1 AS DECIMAL(38,0)) * (c0 + 1)" +
          " * (c0 + 1) * n_tot <= k3 THEN c0 + 1 " +
          "WHEN CAST(c0 AS DECIMAL(38,0)) * c0 * c0 * n_tot <= k3 THEN c0" +
          " ELSE c0 - 1 END"), lit(1L))
          .as("binw_c"))
    hist.crossJoin(broadcast(params))
      .groupBy(expr("price_c DIV binw_c").as("bin"), col("binw_c"))
      .agg(sum(col("n")).as("n_orders"))
  }

  val oFdHistogram: String =
    """WITH hist AS (
      |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |cum AS (
      |  SELECT price_c, n,
      |    CAST(sum(n) OVER (ORDER BY price_c) AS BIGINT) AS cum,
      |    CAST(sum(n) OVER () AS BIGINT) AS n_tot
      |  FROM hist),
      |params AS (
      |  SELECT
      |    min(CASE WHEN cum * 4 >= n_tot THEN price_c END) AS q1_c,
      |    min(CASE WHEN cum * 4 >= n_tot * 3 THEN price_c END) AS q3_c,
      |    max(n_tot) AS n_tot
      |  FROM cum),
      |hint AS (
      |  SELECT n_tot, q1_c, q3_c,
      |    CAST(floor(2.0::DOUBLE * (q3_c - q1_c) /
      |      cbrt(CAST(n_tot AS DOUBLE))) AS BIGINT) AS c0,
      |    8 * (q3_c - q1_c)::HUGEINT * (q3_c - q1_c) * (q3_c - q1_c) AS k3
      |  FROM params),
      |p2 AS (
      |  SELECT greatest(CASE
      |    WHEN (c0 + 1)::HUGEINT * (c0 + 1) * (c0 + 1) * n_tot <= k3
      |      THEN c0 + 1
      |    WHEN c0::HUGEINT * c0 * c0 * n_tot <= k3 THEN c0
      |    ELSE c0 - 1 END, 1) AS binw_c
      |  FROM hint)
      |SELECT hist.price_c // p2.binw_c AS bin, p2.binw_c,
      |  CAST(sum(hist.n) AS BIGINT) AS n_orders
      |FROM hist, p2 GROUP BY 1, 2""".stripMargin

  // ---- casefold/punctuation-normalized dedup census: how much exact
  //      deduplication is left on the table by case and punctuation —
  //      distinct raw texts vs distinct normalized forms (lowercase,
  //      strip non-alphanumerics), reduction in basis points. Two
  //      distinct reductions, one row ----
  def qCasefoldDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("text"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("norm"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_raw"),
        countDistinct(col("norm")).as("n_distinct_norm"))
      .select(col("n_docs"), col("n_distinct_raw"), col("n_distinct_norm"),
        expr("(n_distinct_raw - n_distinct_norm) * 10000L DIV " +
          "n_distinct_raw").as("reduction_bp"))

  val oCasefoldDedup: String =
    """WITH d AS (
      |  SELECT text,
      |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS norm
      |  FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_raw,
      |  CAST(count(DISTINCT norm) AS BIGINT) AS n_distinct_norm,
      |  CAST((count(DISTINCT text) - count(DISTINCT norm)) * 10000 //
      |    count(DISTINCT text) AS BIGINT) AS reduction_bp
      |FROM d""".stripMargin

  // ---- multi-supplier order census: distinct suppliers touched per
  //      order (per-order distinct reduction), rolled up to a bounded
  //      histogram — the "split shipment" profile ----
  def qOrderSupplierMix(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
      .groupBy(col("n_suppliers"))
      .agg(count(lit(1)).as("n_orders"))

  val oOrderSupplierMix: String =
    """WITH per AS (
      |  SELECT l_orderkey,
      |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
      |  FROM lineitem GROUP BY 1)
      |SELECT n_suppliers, CAST(count(*) AS BIGINT) AS n_orders
      |FROM per GROUP BY 1""".stripMargin

  // ---- hierarchical geo rollup: revenue by region → nation with
  //      ROLLUP subtotals and the grouping-id bitmask surfaced (first
  //      rollup column = most significant bit in BOTH engines); the two
  //      dims broadcast onto the fact scan ----
  def qGeoRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("rev_c"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(expr("CAST(grouping_id() AS BIGINT)").as("gid"),
        count(lit(1)).as("n_lines"),
        (sum(col("rev_c")).cast("double") / lit(100.0)).as("revenue"))
      .select(col("r_name"), col("n_name"), col("gid"),
        col("n_lines"), col("revenue"))

  val oGeoRollup: String =
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    ::DOUBLE / 100.0::DOUBLE AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  // ---- daily value-at-risk: the 95th-percentile day-over-day revenue
  //      DROP in exact cents — daily reduction, (day=day+1) self-join
  //      for the drop series, exact rank selection over the bounded day
  //      domain (row_number, target 1+(n−1)·95/100) ----
  def qDailyVar(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE'1970-01-01') AS BIGINT)").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("day")).agg(sum(col("price_c")).as("rev_c"))
    val prev = daily.select((col("day") + 1L).as("day"),
      col("rev_c").as("prev_c"))
    val drops = daily.join(prev, Seq("day"))
      .select(col("day"), (col("prev_c") - col("rev_c")).as("drop_c"))
    val w = Window.orderBy(col("drop_c"), col("day"))
    drops.withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(drops.agg(count(lit(1)).as("n_days"))))
      .filter(col("rn") === lit(1L) + expr("(n_days - 1) * 95 DIV 100"))
      .select(col("n_days"), col("drop_c").as("var95_c"),
        (col("drop_c").cast("double") / lit(100.0)).as("var95"))
  }

  val oDailyVar: String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |drops AS (
      |  SELECT d.day, p.rev_c - d.rev_c AS drop_c
      |  FROM daily d JOIN daily p ON d.day = p.day + 1),
      |r AS (
      |  SELECT drop_c,
      |    CAST(row_number() OVER (ORDER BY drop_c, day) AS BIGINT) AS rn,
      |    CAST(count(*) OVER () AS BIGINT) AS n_days
      |  FROM drops)
      |SELECT n_days, drop_c AS var95_c,
      |  drop_c::DOUBLE / 100.0::DOUBLE AS var95
      |FROM r WHERE rn = 1 + (n_days - 1) * 95 // 100""".stripMargin

  // ---- deterministic-sample drift audit: a 5% md5-bucket sample of
  //      events (the SAME portable hash the split/sampling operators
  //      grade on) vs the full population — mean-value drift in exact
  //      basis points, cross-multiplied through DECIMAL(38,0) so no
  //      float mean is ever compared ----
  def qSampleDrift(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"),
      floor(col("value") * 100).cast("long").as("v_c"),
      (graft.functions.Portable.hash32(col("event_id").cast("string"))
        % 100 < 5).as("in_sample"))
    e.agg(count(lit(1)).as("n_full"), sum(col("v_c")).as("sum_full"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sample"),
        sum(when(col("in_sample"), col("v_c")).otherwise(0L))
          .as("sum_sample"))
      .select(col("n_full"), col("n_sample"),
        (col("sum_full").cast("double") /
          (col("n_full") * 100L).cast("double")).as("mean_full"),
        (col("sum_sample").cast("double") /
          (col("n_sample") * 100L).cast("double")).as("mean_sample"),
        expr("CAST(abs(CAST(sum_sample AS DECIMAL(38,0)) * " +
          "CAST(n_full AS DECIMAL(38,0)) - CAST(sum_full AS DECIMAL(38,0))" +
          " * CAST(n_sample AS DECIMAL(38,0))) * 10000 DIV " +
          "abs(CAST(sum_full AS DECIMAL(38,0)) * " +
          "CAST(n_sample AS DECIMAL(38,0))) AS BIGINT)").as("drift_bp"))
  }

  val oSampleDrift: String = {
    val h = H32.format("CAST(event_id AS VARCHAR)")
    s"""WITH e AS (
       |  SELECT CAST(floor(value * 100) AS BIGINT) AS v_c,
       |    $h % 100 < 5 AS in_sample
       |  FROM events),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_full,
       |    CAST(sum(v_c) AS BIGINT) AS sum_full,
       |    CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_sample,
       |    CAST(sum(CASE WHEN in_sample THEN v_c ELSE 0 END) AS BIGINT)
       |      AS sum_sample
       |  FROM e)
       |SELECT n_full, n_sample,
       |  sum_full::DOUBLE / (n_full * 100)::DOUBLE AS mean_full,
       |  sum_sample::DOUBLE / (n_sample * 100)::DOUBLE AS mean_sample,
       |  CAST(abs(sum_sample::HUGEINT * n_full::HUGEINT -
       |    sum_full::HUGEINT * n_sample::HUGEINT) * 10000 //
       |    abs(sum_full::HUGEINT * n_sample::HUGEINT) AS BIGINT)
       |    AS drift_bp
       |FROM a""".stripMargin
  }

  // ---- top-quintile suppliers per nation via percent_rank parity:
  //      (rank−1)/(n−1) is the same exact rational in both engines, so
  //      the ≥0.8 cut is bit-deterministic; the window runs inside each
  //      nation partition over the supplier dimension ----
  def qPercentRankCut(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("bal_c"))
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        floor(col("s_acctbal") * 100).cast("long").as("bal_c"))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= 0.8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_top"), min(col("bal_c")).as("min_bal_c"),
        max(col("bal_c")).as("max_bal_c"))
  }

  val oPercentRankCut: String =
    """WITH r AS (
      |  SELECT s_nationkey, s_suppkey,
      |    CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_c,
      |    percent_rank() OVER (PARTITION BY s_nationkey
      |      ORDER BY CAST(floor(s_acctbal * 100) AS BIGINT)) AS pr
      |  FROM supplier)
      |SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_top,
      |  min(bal_c) AS min_bal_c, max(bal_c) AS max_bal_c
      |FROM r WHERE pr >= 0.8 GROUP BY 1""".stripMargin

  // ---- calendar-continuity audit: missing order days in the observed
  //      span — present-day lag gaps over the bounded day domain, one
  //      summary row (present days, span, total/max gap) ----
  def qCalendarGaps(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), " +
        "DATE'1970-01-01') AS BIGINT)").as("day"))
      .distinct()
    val w = Window.orderBy(col("day"))
    days.withColumn("gap", col("day") - lag(col("day"), 1).over(w) - 1L)
      .agg(count(lit(1)).as("n_days_present"),
        (max(col("day")) - min(col("day")) + 1L).as("span_days"),
        sum(coalesce(col("gap"), lit(0L))).as("n_gap_days"),
        max(coalesce(col("gap"), lit(0L))).as("max_gap_days"))
  }

  val oCalendarGaps: String =
    """WITH days AS (
      |  SELECT DISTINCT epoch_us(o_orderdate) // 86400000000 AS day
      |  FROM orders),
      |g AS (
      |  SELECT day, day - lag(day) OVER (ORDER BY day) - 1 AS gap
      |  FROM days)
      |SELECT CAST(count(*) AS BIGINT) AS n_days_present,
      |  max(day) - min(day) + 1 AS span_days,
      |  CAST(sum(coalesce(gap, 0)) AS BIGINT) AS n_gap_days,
      |  CAST(max(coalesce(gap, 0)) AS BIGINT) AS max_gap_days
      |FROM g""".stripMargin

  // ---- monthly customer-concentration trend: Herfindahl index of
  //      customer revenue shares per month in exact basis points —
  //      per-(month, customer) reduction, each rev² staged through
  //      DECIMAL(38,0) BEFORE the sum (HUGEINT in the oracle): the
  //      square of a cent-denominated month-revenue fits a long but
  //      the per-month SUM of squares does not — the r14 sf1 probe
  //      caught exactly this wrap (ARITHMETIC_OVERFLOW at 10× rows) ----
  def qMonthlyHhi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("(CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) - 1970) " +
          "* 12 + CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) - 1")
          .as("month_num"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("month_num"), col("o_custkey"))
      .agg(sum(col("price_c")).as("rev_c"))
      .groupBy(col("month_num"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("srev"),
        sum(col("rev_c").cast("decimal(38,0)") * col("rev_c"))
          .as("srev2"))
      .select(col("month_num"), col("n_customers"),
        expr("CAST(CAST(srev2 AS DECIMAL(38,0)) * 10000 DIV " +
          "(CAST(srev AS DECIMAL(38,0)) * CAST(srev AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("hhi_bp"))

  val oMonthlyHhi: String =
    """WITH per AS (
      |  SELECT (CAST(year(o_orderdate) AS BIGINT) - 1970) * 12 +
      |      CAST(month(o_orderdate) AS BIGINT) - 1 AS month_num,
      |    o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT month_num, CAST(count(*) AS BIGINT) AS n_customers,
      |    CAST(sum(rev_c) AS BIGINT) AS srev,
      |    sum(rev_c::HUGEINT * rev_c) AS srev2
      |  FROM per GROUP BY 1)
      |SELECT month_num, n_customers,
      |  CAST(srev2::HUGEINT * 10000 // (srev::HUGEINT * srev::HUGEINT)
      |    AS BIGINT) AS hhi_bp
      |FROM m""".stripMargin

  // ---- day-of-month revenue profile (pay-cycle shape): bounded 31-row
  //      domain, shares in exact basis points against a 1-row broadcast
  //      total ----
  def qDomProfile(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select(dayofmonth(col("o_orderdate").cast("date")).cast("long")
          .as("dom"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      .groupBy(col("dom"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_c"))
    m.crossJoin(broadcast(m.agg(sum(col("rev_c")).as("tot_c"))))
      .select(col("dom"), col("n_orders"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        expr("rev_c * 10000L DIV tot_c").as("share_bp"))
  }

  val oDomProfile: String =
    """WITH m AS (
      |  SELECT CAST(day(o_orderdate) AS BIGINT) AS dom,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c FROM m)
      |SELECT dom, n_orders,
      |  rev_c::DOUBLE / 100.0::DOUBLE AS revenue,
      |  CAST(rev_c * 10000 // tot_c AS BIGINT) AS share_bp
      |FROM m, tot""".stripMargin

  // ---- same-part-same-day discount inconsistency: (part, ship-day)
  //      cells where the SAME item shipped at different discounts —
  //      per-cell distinct reduction, one summary row ----
  def qDiscountInconsistency(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01') " +
          "AS BIGINT)").as("day"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"))
      .groupBy(col("l_partkey"), col("day"))
      .agg(countDistinct(col("disc_pct")).as("n_disc"),
        count(lit(1)).as("n_lines"))
      .agg(count(lit(1)).as("n_part_days"),
        sum(when(col("n_disc") > 1L, 1L).otherwise(0L))
          .as("n_inconsistent"),
        max(col("n_disc")).as("max_n_disc"))
      .select(col("n_part_days"), col("n_inconsistent"), col("max_n_disc"),
        expr("n_inconsistent * 10000L DIV n_part_days")
          .as("inconsistent_bp"))

  val oDiscountInconsistency: String =
    """WITH per AS (
      |  SELECT l_partkey, epoch_us(l_shipdate) // 86400000000 AS day,
      |    CAST(count(DISTINCT CAST(round(l_discount * 100) AS BIGINT))
      |      AS BIGINT) AS n_disc
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_part_days,
      |  CAST(sum(CASE WHEN n_disc > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_inconsistent,
      |  max(n_disc) AS max_n_disc,
      |  CAST(sum(CASE WHEN n_disc > 1 THEN 1 ELSE 0 END) * 10000 //
      |    count(*) AS BIGINT) AS inconsistent_bp
      |FROM per""".stripMargin

  // ---- Mood's median test: is src0's length distribution shifted
  //      against the rest? Grand median from the cumulative over the
  //      reduced value domain (the ks_drift discipline), 2×2 above/below
  //      census, χ² via DECIMAL(38,0)-staged cross-multiplication with
  //      ONE closing double division ----
  def qMedianTest(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("n_chars").as("v"), (col("source") === "src0").as("g"))
    val hist = d.groupBy(col("v")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = hist.withColumn("cum", sum(col("n")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("n")).as("n_tot"))))
      .agg(min(when(col("cum") * 2 >= col("n_tot"), col("v"))).as("med"))
    d.crossJoin(broadcast(med))
      .select(col("g"), (col("v") > col("med")).as("above"))
      .groupBy(col("g"), col("above"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(when(col("g") && col("above"), col("n")).otherwise(0L))
          .as("n11"),
        sum(when(col("g") && !col("above"), col("n")).otherwise(0L))
          .as("n12"),
        sum(when(!col("g") && col("above"), col("n")).otherwise(0L))
          .as("n21"),
        sum(when(!col("g") && !col("above"), col("n")).otherwise(0L))
          .as("n22"))
      .select(col("n11"), col("n12"), col("n21"), col("n22"),
        expr("CAST(CAST(n11 + n12 + n21 + n22 AS DECIMAL(38,0)) * " +
          "(CAST(n11 AS DECIMAL(38,0)) * CAST(n22 AS DECIMAL(38,0)) - " +
          "CAST(n12 AS DECIMAL(38,0)) * CAST(n21 AS DECIMAL(38,0))) * " +
          "(CAST(n11 AS DECIMAL(38,0)) * CAST(n22 AS DECIMAL(38,0)) - " +
          "CAST(n12 AS DECIMAL(38,0)) * CAST(n21 AS DECIMAL(38,0))) " +
          "AS DOUBLE) / CAST((CAST(n11 AS DECIMAL(38,0)) + " +
          "CAST(n12 AS DECIMAL(38,0))) * (CAST(n21 AS DECIMAL(38,0)) + " +
          "CAST(n22 AS DECIMAL(38,0))) * (CAST(n11 AS DECIMAL(38,0)) + " +
          "CAST(n21 AS DECIMAL(38,0))) * (CAST(n12 AS DECIMAL(38,0)) + " +
          "CAST(n22 AS DECIMAL(38,0))) AS DOUBLE)").as("chi2"))
  }

  val oMedianTest: String =
    """WITH d AS (
      |  SELECT n_chars AS v, source = 'src0' AS g FROM documents),
      |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |cum AS (
      |  SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum,
      |    CAST(sum(n) OVER () AS BIGINT) AS n_tot
      |  FROM hist),
      |med AS (SELECT min(CASE WHEN cum * 2 >= n_tot THEN v END) AS med
      |        FROM cum),
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN g AND v > med THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n11,
      |    CAST(sum(CASE WHEN g AND v <= med THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n12,
      |    CAST(sum(CASE WHEN NOT g AND v > med THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n21,
      |    CAST(sum(CASE WHEN NOT g AND v <= med THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n22
      |  FROM d, med)
      |SELECT n11, n12, n21, n22,
      |  CAST((n11 + n12 + n21 + n22)::HUGEINT *
      |    (n11::HUGEINT * n22::HUGEINT - n12::HUGEINT * n21::HUGEINT) *
      |    (n11::HUGEINT * n22::HUGEINT - n12::HUGEINT * n21::HUGEINT)
      |    AS DOUBLE) /
      |  CAST((n11::HUGEINT + n12::HUGEINT) * (n21::HUGEINT + n22::HUGEINT)
      |    * (n11::HUGEINT + n21::HUGEINT) * (n12::HUGEINT + n22::HUGEINT)
      |    AS DOUBLE) AS chi2
      |FROM cells""".stripMargin
}
