package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 extension queries: relational reshaping (unpivot, winsorize),
  * training-corpus chunk dedup, deletion-neighborhood edit-distance join,
  * Bloom-filter runtime pre-filtering, event-transition (Markov) matrix,
  * and iterative BFS. Candidate generation stays equi-join-on-block-key
  * (never an unbounded cartesian) and aggregates stay partial-aggregable —
  * the 100 TB constraints.
  */
object QueriesX {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalized to epoch-nanos longs regardless of storage type
    * (legacy nanos-INT64 or TIMESTAMP_NTZ micros); see [[graft.util.EventTime]].
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.util.EventTime.tsToNanos(t(s, dir, "events"))
  }

  // ---- unpivot / melt: wide per-group aggregates to (group, metric, value)
  //      long form. Spark's Dataset.unpivot is a zero-shuffle local expand
  //      on top of the (already partial-aggregated) groupBy — the long form
  //      is 3x the rows but never re-shuffles. ----
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val agg = t(s, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("qty"),
        sum(col("l_extendedprice").cast("decimal(20,2)")).cast("double").as("price"),
        sum(col("l_discount").cast("decimal(20,2)")).cast("double").as("disc"))
    agg.unpivot(
      Array(col("l_returnflag")),
      Array(col("qty"), col("price"), col("disc")),
      "metric", "value")
  }

  val oUnpivot: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS price,
      |    CAST(sum(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, metric, value FROM (
      |  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
      |  UNION ALL SELECT l_returnflag, 'price', price FROM a
      |  UNION ALL SELECT l_returnflag, 'disc', disc FROM a)""".stripMargin

  // ---- C4-style chunk dedup: split each doc into DISJOINT 10-token
  //      chunks, keep only the globally-first occurrence of each chunk
  //      (ordered by doc_id, then position), report per-doc retention.
  //      The keeper choice is one groupBy on chunk content (hash-
  //      partitioned by chunk — a pathologically common chunk is a skew
  //      key; AQE skew-split handles it, the aggregate itself is just
  //      min(struct)). Differs from q_substring_dedup (overlapping 8-gram
  //      repeated-span coverage): this is the removal policy, not the
  //      measurement. ----
  def qChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val K = 10
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= K) // docs with no full chunk drop out
    val chunks = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), (size(col("t")) / K).cast("int") - 1),
        i => array_join(slice(col("t"), i * K + 1, lit(K)), " "))).as(Seq("pos", "chunk")))
    val keeper = chunks.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .select(col("chunk"), col("k.doc_id").as("kd"), col("k.pos").as("kp"))
    chunks.join(keeper, "chunk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kd") === col("doc_id") && col("kp") === col("pos"), 1L)
          .otherwise(0L)).as("n_kept"))
  }

  val oChunkDedup: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ch AS (
      |  SELECT doc_id,
      |    unnest(range(0, len(t) // 10)) AS pos,
      |    unnest(list_transform(range(0, len(t) // 10),
      |      i -> array_to_string(t[i*10+1:i*10+10], ' '))) AS chunk
      |  FROM toks WHERE len(t) >= 10),
      |k AS (
      |  SELECT doc_id, pos,
      |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      |  FROM ch)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM k GROUP BY 1""".stripMargin

  // ---- edit-distance <= 1 self-join via FastSS deletion neighborhoods
  //      (Bocek et al. 2007, public): two equal-or-off-by-one-length
  //      strings within edit distance 1 share at least one single-character
  //      -deletion variant, so emitting L+1 variants per string and
  //      equi-joining on the variant finds ALL such pairs with blocks sized
  //      by true near-neighbor density — never by any fixed prefix scheme
  //      (c_name's constant "Customer#" prefix makes half/third-split
  //      blocking degenerate to all-pairs; deletion variants stay ~10 per
  //      block here). N*(L+1) emitted rows, one shuffle, exact
  //      levenshtein only on candidates. ----
  /** Deletion variants of `nm`: the string itself plus each single-char
    * deletion, as an array column.
    */
  private def deletionVariants(nm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_union(
      array(nm),
      transform(sequence(lit(1), length(nm)),
        i => concat(nm.substr(lit(1), i - 1), nm.substr(i + 1, length(nm)))))

  def qEditDistJoin(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("nm"))
    val v = names.select(col("id"), col("nm"),
      explode(deletionVariants(col("nm"))).as("v"))
    val a = v.select(col("id").as("a_id"), col("nm").as("a_nm"), col("v"))
    val b = v.select(col("id").as("b_id"), col("nm").as("b_nm"), col("v"))
    a.join(b, Seq("v"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_nm"), col("b_nm")).distinct()
      .filter(levenshtein(col("a_nm"), col("b_nm")) <= 1)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_nm"), col("b_nm")).cast("long").as("d"))
  }

  val oEditDistJoin: String =
    """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS d
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  // ---- Bloom-filter runtime pre-filter: build a 65,536-bit / 3-hash
  //      Bloom filter over the (small) filtered dimension's keys as a
  //      1,024-row (word_index, bits) bitmap — built with one tiny
  //      shuffle, broadcast to the fact side — prefilter fact rows by
  //      testing all 3 bit positions, then remove false positives with the
  //      exact broadcast semi-join. At 100 TB the bloom probe runs inside
  //      the fact scan stage BEFORE any exchange, so rows that cannot join
  //      never reach the shuffle — Spark's own AQE runtime filter does the
  //      same thing implicitly; this is the explicit, tunable form. The
  //      oracle sees only the exact final semantics. ----
  def qBloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val m = 1 << 16
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    def positions(key: org.apache.spark.sql.Column) =
      array((0 until 3).map(i => pmod(xxhash64(lit(i), key), lit(m.toLong))): _*)
    val bitmap = cust
      .select(explode(positions(col("c_custkey"))).as("pos"))
      .select((col("pos") / 64).cast("long").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits")) // <= 1,024 rows
    val orders = t(s, dir, "orders")
    val candKeys = orders.select(col("o_custkey")).distinct()
      .select(col("o_custkey"), explode(positions(col("o_custkey"))).as("pos"))
      .select(col("o_custkey"),
        (col("pos") / 64).cast("long").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("b"))
      .join(broadcast(bitmap), "w")
      .filter(col("bits").bitwiseAND(col("b")) =!= 0)
      .groupBy("o_custkey").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 3) // all 3 bits set -> bloom-maybe
      .select(col("o_custkey"))
    orders
      .join(broadcast(candKeys), Seq("o_custkey"), "left_semi") // bloom prefilter
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"), "left_semi") // exact
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  val oBloomPrefilter: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin

  // ---- first-order Markov transition matrix over per-user event
  //      sequences: one window (shuffle by user_id) for the lag pairing,
  //      one partial-aggregable count, and a broadcast of the tiny
  //      per-prev totals. p = n/tot is exact IEEE long/long division —
  //      bit-identical across engines. ----
  def qMarkov(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val tr = events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("curr", lead(col("event_type"), 1).over(w))
      .filter(col("curr").isNotNull)
      .groupBy(col("event_type").as("prev"), col("curr"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy("prev").agg(sum("n").as("tot"))
    tr.join(broadcast(tot), "prev")
      .select(col("prev"), col("curr"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
  }

  val oMarkov: String =
    """WITH e AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS curr
      |  FROM events),
      |tr AS (
      |  SELECT event_type AS prev, curr, CAST(count(*) AS BIGINT) AS n
      |  FROM e WHERE curr IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY 1)
      |SELECT tr.prev, tr.curr, tr.n,
      |  CAST(tr.n AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS p
      |FROM tr JOIN tot USING (prev)""".stripMargin

  // ---- BFS shortest-path depth (<= 3 hops) from node 0 over the
  //      undirected order/supplier bipartite graph. Frontier-expansion
  //      joins with a distinct() per level keep the frontier bounded by
  //      the node count (not the path count — the recursive-CTE oracle
  //      pays path enumeration; this plan never does). min(d) at the end
  //      collapses revisits. 3 fixed iterations — the unrolled-loop plan
  //      is 3 equi-joins, no lineage blowup at this depth. ----
  def qBfsDepth(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = li.union(li.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val init = s.range(1).select(lit(0L).as("node"), lit(0L).as("d"))
    var reached = init
    var frontier = init
    for (i <- 1 to 3) {
      frontier = frontier.as("f").join(edges.as("e"), col("f.node") === col("e.src"))
        .select(col("e.dst").as("node"), lit(i.toLong).as("d")).distinct()
      reached = reached.union(frontier)
    }
    reached.groupBy("node").agg(min("d").as("d"))
  }

  val oBfsDepth: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
      |  UNION
      |  SELECT DISTINCT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem),
      |bfs(node, d) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
      |  UNION
      |  SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON e.src = bfs.node
      |  WHERE bfs.d < 3)
      |SELECT node, min(d) AS d FROM bfs GROUP BY 1""".stripMargin

  // ---- winsorization: clip each value to its group's nearest-rank
  //      [p05, p95] (rank = ceil(q*n), 1-indexed ascending), then an exact
  //      DECIMAL sum of the clipped column. Nearest-rank (not interpolated)
  //      bounds keep every clipped value a real 2-decimal data value, so
  //      the sum stays exact across engines.
  //
  //      The rank VALUE is found without ever sorting a whole group in one
  //      task (the r10 shape was a 3-partition corpus-scale window — one
  //      task per returnflag sorting ~n/3 rows): a coarse VALUE-BUCKET
  //      histogram (bucket = floor(price/64) — monotone in price, so
  //      bucket boundaries respect rank order and ties share a bucket)
  //      locates the bucket holding rank k via a cumulative count over the
  //      buckets-sized table, and only THAT bucket's ~n/buckets rows rank
  //      locally (window keyed by (flag, bucket, which) — parallel, tiny
  //      partitions). Same two-level cutoff as TrainPrep.qualityGate; at
  //      100 TB no task ever holds more than one bucket's population. ----
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val B = 64.0 // bucket width in price units: ~1,700 buckets over the domain
    val li = t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
    val binned = li.withColumn("bkt", floor(col("l_extendedprice") / B).cast("long"))
    val hist = binned.groupBy(col("l_returnflag"), col("bkt"))
      .agg(count(lit(1)).as("nb"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    val cum = hist
      .withColumn("cum", sum(col("nb")).over(wCum))
      .withColumn("n", sum(col("nb")).over(wAll))
    def rk(q: Double) = ceil(lit(q) * col("n")).cast("long")
    // the bucket containing global rank k, plus the residual rank within it
    def target(q: Double, which: String) = cum
      .filter(col("cum") - col("nb") < rk(q) && rk(q) <= col("cum"))
      .select(col("l_returnflag"), col("bkt"),
        (rk(q) - (col("cum") - col("nb"))).as("r"), lit(which).as("which"))
    val targets = target(0.05, "lo").union(target(0.95, "hi"))
    val wIn = Window.partitionBy(col("l_returnflag"), col("bkt"), col("which"))
      .orderBy(col("l_extendedprice"))
    val bounds = binned
      .join(broadcast(targets), Seq("l_returnflag", "bkt"))
      .withColumn("rn", row_number().over(wIn).cast("long"))
      .filter(col("rn") === col("r"))
      .groupBy(col("l_returnflag"))
      .agg(max(when(col("which") === "lo", col("l_extendedprice"))).as("lo"),
        max(when(col("which") === "hi", col("l_extendedprice"))).as("hi"))
    li.join(broadcast(bounds), "l_returnflag")
      .select(col("l_returnflag"),
        when(col("l_extendedprice") < col("lo"), col("lo"))
          .when(col("l_extendedprice") > col("hi"), col("hi"))
          .otherwise(col("l_extendedprice")).as("v"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(20,2)")).cast("double").as("sum_winsorized"))
  }

  val oWinsorize: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |b AS (
      |  SELECT l_returnflag,
      |    max(CASE WHEN rn = CAST(ceil(0.05::DOUBLE * n) AS BIGINT)
      |      THEN l_extendedprice END) AS lo,
      |    max(CASE WHEN rn = CAST(ceil(0.95::DOUBLE * n) AS BIGINT)
      |      THEN l_extendedprice END) AS hi
      |  FROM r
      |  WHERE rn = CAST(ceil(0.05::DOUBLE * n) AS BIGINT)
      |     OR rn = CAST(ceil(0.95::DOUBLE * n) AS BIGINT)
      |  GROUP BY 1)
      |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(CASE WHEN l_extendedprice < lo THEN lo
      |    WHEN l_extendedprice > hi THEN hi
      |    ELSE l_extendedprice END AS DECIMAL(20,2))) AS DOUBLE) AS sum_winsorized
      |FROM lineitem l JOIN b USING (l_returnflag) GROUP BY 1""".stripMargin

  // ---- top session paths: the event-sequence signature of each 30-min
  //      session (first 5 event types in time order, '>'-joined), counted
  //      corpus-wide, top 20 by frequency — the "what do users actually
  //      do" path-analysis query. Session labeling shares ONE user-keyed
  //      exchange (the sessionize window pair); the path table is
  //      dictionary-sized and the top-k is orderBy+limit
  //      (TakeOrderedAndProject — never a global single-partition
  //      window); ties at the cut broken by path so the selection is
  //      deterministic in both engines. ----
  def qTopPaths(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("event_type"))
    val labeled = e
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    labeled
      .groupBy(col("user_id"), col("session_idx"))
      .agg(array_join(transform(
        slice(sort_array(collect_list(
          struct(col("ts_us"), col("event_id"), col("event_type")))), 1, 5),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  val oTopPaths: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events),
      |w AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER win IS NULL
      |      OR ts_us - lag(ts_us) OVER win > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM w),
      |p AS (
      |  SELECT user_id, session_idx,
      |    array_to_string(list(event_type ORDER BY ts_us, event_id)[1:5], '>') AS path
      |  FROM s GROUP BY 1, 2),
      |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1)
      |SELECT path, n_sessions FROM c ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  // ---- equi-width histogram: binned value distribution per group, the
  //      profiling primitive q_profile's scalar stats don't give. Exact
  //      integer binning via the round-to-cents trick (both engines bin
  //      identically — no float-boundary drift); one partial-aggregable
  //      hash agg, output is bins-sized. ----
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) DIV 1000000").as("bin"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", (col("bin") * 10000L).cast("double"))

  val oHistogram: String =
    """SELECT l_returnflag,
      |  CAST(round(l_extendedprice * 100) AS BIGINT) // 1000000 AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST((CAST(round(l_extendedprice * 100) AS BIGINT) // 1000000) * 10000
      |    AS DOUBLE) AS bin_lo
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  // ---- last-touch conversion attribution: each purchase attributed to
  //      the latest prior click by the same user, but only within a
  //      2-hour horizon — the productized form of the as-of join
  //      primitive (q_asof_join): horizon gating, revenue carried, and
  //      an attributed verdict per conversion. One user-keyed window
  //      (the carry-forward union trick — never an inequality join) plus
  //      one id-keyed equi-join to bring the revenue back. ----
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Temporal
    val horizonUs = 2L * 3600L * 1000000L
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("event_type"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val matched = Temporal.asofJoin(purchases, clicks,
      keys = Seq("user_id"), tsCol = "ts_us", idCol = "event_id")
    val gated = matched.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts_us"),
      when(col("ts_us") - col("matched_ts") <= horizonUs, col("matched_id"))
        .as("click_id"),
      when(col("ts_us") - col("matched_ts") <= horizonUs,
        col("ts_us") - col("matched_ts")).as("gap_us"))
    gated.join(
        e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("value")),
        "purchase_id")
      .select(col("purchase_id"), col("user_id"), col("ts_us"),
        col("click_id"), col("gap_us"), col("value"),
        col("click_id").isNotNull.as("attributed"))
  }

  val oAttribution: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events),
      |u AS (
      |  SELECT user_id, ts_us, event_id, 1 AS is_ref FROM e WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts_us, event_id, 0 AS is_ref FROM e WHERE event_type = 'purchase'),
      |w AS (SELECT user_id, ts_us, event_id, is_ref,
      |    last_value(CASE WHEN is_ref = 1 THEN event_id END IGNORE NULLS) OVER win AS matched_id,
      |    last_value(CASE WHEN is_ref = 1 THEN ts_us END IGNORE NULLS) OVER win AS matched_ts
      |  FROM u WINDOW win AS (PARTITION BY user_id
      |    ORDER BY ts_us, is_ref DESC, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |g AS (
      |  SELECT event_id AS purchase_id, user_id, ts_us,
      |    CASE WHEN ts_us - matched_ts <= 7200000000 THEN matched_id END AS click_id,
      |    CASE WHEN ts_us - matched_ts <= 7200000000 THEN ts_us - matched_ts END AS gap_us
      |  FROM w WHERE is_ref = 0)
      |SELECT g.purchase_id, g.user_id, g.ts_us, g.click_id, g.gap_us,
      |  e.value, g.click_id IS NOT NULL AS attributed
      |FROM g JOIN e ON e.event_id = g.purchase_id""".stripMargin

  // ---- linear (multi-touch) attribution: every click in the 2-hour
  //      window before a purchase shares the credit equally — the
  //      complement of q_attribution's last-touch rule. The
  //      (click, purchase) pair stage is the binned range join (equi-join
  //      on (user, 30-min bin) + exact BETWEEN — never an inequality
  //      BNLJ); credit = value / n_clicks is emitted PER PAIR with one
  //      deterministic division — summing credits across purchases would
  //      be a float sum whose partition order could differ between
  //      engines, so the materialized assignment IS the graded output. ----
  def qAttributionLinear(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Temporal
    val horizonUs = 2L * 3600L * 1000000L
    val e = events(s, dir).select(col("event_id"), col("user_id"),
      expr("ts DIV 1000").as("ts_us"), col("event_type"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        (col("ts_us") - horizonUs).as("start_us"), col("ts_us").as("end_us"),
        col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us"))
    val pairs = Temporal.rangeJoinBinned(clicks, purchases,
      keys = Seq("user_id"), tsCol = "ts_us",
      startCol = "start_us", endCol = "end_us",
      binMicros = 1800L * 1000000L)
    val perPurchase = pairs.groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"))
    pairs.join(perPurchase, "purchase_id")
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("ts_us").as("click_ts"), col("n_clicks"),
        (col("value") / col("n_clicks").cast("double")).as("credit"))
  }

  val oAttributionLinear: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |    ts_us - 7200000000 AS start_us, ts_us AS end_us, value
      |  FROM e WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, event_id AS click_id, ts_us
      |  FROM e WHERE event_type = 'click'),
      |pairs AS (
      |  SELECT p.purchase_id, p.user_id, c.click_id, c.ts_us AS click_ts, p.value
      |  FROM c JOIN p ON c.user_id = p.user_id
      |    AND c.ts_us BETWEEN p.start_us AND p.end_us),
      |n AS (
      |  SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_clicks
      |  FROM pairs GROUP BY 1)
      |SELECT pairs.purchase_id, user_id, click_id, click_ts, n.n_clicks,
      |  value / CAST(n.n_clicks AS DOUBLE) AS credit
      |FROM pairs JOIN n USING (purchase_id)""".stripMargin

  // ---- sliding-window distinct via HLL register fan-out: 7-day trailing
  //      distinct (user, action) activity pairs, daily. Sliding DISTINCT
  //      doesn't decompose like sliding sums — recounting each window
  //      rescans every event windowDays times; fanning out each day's
  //      <=256 register rows and max-merging per window costs
  //      days×7×256 rows however large the corpus is. The exact recount
  //      rides along as the measurement harness (the q_hll_distinct
  //      pattern); the value is the composite user#event_type so the
  //      per-window cardinality (~750 at sf0.01) sits above the raw
  //      p=8 estimator's ~2.5m small-range bias floor. ----
  def qHllSliding(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketch
    val W = 7
    val e = events(s, dir).select(
      expr("ts DIV 1000 DIV 86400000000").as("day"),
      concat(col("user_id").cast("string"), lit("#"), col("event_type")).as("pair"))
    val est = Sketch.hllSlidingDaily(e, "day", "pair", W)
    // exact side: fan out DISTINCT (day, pair) — the day-grain dedup
    // happens before the ×W expansion, so the harness too stays far
    // smaller than events×W
    val exact = e.select(col("day"), col("pair")).distinct()
      .select(explode(sequence(col("day"), col("day") + (W - 1))).as("win"),
        col("pair"))
      .groupBy(col("win")).agg(countDistinct(col("pair")).as("n_exact"))
    val rel = abs(col("hll_est") - col("n_exact").cast("double")) /
      col("n_exact").cast("double")
    exact.join(est, "win")
      .select(col("win"), col("n_exact"), col("hll_est"),
        rel.as("rel_err"), (rel <= lit(0.195)).as("err_ok"))
  }

  // ---- robust outlier detection via Median Absolute Deviation: the
  //      heavy-tail-safe complement of q_outliers' IQR fences (one wild
  //      value can stretch quartiles; the MAD barely moves). Median and
  //      MAD are interpolated percentiles (bit-compatible with DuckDB
  //      quantile_cont, the q_group_median precedent); the outlier rule
  //      |x - med| > 3*MAD is exact double arithmetic with a rational
  //      multiplier.
  //
  //      Both medians come from the rank-window formulation (the
  //      q_outliers r10 template): `percentile(...)` is a
  //      TypedImperativeAggregate that buffers EVERY group value in a
  //      per-partition OpenHashMap and serializes the maps between
  //      partial and final — 5.7 s at sf0.1 for the two calls here; a
  //      row_number window is one exchange + one codegen'd sort. The
  //      interpolation replays Percentile.getPercentile bit-for-bit:
  //      pos = 0.5*(n-1), (ceil(pos)-pos)*lo + (pos-floor(pos))*hi, with
  //      the floor==ceil and equal-endpoint shortcuts. The second pass
  //      (median of |x-med|) reuses the first exchange's hash(flag)
  //      partitioning — the deviation frame derives from the broadcast
  //      join, so window 2 sorts without re-shuffling, and the final agg
  //      is exchange-free. ----
  def qMadOutliers(s: SparkSession, dir: String): DataFrame = {
    def interp(pos: Column, vLo: Column, vHi: Column): Column =
      when(floor(pos) === ceil(pos) || vLo === vHi, vLo)
        .otherwise((ceil(pos) - pos) * vLo + (pos - floor(pos)) * vHi)
    // per-group interpolated median of `v` via ONE rank window over df
    def groupMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val wOrd = Window.partitionBy("l_returnflag").orderBy(v)
      val wAll = Window.partitionBy("l_returnflag")
      def atFloor = col("_rn") === floor(col("_pos")).cast("long")
      def atCeil = col("_rn") === ceil(col("_pos")).cast("long")
      df
        .withColumn("_rn", row_number().over(wOrd).cast("long") - 1)
        .withColumn("_pos",
          lit(0.5) * (count(lit(1)).over(wAll) - 1).cast("double"))
        .filter(atFloor || atCeil)
        .groupBy(col("l_returnflag"))
        .agg(max(when(atFloor, col(v))).cast("double").as("_lo"),
          max(when(atCeil, col(v))).cast("double").as("_hi"),
          max(col("_pos")).as("_p"))
        .select(col("l_returnflag"),
          interp(col("_p"), col("_lo"), col("_hi")).as(out))
    }
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    // the 3-row median table is referenced by BOTH the MAD pass and the
    // final aggregate; without truncation each reference replays the
    // median's corpus-scale window (no cross-branch plan reuse in Spark) —
    // checkpointing 3 rows costs nothing and halves the query
    val med = graft.util.Checkpoints.truncate(groupMedian(li, "x", "med"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = groupMedian(dev.select(col("l_returnflag"), col("adev")), "adev", "mad")
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  val oMadOutliers: String =
    """WITH li AS (SELECT l_returnflag, l_extendedprice AS x FROM lineitem),
      |med AS (
      |  SELECT l_returnflag, quantile_cont(x, 0.5) AS med FROM li GROUP BY 1),
      |d AS (
      |  SELECT li.l_returnflag, x, abs(x - med) AS adev, med
      |  FROM li JOIN med USING (l_returnflag)),
      |m AS (
      |  SELECT l_returnflag, max(med) AS med, quantile_cont(adev, 0.5) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  max(m.med) AS med, max(m.mad) AS mad,
      |  CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM d JOIN m USING (l_returnflag) GROUP BY 1""".stripMargin

  private val H32 = "('0x' || substr(md5(%s), 1, 8))::BIGINT"

  val oHllSliding: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(user_id AS VARCHAR) || '#' || event_type AS pair
       |  FROM events),
       |mx AS (SELECT max(day) AS mx FROM e),
       |h AS (SELECT day, ${H32.format("pair")} AS h FROM e),
       |r AS (
       |  SELECT day, h // 16777216 AS j,
       |    CASE WHEN h % 16777216 = 0 THEN 25
       |         ELSE 25 - length(bin(h % 16777216)) END AS rho
       |  FROM h),
       |m AS (SELECT day, j, max(rho) AS mj FROM r GROUP BY 1, 2),
       |f AS (
       |  SELECT unnest(range(day, day + 7)) AS win, j, mj FROM m),
       |fm AS (
       |  SELECT win, j, max(mj) AS mj FROM f, mx WHERE win <= mx.mx
       |  GROUP BY 1, 2),
       |sm AS (
       |  SELECT win, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(1::BIGINT << (25 - mj)) AS BIGINT) AS sp
       |  FROM fm GROUP BY 1),
       |est AS (
       |  SELECT win,
       |    (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
       |      * 65536.0::DOUBLE * 33554432.0::DOUBLE
       |      / CAST((256 - c) * 33554432 + sp AS DOUBLE) AS hll_est
       |  FROM sm),
       |dp AS (SELECT DISTINCT day, pair FROM e),
       |xf AS (SELECT unnest(range(day, day + 7)) AS win, pair FROM dp),
       |x AS (
       |  SELECT win, CAST(count(DISTINCT pair) AS BIGINT) AS n_exact
       |  FROM xf, mx WHERE win <= mx.mx GROUP BY 1)
       |SELECT win, n_exact, hll_est,
       |  abs(hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err,
       |  (abs(hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE))
       |    <= 0.195::DOUBLE AS err_ok
       |FROM x JOIN est USING (win)""".stripMargin

  // ---- winnowing (MOSS) fingerprint overlap: partial-copy detection
  //      via window-min k-gram hashes, stop-fingerprint capped ----
  def qWinnow(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.winnowPairs(t(s, dir, "documents"))

  val oWinnow: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |hs AS (SELECT doc_id,
      |  list_transform(range(1, len(tk) - 2), i ->
      |    ('0x' || substr(md5(array_to_string(tk[i:i+3], ' ')), 1, 8))::BIGINT) AS h
      |  FROM toks WHERE len(tk) >= 4),
      |fp AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(h) >= 4
      |    THEN list_transform(range(1, len(h) - 2), j -> list_min(h[j:j+3]))
      |    ELSE [list_min(h)] END)) AS f
      |  FROM hs),
      |df AS (SELECT f, count(*) AS d FROM fp GROUP BY 1),
      |keep AS (SELECT fp.doc_id, fp.f FROM fp JOIN df USING (f) WHERE d <= 20)
      |SELECT a_id, b_id, shared FROM (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(count(*) AS BIGINT) AS shared
      |  FROM keep a JOIN keep b ON a.f = b.f AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |WHERE shared >= 2""".stripMargin

  // ---- label propagation (deterministic LPA, 2 synchronous rounds) over
  //      the order↔supplier bipartite graph; oracle unrolls both rounds
  //      with a row_number argmax (cnt DESC, lbl ASC) ----
  def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
    graft.operators.Graph.labelPropagation(li, iters = 2)
  }

  val oLabelProp: String = {
    def round(cIn: String, i: String) =
      s"""c$i AS (
         |  SELECT n.node, l.lbl, count(*) AS cnt
         |  FROM nbr n JOIN $cIn l ON n.peer = l.node GROUP BY 1, 2),
         |r$i AS (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1)"""
    s"""WITH e0 AS (
       |  SELECT DISTINCT l_orderkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM lineitem),
       |nbr AS (SELECT a AS node, b AS peer FROM e0
       |        UNION ALL SELECT b, a FROM e0),
       |l0 AS (SELECT node, node AS lbl FROM (SELECT DISTINCT node FROM nbr)),
       |${round("l0", "1")},
       |${round("r1", "2")}
       |SELECT node, lbl AS label FROM r2""".stripMargin
  }

  // ---- differentially-private histogram (geometric mechanism, seeded
  //      trailing-zero noise, noisy-threshold suppression) ----
  def qDpCounts(s: SparkSession, dir: String): DataFrame =
    graft.operators.TrainPrep.dpCounts(t(s, dir, "documents"), "lang", "source",
      threshold = 5L)

  val oDpCounts: String = {
    def geo(h: String) = {
      val arms = (1 to 11).map { k =>
        val m = 1L << (k + 1); s"WHEN $h % $m = ${m >> 1} THEN $k"
      }.mkString(" ")
      s"CASE WHEN $h % 2 = 1 THEN 0 $arms ELSE 12 END"
    }
    s"""WITH c AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2),
       |h AS (
       |  SELECT lang, source, n,
       |    ('0x' || substr(md5('101#' || lang || '|' || source), 1, 8))::BIGINT AS h1,
       |    ('0x' || substr(md5('202#' || lang || '|' || source), 1, 8))::BIGINT AS h2
       |  FROM c),
       |g AS (
       |  SELECT lang, source, n,
       |    ${geo("h1")} AS g1,
       |    ${geo("h2")} AS g2
       |  FROM h)
       |SELECT lang, source, n + (g1 - g2) AS noisy_n,
       |  CAST(g1 - g2 AS BIGINT) AS noise
       |FROM g WHERE n + (g1 - g2) >= 5""".stripMargin
  }

  // ---- RAKE keyword extraction (2^20 fixed-point word scores, top-50
  //      phrases; ties broken on phrase text) ----
  def qRake(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.rakeKeywords(t(s, dir, "documents"))

  val oRake: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(range(0, len(t))) AS pos, unnest(t) AS tok
      |        FROM toks),
      |m AS (SELECT doc_id, pos, tok,
      |        (tok IN ('the','a','of','and','to','in','is')) AS stop
      |      FROM tok),
      |p AS (SELECT doc_id, pos, tok, stop,
      |        sum(CASE WHEN stop THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY doc_id ORDER BY pos
      |                ROWS UNBOUNDED PRECEDING) AS pid
      |      FROM m),
      |words AS (SELECT doc_id, pid, pos, tok FROM p WHERE NOT stop),
      |phr AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen,
      |          string_agg(tok, ' ' ORDER BY pos) AS phrase
      |        FROM words GROUP BY 1, 2 HAVING count(*) <= 4),
      |mem AS (SELECT w.doc_id, w.pid, w.tok, ph.plen
      |        FROM words w JOIN phr ph ON w.doc_id = ph.doc_id AND w.pid = ph.pid),
      |ws AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq,
      |         CAST(sum(plen) AS BIGINT) AS deg
      |       FROM mem GROUP BY 1),
      |wsc AS (SELECT tok, (deg * 1048576) // freq AS wscore FROM ws),
      |ps AS (SELECT m.doc_id, m.pid, CAST(sum(wscore) AS BIGINT) AS score
      |       FROM mem m JOIN wsc USING (tok) GROUP BY 1, 2)
      |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ, max(score) AS score
      |FROM phr JOIN ps USING (doc_id, pid)
      |GROUP BY phrase ORDER BY score DESC, phrase LIMIT 50""".stripMargin

  // ---- greedy k-center coreset (farthest-point traversal, k=5, seed =
  //      min vec_id; oracle unrolls all four argmax rounds) ----
  def qKcenterCoreset(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.kCenterCoreset(t(s, dir, "embeddings"), k = 5)

  val oKcenterCoreset: String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), " +
        s"i -> $x[i]::DOUBLE * $y[i]::DOUBLE)), (acc, v) -> acc + v)"
    def cosd(x: String, y: String) =
      s"(1.0::DOUBLE - ${dot(x, y)} / (sqrt(${dot(x, x)}) * sqrt(${dot(y, y)})))"
    def round(i: Int) =
      s"""s$i AS (SELECT vec_id, embedding, mind FROM m${i - 1}
         |       ORDER BY mind DESC, vec_id LIMIT 1),
         |m$i AS (SELECT m.vec_id, m.embedding,
         |         least(m.mind, ${cosd("m.embedding", "s.embedding")}) AS mind
         |       FROM m${i - 1} m, s$i s)"""
    s"""WITH c1 AS (SELECT vec_id, embedding FROM embeddings
       |            ORDER BY vec_id LIMIT 1),
       |m1 AS (SELECT e.vec_id, e.embedding,
       |         ${cosd("e.embedding", "c.embedding")} AS mind
       |       FROM embeddings e, c1 c),
       |${round(2)},
       |${round(3)},
       |${round(4)},
       |${round(5)}
       |SELECT 1 AS round, vec_id, 0.0::DOUBLE AS radius FROM c1
       |UNION ALL SELECT 2, vec_id, mind FROM s2
       |UNION ALL SELECT 3, vec_id, mind FROM s3
       |UNION ALL SELECT 4, vec_id, mind FROM s4
       |UNION ALL SELECT 5, vec_id, mind FROM s5""".stripMargin
  }

  // ---- T5 span corruption: hash-seeded masks, contiguous runs collapse
  //      to sentinels; input/target pair per document ----
  def qSpanCorruption(s: SparkSession, dir: String): DataFrame =
    graft.operators.TrainPrep.spanCorruption(t(s, dir, "documents"))

  val oSpanCorruption: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(range(0, len(t))) AS pos, unnest(t) AS tok
      |        FROM toks),
      |m0 AS (SELECT doc_id, pos, tok,
      |  ('0x' || substr(md5(doc_id || '#' || pos), 1, 8))::BIGINT % 100 < 15 AS m
      |  FROM tok),
      |r0 AS (SELECT *, m AND NOT coalesce(lag(m) OVER w, false) AS run_start
      |       FROM m0 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |r1 AS (SELECT *,
      |  CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS rid
      |  FROM r0),
      |e AS (SELECT doc_id, pos, m, rid,
      |  CASE WHEN NOT m THEN tok
      |       WHEN run_start THEN '<X' || rid || '>' END AS ein,
      |  CASE WHEN m AND run_start THEN '<X' || rid || '> ' || tok
      |       WHEN m THEN tok END AS etgt
      |  FROM r1)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
      |  coalesce(max(CASE WHEN m THEN rid END), 0) AS n_spans,
      |  coalesce(string_agg(ein, ' ' ORDER BY pos) FILTER (ein IS NOT NULL), '')
      |    AS input_text,
      |  coalesce(string_agg(etgt, ' ' ORDER BY pos) FILTER (etgt IS NOT NULL), '')
      |    AS target_text
      |FROM e GROUP BY doc_id""".stripMargin

  // ---- CM-sketch join-size estimation (inner product, min over seeds):
  //      an FK join (collision-dominated at w=512 — the BOUND is the
  //      guarantee) and a dimension join (collision-free — est = exact) ----
  def qJoinSizeEst(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketch
    val li = t(s, dir, "lineitem").select(col("l_orderkey").as("token"))
    val ord = t(s, dir, "orders").select(col("o_orderkey").as("token"))
    val cust = t(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("token"))
    val supp = t(s, dir, "supplier")
      .select(col("s_nationkey").cast("long").as("token"))
    Sketch.cmsJoinSizeEstimate(li, ord).withColumn("pair", lit("order_fk"))
      .unionByName(Sketch.cmsJoinSizeEstimate(cust, supp)
        .withColumn("pair", lit("nation_dim")))
  }

  val oJoinSizeEst: String = {
    def half(tag: String, aSel: String, bSel: String) =
      s"""a_$tag AS ($aSel),
         |b_$tag AS ($bSel),
         |sa_$tag AS (
         |  SELECT seed,
         |    ('0x' || substr(md5(seed::VARCHAR || '#' || token::VARCHAR), 1, 8))::BIGINT % 512 AS bucket,
         |    count(*) AS ca
         |  FROM a_$tag CROSS JOIN sd GROUP BY 1, 2),
         |sb_$tag AS (
         |  SELECT seed,
         |    ('0x' || substr(md5(seed::VARCHAR || '#' || token::VARCHAR), 1, 8))::BIGINT % 512 AS bucket,
         |    count(*) AS cb
         |  FROM b_$tag CROSS JOIN sd GROUP BY 1, 2),
         |dot_$tag AS (
         |  SELECT seed, CAST(sum(ca * cb) AS BIGINT) AS dot
         |  FROM sa_$tag JOIN sb_$tag USING (seed, bucket) GROUP BY 1),
         |est_$tag AS (SELECT min(dot) AS est_join FROM dot_$tag),
         |ex_$tag AS (
         |  SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS exact_join
         |  FROM (SELECT token, count(*) AS na FROM a_$tag GROUP BY 1) x
         |  JOIN (SELECT token, count(*) AS nb FROM b_$tag GROUP BY 1) y
         |    USING (token)),
         |sz_$tag AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a_$tag) AS n_a,
         |         (SELECT CAST(count(*) AS BIGINT) FROM b_$tag) AS n_b),
         |r_$tag AS (
         |  SELECT est_join, exact_join, n_a, n_b,
         |    est_join - exact_join AS overest,
         |    est_join >= exact_join AS never_under,
         |    est_join <= exact_join + (3 * n_a * n_b) // 512 AS bound_ok,
         |    '$tag' AS pair
         |  FROM est_$tag, ex_$tag, sz_$tag)"""
    s"""WITH sd AS (SELECT unnest([0, 1, 2, 3]) AS seed),
       |${half("order_fk", "SELECT l_orderkey AS token FROM lineitem",
                "SELECT o_orderkey AS token FROM orders")},
       |${half("nation_dim",
                "SELECT CAST(c_nationkey AS BIGINT) AS token FROM customer",
                "SELECT CAST(s_nationkey AS BIGINT) AS token FROM supplier")}
       |SELECT * FROM r_order_fk UNION ALL SELECT * FROM r_nation_dim""".stripMargin
  }

  // ---- distinct l-diversity: groups with < 3 distinct wealth bands get
  //      their quasi-identifiers suppressed (homogeneity-attack guard) ----
  def qLDiversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.TrainPrep.lDiversity(t(s, dir, "customer"),
      idCol = "c_custkey", qi1 = "c_nationkey", qi2 = "c_mktsegment",
      sensitive = floor(col("c_acctbal") / 4000).cast("long"), l = 3)

  val oLDiversity: String =
    """WITH d AS (
      |  SELECT c_custkey, c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 4000) AS BIGINT) AS sv
      |  FROM customer),
      |g AS (SELECT c_nationkey, c_mktsegment,
      |        CAST(count(DISTINCT sv) AS BIGINT) AS ldiv
      |      FROM d GROUP BY 1, 2)
      |SELECT c_custkey,
      |  CASE WHEN ldiv >= 3 THEN CAST(c_nationkey AS VARCHAR) ELSE '*' END AS gen_q1,
      |  CASE WHEN ldiv >= 3 THEN c_mktsegment ELSE '*' END AS gen_q2,
      |  CAST(ldiv >= 3 AS INT) AS released, ldiv
      |FROM d JOIN g USING (c_nationkey, c_mktsegment)""".stripMargin

  // ---- tf-weighted MinHash near-dup pairs (bigram weights capped at 3,
  //      16 hashes in 4 bands; banding candidates verified by EXACT
  //      weighted Jaccard — the oracle replays both halves) ----
  def qDedupMinhashWeighted(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.weightedMinhashPairs(t(s, dir, "documents"))

  val oDedupMinhashWeighted: String = {
    val mins = (0 until 16).map(h =>
      s"min(('0x' || substr(md5('$h#' || e || '#' || occ), 1, 8))::BIGINT) AS h$h")
      .mkString(",\n    ")
    val bandSel = (0 until 4).map { b =>
      val key = (0 until 4).map(i => s"h${b * 4 + i}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  unnest(list_transform(range(1, len(t)),
       |    i -> array_to_string(t[i:i+1], ' '))) AS e
       |  FROM toks),
       |tf AS (SELECT doc_id, e, least(count(*), 3) AS w FROM sh GROUP BY 1, 2),
       |rep AS (SELECT doc_id, e, unnest(range(1, w + 1)) AS occ FROM tf),
       |sig AS (SELECT doc_id,
       |    $mins
       |  FROM rep GROUP BY doc_id),
       |bands AS (
       |  $bandSel),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id),
       |tw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tw FROM tf GROUP BY 1),
       |inter AS (
       |  SELECT c.a_id, c.b_id, CAST(sum(least(x.w, y.w)) AS BIGINT) AS n_min
       |  FROM cand c
       |  JOIN tf x ON x.doc_id = c.a_id
       |  JOIN tf y ON y.doc_id = c.b_id AND y.e = x.e
       |  GROUP BY 1, 2)
       |SELECT i.a_id, i.b_id, i.n_min, ta.tw AS tw_a, tb.tw AS tw_b,
       |  CAST(i.n_min AS DOUBLE) / CAST(ta.tw + tb.tw - i.n_min AS DOUBLE) AS jw
       |FROM inter i
       |JOIN tw ta ON i.a_id = ta.doc_id
       |JOIN tw tb ON i.b_id = tb.doc_id
       |WHERE CAST(i.n_min AS DOUBLE) / CAST(ta.tw + tb.tw - i.n_min AS DOUBLE)
       |  >= 0.5::DOUBLE""".stripMargin
  }

  // ---- deterministic epoch shuffle: per-shard summary of the derived
  //      training order (the assignment is a pure projection; the summary
  //      is the one hash agg). order_sig pins membership, and membership
  //      pins the order because the order is SORTED by (sort_key, id) ----
  def qShardShuffle(s: SparkSession, dir: String): DataFrame =
    graft.operators.TrainPrep.shuffleShards(t(s, dir, "documents"), "doc_id",
      nShards = 16, epoch = 1)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("sort_key")).as("min_key"), max(col("sort_key")).as("max_key"),
        expr("bit_xor(sort_key * 1000003 + doc_id)").as("order_sig"))

  val oShardShuffle: String =
    """WITH a AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('1#' || doc_id), 1, 8))::BIGINT AS k
      |  FROM documents),
      |s AS (SELECT doc_id, k, CAST(k % 16 AS INTEGER) AS shard FROM a)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  min(k) AS min_key, max(k) AS max_key,
      |  bit_xor(k * 1000003 + doc_id) AS order_sig
      |FROM s GROUP BY shard""".stripMargin

  // ---- Fellegi–Sunter record linkage: (nation, segment) blocking +
  //      integer agreement weights, link threshold 20 ----
  def qRecordLinkage(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.scoredPairs(t(s, dir, "customer"))

  val oRecordLinkage: String =
    """WITH base AS (
      |  SELECT c_custkey AS key, c_nationkey AS nk, c_mktsegment AS seg,
      |         c_acctbal AS bal, c_name AS nm
      |  FROM customer),
      |ok AS (SELECT nk, seg FROM base GROUP BY 1, 2
      |       HAVING count(*) BETWEEN 2 AND 2000),
      |b AS (SELECT base.* FROM base JOIN ok USING (nk, seg)),
      |p AS (
      |  SELECT x.key AS a_key, y.key AS b_key,
      |    (CASE WHEN abs(x.bal - y.bal) < 100 THEN 24
      |          WHEN abs(x.bal - y.bal) < 1000 THEN 8 ELSE -12 END
      |     + CASE WHEN right(x.nm, 2) = right(y.nm, 2) THEN 10 ELSE -6 END
      |     + CASE WHEN floor(x.bal / 1000) = floor(y.bal / 1000)
      |            THEN 6 ELSE -2 END) AS score
      |  FROM b x JOIN b y ON x.nk = y.nk AND x.seg = y.seg AND x.key < y.key)
      |SELECT a_key, b_key, CAST(score AS INTEGER) AS score
      |FROM p WHERE score >= 20""".stripMargin

  // ---- per-source boilerplate scrub (C4/RefinedWeb cleaning): chunks
  //      repeating across >= n_docs/20 documents of the SAME source are
  //      boilerplate; fractional threshold, (source, chunk)-keyed aggs ----
  def qBoilerplateScrub(s: SparkSession, dir: String): DataFrame =
    graft.operators.TrainPrep.boilerplateScrub(
      t(s, dir, "documents"), k = 10, denom = 20L)

  val oBoilerplateScrub: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 10),
      |ch AS (
      |  SELECT doc_id, source,
      |    unnest(range(0, len(t) // 10)) AS pos,
      |    unnest(list_transform(range(0, len(t) // 10),
      |      i -> array_to_string(t[i*10+1:i*10+10], ' '))) AS chunk
      |  FROM toks),
      |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |       FROM toks GROUP BY 1),
      |dfc AS (SELECT source, chunk,
      |          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |        FROM ch GROUP BY 1, 2),
      |boiler AS (
      |  SELECT source, chunk FROM dfc JOIN nd USING (source)
      |  WHERE df * 20 >= n_docs)
      |SELECT ch.doc_id, ch.source,
      |  CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_boiler,
      |  CAST(count(*) - sum(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept
      |FROM ch LEFT JOIN boiler b
      |  ON ch.source = b.source AND ch.chunk = b.chunk
      |GROUP BY 1, 2""".stripMargin

  // ---- TPC-H Q7 shape: bidirectional nation-pair shipping volume by
  //      ship year. Small dims broadcast (supplier, customer, nation x2),
  //      the fact scan carries only cents-exact units; one hash agg ----
  def qTpchQ7(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("vol_u"))
    val sup = t(s, dir, "supplier")
      .filter(col("s_nationkey").isin(1, 2))
      .select(col("s_suppkey"), col("s_nationkey"))
    val cust = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(1, 2))
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(
        concat(lit("NATION_"), col("s_nationkey").cast("string")).as("supp_nation"),
        concat(lit("NATION_"), col("c_nationkey").cast("string")).as("cust_nation"),
        col("l_year"))
      .agg(sum(col("vol_u")).as("vol_units"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (col("vol_units").cast("double") / lit(10000.0)).as("volume"))
  }

  val oTpchQ7: String =
    """SELECT 'NATION_' || s.s_nationkey::VARCHAR AS supp_nation,
      |  'NATION_' || c.c_nationkey::VARCHAR AS cust_nation,
      |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT) *
      |           (100 - CAST(floor(l.l_discount * 100) AS BIGINT)))
      |    AS BIGINT)::DOUBLE / 10000.0::DOUBLE AS volume
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |  AND s.s_nationkey IN (1, 2) AND c.c_nationkey IN (1, 2)
      |  AND s.s_nationkey <> c.c_nationkey
      |GROUP BY 1, 2, 3""".stripMargin

  // ---- TPC-H Q13 shape: orders-per-customer distribution with a
  //      filtered LEFT join (customers with zero qualifying orders count
  //      at c_count = 0). Join keyed on custkey, then two integer aggs ----
  def qTpchQ13(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val oTpchQ13: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1""".stripMargin

  // ---- bounded-round k-core peeling on the order–supplier graph
  //      (k=4, 3 rounds; oracle unrolls the identical state) ----
  def qKcore(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    graft.operators.Graph.kCore(li, k = 4, rounds = 3)
  }

  val oKcore: String =
    """WITH e0 AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
      |    UNION ALL
      |    SELECT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem)),
      |k1 AS (SELECT src FROM e0 GROUP BY 1 HAVING count(*) >= 4),
      |e1 AS (SELECT e0.src, e0.dst FROM e0
      |       JOIN k1 a ON e0.src = a.src JOIN k1 b ON e0.dst = b.src),
      |k2 AS (SELECT src FROM e1 GROUP BY 1 HAVING count(*) >= 4),
      |e2 AS (SELECT e1.src, e1.dst FROM e1
      |       JOIN k2 a ON e1.src = a.src JOIN k2 b ON e1.dst = b.src),
      |k3 AS (SELECT src FROM e2 GROUP BY 1 HAVING count(*) >= 4),
      |e3 AS (SELECT e2.src, e2.dst FROM e2
      |       JOIN k3 a ON e2.src = a.src JOIN k3 b ON e2.dst = b.src)
      |SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
      |FROM e3 GROUP BY 1""".stripMargin

  // ---- degree assortativity of the same graph: exact DECIMAL moments,
  //      one final double expression (identical operation order) ----
  def qAssortativity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    graft.operators.Graph.assortativity(li)
  }

  val oAssortativity: String =
    """WITH e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
      |    UNION ALL
      |    SELECT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem)),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
      |j AS (
      |  SELECT dx.d AS dx, dy.d AS dy FROM e
      |  JOIN deg dx ON e.src = dx.src JOIN deg dy ON e.dst = dy.src),
      |mo AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS m,
      |    CAST(sum(dx) AS HUGEINT) AS sx, CAST(sum(dy) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS HUGEINT) AS syy
      |  FROM j)
      |SELECT CAST(m AS BIGINT) AS n_edges,
      |  CAST(m * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS r
      |FROM mo""".stripMargin

  // ---- domain-level vocabulary overlap: pairwise Jaccard of the
  //      token SETS of every source pair — the dataset-curation "how
  //      much do these domains repeat each other" matrix. Token-keyed
  //      equi-join; the pair fan-out per token is (sources containing
  //      it)², bounded by the SOURCE count, not the corpus — the
  //      bounded-domain-pair regime (like corrMatrix's label pairs) ----
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val sizes = tok.groupBy(col("source")).agg(count(lit(1)).as("n"))
    tok.select(col("source").as("a_src"), col("token"))
      .join(tok.select(col("source").as("b_src"), col("token")), "token")
      .filter(col("a_src") < col("b_src"))
      .groupBy(col("a_src"), col("b_src"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("source").as("a_src"), col("n").as("n_a")), "a_src")
      .join(sizes.select(col("source").as("b_src"), col("n").as("n_b")), "b_src")
      .select(col("a_src"), col("b_src"), col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
  }

  val oSourceOverlap: String =
    """WITH tok AS (
      |  SELECT DISTINCT source, token FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token
      |    FROM documents)),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
      |          FROM tok GROUP BY 1),
      |i AS (
      |  SELECT a.source AS a_src, b.source AS b_src,
      |    CAST(count(*) AS BIGINT) AS n_inter
      |  FROM tok a JOIN tok b ON a.token = b.token AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT a_src, b_src, n_inter, sa.n AS n_a, sb.n AS n_b,
      |  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
      |    AS jaccard
      |FROM i
      |JOIN sizes sa ON i.a_src = sa.source
      |JOIN sizes sb ON i.b_src = sb.source""".stripMargin

  // ---- TPC-H Q22 shape: "wealthy but inactive" — customers above the
  //      global positive-balance mean (exact cents-integer mean, one
  //      broadcast scalar) with NO orders (left-anti join), counted per
  //      nation. The scalar mean comparison is exact: bal_cents * n_pos
  //      > sum_cents avoids the division entirely ----
  def qTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey"),
      col("c_nationkey"), floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val avgPos = cust.filter(col("bal_c") > 0L)
      .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("n_pos"))
    // "inactive" = no order since 2000 (every customer has SOME order in
    // the synthetic data; the unrestricted anti-join is empty)
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_c") * col("n_pos") > col("sum_c"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
      .select(col("c_nationkey"), col("numcust"),
        (col("totacctbal_c").cast("double") / lit(100.0)).as("totacctbal"))
  }

  val oTpchQ22: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer),
      |a AS (
      |  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
      |    CAST(count(*) AS BIGINT) AS n_pos
      |  FROM cust WHERE bal_c > 0)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(bal_c) AS BIGINT)::DOUBLE / 100.0::DOUBLE AS totacctbal
      |FROM cust CROSS JOIN a
      |WHERE bal_c * n_pos > sum_c
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = cust.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1""".stripMargin

  // ---- TPC-H Q8 shape: national market share within a region for one
  //      part type. All dims broadcast; the fact scan carries cents-exact
  //      volume units; numerator and denominator are exact integer sums
  //      with ONE final double division per year ----
  def qTpchQ8(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val asia = t(s, dir, "nation").filter(col("n_regionkey") === 2)
      .select(col("n_nationkey"))
    val cust = t(s, dir, "customer")
      .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("vol_u"))
    li.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("s_nationkey") === 10, col("vol_u")).otherwise(0L))
          .as("num_u"),
        sum(col("vol_u")).as("den_u"))
      .select(col("o_year"),
        (col("num_u").cast("double") / col("den_u").cast("double"))
          .as("mkt_share"),
        (col("den_u").cast("double") / lit(10000.0)).as("total_volume"))
  }

  val oTpchQ8: String =
    """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CASE WHEN s.s_nationkey = 10 THEN
      |      CAST(floor(l.l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(floor(l.l_discount * 100) AS BIGINT)) ELSE 0 END)
      |    AS BIGINT)::DOUBLE /
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(floor(l.l_discount * 100) AS BIGINT)))
      |    AS BIGINT)::DOUBLE AS mkt_share,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(floor(l.l_discount * 100) AS BIGINT)))
      |    AS BIGINT)::DOUBLE / 10000.0::DOUBLE AS total_volume
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_regionkey = 2
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1""".stripMargin

  // ---- TPC-H Q10 shape: returned-item revenue per customer for one
  //      quarter. Customer/nation dims broadcast; one hash agg keyed by
  //      customer; acctbal carried as exact cents ----
  def qTpchQ10(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("vol_u"))
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_c"))
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("acctbal_c"),
        col("n_name"))
      .agg(sum(col("vol_u")).as("rev_u"))
      .select(col("c_custkey"), col("c_name"),
        (col("acctbal_c").cast("double") / lit(100.0)).as("acctbal"),
        col("n_name"),
        (col("rev_u").cast("double") / lit(10000.0)).as("revenue"))
  }

  val oTpchQ10: String =
    """SELECT c.c_custkey, c.c_name,
      |  CAST(floor(c.c_acctbal * 100) AS BIGINT)::DOUBLE / 100.0::DOUBLE
      |    AS acctbal,
      |  n.n_name,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(floor(l.l_discount * 100) AS BIGINT)))
      |    AS BIGINT)::DOUBLE / 10000.0::DOUBLE AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY 1, 2, 3, 4""".stripMargin

  // ---- TPC-H Q15 shape: top supplier(s) by quarterly revenue. The
  //      per-supplier revenue aggregate is checkpointed once (the max
  //      self-reference would otherwise replan and rescan the subtree),
  //      then the 1-row max is broadcast back ----
  def qTpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.util.Checkpoints.truncate(
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(
          floor(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev_u")))
    val top = rev.agg(max(col("rev_u")).as("max_u"))
    rev.join(broadcast(top), col("rev_u") === col("max_u"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_u").cast("double") / lit(10000.0)).as("total_revenue"))
  }

  val oTpchQ15: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT) *
      |        (100 - CAST(floor(l_discount * 100) AS BIGINT)))
      |      AS BIGINT) AS rev_u
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name,
      |  r.rev_u::DOUBLE / 10000.0::DOUBLE AS total_revenue
      |FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE r.rev_u = (SELECT max(rev_u) FROM revenue)""".stripMargin

  // ---- TPC-H Q16 shape over the lineitem-derived supplier-part pairs
  //      (this schema ships no partsupp table): distinct suppliers per
  //      (brand, type, size), excluding negative-balance suppliers (the
  //      complaints stand-in). Pair distinct is one hash agg; both dims
  //      broadcast ----
  def qTpchQ16(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
    val pairs = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excl = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val pf = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#13" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    pairs
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val oTpchQ16: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  CAST(count(DISTINCT sp.l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
      |JOIN part p ON sp.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#13'
      |  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
      |  AND sp.l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  // ---- TPC-H Q17 shape: small-quantity-order revenue for one brand.
  //      The avg-quantity correlated subquery becomes a per-part hash agg
  //      joined back; qty < 0.2*avg is the exact integer inequality
  //      5*qty*cnt < sum_qty (quantities are integer-valued) ----
  def qTpchQ17(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    val li = t(s, dir, "lineitem")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val avgq = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(broadcast(avgq), col("l_partkey") === col("a_partkey"))
      .filter(col("qty") * lit(5L) * col("cnt") < col("sum_qty"))
      .agg(count(lit(1)).as("n_small"),
        sum(col("price_c")).as("price_sum_c"))
      .select(col("n_small"),
        (col("price_sum_c").cast("double") / lit(700.0)).as("avg_yearly"))
  }

  val oTpchQ17: String =
    """WITH li AS (
      |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
      |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |    AND p.p_brand = 'Brand#13'),
      |a AS (
      |  SELECT l_partkey AS a_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM li GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_small,
      |  CAST(sum(price_c) AS BIGINT)::DOUBLE / 700.0::DOUBLE AS avg_yearly
      |FROM li JOIN a ON li.l_partkey = a.a_partkey
      |WHERE qty * 5 * cnt < sum_qty""".stripMargin

  // ---- Mann–Whitney U: does the A-return cohort's quantity distribution
  //      dominate the R-return cohort's? Histogram pair counting, exact
  //      tie-corrected variance, one mirrored double expression ----
  def qMannWhitney(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.mannWhitneyU(
      t(s, dir, "lineitem"), "l_quantity", "l_returnflag", "A", "R")

  val oMannWhitney: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS n2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |sc AS (
      |  SELECT v, n1, n2, n1 + n2 AS t,
      |    COALESCE(CAST(sum(n1 + n2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS cum
      |  FROM hist),
      |a AS (
      |  SELECT CAST(sum(n1) AS BIGINT) AS na, CAST(sum(n2) AS BIGINT) AS nb,
      |    sum(CAST(n1 AS HUGEINT) * (2 * cum + t + 1)) AS r1x2,
      |    sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
      |      - CAST(t AS HUGEINT)) AS tsum
      |  FROM sc)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(r1x2 - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u1_x2,
      |  CAST(r1x2 - CAST(na AS HUGEINT) * (na + 1)
      |      - CAST(na AS HUGEINT) * nb AS DOUBLE) /
      |    (2.0::DOUBLE * sqrt(
      |      CAST(CAST(na AS HUGEINT) * nb *
      |        (CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb)
      |          - (na + nb) - tsum) AS DOUBLE) /
      |      CAST(12 * CAST(na + nb AS HUGEINT) * (na + nb - 1) AS DOUBLE)))
      |    AS z
      |FROM a""".stripMargin

  // ---- Kendall tau-b: monotone association between quantity and line
  //      number via the joint-value histogram (cell x cell pair counting,
  //      never corpus pairs) ----
  def qKendallTau(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.kendallTauB(
      t(s, dir, "lineitem"), "l_quantity", "l_linenumber")

  val oKendallTau: String =
    """WITH cells AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(l_linenumber AS BIGINT) AS y,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (
      |  SELECT
      |    sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c
      |      ELSE 0 END) AS conc,
      |    sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c
      |      ELSE 0 END) AS disc
      |  FROM cells a JOIN cells b ON a.x < b.x),
      |xm AS (
      |  SELECT sum(CAST(tx AS HUGEINT) * (tx - 1)) AS tiex2,
      |    CAST(sum(tx) AS HUGEINT) AS n
      |  FROM (SELECT CAST(sum(c) AS BIGINT) AS tx FROM cells GROUP BY x)),
      |ym AS (
      |  SELECT sum(CAST(ty AS HUGEINT) * (ty - 1)) AS tiey2
      |  FROM (SELECT CAST(sum(c) AS BIGINT) AS ty FROM cells GROUP BY y))
      |SELECT CAST(n AS BIGINT) AS n, CAST(conc AS BIGINT) AS conc,
      |  CAST(disc AS BIGINT) AS disc,
      |  2.0::DOUBLE * CAST(conc - disc AS DOUBLE) /
      |    (sqrt(CAST(n * (n - 1) - tiex2 AS DOUBLE)) *
      |      sqrt(CAST(n * (n - 1) - tiey2 AS DOUBLE))) AS tau_b
      |FROM p CROSS JOIN xm CROSS JOIN ym""".stripMargin

  // ---- Cochran–Armitage trend: is order finality monotonically
  //      associated with the priority tier? One bounded hash agg, exact
  //      moments, one mirrored z expression ----
  def qTrendTest(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      substring(col("o_orderpriority"), 1, 1).cast("int").as("w"),
      (col("o_orderstatus") === "F").as("y"))
    graft.operators.Stats.trendTest(base, "w", "y")
  }

  val oTrendTest: String =
    """WITH rows0 AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |g AS (
      |  SELECT w, CAST(sum(y) AS BIGINT) AS a,
      |    CAST(count(*) AS BIGINT) AS ni
      |  FROM rows0 GROUP BY 1),
      |m AS (
      |  SELECT CAST(sum(a) AS HUGEINT) AS r1,
      |    CAST(sum(ni) AS HUGEINT) AS nn,
      |    sum(CAST(w AS HUGEINT) * a) AS swa,
      |    sum(CAST(w AS HUGEINT) * (ni - a)) AS swb,
      |    sum(CAST(w AS HUGEINT) * ni) AS swn,
      |    sum(CAST(w AS HUGEINT) * w * ni) AS sw2n
      |  FROM g)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(r1 AS BIGINT) AS r1,
      |  CAST((nn - r1) * swa - r1 * swb AS BIGINT) AS t_stat,
      |  CAST((nn - r1) * swa - r1 * swb AS DOUBLE) *
      |    sqrt(CAST(nn AS DOUBLE)) /
      |    sqrt(CAST(r1 * (nn - r1) * (nn * sw2n - swn * swn) AS DOUBLE))
      |    AS z
      |FROM m""".stripMargin

  // ---- TPC-H Q2 shape (schema ships no partsupp): per-part minimum
  //      unit cost among one region's suppliers, ties kept. Unit cost is
  //      exact integer division (DIV/"//" — cents DIV qty); the cost
  //      table is checkpointed once so the min self-reference does not
  //      rescan the corpus ----
  def qTpchQ2(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part").filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_name"))
    val eur = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_regionkey") === 3)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        floor(col("s_acctbal") * 100).cast("long").as("bal_c"))
    val cost = graft.util.Checkpoints.truncate(
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT) DIV " +
            "CAST(l_quantity AS BIGINT)").as("unit_c"))
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("bal_c"))
        .agg(min(col("unit_c")).as("cost_c")))
    val best = cost.groupBy(col("p_partkey").as("b_partkey"))
      .agg(min(col("cost_c")).as("min_c"))
    cost.join(broadcast(best),
        col("p_partkey") === col("b_partkey") &&
          col("cost_c") === col("min_c"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("cost_c"),
        (col("bal_c").cast("double") / lit(100.0)).as("acctbal"))
  }

  val oTpchQ2: String =
    """WITH cost AS (
      |  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
      |    CAST(floor(s.s_acctbal * 100) AS BIGINT) AS bal_c,
      |    min(CAST(floor(l.l_extendedprice * 100) AS BIGINT) //
      |        CAST(l.l_quantity AS BIGINT)) AS cost_c
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size = 15
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |    AND n.n_regionkey = 3
      |  GROUP BY 1, 2, 3, 4, 5, 6),
      |best AS (
      |  SELECT p_partkey AS b_partkey, min(cost_c) AS min_c
      |  FROM cost GROUP BY 1)
      |SELECT c.p_partkey, c.p_name, c.s_name, c.n_name, c.cost_c,
      |  c.bal_c::DOUBLE / 100.0::DOUBLE AS acctbal
      |FROM cost c JOIN best b
      |  ON c.p_partkey = b.b_partkey AND c.cost_c = b.min_c""".stripMargin

  // ---- TPC-H Q9 shape: profit by supplier nation and order year for a
  //      part-name family, with p_retailprice standing in for the absent
  //      ps_supplycost. profit units are cents x percent, exact ----
  def qTpchQ9(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part").filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100).cast("long").as("retail_c"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    t(s, dir, "lineitem")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(
        floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")) -
          lit(100L) * col("l_quantity").cast("long") * col("retail_c"))
        .as("profit_u"))
      .select(col("n_name"), col("o_year"),
        (col("profit_u").cast("double") / lit(10000.0)).as("profit"))
  }

  val oTpchQ9: String =
    """SELECT n.n_name, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT) *
      |      (100 - CAST(floor(l.l_discount * 100) AS BIGINT)) -
      |      100 * CAST(l.l_quantity AS BIGINT) *
      |        CAST(floor(p.p_retailprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE / 10000.0::DOUBLE AS profit
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1, 2""".stripMargin

  // ---- TPC-H Q11 shape: shipped-value concentration for one nation's
  //      suppliers — parts whose value exceeds 1/1000 of the national
  //      total, the fraction test done by exact integer multiplication
  //      (value x 1000 > total), never division ----
  def qTpchQ11(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").filter(col("s_nationkey") === 7)
      .select(col("s_suppkey"))
    val value = graft.util.Checkpoints.truncate(
      t(s, dir, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long") *
          floor(col("l_extendedprice") * 100).cast("long")).as("val_u")))
    val total = value.agg(sum(col("val_u")).as("total_u"))
    value.crossJoin(broadcast(total))
      .filter(col("val_u") * lit(1000L) > col("total_u"))
      .select(col("l_partkey"),
        (col("val_u").cast("double") / lit(100.0)).as("value"))
  }

  val oTpchQ11: String =
    """WITH value AS (
      |  SELECT l.l_partkey,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT) *
      |        CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS val_u
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = 7
      |  GROUP BY 1)
      |SELECT l_partkey, val_u::DOUBLE / 100.0::DOUBLE AS value
      |FROM value
      |WHERE val_u * 1000 > (SELECT CAST(sum(val_u) AS BIGINT) FROM value)"""
      .stripMargin

  // ---- TPC-H Q12 shape (schema ships no l_shipmode): late-shipment
  //      priority mix by line status — late = shipped more than 60 days
  //      after the order date; priority split via exact CASE sums ----
  def qTpchQ12(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  val oTpchQ12: String =
    """SELECT l.l_linestatus,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1""".stripMargin

  // ---- TPC-H Q20 shape: suppliers who shipped more of the red part
  //      family in 1996 than a fifth of their all-years volume (the
  //      availqty correlation recast per-supplier: 5 x qty_1996 >
  //      qty_total, exact — above the ~1/7 uniform-year share) — one
  //      conditional hash agg, no second scan ----
  def qTpchQ20(s: SparkSession, dir: String): DataFrame = {
    val red = t(s, dir, "part").filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    t(s, dir, "lineitem")
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1996,
          col("l_quantity").cast("long")).otherwise(0L)).as("qty_1996"),
        sum(col("l_quantity").cast("long")).as("qty_total"))
      .filter(col("qty_1996") * lit(5L) > col("qty_total"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_name"), col("qty_1996"),
        col("qty_total"))
  }

  val oTpchQ20: String =
    """WITH q AS (
      |  SELECT l.l_suppkey,
      |    CAST(sum(CASE WHEN year(l.l_shipdate) = 1996
      |      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS qty_1996,
      |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_total
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'red%'
      |  GROUP BY 1)
      |SELECT s.s_name, n.n_name, q.qty_1996, q.qty_total
      |FROM q JOIN supplier s ON q.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE q.qty_1996 * 5 > q.qty_total""".stripMargin

  // ---- TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
  //      multi-supplier finalized order (late = shipped >90 days after
  //      the order date; the schema ships no receipt/commit dates). The
  //      per-(order, supplier) aggregate is checkpointed once; the
  //      EXISTS / NOT EXISTS pair becomes integer predicates on the
  //      per-order rollup ----
  def qTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val ordF = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pairs = graft.util.Checkpoints.truncate(
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L).otherwise(0L))
          .as("has_late")))
    val stats = pairs.groupBy(col("o_orderkey").as("k_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("has_late")).as("n_late"))
    pairs.filter(col("has_late") === 1L)
      .join(stats,
        col("o_orderkey") === col("k_orderkey") &&
          col("n_supp") > 1L && col("n_late") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
  }

  val oTpchQ21: String =
    """WITH pairs AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      |      THEN 1 ELSE 0 END) AS has_late
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |    AND o.o_orderstatus = 'F'
      |  GROUP BY 1, 2),
      |stats AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
      |    CAST(sum(has_late) AS BIGINT) AS n_late
      |  FROM pairs GROUP BY 1)
      |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM pairs p
      |JOIN stats t ON p.l_orderkey = t.l_orderkey
      |  AND t.n_supp > 1 AND t.n_late = 1
      |JOIN supplier s ON p.l_suppkey = s.s_suppkey
      |WHERE p.has_late = 1
      |GROUP BY 1""".stripMargin

  // ---- local-peak detection: days strictly above both neighbors and
  //      the event type's mean; integer cross-multiplied mean test ----
  def qPeaks(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .select(col("event_type"), expr("ts DIV 86400000000000").as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n"))
    graft.operators.Temporal.peakDetect(daily, "event_type", "d", "n")
  }

  val oPeaks: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
      |    CAST(count(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY 1),
      |x AS (
      |  SELECT event_type, d, n,
      |    lag(n) OVER (PARTITION BY event_type ORDER BY d) AS prev_n,
      |    lead(n) OVER (PARTITION BY event_type ORDER BY d) AS next_n
      |  FROM daily)
      |SELECT x.event_type, x.d, x.n, x.prev_n, x.next_n,
      |  CAST(x.n * t.n_days AS DOUBLE) / CAST(t.tot AS DOUBLE) AS lift
      |FROM x JOIN tot t ON x.event_type = t.event_type
      |WHERE x.prev_n IS NOT NULL AND x.next_n IS NOT NULL
      |  AND x.n > x.prev_n AND x.n > x.next_n
      |  AND x.n * t.n_days > t.tot""".stripMargin

  // ---- rich-club coefficient of the co-purchase graph (same projection
  //      as q_triangles): hub interconnection density per degree
  //      threshold, evaluated against bounded histograms ----
  def qRichClub(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 26)
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("src"))
      .join(li.select(col("k"), col("l_partkey").as("dst")), "k")
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
    graft.operators.Graph.richClub(pairs, Seq(2, 4, 8, 16))
  }

  val oRichClub: String =
    """WITH li AS (
      |  SELECT l_orderkey AS k, l_partkey FROM lineitem
      |  WHERE l_quantity >= 26),
      |e0 AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b ON a.k = b.k AND a.l_partkey < b.l_partkey),
      |und AS (SELECT u AS s, v AS d FROM e0
      |        UNION SELECT v, u FROM e0),
      |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS dg
      |        FROM und GROUP BY 1),
      |degh AS (SELECT dg, CAST(count(*) AS BIGINT) AS dcnt
      |         FROM deg GROUP BY 1),
      |ed AS (
      |  SELECT least(dx.dg, dy.dg) AS md
      |  FROM und u JOIN deg dx ON u.s = dx.s JOIN deg dy ON u.d = dy.s),
      |edh AS (SELECT md, CAST(count(*) AS BIGINT) AS mcnt
      |        FROM ed GROUP BY 1),
      |ks AS (SELECT CAST(unnest([2, 4, 8, 16]) AS BIGINT) AS k),
      |nr AS (
      |  SELECT ks.k, CAST(COALESCE(sum(degh.dcnt), 0) AS BIGINT)
      |    AS n_rich
      |  FROM ks LEFT JOIN degh ON degh.dg > ks.k GROUP BY 1),
      |er AS (
      |  SELECT ks.k, CAST(COALESCE(sum(edh.mcnt), 0) AS BIGINT)
      |    AS e_rich_x2
      |  FROM ks LEFT JOIN edh ON edh.md > ks.k GROUP BY 1)
      |SELECT nr.k, nr.n_rich, er.e_rich_x2,
      |  CAST(er.e_rich_x2 AS DOUBLE) /
      |    CAST(nr.n_rich * (nr.n_rich - 1) AS DOUBLE) AS phi
      |FROM nr JOIN er ON nr.k = er.k
      |WHERE nr.n_rich >= 2""".stripMargin

  // ---- blocking-quality audit for the record-linkage blocking key:
  //      per-block candidate pairs, work share, global reduction ratio ----
  def qBlockingQuality(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.blockingQuality(
      t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"))

  val oBlockingQuality: String =
    """WITH blocks AS (
      |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT)
      |    AS n_rows
      |  FROM customer GROUP BY 1, 2),
      |t AS (
      |  SELECT CAST(sum(n_rows) AS HUGEINT) AS nn,
      |    sum(CAST(n_rows AS HUGEINT) * (n_rows - 1)) AS cand_x2
      |  FROM blocks)
      |SELECT b.c_nationkey, b.c_mktsegment, b.n_rows,
      |  CAST(b.n_rows * (b.n_rows - 1) AS BIGINT) AS pairs_x2,
      |  CAST(CAST(b.n_rows AS HUGEINT) * (b.n_rows - 1) AS DOUBLE) /
      |    CAST(t.cand_x2 AS DOUBLE) AS pair_share,
      |  1.0::DOUBLE - CAST(t.cand_x2 AS DOUBLE) /
      |    CAST(t.nn * (t.nn - 1) AS DOUBLE) AS reduction_ratio
      |FROM blocks b CROSS JOIN t""".stripMargin

  // ---- landmark harmonic closeness on the order-supplier graph:
  //      multi-source bounded BFS from 5 deterministic supplier
  //      landmarks; reciprocal distances fold via lcm(1..3)=6 scaling ----
  def qLandmarkCloseness(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val edges = li.select((col("l_orderkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val lms = li.filter(col("l_suppkey") < 5)
      .select((col("l_suppkey") * 2 + 1).as("lm")).distinct()
    graft.operators.Graph.landmarkCloseness(edges, lms, rounds = 3)
  }

  val oLandmarkCloseness: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |    FROM lineitem
      |    UNION ALL
      |    SELECT l_suppkey * 2 + 1, l_orderkey * 2 FROM lineitem)),
      |lm AS (
      |  SELECT DISTINCT l_suppkey * 2 + 1 AS lm FROM lineitem
      |  WHERE l_suppkey < 5),
      |bfs(lm, node, d) AS (
      |  SELECT lm, lm, CAST(0 AS BIGINT) FROM lm
      |  UNION
      |  SELECT bfs.lm, e.dst, bfs.d + 1 FROM bfs
      |  JOIN e ON e.src = bfs.node WHERE bfs.d < 3),
      |md AS (SELECT lm, node, min(d) AS d FROM bfs GROUP BY 1, 2)
      |SELECT node, CAST(count(*) AS BIGINT) AS n_lm,
      |  CAST(sum(6 // d) AS BIGINT) AS h_scaled,
      |  CAST(sum(6 // d) AS BIGINT)::DOUBLE / 6.0::DOUBLE AS harmonic
      |FROM md WHERE d > 0 GROUP BY 1""".stripMargin

  // ---- functional-dependency discovery over candidate pairs: one
  //      melted scan, per-group rhs cardinality, per-pair rollup ----
  def qFdCheck(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.fdProfile(t(s, dir, "orders"), Seq(
      ("o_orderkey", "o_orderstatus"),
      ("o_custkey", "o_orderpriority"),
      ("o_orderpriority", "o_orderstatus")))

  val oFdCheck: String =
    """WITH m AS (
      |  SELECT 'o_orderkey->o_orderstatus' AS fd,
      |    CAST(o_orderkey AS VARCHAR) AS lhs, o_orderstatus AS rhs
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey->o_orderpriority',
      |    CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority->o_orderstatus',
      |    o_orderpriority, o_orderstatus FROM orders),
      |g AS (
      |  SELECT fd, lhs, CAST(count(DISTINCT rhs) AS BIGINT) AS card,
      |    CAST(count(*) AS BIGINT) AS nr
      |  FROM m GROUP BY 1, 2)
      |SELECT fd, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating,
      |  max(card) AS max_card,
      |  CAST(sum(nr) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN card <= 1 THEN nr ELSE 0 END) AS BIGINT)::DOUBLE
      |    / CAST(sum(nr) AS BIGINT)::DOUBLE AS clean_frac
      |FROM g GROUP BY 1""".stripMargin

  // ---- split-balance chi^2: is source composition independent of the
  //      content-hash train/val/test assignment? Exact per-cell
  //      contributions, Benford discipline ----
  def qSplitBalance(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.TrainPrep.deterministicSplit(
      t(s, dir, "documents").select(col("doc_id"), col("source")), "doc_id")
    graft.operators.Profiling.splitBalance(docs, "source", "split")
  }

  val oSplitBalance: String =
    s"""WITH s0 AS (
       |  SELECT source,
       |    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
       |      ELSE 'test' END AS split
       |  FROM (SELECT source,
       |          ${H32.format("CAST(doc_id AS VARCHAR)")} % 100 AS h
       |        FROM documents)),
       |cells AS (
       |  SELECT source, split, CAST(count(*) AS BIGINT) AS n_obs
       |  FROM s0 GROUP BY 1, 2),
       |r AS (SELECT source, CAST(sum(n_obs) AS HUGEINT) AS r
       |      FROM cells GROUP BY 1),
       |c AS (SELECT split, CAST(sum(n_obs) AS HUGEINT) AS c
       |      FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(n_obs) AS HUGEINT) AS nn FROM cells)
       |SELECT cells.source, cells.split, cells.n_obs,
       |  CAST(r.r * c.c AS DOUBLE) / CAST(t.nn AS DOUBLE) AS expected,
       |  CAST((CAST(cells.n_obs AS HUGEINT) * t.nn - r.r * c.c) *
       |       (CAST(cells.n_obs AS HUGEINT) * t.nn - r.r * c.c) AS DOUBLE)
       |    / CAST(t.nn * r.r * c.c AS DOUBLE) AS contrib
       |FROM cells JOIN r ON cells.source = r.source
       |JOIN c ON cells.split = c.split CROSS JOIN t""".stripMargin

  // ---- growth accounting: weekly active-user ledger decomposed into
  //      new / retained / resurrected / churned via a shifted
  //      full-outer self-join on the (user, week) activity grid ----
  def qGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val weekly = events(s, dir)
      .select(col("user_id"), expr("ts DIV 604800000000000").as("w"))
    graft.operators.Sessions.growthAccounting(weekly, "user_id", "w")
  }

  val oGrowthAccounting: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS w
      |  FROM events),
      |f AS (SELECT u, min(w) AS fw FROM weekly GROUP BY 1),
      |cur AS (SELECT u, w, 1 AS c FROM weekly),
      |prv AS (SELECT u, w + 1 AS w, 1 AS p FROM weekly),
      |j AS (
      |  SELECT COALESCE(cur.u, prv.u) AS u, COALESCE(cur.w, prv.w) AS w,
      |    cur.c, prv.p
      |  FROM cur FULL JOIN prv ON cur.u = prv.u AND cur.w = prv.w)
      |SELECT j.w,
      |  CAST(sum(CASE WHEN j.c = 1 AND j.w = f.fw THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN j.c = 1 AND j.p = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_retained,
      |  CAST(sum(CASE WHEN j.c = 1 AND j.p IS NULL AND j.w > f.fw
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
      |  CAST(sum(CASE WHEN j.c IS NULL AND j.p = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_churned
      |FROM j JOIN f ON j.u = f.u GROUP BY 1""".stripMargin

  // ---- bipartite audit: parity 2-coloring of the co-purchase graph's
  //      4-hop ball; any same-parity edge witnesses an odd cycle ----
  def qBipartiteCheck(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 26)
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("src"))
      .join(li.select(col("k"), col("l_partkey").as("dst")), "k")
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
    graft.operators.Graph.bipartiteCheck(pairs, sourceNode = 1L, rounds = 4)
  }

  val oBipartiteCheck: String =
    """WITH RECURSIVE li AS (
      |  SELECT l_orderkey AS k, l_partkey FROM lineitem
      |  WHERE l_quantity >= 26),
      |e0 AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b ON a.k = b.k AND a.l_partkey < b.l_partkey),
      |e AS (SELECT u AS src, v AS dst FROM e0
      |      UNION SELECT v, u FROM e0),
      |bfs(node, d) AS (
      |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION
      |  SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON e.src = bfs.node
      |  WHERE bfs.d < 4),
      |dep AS (SELECT node, min(d) AS d FROM bfs GROUP BY 1),
      |chk AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_edges_x2,
      |    CAST(sum(CASE WHEN (du.d + dv.d) % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_conflicts_x2
      |  FROM e JOIN dep du ON e.src = du.node
      |  JOIN dep dv ON e.dst = dv.node)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM dep) AS n_reached,
      |  chk.n_edges_x2, chk.n_conflicts_x2,
      |  chk.n_conflicts_x2 = 0 AS is_bipartite_ball
      |FROM chk""".stripMargin

  // ---- Hampel filter: trailing-7-day median/MAD spike flags, exact
  //      order statistics of integer lists (odd window, no floats) ----
  def qHampel(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .select(col("event_type"), expr("ts DIV 86400000000000").as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n"))
    graft.operators.Temporal.hampelFilter(daily, "event_type", "d", "n")
  }

  val oHampel: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT event_type, d, n,
      |    list(n) OVER (PARTITION BY event_type ORDER BY d
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS lst
      |  FROM daily),
      |y AS (
      |  SELECT event_type, d, n, lst,
      |    CAST(list_sort(lst)[4] AS BIGINT) AS med
      |  FROM x WHERE len(lst) = 7),
      |z AS (
      |  SELECT event_type, d, n, med, abs(n - med) AS dev,
      |    CAST(list_sort(list_transform(lst, v -> abs(v - med)))[4]
      |      AS BIGINT) AS mad
      |  FROM y)
      |SELECT event_type, d, n, med, dev, mad,
      |  dev > 3 * mad AS is_outlier
      |FROM z""".stripMargin

  // ---- global transitivity of the co-purchase graph (same projection
  //      as q_triangles): 6 x triangles / sum d(d-1), exact counts ----
  def qTransitivity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 26)
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("a"))
      .join(li.select(col("k"), col("l_partkey").as("b")), "k")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    graft.operators.Graph.transitivity(pairs)
  }

  val oTransitivity: String =
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
      |  SELECT e1.dst AS y, e2.dst AS z
      |  FROM o e1 JOIN o e2 ON e1.src = e2.src
      |  WHERE e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
      |t AS (
      |  -- each wedge row matches at most one oriented (y,z) edge, and
      |  -- wedges with the same (y,z) but different centers each count
      |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |  FROM w JOIN o ON w.y = o.src AND w.z = o.dst),
      |wd AS (SELECT CAST(sum(d * (d - 1)) AS BIGINT) AS wedges_x2 FROM deg)
      |SELECT t.n_triangles, wd.wedges_x2,
      |  CAST(6 * t.n_triangles AS DOUBLE) / CAST(wd.wedges_x2 AS DOUBLE)
      |    AS transitivity
      |FROM t CROSS JOIN wd""".stripMargin

  // ---- dedup threshold sweep: the "how much would we delete at
  //      threshold theta" curve every curation decision needs - pair
  //      counts and flagged-doc counts at four Jaccard cutoffs from ONE
  //      pair computation (explode a literal theta list, no re-scan) ----
  def qDedupSweep(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Dedup.ngramJaccardSample(
      t(s, dir, "documents"), n = 3, targetSample = 60,
      minJaccard = 0.2, hashedIds = true)
    pairs.select(col("a_id"), col("b_id"), col("jaccard"),
        explode(array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*)).as("theta"))
      .filter(col("jaccard") >= col("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("b_id")).as("n_docs_flagged"))
  }

  val oDedupSweep: String =
    """WITH m AS (
      |  SELECT greatest(1, CAST(ceil(count(*) / 60.0) AS BIGINT)) AS mod
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS g
      |  FROM documents, m
      |  WHERE ('0x' || substr(md5('7#' || CAST(doc_id AS VARCHAR)), 1, 8))
      |          ::BIGINT % m.mod = 0),
      |p AS (
      |  SELECT a_id, b_id, jaccard FROM (
      |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |      CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
      |        len(list_distinct(a.g || b.g)) AS jaccard
      |    FROM g a, g b WHERE a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.2)
      |SELECT theta, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT b_id) AS BIGINT) AS n_docs_flagged
      |FROM p, (SELECT unnest([0.2, 0.4, 0.6, 0.8]::DOUBLE[]) AS theta) t
      |WHERE p.jaccard >= t.theta
      |GROUP BY 1""".stripMargin

  // ---- cohort LTV: cumulative revenue per first-order-month cohort by
  //      month offset - the revenue-weighted companion to retention.
  //      Cents-exact sums; the cumulative window runs over the bounded
  //      month-offset domain per cohort ----
  def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = t(s, dir, "orders").select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"),
      floor(col("o_totalprice") * 100).cast("long").as("price_c"))
    val first = graft.util.Checkpoints.truncate(
      ord.groupBy(col("o_custkey")).agg(min(col("m")).as("cohort_m")))
    val sizes = first.groupBy(col("cohort_m")).agg(count(lit(1)).as("n_cohort"))
    val cells = ord.join(first, Seq("o_custkey"))
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("offset"))
      .agg(sum(col("price_c")).as("rev_c"),
        countDistinct(col("o_custkey")).as("n_active"))
    val w = Window.partitionBy(col("cohort_m")).orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_rev_c", sum(col("rev_c")).over(w))
      .join(broadcast(sizes), Seq("cohort_m"))
      .select(col("cohort_m"), col("offset"), col("n_active"),
        col("n_cohort"),
        (col("cum_rev_c").cast("double") / lit(100.0)).as("cum_rev"),
        (col("cum_rev_c").cast("double") /
          (lit(100L) * col("n_cohort")).cast("double")).as("ltv_per_customer"))
  }

  val oCohortLtv: String =
    """WITH ord AS (
      |  SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS m,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |f AS (SELECT o_custkey, min(m) AS cohort_m FROM ord GROUP BY 1),
      |sz AS (SELECT cohort_m, CAST(count(*) AS BIGINT) AS n_cohort
      |       FROM f GROUP BY 1),
      |cells AS (
      |  SELECT f.cohort_m, ord.m - f.cohort_m AS "offset",
      |    CAST(sum(price_c) AS BIGINT) AS rev_c,
      |    CAST(count(DISTINCT ord.o_custkey) AS BIGINT) AS n_active
      |  FROM ord JOIN f ON ord.o_custkey = f.o_custkey
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_m, "offset", n_active,
      |    CAST(sum(rev_c) OVER (PARTITION BY cohort_m ORDER BY "offset"
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_rev_c
      |  FROM cells)
      |SELECT c.cohort_m, c."offset", c.n_active, sz.n_cohort,
      |  c.cum_rev_c::DOUBLE / 100.0::DOUBLE AS cum_rev,
      |  c.cum_rev_c::DOUBLE / CAST(100 * sz.n_cohort AS DOUBLE)
      |    AS ltv_per_customer
      |FROM cum c JOIN sz ON c.cohort_m = sz.cohort_m""".stripMargin

  // ---- duplicate-payment audit: same customer, same amount bucket
  //      (nearest $100 - this synthetic price domain never repeats to
  //      the cent), different order, within 90 days - the classic AP
  //      double-charge screen as a (customer, amount) equi-join ----
  def qDupInvoices(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT) DIV 10000")
        .as("amt_b"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("ts_us"))
    o.select(col("o_custkey"), col("amt_b"),
        col("o_orderkey").as("a_key"), col("ts_us").as("a_ts"))
      .join(o.select(col("o_custkey"), col("amt_b"),
        col("o_orderkey").as("b_key"), col("ts_us").as("b_ts")),
        Seq("o_custkey", "amt_b"))
      .filter(col("a_key") < col("b_key") &&
        abs(col("a_ts") - col("b_ts")) <= lit(90L * 86400000000L))
      .select(col("o_custkey"), col("a_key"), col("b_key"),
        (col("amt_b") * lit(100L)).as("amount_bucket"),
        // DIV, not `/` (which widens longs to DOUBLE and then truncates
        // differently than integer floor) — the binning discipline
        expr("abs(a_ts - b_ts) DIV 86400000000").as("day_gap"))
  }

  val oDupInvoices: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) // 10000 AS amt_b,
      |    epoch_us(o_orderdate) AS ts_us
      |  FROM orders)
      |SELECT a.o_custkey, a.o_orderkey AS a_key, b.o_orderkey AS b_key,
      |  CAST(a.amt_b * 100 AS BIGINT) AS amount_bucket,
      |  CAST(abs(a.ts_us - b.ts_us) // 86400000000 AS BIGINT) AS day_gap
      |FROM o a JOIN o b
      |  ON a.o_custkey = b.o_custkey AND a.amt_b = b.amt_b
      |  AND a.o_orderkey < b.o_orderkey
      |  AND abs(a.ts_us - b.ts_us) <= 90 * 86400000000""".stripMargin

  // ---- sample-ratio mismatch: the experimentation guardrail - a
  //      hash-based 50/50 assignment whose observed split drifts is a
  //      broken experiment, not a treatment effect. Exact integer flag
  //      (na-nb)^2 > 4(na+nb) = |z| > 2; z itself is the one float ----
  def qAbSrm(s: SparkSession, dir: String): DataFrame = {
    val users = events(s, dir).select(col("user_id")).distinct()
      .select(col("user_id"),
        (graft.functions.Portable.hash32(col("user_id"), 11) % 2)
          .as("variant"))
    users.agg(
        sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
          lit(4L) * (col("n_a") + col("n_b"))).as("srm_flag"),
        ((col("n_a") - col("n_b")).cast("double") /
          sqrt((col("n_a") + col("n_b")).cast("double"))).as("z"))
  }

  val oAbSrm: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |v AS (
       |  SELECT ${H32.format("'11#' || CAST(user_id AS VARCHAR)")} % 2
       |    AS variant
       |  FROM u),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b
       |  FROM v)
       |SELECT n_a, n_b,
       |  (n_a - n_b) * (n_a - n_b) > 4 * (n_a + n_b) AS srm_flag,
       |  CAST(n_a - n_b AS DOUBLE) / sqrt(CAST(n_a + n_b AS DOUBLE)) AS z
       |FROM a""".stripMargin

  // ---- funnel conversion-latency histogram: days from first view to
  //      the (windowed) purchase for fully converting users ----
  def qFunnelLatency(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessions.windowedFunnel(
        events(s, dir).select(col("user_id"), col("event_type"),
          expr("ts DIV 1000").as("ts_us")),
        steps = Seq("view", "click", "purchase"),
        windowMicros = 604800000000L)
      .filter(col("stage") === 3L)
      .groupBy(expr("(t3 - t1) DIV 86400000000").as("day_bucket"))
      .agg(count(lit(1)).as("n_users"))

  val oFunnelLatency: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts_us > t1
      |         AND ts_us <= t1 + 604800000000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > t2
      |         AND ts_us <= t2 + 604800000000 GROUP BY 1)
      |SELECT (s3.t3 - s1.t1) // 86400000000 AS day_bucket,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM s3 JOIN s1 USING (user_id) GROUP BY 1""".stripMargin

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
      .agg(sum(col("price_c")).as("sold_c"),
        sum(col("qty") * col("retail_c")).as("catalog_c"),
        count(lit(1)).as("n_lines"))
      .select(col("p_brand"), col("n_lines"),
        (col("sold_c").cast("double") / lit(100.0)).as("sold_value"),
        (col("catalog_c").cast("double") / lit(100.0)).as("catalog_value"),
        (col("sold_c").cast("double") / col("catalog_c").cast("double"))
          .as("markup_ratio"))
  }

  val oBrandMarkup: String =
    """SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS sold_value,
      |  CAST(sum(CAST(l.l_quantity AS BIGINT) *
      |    CAST(floor(p.p_retailprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE / 100.0::DOUBLE AS catalog_value,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE /
      |  CAST(sum(CAST(l.l_quantity AS BIGINT) *
      |    CAST(floor(p.p_retailprice * 100) AS BIGINT))
      |    AS BIGINT)::DOUBLE AS markup_ratio
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
    val pairs = li.select(col("k"), col("l_partkey").as("a"))
      .join(li.select(col("k"), col("l_partkey").as("b")), "k")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    val und = pairs.distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    deg.join(graft.operators.Graph.triangleCounts(pairs), Seq("node"), "left")
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
    c.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("user_id"), col("n_hours"), col("n_events"),
        ((col("n_hours") * col("s2") - col("n_events") * col("n_events"))
          .cast("double") /
          (col("n_hours") * col("n_events")).cast("double")).as("fano"))
  }

  val oBurstiness: String =
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
      |    CAST(sum(c) AS BIGINT) AS n_events,
      |    CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM c GROUP BY 1)
      |SELECT user_id, n_hours, n_events,
      |  CAST(n_hours * s2 - n_events * n_events AS DOUBLE) /
      |    CAST(n_hours * n_events AS DOUBLE) AS fano
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
    val tot = pairs.agg(sum(col("w")).as("w_all"),
      sum(col("value_c") * col("w")).as("vw_all"))
    pairs.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("w")).as("w_sum"),
        sum(col("value_c") * col("w")).as("vw_sum"))
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
      |    CAST(sum(value_c * w) AS BIGINT) AS vw_all
      |  FROM pairs)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(sum(w) AS BIGINT) AS w_sum,
      |  CAST(sum(w) AS BIGINT)::DOUBLE / CAST(w_all AS BIGINT)::DOUBLE
      |    AS credit_share,
      |  CAST(sum(value_c * w) AS BIGINT)::DOUBLE /
      |    CAST(vw_all AS BIGINT)::DOUBLE AS value_share
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
      .agg(sum(col("n_i")).as("n"),
        sum(col("n_i") * col("n_i")).as("ssum"))
      .select(expr("(ssum * 10000L DIV (n * n)) DIV 100").as("band"),
        col("n"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))

  val oUserSimpsonHist: String =
    """WITH per AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_i
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, CAST(sum(n_i) AS BIGINT) AS n,
      |    CAST(sum(n_i * n_i) AS BIGINT) AS ssum
      |  FROM per GROUP BY 1)
      |SELECT (ssum * 10000 // (n * n)) // 100 AS band,
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
  //      ±2 position window. Each occurrence fans out to its TWO target
  //      positions (a bounded 2× expansion), then one (doc, position)
  //      equi-join — never a per-document positions² self-join — and a
  //      bounded top-k heap ----
  def qSkipgramTopk(s: SparkSession, dir: String): DataFrame = {
    val pos = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val left = pos.select(col("doc_id"), col("tok"),
      explode(expr("array(pos + 1, pos + 2)")).as("p2"))
    val right = pos.select(col("doc_id").as("d2"), col("pos").as("p2"),
      col("tok").as("tok2"))
    left.join(right, col("doc_id") === col("d2") && left("p2") === right("p2"))
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
        sum(col("v") * col("v")).as("sv2"))
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
      |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS sv2
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
  //      per-(month, customer) reduction, squares summed as longs,
  //      the final ratio staged through DECIMAL(38,0) (HUGEINT in the
  //      oracle) so 100 TB cent-sums can't wrap ----
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
        sum(col("rev_c") * col("rev_c")).as("srev2"))
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
      |    CAST(sum(rev_c * rev_c) AS BIGINT) AS srev2
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
        sum(col("disc_pct") * col("price_c")).as("wdisc_c"))
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
    val summary = d.agg(sum(col("n_d")).as("n"),
        sum(col("n_d") * col("n_d")).as("s2"))
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
      |    CAST((10 * CAST(sum(n_d * n_d) AS HUGEINT) -
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
      .agg(count(lit(1)).as("n"), sum(col("gap")).as("s1"),
        sum(col("gap") * col("gap")).as("s2"))
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
      |    CAST(sum(gap * gap) AS BIGINT) AS s2
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
      .agg(sum(col("n")).as("n_tot"), sum(col("v_c") * col("n")).as("sv"))
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
      |    CAST(sum(v_c * n) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS sv
      |  FROM hist)
      |SELECT event_type, max(n_tot) AS n_events,
      |  max(sv) // max(n_tot) AS mean_c,
      |  min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS median_c,
      |  max(sv) // max(n_tot) -
      |    min(CASE WHEN cum * 2 >= n_tot THEN v_c END) AS gap_c
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
        sum(col("c") * col("c")).as("s2"))
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
      |    CAST(sum(c * c) AS BIGINT) AS s2
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
