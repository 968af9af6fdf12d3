package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, shaped for scale.
  *
  * Both avoid the naive inequality-join formulation, which Catalyst can
  * only plan as a broadcast-nested-loop/cartesian: the as-of join is a
  * single union + window carry-forward (one shuffle by key, linear in
  * |probe|+|ref|), and the range join buckets intervals into fixed time
  * bins so containment becomes an equi-join on (key, bin) with a cheap
  * residual filter.
  */
object Temporal {

  /** As-of join: for each probe row, the most recent reference row with
    * `ref.ts <= probe.ts` in the same key group (null columns when no
    * reference precedes the probe).
    *
    * Formulation: union both sides tagged `_is_ref`, ONE window ordered by
    * (ts, ref-first, id) carrying the last reference id/ts forward, keep
    * probe rows. At equal timestamps the reference row wins (`<=`
    * semantics); ties within the reference break to the highest id —
    * the same total order the oracle replays.
    */
  def asofJoin(probe: DataFrame, ref: DataFrame, keys: Seq[String],
               tsCol: String, idCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val r = ref.select(keyCols :+ col(tsCol) :+ col(idCol) :+ lit(1).as("_is_ref"): _*)
    val l = probe.select(keyCols :+ col(tsCol) :+ col(idCol) :+ lit(0).as("_is_ref"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol), col("_is_ref").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .select(keyCols :+ col(tsCol) :+ col(idCol) :+ col("_is_ref") :+
        last(when(col("_is_ref") === 1, col(idCol)), ignoreNulls = true)
          .over(w).as("matched_id") :+
        last(when(col("_is_ref") === 1, col(tsCol)), ignoreNulls = true)
          .over(w).as("matched_ts"): _*)
      .filter(col("_is_ref") === 0)
      .drop("_is_ref")
  }

  /** Interval-containment (range) join: probe rows against intervals of
    * the same key with `start <= ts <= end`, binned so it plans as an
    * EQUI-join: each interval explodes to the fixed-size time bins it
    * covers, each probe row maps to its own bin, join on (keys, bin),
    * then the exact BETWEEN filter. Bin size trades interval fan-out
    * against bucket population; at 100 TB pick it near the median
    * interval length so each interval lands in O(1) bins.
    */
  /** Merge overlapping-or-touching intervals per key (the session/span
    * consolidation primitive: uptime windows, coverage spans, blackout
    * merging). Classic sweep: within each key, an interval starts a new
    * merged group iff its start exceeds the running max end of everything
    * before it.
    *
    * Shape: ONE key-partitioned exchange feeding two same-partitioning
    * windows (prev-max-end, then the cumulative group counter) + the
    * final (key, grp) hash agg — Catalyst reuses the single sort.
    * `ordCol` breaks start-time ties so the row order (and thus output)
    * is total and engine-independent.
    *
    * Output: key..., grp (1-based per key in time order), span_start,
    * span_end, n_events.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
                     endCol: String, ordCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val ord = Seq(col(startCol), col(ordCol))
    val wPrev = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keyCols :+ col(startCol) :+ col(endCol) :+ col(ordCol): _*)
      .withColumn("_pmax", max(col(endCol)).over(wPrev))
      .withColumn("grp",
        sum(when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L)
          .otherwise(0L)).over(wCum))
      .groupBy(keyCols :+ col("grp"): _*)
      .agg(min(col(startCol)).as("span_start"), max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_events"))
  }

  /** Changelog → slowly-changing-dimension type 2: compact each key's
    * attribute stream into validity intervals — consecutive rows with an
    * unchanged attribute collapse into one version; each version is
    * [valid_from, valid_to) with `valid_to` null (and `is_current` true)
    * on the key's latest version. The point-in-time join this table
    * enables (`valid_from <= ts < valid_to`) is how a training pipeline
    * reconstructs what a dimension looked like when each training example
    * was emitted, instead of leaking today's attributes into the past.
    *
    * Shape: ONE key-partitioned exchange; the change-detection lag and
    * the valid_to/version windows share the identical (keys, ts, ord)
    * sort, and the intermediate filter preserves distribution, so
    * Catalyst plans a single exchange + sort reused by all three window
    * functions. `ordCol` totalizes ties so versions are
    * engine-independent.
    *
    * Output: keys..., attr, valid_from, valid_to, version (1-based per
    * key), is_current.
    */
  def scd2(changes: DataFrame, keys: Seq[String], attrCol: String,
           tsCol: String, ordCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(tsCol), col(ordCol))
    changes
      .select(keyCols :+ col(attrCol) :+ col(tsCol) :+ col(ordCol): _*)
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols ++ Seq(col(attrCol), col("valid_from"),
        col("valid_to"), col("version"), col("is_current")): _*)
  }

  /** Calendar gap-fill with last-observation-carried-forward: re-key a
    * sparse per-(key, day) count series onto the full day spine so
    * missing days exist as rows (n = 0) and `locf_n` carries the last
    * seen value — the densification step before any window/forecast op
    * that assumes regular spacing.
    *
    * The spine is |keys| × |days| — generated, never shuffled large: the
    * day bounds are a broadcast scalar and the left join is keyed on
    * (key, day) like the fact side. Counts are integers, so the fill is
    * exact (no float carry).
    */
  def gapFillDaily(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), col(dayCol))
      .agg(count(lit(1)).as("_raw"))
    val bounds = daily.agg(min(col(dayCol)).as("_lo"), max(col(dayCol)).as("_hi"))
    val spine = df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"))).as(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(col("_raw"), lit(0L)).as("n"), col("_raw"))
      .withColumn("locf_n",
        coalesce(last(col("_raw"), ignoreNulls = true).over(w), lit(0L)))
      .drop("_raw")
  }

  /** Time-bucket downsampling to OHLC bars (open/high/low/close + count)
    * per key — the resolution-reduction op that turns an event firehose
    * into a chartable/joinable series. Open and close are picked by
    * row_number over the (ts, id) total order (deterministic under ties,
    * unlike min_by/max_by whose tie-break is undefined); both window
    * specs share one (key, bucket) partitioning, so the whole op is one
    * exchange + one hash agg.
    */
  def ohlc(df: DataFrame, keyCol: String, bucketCol: String, tsCol: String,
           idCol: String, valueCol: String): DataFrame = {
    val part = Seq(col(keyCol), col(bucketCol))
    val wAsc = Window.partitionBy(part: _*).orderBy(col(tsCol), col(idCol))
    val wDesc = Window.partitionBy(part: _*).orderBy(col(tsCol).desc, col(idCol).desc)
    df.select(part :+ col(tsCol) :+ col(idCol) :+ col(valueCol): _*)
      .withColumn("_ra", row_number().over(wAsc))
      .withColumn("_rd", row_number().over(wDesc))
      .groupBy(part: _*)
      .agg(max(when(col("_ra") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"), min(col(valueCol)).as("low"),
        max(when(col("_rd") === 1, col(valueCol))).as("close"),
        count(lit(1)).as("n"))
  }

  /** Exponentially-weighted moving average with α = 1/2 folded over each
    * key's (ts, id)-ordered values: e ← e/2 + v/2. Halving is EXACT in
    * binary floating point, so the fold has one rounding per step in a
    * fixed order — bit-identical on any engine that replays the same
    * sequence (the [[graft.functions.Portable.polyFold]] discipline for
    * doubles).
    *
    * Shape: one key-partitioned hash agg collecting the (bounded)
    * per-key sequence, then a per-row array fold — state is one key's
    * events, the same bounded-sequence contract as sequence packing.
    * Output: key..., n, ewma (the smoothed final value per key).
    */
  def ewmaHalf(df: DataFrame, keys: Seq[String], tsCol: String,
               idCol: String, valueCol: String): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ col(tsCol) :+ col(idCol) :+ col(valueCol): _*)
      .groupBy(keyCols: _*)
      .agg(sort_array(collect_list(struct(col(tsCol), col(idCol),
        col(valueCol).as("_v")))).as("_seq"))
      .select(keyCols :+ size(col("_seq")).cast("long").as("n") :+
        aggregate(transform(col("_seq"), x => x.getField("_v")),
          lit(0.0), (acc, v) => acc / 2 + v / 2).as("ewma"): _*)
  }

  def rangeJoinBinned(probe: DataFrame, intervals: DataFrame, keys: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      binMicros: Long): DataFrame = {
    val binned = intervals.withColumn("_bin",
      explode(sequence(expr(s"$startCol DIV ${binMicros}L"),
        expr(s"$endCol DIV ${binMicros}L"))))
    val probeB = probe.withColumn("_bin", expr(s"$tsCol DIV ${binMicros}L"))
    probeB.join(binned, keys :+ "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }

  /** CUSUM changepoint estimation (Page 1954, Biometrika — the control-
    * chart statistic): per series, the day on which an upward level shift
    * in a daily count is most likely — the monitor for "did ingest volume
    * / error rate / event mix change, and when?". Page's clamped
    * recursion S_t = max(0, S_{t−1} + (c_t − μ)) LOOKS inherently
    * sequential, but the textbook identity
    *   S_t = P_t − min(0, min_{i≤t} P_i),  P_t = Σ_{i≤t}(c_i − μ)
    * turns it into TWO ordinary windows (prefix sum + running min) over
    * the per-series day order — fully parallel across series, bounded by
    * days-per-series within one.
    *
    * Exact arithmetic: subtracting the float mean would poison every
    * prefix; instead each deviation is scaled by the series' day count,
    * d_t = c_t·D − T (both exact longs), so prefixes, running minima,
    * and the final argmax all compare exact integers. The reported
    * `cusum` is the single division scaled/D at the end.
    *
    * Output: one row per series — (key, cp_day, cusum, n_days), cp_day
    * the argmax day of the CUSUM path (ties to the earliest day, the
    * canonical first-hit estimator).
    *
    * Scale shape: one (key, day)-keyed count agg, one key-keyed totals
    * agg joined back on the same key exchange, two windows partitioned
    * by key (series-bounded, never corpus-wide), and a per-key max_by.
    * No global-order window anywhere.
    */
  def cusumChangepoint(daily: DataFrame, keyCol: String, dayCol: String,
                       cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = daily.groupBy(col(keyCol))
      .agg(sum(col(cntCol)).as("_tot"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val path = daily.join(totals, Seq(keyCol))
      .withColumn("_d", col(cntCol) * col("n_days") - col("_tot"))
      .withColumn("_p", sum(col("_d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_s", col("_p") - least(lit(0L), min(col("_p")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    path.groupBy(col(keyCol))
      .agg(max_by(struct(col(dayCol).as("d"), col("_s"), col("n_days")),
        // argmax with earliest-day tie-break: order by (s, -day)
        struct(col("_s"), (-col(dayCol)).cast("long"))).as("_m"))
      .select(col(keyCol), col("_m.d").as("cp_day"),
        (col("_m._s").cast("double") / col("_m.n_days").cast("double"))
          .as("cusum"),
        col("_m.n_days").as("n_days"))
  }

  /** Seasonal z-score anomalies — flag the samples of each seasonal cell
    * (e.g. (event_type, hour-of-day)) that sit more than z₀ standard
    * deviations from THAT CELL's mean: the time-series monitor that a
    * global outlier fence ([[graft.QueriesCore.qOutliers]]'s IQR) gets
    * wrong, because 3 a.m. traffic is only anomalous relative to other
    * 3 a.m. samples.
    *
    * Square-free exact test: with D samples per cell, total T and Σv²,
    *   |v − μ| > z₀σ  ⇔  (v·D − T)² > z₀²·(D·Σv² − T²)
    * — every quantity an exact long, so the FLAG is bit-identical across
    * engines and partitionings (a sqrt-based z would round). The
    * reported zsq = (v·D−T)²/(D·Σv²−T²) is one double division.
    * Zero-variance cells (D·Σv² = T²) flag nothing by construction.
    *
    * Scale shape: one cell-keyed moment agg (map-side partials), joined
    * back to the samples on the same cell key, then a narrow filter.
    * No window at all — the seasonal profile is an agg, not an order.
    */
  def seasonalAnomaly(samples: DataFrame, keyCols: Seq[String],
                      sampleCol: String, valCol: String,
                      zsq: Int = 4): DataFrame = {
    // All moment sums and the squared-deviation comparison run in
    // DECIMAL(38,0) (= the oracle's HUGEINT): Σv² and (v·D−T)² overflow a
    // long at large counts, and Spark would wrap SILENTLY where DuckDB
    // errors — the linregExact discipline applies here too.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = keyCols.map(col)
    val v = col(valCol).cast("long")
    val base = samples.select(g :+ col(sampleCol) :+ v.as("_v"): _*)
    val prof = base.groupBy(g: _*).agg(
      count(lit(1)).cast(dec).as("_d"), sum(col("_v").cast(dec)).as("_t"),
      sum(col("_v").cast(dec) * col("_v").cast(dec)).as("_s2"))
    val dev = col("_v").cast(dec) * col("_d") - col("_t")
    val varI = col("_d") * col("_s2") - col("_t") * col("_t")
    base.join(prof, keyCols)
      .filter(dev * dev > lit(zsq.toLong).cast(dec) * varI)
      .select(g :+ col(sampleCol) :+ col("_v").as("value") :+
        ((dev * dev).cast("double") / varI.cast("double")).as("zsq"): _*)
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958) — the
    * right-censoring-correct answer to "how long do users/documents/
    * connections survive?": a plain duration CDF treats still-active
    * units as churned at their last observation and BIASES survival
    * down; KM keeps censored units in the at-risk denominator until
    * they leave. S(t) = Π_{u ≤ t} (1 − d_u/n_u) over event times u,
    * with d the deaths at u and n the units still at risk.
    *
    * Determinism without logs: the factors (1 − d_u/n_u) are single
    * divisions of exact longs; the cumulative product is a LEFT FOLD in
    * ascending-time order over the COLLECTED event-time table — legal
    * to collect because the table is duration-histogram-sized (the
    * quantization-bounded regime, NOT corpus rows), and the fold order
    * is pinned so every multiplication is the same IEEE op in both
    * engines (DuckDB replays via list_reduce over the same ordering).
    *
    * Scale shape: unit durations → duration histogram (one hash agg);
    * at-risk counts are SUFFIX sums over the histogram (bounded
    * window); the 1-row ordered array broadcasts back onto the
    * histogram rows for the prefix folds. Corpus scanned once.
    *
    * Input: one row per unit — (durationCol, eventCol) with eventCol
    * true = observed terminal event, false = right-censored.
    * Output: one row per distinct duration with ≥1 death —
    * (t, n_at_risk, d_events, survival).
    */
  def kaplanMeier(units: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = units.select(col(durationCol).cast("long").as("t"),
      col(eventCol).cast("boolean").as("e"))
    val hist = base.groupBy(col("t"))
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leaving"))
    // at risk at t = all units with duration >= t: suffix sum
    val wSuf = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = hist.withColumn("n", sum(col("leaving")).over(wSuf))
      .filter(col("d") > 0)
      .select(col("t"), col("d"), col("n"))
    // Survival products in ONE linear fold over the (histogram-sized,
    // time-sorted) array: the accumulator carries (running product,
    // emitted array), so s_k = s_{k-1} · (1 − d_k/n_k) multiplies in the
    // identical left-fold order as the previous per-row prefix folds —
    // bit-equal doubles — without their O(k) re-fold per output row
    // (3.6k rows × 3.6k-element prefixes = 6.6M interpreted lambda steps,
    // 0.85 s of the query, r16 profile). The per-rank crossJoin and the
    // global row_number window disappear with it.
    val arr = risk
      .agg(array_sort(collect_list(struct(col("t"), col("d"), col("n"))))
        .as("_arr"))
    val surv = arr.select(col("_arr"),
      aggregate(col("_arr"),
        struct(lit(1.0).as("s"), array().cast("array<double>").as("out")),
        (acc, x) => {
          val s2 = acc.getField("s") * (lit(1.0) -
            x.getField("d").cast("double") / x.getField("n").cast("double"))
          struct(s2.as("s"), concat(acc.getField("out"), array(s2)).as("out"))
        },
        acc => acc.getField("out")).as("_sv"))
    surv.select(posexplode(arrays_zip(col("_arr"), col("_sv"))))
      .select(col("col._arr.t").as("t"),
        col("col._arr.n").as("n_at_risk"),
        col("col._arr.d").as("d_events"),
        col("col._sv").as("survival"))
  }

  /** Log-rank test (Mantel 1966) — "are these two survival curves
    * actually different?": the hypothesis test that goes with
    * [[kaplanMeier]], comparing group 1's observed deaths at every event
    * time against the hypergeometric expectation under equal hazards.
    *   U = Σ_t (d1_t − n1_t·d_t/n_t)
    *   V = Σ_t (d_t·n1_t/n_t)·((n_t−n1_t)/n_t)·((n_t−d_t)/(n_t−1))
    *   χ² = U²/V   (1 df; χ² > 3.84 ⇒ p < 0.05)
    * Despite its name the statistic is log-free — it survives this
    * repo's determinism bar: every per-time term is a pinned sequence of
    * exact-long divisions/products, and the two Σ run as LEFT FOLDS in
    * ascending-time order over the duration-histogram-sized collected
    * array (the [[kaplanMeier]] fold discipline; DuckDB replays the
    * identical folds via list_reduce). Times where n_t = 1 contribute
    * V = 0 by the (n−d)/(n−1) convention guarded to 0.
    *
    * Scale shape: one corpus hash agg into the per-time histogram,
    * suffix sums over it (bounded window), one 1-row fold. Output: one
    * row (n_times, u, v, chi2).
    */
  def logRank(units: DataFrame, durationCol: String, eventCol: String,
              groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = units.select(col(durationCol).cast("long").as("t"),
      col(eventCol).cast("boolean").cast("long").as("e"),
      col(groupCol).cast("boolean").cast("long").as("g"))
    val hist = base.groupBy(col("t")).agg(
      sum(col("e")).as("d"), sum(col("e") * col("g")).as("d1"),
      count(lit(1)).as("leaving"), sum(col("g")).as("leaving1"))
    val wSuf = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = hist
      .withColumn("n", sum(col("leaving")).over(wSuf))
      .withColumn("n1", sum(col("leaving1")).over(wSuf))
      .filter(col("d") > 0)
      .select(col("t"), col("d"), col("d1"), col("n"), col("n1"))
    val arr = risk
      .agg(array_sort(collect_list(
        struct(col("t"), col("d"), col("d1"), col("n"), col("n1"))))
        .as("_a"),
        count(lit(1)).as("n_times"))
    def dd(x: org.apache.spark.sql.Column, f: String) =
      x.getField(f).cast("double")
    arr.select(col("n_times"),
        aggregate(col("_a"), lit(0.0), (acc, x) =>
          acc + (dd(x, "d1") - dd(x, "n1") * dd(x, "d") / dd(x, "n")))
          .as("u"),
        aggregate(col("_a"), lit(0.0), (acc, x) =>
          acc + when(x.getField("n") > 1L,
            (dd(x, "d") * dd(x, "n1") / dd(x, "n")) *
              ((dd(x, "n") - dd(x, "n1")) / dd(x, "n")) *
              ((dd(x, "n") - dd(x, "d")) / (dd(x, "n") - lit(1.0))))
            .otherwise(lit(0.0))).as("v"))
      .withColumn("chi2", col("u") * col("u") / col("v"))
  }

  /** Exponentially time-decayed sum per key — the recency weighting
    * behind "hot" domain mixing, trending-content scores, and decayed
    * engagement counters: each value contributes v·2^(−age/h). Generic
    * float decay (pow/exp per row, float fold) is neither associative
    * nor engine-stable; this variant keeps the whole aggregation EXACT
    * by quantizing the decay to WHOLE HALVINGS — k = age DIV h half-
    * lives — so a contribution is the integer v·2^(K−k), summed as
    * DECIMAL(38,0) with map-side partials, and the ONLY float op is the
    * final ÷2^K·scale. Values older than K half-lives contribute 0 (at
    * K = 40 that is a 10¹²-fold decay — noise floor by construction).
    *
    * The step-wise decay is a documented approximation trade: within a
    * half-life bucket all values weigh equally. For ranking/mixing use
    * cases the ordering error is bounded by one halving (≤2×) and the
    * determinism is what makes the score reusable as a regression gate.
    *
    * Scale shape: a 1-row max-age broadcast onto the scan, a narrow
    * shift/multiply, one key-keyed hash agg. One corpus shuffle.
    */
  def decayedSum(df: DataFrame, keyCols: Seq[String], ageCol: String,
                 valCol: String, halfLife: Long, maxHalvings: Int = 40)
      : DataFrame = {
    require(halfLife > 0 && maxHalvings > 0 && maxHalvings <= 62)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = keyCols.map(col)
    // DIV, not `/` (which widens longs to DOUBLE); ages are >= 0 by the
    // caller's age = maxAge - age construction. valCol is INTEGER-VALUED
    // (quantize first — the Stats.corrExact contract).
    val k = expr(s"CAST($ageCol AS BIGINT) DIV $halfLife")
    val contrib = when(k <= maxHalvings,
      col(valCol).cast("long").cast(dec) *
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxHalvings - " +
          s"(CAST($ageCol AS BIGINT) DIV $halfLife) AS INT))").cast(dec))
      .otherwise(lit(0L).cast(dec))
    df.select(g :+ contrib.as("_c") :+ lit(1L).as("_one"): _*)
      .groupBy(g: _*)
      .agg(sum(col("_c")).as("_s"), count(lit(1)).as("n"))
      .select(g :+ col("n") :+
        (col("_s").cast("double") /
          lit(math.pow(2.0, maxHalvings)).cast("double")).as("decayed"): _*)
  }

  /** Local-peak detection over per-key daily series: days that strictly
    * exceed BOTH neighbors AND the key's mean — the spike-triage read
    * ("which days actually popped for this event type?") behind
    * incident review and burst labeling. Interior peaks only: a missing
    * neighbor (series boundary) disqualifies, so the flag never depends
    * on where the observation window was cut.
    *
    * Determinism shape: the corpus collapses FIRST into per-(key, day)
    * counts (the caller's agg); the lag/lead window then runs over the
    * bounded day domain per key — the [[cusumChangepoint]] precedent,
    * never corpus rows. The above-mean test is the exact integer
    * cross-multiplication cnt·n_days > total (no division); the
    * reported lift = cnt·n_days / total is the ONLY float op.
    *
    * Output: one row per peak — (key, day, cnt, prev_n, next_n, lift).
    */
  /** Hampel filter (Hampel 1974; the robust spike detector): flag days
    * whose count sits more than k MADs from the TRAILING window's
    * median — the outlier rule a mean/σ fence gets wrong because the
    * spike itself inflates σ. Trailing (not centered) window = the
    * online semantics; only full windows emit, so a flag never depends
    * on where the series was cut.
    *
    * Exactness by construction: `window` must be ODD, so the median of
    * the window values and the median of their absolute deviations are
    * BOTH order statistics of integer lists — exact integers, no
    * interpolation, no float anywhere (the flag compare is
    * dev > k·mad on longs). The window's value list is array_sort-ed
    * before indexing, so collect_list's nondeterministic order never
    * reaches the result; windows run over the bounded per-key day
    * domain (the [[peakDetect]]/[[cusumChangepoint]] precedent).
    *
    * Output: one row per full-window day — (key, day, cnt, med, dev,
    * mad, is_outlier).
    */
  def hampelFilter(daily: DataFrame, keyCol: String, dayCol: String,
                   cntCol: String, window: Int = 7, k: Long = 3L)
      : DataFrame = {
    require(window >= 3 && window % 2 == 1, "window must be odd >= 3")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(-window, -1)
    val mid = (window + 1) / 2
    daily
      .withColumn("_lst", collect_list(col(cntCol)).over(w))
      .filter(size(col("_lst")) === window)
      .withColumn("med", element_at(array_sort(col("_lst")), mid))
      .withColumn("dev", abs(col(cntCol) - col("med")))
      .withColumn("mad", element_at(
        array_sort(transform(col("_lst"), x => abs(x - col("med")))), mid))
      .select(col(keyCol), col(dayCol), col(cntCol), col("med"), col("dev"),
        col("mad"), (col("dev") > lit(k) * col("mad")).as("is_outlier"))
  }

  def peakDetect(daily: DataFrame, keyCol: String, dayCol: String,
                 cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val totals = daily.groupBy(col(keyCol))
      .agg(sum(col(cntCol)).as("_tot"), count(lit(1)).as("n_days"))
    daily
      .withColumn("prev_n", lag(col(cntCol), 1).over(w))
      .withColumn("next_n", lead(col(cntCol), 1).over(w))
      .filter(col("prev_n").isNotNull && col("next_n").isNotNull &&
        col(cntCol) > col("prev_n") && col(cntCol) > col("next_n"))
      .join(totals, Seq(keyCol))
      .filter(col(cntCol) * col("n_days") > col("_tot"))
      .select(col(keyCol), col(dayCol), col(cntCol), col("prev_n"),
        col("next_n"),
        ((col(cntCol) * col("n_days")).cast("double") /
          col("_tot").cast("double")).as("lift"))
  }
}
