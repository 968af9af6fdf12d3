package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-arithmetic statistics. Spark's built-in `corr` sums doubles, so
  * its last bits depend on partition layout (float addition is not
  * associative) — fine for exploration, wrong for a hash-graded,
  * rerun-reproducible pipeline. This variant carries the five moment sums
  * as LONGS (exact, associative, partition-independent) and defers every
  * float op to the final scalar formula — the [[Similarity]] kmeans /
  * [[Graph]] PageRank fixed-point discipline applied to statistics.
  */
object Stats {

  /** Pearson correlation per group over two INTEGER-VALUED columns
    * (callers quantize reals first — money → cents, rates → mills — the
    * [[Quantile.logLinearQuantile]] contract). One hash agg with map-side
    * partials; output is one row per group.
    *
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)),
    * every product exact in long, the division and the (IEEE-correctly-
    * rounded) sqrts in double — bit-identical on any engine.
    */
  def corrExact(df: DataFrame, groupCols: Seq[String],
                xCol: String, yCol: String): DataFrame = {
    // Moment sums staged through DECIMAL(38,0): Σx² of a cents-quantized
    // column (~10¹⁴/row) wraps a long at ~10⁵ rows per group — the
    // q_monthly_hhi overflow class the r14 sf1 probe proved real. 128-bit
    // decimals stay exact and associative (map-side partials intact).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = groupCols.map(col)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.select(g :+ x.as("_x") :+ y.as("_y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_x").cast(dec)).as("_sx"), sum(col("_y").cast(dec)).as("_sy"),
        sum(col("_x").cast(dec) * col("_x").cast(dec)).as("_sxx"),
        sum(col("_y").cast(dec) * col("_y").cast(dec)).as("_syy"),
        sum(col("_x").cast(dec) * col("_y").cast(dec)).as("_sxy"))
      .select(g :+ col("n") :+
        ((col("n") * col("_sxy") - col("_sx") * col("_sy")).cast("double") /
          (sqrt((col("n") * col("_sxx") - col("_sx") * col("_sx")).cast("double")) *
            sqrt((col("n") * col("_syy") - col("_sy") * col("_sy")).cast("double"))))
          .as("corr"): _*)
  }

  /** Deterministic subsample-bootstrap confidence interval for a corpus
    * mean (Politis–Romano–Wolf subsampling; the hash-seeded kin of the
    * Poisson bootstrap used for big-data CIs). Every corpus-level number
    * a pipeline reports — mean length, dedup rate, quality mean — needs
    * an uncertainty band before two corpus versions can be compared
    * honestly; the bootstrap gives it without distributional assumptions.
    *
    * Each of the B resamples keeps a document iff the portable hash of
    * (resample, id) clears the subsample rate — no RNG, so the interval
    * is reproducible across clusters and reruns (a resampled CI that
    * moved on every rerun would defeat its regression-test purpose). The
    * metric is an INTEGER column: resample means are one exact-long sum
    * ÷ one exact count — a single double division, no float fold order.
    *
    * Scale shape: one explode by B (bounded constant) → one (resample)-
    * keyed hash agg → a B-row rank window (single partition over B rows,
    * a bounded constant — never corpus-sized) → 1-row broadcasts. The
    * corpus is scanned once.
    *
    * Output: (point_mean, lo, hi, n_resamples) with lo/hi the
    * ⌈0.025·B⌉-th and ⌈0.975·B⌉-th order statistics of the resample
    * means.
    */
  def bootstrapCi(df: DataFrame, idCol: String, valueCol: String,
                  resamples: Int = 50, keepPct: Int = 63): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val loRank = math.ceil(0.025 * resamples).toInt.max(1)
    val hiRank = math.ceil(0.975 * resamples).toInt
    val base = df.select(col(idCol).as("_id"), col(valueCol).cast("long").as("_v"))
    val sub = base
      .select(col("_id"), col("_v"),
        explode(sequence(lit(0), lit(resamples - 1))).as("b"))
      .filter(graft.functions.Portable.hash32(
        concat_ws("#", col("b"), col("_id"))) % 100 < keepPct)
    val means = sub.groupBy(col("b"))
      .agg((sum(col("_v")).cast("double") / count(lit(1)).cast("double")).as("m"))
    val ranked = means.withColumn("rk",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    val lo = ranked.filter(col("rk") === loRank).select(col("m").as("lo"))
    val hi = ranked.filter(col("rk") === hiRank).select(col("m").as("hi"))
    val point = base.agg(
      (sum(col("_v")).cast("double") / count(lit(1)).cast("double"))
        .as("point_mean"))
    point.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .withColumn("n_resamples", lit(resamples))
  }

  /** Cohen's kappa (Cohen 1960, Educ. Psychol. Meas. 20) — chance-
    * corrected agreement between two categorical labelings: the QA
    * metric for comparing a cheap heuristic labeler against gold labels
    * (or two annotators / two model versions) before trusting it to
    * filter a corpus. Raw accuracy rewards majority-class parroting;
    * kappa subtracts the agreement two independent labelers with these
    * marginals would reach by chance.
    *
    * Exact arithmetic: with N rows, A agreeing rows, and
    * R = Σ_class rowMarginal·colMarginal,
    * kappa = (N·A − R) / (N² − R) — one division of exact 64-bit
    * integers, so the double is bit-identical across engines (the
    * textbook (p_o − p_e)/(1 − p_e) divides twice and would not be).
    *
    * Scale shape: one (a,b)-keyed confusion hash agg (bounded by the
    * label-domain square), then marginal aggs and 1-row scalar
    * cross-joins over that tiny table. One corpus shuffle total.
    */
  def cohensKappa(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val conf = pairs.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val total = conf.agg(sum(col("cnt")).as("nn"))
    val diag = conf.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("agree"))
    val rowm = conf.groupBy(col("a")).agg(sum(col("cnt")).as("na"))
    val colm = conf.groupBy(col("b")).agg(sum(col("cnt")).as("nb"))
    // na·nb is a product of two corpus-scale marginals (~N² — wraps a
    // long at N ≈ 3·10⁹) → staged through DECIMAL(38,0); kappa's N·A and
    // N² products likewise. The reported `rowcol` column keeps its BIGINT
    // schema (representational bound: exceeds 2⁶³ only past N ≈ 3·10⁹
    // rows ALL in one confusion cell-pair — kappa itself stays exact).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rc = rowm.join(colm, col("a") === col("b"))
      .agg(coalesce(sum(col("na").cast(dec) * col("nb").cast(dec)),
        lit(0L).cast(dec)).as("_rowcol"))
    total.crossJoin(broadcast(diag)).crossJoin(broadcast(rc))
      .select(col("nn").as("n"), col("agree"),
        col("_rowcol").cast("long").as("rowcol"),
        ((col("nn").cast(dec) * col("agree") - col("_rowcol")).cast("double") /
          (col("nn").cast(dec) * col("nn") - col("_rowcol")).cast("double"))
          .as("kappa"))
  }

  /** Grouped ordinary-least-squares fit over two INTEGER-VALUED columns
    * (quantize first, the [[corrExact]] contract) — the trend-line of a
    * metric against a driver per segment: bytes vs docs per crawl,
    * quality vs length per domain, price vs quantity per flag. Spark's
    * built-in `regr_slope` folds doubles and its last bits depend on
    * partition layout; this variant carries the moment sums exactly.
    *
    * Five per-group sums held as DECIMAL(38,0) (Σy² of a cents-quantized
    * metric overflows a long at ~10⁶ rows; 128-bit decimals stay exact
    * and associative so map-side partials stay partition-independent).
    * Closed forms with ONE double division each — never the two-step
    * `intercept = ȳ − slope·x̄`, which would compound rounding:
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    *   r²        = cov² / (varx·vary), each factor exact-cast to double
    * DuckDB replays bit-for-bit via HUGEINT sums.
    *
    * Scale shape: one hash agg with map-side partials (the exchange
    * carries one 5-sum row per group per map partition), then scalar
    * projection. One corpus shuffle total, no window.
    */
  def linregExact(df: DataFrame, groupCols: Seq[String],
                  xCol: String, yCol: String): DataFrame = {
    val g = groupCols.map(col)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val base = df.select(g :+ x.as("_x") :+ y.as("_y"): _*)
    val sums = base.groupBy(g: _*).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("_x").cast(dec)).as("sx"),
      sum(col("_y").cast(dec)).as("sy"),
      sum(col("_x").cast(dec) * col("_x").cast(dec)).as("sxx"),
      sum(col("_y").cast(dec) * col("_y").cast(dec)).as("syy"),
      sum(col("_x").cast(dec) * col("_y").cast(dec)).as("sxy"))
    val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    sums.select(g :+ col("n").cast("long").as("n") :+
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope") :+
      ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("intercept") :+
      ((cov * cov) / (varx * vary)).as("r2"): _*)
  }

  /** Scaled Benford first-digit probabilities: floor(log10(1+1/d)·2⁴⁰)
    * for d = 1..9 — FIXED literals shared verbatim with the oracle, so
    * no engine ever evaluates a log. */
  private[graft] val BenfordScaled: Seq[(Int, Long)] = Seq(
    1 -> 330985980541L, 2 -> 193614386881L, 3 -> 137371593660L,
    4 -> 106553686150L, 5 -> 87060700731L, 6 -> 73608773641L,
    7 -> 63762820019L, 8 -> 56242793220L, 9 -> 50310892929L)

  /** Empirical-Bayes rate shrinkage (additive/m-estimate smoothing —
    * the Laplace/Dirichlet posterior mean): per-key success rates pulled
    * toward the global rate with prior strength m,
    *   shrunk_k = (x_k + m·(T/N)) / (n_k + m)
    * — the fix for small-sample league tables ("this domain is 2/2 =
    * 100% quality!") before using per-key rates to gate or mix a corpus.
    * Keys with few trials land near the global rate; data-rich keys keep
    * their own.
    *
    * Exact form: shrunk_k = (x_k·N + m·T) / (N·(n_k + m)) — cross-
    * multiplied so both sides are exact longs, ONE double division per
    * key (the naive two-division form would compound rounding).
    *
    * Scale shape: one key-keyed (n, x) hash agg + a 1-row (N, T) global
    * broadcast. One corpus shuffle.
    */
  def rateShrinkage(df: DataFrame, keyCols: Seq[String], hitCol: String,
                    priorStrength: Long): DataFrame = {
    require(priorStrength >= 0)
    val g = keyCols.map(col)
    val hit = col(hitCol).cast("boolean").cast("long")
    val per = df.select(g :+ hit.as("_x"): _*)
      .groupBy(g: _*).agg(count(lit(1)).as("n"), sum(col("_x")).as("x"))
    val global = per.agg(sum(col("n")).as("nn"), sum(col("x")).as("tt"))
    per.crossJoin(broadcast(global))
      .select(g :+ col("n") :+ col("x") :+
        ((col("x") * col("nn") + lit(priorStrength) * col("tt")).cast("double") /
          (col("nn") * (col("n") + lit(priorStrength))).cast("double"))
          .as("shrunk_rate"): _*)
  }

  /** Quantile normalization (the micro-array/batch-effect classic,
    * Bolstad 2003): map each group's value distribution onto the POOLED
    * distribution so downstream comparisons see identical marginals —
    * the fix when two crawls/labs/sources measured the same quantity
    * with different systematic stretch. Output: the per-(group, value)
    * mapping (group, v, c, target) — appliable to rows by an equi-join
    * on (group, v).
    *
    * Exact integer rule (no float quantiles anywhere): a value v in
    * group g with c ties and C below sits at the scaled BLOCK MIDPOINT
    * pos2 = 2C + c (of 2n_g — the symmetric (k−½)/n convention, so the
    * first and last values sit ½/n in from the pooled extremes); its
    * target is the SMALLEST pooled value t with 2·cumPool(t)·n_g ≥
    * pos2·N — every comparison a product of exact longs, so the mapping
    * is bit-identical across engines and partitionings, and a group that
    * IS the pool maps onto itself.
    *
    * Scale shape: the corpus collapses into per-group and pooled VALUE
    * HISTOGRAMS first (two hash aggs); ordered windows and the
    * least-upper-bound lookup run over histograms only (quantization-
    * bounded, the [[aucExact]] precedent) — the lookup is a min_by over
    * the histogram-×-histogram candidate join, never row-level.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val gh = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gcum = gh
      .withColumn("cbelow", coalesce(sum(col("c")).over(wg), lit(0L)))
    val gn = gh.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val pool = base.groupBy(col("v")).agg(count(lit(1)).as("cp"))
    val wp = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pcum = pool.withColumn("cum_pool", sum(col("cp")).over(wp))
      .select(col("v").as("t"), col("cum_pool"))
    val nPool = pool.agg(sum(col("cp")).as("n_pool"))
    gcum.join(gn, Seq("g")).crossJoin(broadcast(nPool))
      .withColumn("pos2", lit(2L) * col("cbelow") + col("c"))
      .join(broadcast(pcum),
        lit(2L) * col("cum_pool") * col("n_g") >= col("pos2") * col("n_pool"))
      .groupBy(col("g"), col("v"), col("c"))
      .agg(min(col("t")).as("target"))
  }

  /** Exact Gini coefficient of an INTEGER-VALUED quantity — the
    * concentration number behind "is the corpus dominated by a few
    * domains?" / "do 1% of users produce 90% of events?": 0 = perfectly
    * even, →1 = all mass on one unit.
    *
    * The textbook formula G = (2Σᵢ i·x₍ᵢ₎ − (N+1)Σx) / (N·Σx) needs the
    * values SORTED — a corpus-wide single-partition sort. This version
    * collapses the corpus into the value histogram first (one hash agg)
    * and uses the rank-block identity for a run of c equal values v with
    * C values below: Σranks·x = v·(c·C + c(c+1)/2), so
    *   2Σᵢi·x₍ᵢ₎ = Σ_v v·(2cC + c² + c)
    * — every term an exact long off cumulative sums OVER THE HISTOGRAM
    * (quantization-bounded, the [[aucExact]] precedent). ONE double
    * division at the end. Output: (n_units, total, gini).
    */
  def giniExact(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cbelow", coalesce(sum(col("c")).over(w), lit(0L)))
    // v·c·cbelow multiplies a value by TWO corpus-scale counts (~v·N² —
    // wraps a long at N ≈ 10⁶ for cents-scale v) → the rank-block terms
    // are staged through DECIMAL(38,0); Σv·c stays within the linear
    // sum-of-values envelope but rides the same staging for one schema.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    cum.agg(
        sum(col("c")).as("n_units"),
        sum(col("v").cast(dec) * col("c")).as("_total"),
        sum(col("v").cast(dec) * (lit(2L).cast(dec) * col("c") * col("cbelow") +
          col("c").cast(dec) * col("c") + col("c"))).as("_two_six"))
      .select(col("n_units"), col("_total").cast("long").as("total"),
        ((col("_two_six") - (col("n_units").cast(dec) + 1L) * col("_total"))
          .cast("double") /
          (col("n_units").cast(dec) * col("_total")).cast("double")).as("gini"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over an INTEGER-VALUED
    * metric — D = max_v |F₁(v) − F₂(v)|, the distribution-drift test
    * that compares WHOLE CDFs where a mean/variance check sees nothing
    * (and log-free where PSI would import engine-variant ln): "does
    * this week's length distribution still look like last week's?"
    * before a corpus version ships.
    *
    * Exact arithmetic: with per-value counts (c₁, c₂) and totals
    * (n₁, n₂), the scaled gap |cum₁·n₂ − cum₂·n₁| is an exact long, so
    * the argmax is an exact-integer comparison and D itself is ONE
    * double division at the end. Ties in the gap break toward the
    * smallest value (max_by on (gap, −v)).
    *
    * Scale shape: the corpus collapses FIRST into the per-value
    * histogram (one hash agg); cumulative sums run over the histogram —
    * bounded by the metric's quantization domain, the [[aucExact]]
    * precedent — never over rows. Output: one row
    * (n1, n2, d_at_value, d_num, d).
    */
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(col(valueCol).cast("long").as("v"),
        col(groupCol).cast("boolean").as("g"))
      .groupBy(col("v"))
      .agg(sum(when(col("g"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("g"), 0L).otherwise(1L)).as("c2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    val tot = hist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"), col("v"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("gap"))
      .groupBy(col("n1"), col("n2"))
      .agg(max_by(struct(col("v"), col("gap")),
        struct(col("gap"), (-col("v")).cast("long"))).as("_m"))
      .select(col("n1"), col("n2"), col("_m.v").as("d_at_value"),
        col("_m.gap").as("d_num"),
        (col("_m.gap").cast("double") /
          (col("n1") * col("n2")).cast("double")).as("d"))
  }

  /** CUPED variance reduction (Deng et al. 2013, WSDM — "Improving the
    * Sensitivity of Online Controlled Experiments"): adjust each unit's
    * experiment metric y by its PRE-EXPERIMENT covariate x,
    *   y' = y − θ·(x − x̄),  θ = cov(x,y)/var(x),
    * so cohort means keep their expectations but shed the variance x
    * explains — the industry-standard way to detect smaller effects with
    * the same traffic. θ is exactly the pooled OLS slope, computed like
    * [[linregExact]] from DECIMAL(38,0) moment sums with ONE double
    * division; cohort-mean adjustments are then fixed-order flops, so
    * the whole table is bit-identical across engines and partitionings.
    *
    * Output: one row per cohort — (cohort, n, mean_y, mean_y_adj) plus
    * the shared θ (broadcast back onto the cohort rows).
    *
    * Scale shape: one global 1-row moment agg + one cohort-keyed agg
    * over the same scan shape, met by a 1-row broadcast. Two corpus
    * shuffles of unit-level rows (the unit table is already one row per
    * experiment unit — aggregate events to units first).
    */
  def cuped(units: DataFrame, cohortCol: String, xCol: String, yCol: String)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = units.select(col(cohortCol).as("cohort"),
      col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
    val g = base.agg(count(lit(1)).cast(dec).as("gn"),
      sum(col("_x").cast(dec)).as("gsx"), sum(col("_y").cast(dec)).as("gsy"),
      sum(col("_x").cast(dec) * col("_x").cast(dec)).as("gsxx"),
      sum(col("_x").cast(dec) * col("_y").cast(dec)).as("gsxy"))
    val theta = (col("gn") * col("gsxy") - col("gsx") * col("gsy"))
      .cast("double") /
      (col("gn") * col("gsxx") - col("gsx") * col("gsx")).cast("double")
    val per = base.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("csx"),
        sum(col("_y")).as("csy"))
    val meanY = col("csy").cast("double") / col("n").cast("double")
    val meanXc = col("csx").cast("double") / col("n").cast("double")
    val meanXg = col("gsx").cast("double") / col("gn").cast("double")
    per.crossJoin(broadcast(g))
      .select(col("cohort"), col("n"), meanY.as("mean_y"),
        (meanY - theta * (meanXc - meanXg)).as("mean_y_adj"),
        theta.as("theta"))
  }

  /** Two-proportion z-test (the A/B-test primitive): did cohorts A and B
    * convert at different rates, or is the gap noise? Pooled-variance z,
    *   z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)),
    * evaluated in a FIXED operation order over exact counts so both
    * engines produce the identical double: each pᵢ is one exact
    * division, the pooled p̂ likewise, and the two final flops (divide,
    * IEEE-correctly-rounded sqrt) are order-pinned. |z| > 1.96 ⇒ 95%
    * significance — reported as the exact-integer-safe z² vs a literal
    * threshold is left to callers; z itself is the deliverable.
    *
    * Scale shape: one 2-group hash agg (map-side partials) pivoted into
    * a single row. One corpus shuffle, constant-size downstream.
    *
    * Cohort-column contract: the test is defined over EXACTLY two
    * cohorts. When the column carries more, only the two
    * lexicographically-smallest cohort labels (as strings) are compared
    * and the rest are DROPPED — deliberate, so a dirty dimension cannot
    * fail the pipeline, but callers who need strictness should pre-assert
    * the domain. `n1 + n2` < the input row count is the tell.
    */
  def twoProportionZ(df: DataFrame, cohortCol: String, hitCol: String)
      : DataFrame = {
    val hit = col(hitCol).cast("boolean").cast("long")
    val agg = df.select(col(cohortCol).cast("string").as("_c"), hit.as("_x"))
      .groupBy(col("_c")).agg(count(lit(1)).as("n"), sum(col("_x")).as("x"))
    val keys = agg.select(col("_c")).orderBy(col("_c")).limit(2)
    val row = agg.join(broadcast(keys), Seq("_c"), "left_semi")
      .agg(
        min_by(struct(col("n"), col("x")), col("_c")).as("_a"),
        max_by(struct(col("n"), col("x")), col("_c")).as("_b"))
      .select(col("_a.n").as("n1"), col("_a.x").as("x1"),
        col("_b.n").as("n2"), col("_b.x").as("x2"))
    val p1 = col("x1").cast("double") / col("n1").cast("double")
    val p2 = col("x2").cast("double") / col("n2").cast("double")
    val pp = (col("x1") + col("x2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    row.select(col("n1"), col("x1"), col("n2"), col("x2"),
      ((p1 - p2) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n1").cast("double") +
            lit(1.0) / col("n2").cast("double")))).as("z"))
  }

  /** Exact ROC-AUC over an INTEGER-VALUED score (quantize first — the
    * [[corrExact]] contract): the probability a random positive outranks
    * a random negative, tie-aware (Mann–Whitney U) — the metric of
    * record for "does this cheap signal actually separate the classes?"
    * before promoting a quality score or classifier to a corpus filter.
    *
    * Pair-counting form, not rank windows over rows: with per-score
    * positives p_s and negatives n_s,
    *   AUC = (2·Σ_s p_s·N(<s) + Σ_s p_s·n_s) / (2·P·N)
    * (concordant pairs + half the ties) — all exact longs, ONE double
    * division. A row-level rank window would be a corpus-wide
    * single-partition sort; here the corpus collapses FIRST into the
    * score histogram (one hash agg), and the only ordered window runs
    * over that histogram — bounded by the score's quantization domain,
    * the [[bootstrapCi]] B-row precedent, never corpus-sized.
    *
    * Output: one row — (n_pos, n_neg, concordant2 = 2C+T, auc).
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("s"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("p"),
        sum(when(col("y"), 0L).otherwise(1L)).as("n"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = hist
      .withColumn("cum_n_below", coalesce(sum(col("n")).over(w), lit(0L)))
    // p·cum_n_below is a product of two corpus-scale counts (~N²/4 —
    // wraps a long at N ≈ 6·10⁹) → staged through DECIMAL(38,0), as is
    // the 2·P·N denominator. `concordant2` keeps its BIGINT output
    // schema (representational bound at N ≈ 4·10⁹ pairs; auc itself
    // stays exact in the decimal path).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    scored.agg(
        sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(lit(2L).cast(dec) * col("p") * col("cum_n_below") +
          col("p").cast(dec) * col("n")).as("_concordant2"))
      .select(col("n_pos"), col("n_neg"),
        col("_concordant2").cast("long").as("concordant2"),
        (col("_concordant2").cast("double") /
          (lit(2L).cast(dec) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** One-pass correlation matrix — every pairwise Pearson correlation of
    * k INTEGER-VALUED columns from a SINGLE aggregation over a SINGLE
    * scan: the profiling step before feature selection / redundancy
    * pruning, where the naive approach (one [[corrExact]] per pair)
    * costs k²/2 scans. All k + k(k+1)/2 moment sums ride in one
    * map-side-partial hash agg as DECIMAL(38,0) (Σxy of two cents-scale
    * columns overflows a long); the pair rows then assemble from the
    * 1-row result with the [[corrExact]] closed form — exact products,
    * one division + two IEEE sqrts per pair.
    *
    * Scale shape: one corpus scan, one 1-row aggregate (the exchange
    * carries one (k²/2)-sum row per map partition), then k²/2 1-row
    * projections unioned — constant-sized downstream of the scan.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val sums =
      cols.map(c => sum(col(c).cast(dec)).as(s"_s_$c")) ++
      (for { i <- cols.indices; j <- cols.indices if i <= j }
        yield sum(col(cols(i)).cast(dec) * col(cols(j)).cast(dec))
          .as(s"_p_${cols(i)}_${cols(j)}"))
    val m = base.agg(count(lit(1)).cast(dec).as("_n"), sums: _*)
    // all pair rows explode out of the SAME 1-row aggregate — a union of
    // per-pair selects would replan (and rescan) the corpus once per pair
    val pairStructs = pairs.map { case (a, b) =>
      val (sa, sb) = (col(s"_s_$a"), col(s"_s_$b"))
      val (saa, sbb, sab) =
        (col(s"_p_${a}_$a"), col(s"_p_${b}_$b"), col(s"_p_${a}_$b"))
      struct(lit(a).as("x"), lit(b).as("y"),
        col("_n").cast("long").as("n"),
        ((col("_n") * sab - sa * sb).cast("double") /
          (sqrt((col("_n") * saa - sa * sa).cast("double")) *
            sqrt((col("_n") * sbb - sb * sb).cast("double")))).as("corr"))
    }
    m.select(explode(array(pairStructs: _*)).as("_pair")).select(col("_pair.*"))
  }

  /** Benford's-law first-digit audit (Newcomb 1881 / Benford 1938; the
    * forensic-accounting screen): naturally-occurring magnitudes spread
    * over several orders have first-digit frequencies log10(1+1/d);
    * fabricated, truncated, capped, or default-filled numeric columns do
    * not. Per digit, observed count vs Benford expectation plus the χ²
    * contribution — the data-quality probe for "is this metric column
    * organic?".
    *
    * Log-free determinism: the nine Benford probabilities enter as the
    * FIXED 2⁴⁰-scaled integer literals [[BenfordScaled]] (identical in
    * the oracle SQL — neither engine evaluates log10, whose last ulp
    * differs between libm and the JVM). With O observed, N total, C the
    * scaled probability: expected = N·C / 2⁴⁰ and
    * contrib = (O·2⁴⁰ − N·C)² / (2⁴⁰·N·C), numerator/denominator exact
    * DECIMAL(38,0) (the squared diff tops 10³⁴ at corpus scale), ONE
    * double division each.
    *
    * Scale shape: a narrow first-digit projection, one 9-ary hash agg,
    * a 1-row N broadcast, and a 9-row literal join. One corpus shuffle.
    */
  def benfordDigits(df: DataFrame, valCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val two40 = lit(1099511627776L) // 2^40
    val sess = df.sparkSession
    import sess.implicits._
    val bench = broadcast(BenfordScaled.toDF("digit", "c_scaled"))
    val observed = df
      .filter(col(valCol) >= 1)
      .select(substring(floor(col(valCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = observed.agg(sum(col("n_obs")).as("nn"))
    // Drive from the 9-row literal table so a digit with ZERO observations
    // — the most anomalous audit outcome — still emits its row (n_obs = 0,
    // full χ² contribution) instead of vanishing from the report.
    val digits = bench.join(observed, Seq("digit"), "left")
      .select(col("digit"), col("c_scaled"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val diff = (col("n_obs").cast(dec) * two40.cast(dec) -
      col("nn").cast(dec) * col("c_scaled").cast(dec))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        ((col("nn").cast(dec) * col("c_scaled").cast(dec)).cast("double") /
          two40.cast("double")).as("expected"),
        ((diff * diff).cast("double") /
          (two40.cast(dec) * col("nn").cast(dec) * col("c_scaled").cast(dec))
            .cast("double")).as("contrib"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) over an
    * INTEGER-VALUED column with a bounded domain (the [[aucExact]]
    * contract): does cohort A's value distribution stochastically
    * dominate cohort B's — the nonparametric A/B read when means are
    * skew-fragile.
    *
    * Pair-counting via the value histogram, never rank windows over
    * rows: the corpus collapses FIRST into per-value cohort counts (one
    * hash agg); the only ordered window runs over that bounded-domain
    * histogram. With average ranks r(v) = cum(<v) + (t+1)/2 carried ×2
    * to stay integral, 2·R1 = Σ n1(v)·(2·cum + t + 1), 2·U1 = 2·R1 −
    * n1(n1+1), and the tie-corrected variance
    *   Var(U) = n1·n2·(N³ − N − Σ(t³−t)) / (12·N·(N−1))
    * rides in DECIMAL(38,0) (N³ wraps a long past N ≈ 2M). The z-score
    * is the ONLY float step, its operand order mirrored in the oracle:
    *   z = (2U1 − n1n2) / (2·√(Var)).
    *
    * Output: one row — (n_a, n_b, u1_x2 = 2·U1, z).
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val hist = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).cast("long").as("v"),
        (col(groupCol) === groupA).as("isa"))
      .groupBy(col("v"))
      .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("isa"), 0L).otherwise(1L)).as("n2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = hist
      .withColumn("t", col("n1") + col("n2"))
      .withColumn("cum", coalesce(sum(col("n1") + col("n2")).over(w), lit(0L)))
    val a = scored.agg(
      sum(col("n1")).as("na"), sum(col("n2")).as("nb"),
      sum(col("n1").cast(dec) *
        (lit(2L) * col("cum") + col("t") + lit(1L)).cast(dec)).as("r1x2"),
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
        col("t").cast(dec)).as("tsum"))
    val nn = (col("na") + col("nb")).cast(dec)
    val u1x2 = col("r1x2") -
      col("na").cast(dec) * (col("na").cast(dec) + lit(1L).cast(dec))
    val aNum = u1x2 - col("na").cast(dec) * col("nb").cast(dec)
    val bVar = col("na").cast(dec) * col("nb").cast(dec) *
      (nn * nn * nn - nn - col("tsum"))
    a.select(col("na").as("n_a"), col("nb").as("n_b"),
      u1x2.cast("long").as("u1_x2"),
      (aNum.cast("double") /
        (lit(2.0) * sqrt(bVar.cast("double") /
          (lit(12L).cast(dec) * nn * (nn - lit(1L).cast(dec)))
            .cast("double")))).as("z"))
  }

  /** Kendall τ-b rank correlation (Kendall 1938; tie-corrected τ-b per
    * Kendall 1945) between two INTEGER-VALUED bounded-domain columns —
    * the monotone-association read that, unlike Pearson, ignores scale
    * and outliers entirely.
    *
    * Pair counting over the joint-value histogram: the corpus collapses
    * FIRST into |X|·|Y| cells (one hash agg, checkpointed once — the
    * concordance self-join would otherwise replan and rescan the
    * corpus), then concordant/discordant pair counts come from the
    * cell×cell join on x_a < x_b — bounded by the DOMAIN size squared,
    * never the corpus. Tie terms from the marginals, everything exact:
    *   τ-b = 2·(C − D) / (√(n(n−1) − Σtx(tx−1)) · √(n(n−1) − Σty(ty−1)))
    * with the doubled forms kept integral and the final expression
    * order mirrored in the oracle.
    *
    * Output: one row — (n, conc, disc, tau_b).
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = graft.util.Checkpoints.truncate(
      df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c")))
    val pairs = cells.select(col("x").as("xa"), col("y").as("ya"),
        col("c").as("ca"))
      .join(broadcast(cells.select(col("x").as("xb"), col("y").as("yb"),
        col("c").as("cb"))), col("xa") < col("xb"))
      .agg(
        sum(when(col("ya") < col("yb"),
          col("ca").cast(dec) * col("cb").cast(dec)).otherwise(lit(0L).cast(dec)))
          .as("conc"),
        sum(when(col("ya") > col("yb"),
          col("ca").cast(dec) * col("cb").cast(dec)).otherwise(lit(0L).cast(dec)))
          .as("disc"))
    val xm = cells.groupBy(col("x")).agg(sum(col("c")).as("tx"))
      .agg(sum(col("tx").cast(dec) * (col("tx") - 1L).cast(dec)).as("tiex2"),
        sum(col("tx")).cast(dec).as("n"))
    val ym = cells.groupBy(col("y")).agg(sum(col("c")).as("ty"))
      .agg(sum(col("ty").cast(dec) * (col("ty") - 1L).cast(dec)).as("tiey2"))
    val dx2 = col("n") * (col("n") - lit(1L).cast(dec)) - col("tiex2")
    val dy2 = col("n") * (col("n") - lit(1L).cast(dec)) - col("tiey2")
    pairs.crossJoin(broadcast(xm)).crossJoin(broadcast(ym))
      .select(col("n").cast("long").as("n"),
        col("conc").cast("long").as("conc"),
        col("disc").cast("long").as("disc"),
        (lit(2.0) * (col("conc") - col("disc")).cast("double") /
          (sqrt(dx2.cast("double")) * sqrt(dy2.cast("double"))))
          .as("tau_b"))
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955): is a
    * binary outcome monotonically associated with an ORDERED category
    * (dose, priority tier, quality bucket)? The categorical-trend
    * screen a plain χ² can't answer — χ² detects any association,
    * this detects direction.
    *
    * With per-category successes a_i, totals n_i, integer weights w_i,
    * R1 = Σa_i, R2 = N − R1:
    *   T = R2·Σw_i·a_i − R1·Σw_i·(n_i − a_i)          (exact)
    *   Var·N = R1·R2·(N·Σw_i²·n_i − (Σw_i·n_i)²)      (exact)
    *   z = T·√N / √(R1·R2·(N·Σw_i²n_i − (Σw_i n_i)²))
    * — one hash agg over categories (bounded), every moment in
    * DECIMAL(38,0), the z expression order mirrored in the oracle.
    *
    * Output: one row — (n, r1, t_stat, z).
    */
  def trendTest(df: DataFrame, weightCol: String, outcomeCol: String)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.select(col(weightCol).cast("long").as("w"),
        col(outcomeCol).cast("boolean").cast("long").as("y"))
      .groupBy(col("w"))
      .agg(sum(col("y")).as("a"), count(lit(1)).as("ni"))
    val m = rows.agg(
      sum(col("a")).cast(dec).as("r1"),
      sum(col("ni")).cast(dec).as("nn"),
      sum(col("w").cast(dec) * col("a").cast(dec)).as("swa"),
      sum(col("w").cast(dec) * (col("ni") - col("a")).cast(dec)).as("swb"),
      sum(col("w").cast(dec) * col("ni").cast(dec)).as("swn"),
      sum(col("w").cast(dec) * col("w").cast(dec) * col("ni").cast(dec))
        .as("sw2n"))
    val r2 = col("nn") - col("r1")
    val tStat = r2 * col("swa") - col("r1") * col("swb")
    val bracket = col("nn") * col("sw2n") - col("swn") * col("swn")
    m.select(col("nn").cast("long").as("n"), col("r1").cast("long").as("r1"),
      tStat.cast("long").as("t_stat"),
      (tStat.cast("double") * sqrt(col("nn").cast("double")) /
        sqrt((col("r1") * r2 * bracket).cast("double"))).as("z"))
  }
}
