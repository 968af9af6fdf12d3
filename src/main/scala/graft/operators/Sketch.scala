package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible cardinality / frequency sketches.
  *
  * Spark's own `approx_count_distinct` (HLL++) and count-min live behind
  * opaque binary buffers whose estimates can never hash-match another
  * engine. These variants are built from the same published estimators
  * (Flajolet et al. 2007 HyperLogLog; Cormode & Muthukrishnan 2005
  * count-min) but on [[Portable.hash32]] and pure integer register math,
  * so DuckDB can replay them bit-for-bit — the same determinism trick as
  * [[Quantile.logLinearQuantile]] (no transcendentals, no float sums:
  * register folds are longs, the one double op is the final division).
  *
  * Scale shape (the reason sketches exist at 100 TB):
  *  - HLL: ONE narrow pass over the fact table → hash agg on
  *    (group, register) with map-side combine — at most groups×2^p rows
  *    ever shuffle, vs exact distinct's full key shuffle.
  *  - count-min: one pass → hash agg on (seed, bucket) — the sketch is
  *    d×w rows total (broadcastable) regardless of input size.
  */
object Sketch {

  /** HyperLogLog distinct estimate per group, p = 8 (m = 256 registers,
    * standard error 1.04/√m ≈ 6.5 %).
    *
    * Register math, all exact integers (portable to any engine):
    *  - h   = 32-bit md5 prefix of the value
    *  - j   = h >> 24 (register index, 0..255)
    *  - w   = h & 0xFFFFFF; rho = 25 − bitlen(w) (w = 0 → 25)
    *  - M_j = max(rho); Σ 2^−M_j is carried as the integer
    *    S = Σ 2^(25−M_j) (absent registers contribute 2^25), so the only
    *    float op is the final αm²·2^25 / S division.
    *
    * RAW estimator only (no low-range linear-counting correction: it
    * needs `ln`, whose last ulp differs across libm builds — the exact
    * failure mode this class exists to avoid). Below n ≈ 2.5m the raw
    * estimate carries the documented upward bias; callers counting small
    * groups should use exact distinct anyway.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol), groupCols)

  /** The register table (groups..., _j, _m): a max-fold of a pure value
    * hash, so it is (a) partition-independent and (b) MERGEABLE — the
    * union of two data slices is `max` per register, which is how a
    * 100 TB pipeline keeps per-partition/per-day sketches and answers
    * "distinct over any slice union" without rescanning
    * ([[hllEstimate]] of the max-merged registers is EXACTLY the
    * estimate a direct scan of the union would produce).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ Portable.hash32(col(valueCol)).as("_h"): _*)
      .select(g :+ expr("_h DIV 16777216").as("_j") :+
        when(expr("_h % 16777216") === 0L, lit(25))
          .otherwise(lit(25) - length(conv(expr("_h % 16777216").cast("string"), 10, 2)))
          .as("_rho"): _*)
      .groupBy(g :+ col("_j"): _*).agg(max(col("_rho")).as("_m"))
  }

  /** Estimate from a register table (the αm²·2²⁵/S formula; absent
    * registers contribute 2²⁵ to the integer S). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    registers
      .groupBy(g: _*)
      .agg(count(lit(1)).as("_c"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 25 - _m)")).as("_sp"))
      .select(g :+
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0) * lit(33554432.0) /
          ((lit(256L) - col("_c")) * lit(33554432L) + col("_sp")).cast("double"))
          .as("hll_est"): _*)
  }

  /** Count-min heavy hitters over a token stream (one row per occurrence,
    * column `token`), d = 4 hash rows × w = 512 buckets.
    *
    * The sketch is the d×w cell table (2,048 rows — broadcast side of the
    * probe join no matter the corpus size); estimate = min over the d
    * cells a token hashes to, which can only OVER-estimate (`overest` is
    * the measured slack, `bound_ok` the classic ε = 4/w additive bound).
    * The exact per-token count joined next to it is the measurement
    * harness (the [[Dedup]] `minhashError` / ANN-recall pattern — grade
    * the sketch against ground truth, don't trust it blind); a production
    * 100 TB run would keep only the sketch + per-partition candidate
    * heaps and skip the exact side.
    *
    * @param minFracDenom report tokens whose estimate ≥ N / minFracDenom
    */
  /** Trailing-`windowDays`-day sliding distinct estimates, built ENTIRELY
    * from per-day register sketches: each day's ≤ m register rows fan out
    * to the `windowDays` windows they belong to and are max-merged per
    * window (the [[hllRegisters]] merge law), so the sliding-distinct
    * series costs one scan of the data plus work proportional to
    * `days × windowDays × m` — NOT `days × window_slice` rescans. This is
    * how a 100 TB pipeline answers "7-day active distincts, daily" —
    * sliding distinct counts don't decompose like sums, but register
    * sketches do. Windows past the last observed day are suppressed (the
    * max-day scalar rides the plan as a broadcast, never collected).
    *
    * Output: (win = day index the window ends on, hll_est).
    */
  def hllSlidingDaily(df: DataFrame, dayCol: String, valueCol: String,
                      windowDays: Int): DataFrame = {
    val daily = hllRegisters(df, Seq(dayCol), valueCol)
    val maxDay = df.agg(max(col(dayCol)).as("_mx"))
    val fanned = daily
      .select(explode(sequence(col(dayCol),
        col(dayCol) + (windowDays - 1))).as("win"), col("_j"), col("_m"))
      .crossJoin(broadcast(maxDay))
      .filter(col("win") <= col("_mx")).drop("_mx")
      .groupBy(col("win"), col("_j")).agg(max(col("_m")).as("_m"))
    hllEstimate(fanned, Seq("win"))
  }

  /** The count-min cell table (seed, bucket, cell_cnt) — d×w rows. Like
    * the HLL registers and the quantile slots it is MERGEABLE: cells are
    * keyed by a pure token hash, so the sketch of a union of slices is
    * the cell-wise SUM of the slice sketches (distributed counters
    * without recounting; merge law asserted in SketchSpec).
    */
  def cmsSketch(tokens: DataFrame, d: Int = 4, w: Int = 512): DataFrame =
    cmsSketchBy(tokens, Nil, d, w)

  /** Per-group count-min cell tables (groups..., seed, bucket, cell_cnt):
    * the per-slice sketches a 100 TB pipeline keeps per partition/day so
    * any slice union is answerable by [[cmsMerge]] without a rescan.
    */
  def cmsSketchBy(tokens: DataFrame, groupCols: Seq[String],
                  d: Int = 4, w: Int = 512): DataFrame = {
    val g = groupCols.map(col)
    val seeds = explode(array((0 until d).map(lit): _*)).as("seed")
    // Cells from the term-frequency table, not the raw occurrence stream:
    // cell_cnt = Σ_{token→bucket} tf(token) is EXACTLY count over
    // occurrences, but the d md5 hashes run once per DISTINCT
    // (group, token) instead of once per occurrence — at sf10 that is
    // 4×vocab ≈ 200k hashes instead of 4×50M, and the tf groupBy ships
    // vocab-sized map-side partials instead of the d×-replicated stream.
    tokens.groupBy(g :+ col("token"): _*).agg(count(lit(1)).as("_tf"))
      .select(g :+ col("token") :+ col("_tf") :+ seeds: _*)
      .select(g :+ col("seed") :+
        (Portable.hash32(col("token"), col("seed")) % w).as("bucket") :+
        col("_tf"): _*)
      .groupBy(g ++ Seq(col("seed"), col("bucket")): _*)
      .agg(sum(col("_tf")).as("cell_cnt"))
  }

  /** Cell-wise SUM-merge of per-slice count-min sketches: counters are
    * additive on pure-hash keys, so the merged table is EXACTLY the
    * sketch a direct scan of the union would build (graded in
    * q_cms_union; law also property-tested in SketchSpec). Input is a
    * union of [[cmsSketchBy]] outputs with their group columns dropped.
    */
  def cmsMerge(cells: DataFrame): DataFrame =
    cells.groupBy(col("seed"), col("bucket"))
      .agg(sum(col("cell_cnt")).as("cell_cnt"))

  /** Join-size estimation via the count-min INNER PRODUCT (Cormode &
    * Muthukrishnan 2005, §4.2): for two frequency vectors a, b over the
    * same key domain, |a ⋈ b| = Σ_k a(k)·b(k), and the sketch estimate
    * est_d = Σ_bucket A_d[bucket]·B_d[bucket] satisfies est ≥ true
    * ALWAYS (collisions only add cross terms) and, per seed,
    * est ≤ true + (e/w)·‖a‖₁·‖b‖₁ with high probability; the published
    * estimate takes the min over the d seeds. This is what a 100 TB
    * planner wants BEFORE committing to a join strategy: both sketches
    * are w·d-cell tables buildable in one pass per side (mergeable
    * across slices via [[cmsMerge]]), so the estimate costs two scans
    * that were often already paid for heavy-hitter stats — no key-level
    * shuffle of either side.
    *
    * Emits one row with the estimate, the exact size (for grading — a
    * production call passes gradeExact = false and gets only the
    * estimate + ℓ₁ norms, skipping the key-level exact join entirely),
    * both ℓ₁ norms, and the two guarantee bits.
    *
    * Cost shape: each side is scanned ONCE into its token-frequency
    * table (one hash agg), which is lineage-truncated and then feeds all
    * three consumers — the sketch (hash per DISTINCT token × d, not per
    * occurrence × d: on an FK side with multiplicity m that is a m·d-fold
    * reduction in hash evaluations), the exact grading join, and the ℓ₁
    * norms — with no rescans. Downstream is w·d-cell tables, a
    * (seed,bucket) cell equi-join, and 1-row broadcast cross joins.
    */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame, d: Int = 4,
                          w: Int = 512, gradeExact: Boolean = true): DataFrame = {
    // Frequency tables are key-domain-sized (≪ input) and referenced by
    // 2–3 consumers each — truncate so each is computed exactly once.
    val fa = graft.util.Checkpoints.truncate(
      a.groupBy(col("token")).agg(count(lit(1)).as("n")))
    val fb = graft.util.Checkpoints.truncate(
      b.groupBy(col("token")).agg(count(lit(1)).as("n")))
    val seeds = explode(array((0 until d).map(lit): _*)).as("seed")
    // Sketch from the frequency table: cell_cnt = Σ n over tokens in the
    // bucket — identical to the per-occurrence build, d× fewer hashes.
    def sketchOf(f: DataFrame, out: String) = f
      .select(col("token"), col("n"), seeds)
      .select(col("seed"),
        (Portable.hash32(col("token"), col("seed")) % w).as("bucket"),
        col("n"))
      .groupBy(col("seed"), col("bucket")).agg(sum(col("n")).as(out))
    // ca·cb and na·nb are products of two corpus-scale counts (~(N/w)²
    // and token-frequency², both quadratic in N — wrap a long at
    // N ≈ w·3·10⁹) → staged through DECIMAL(38,0); the graded outputs
    // keep their BIGINT schema (representational bound, not a wrap).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val est = sketchOf(fa, "ca").join(sketchOf(fb, "cb"), Seq("seed", "bucket"))
      .groupBy(col("seed"))
      .agg(sum(col("ca").cast(dec) * col("cb").cast(dec)).as("dot"))
      .agg(min(col("dot")).cast("long").as("est_join"))
    val sizes = fa.agg(sum(col("n")).as("n_a"))
      .crossJoin(fb.agg(sum(col("n")).as("n_b")))
    if (!gradeExact)
      est.crossJoin(broadcast(sizes))
        .select(col("est_join"), col("n_a"), col("n_b"))
    else {
      val exact = fa.withColumnRenamed("n", "na")
        .join(fb.withColumnRenamed("n", "nb"), "token")
        .agg(coalesce(sum(col("na").cast(dec) * col("nb").cast(dec)),
          lit(0L).cast(dec)).cast("long").as("exact_join"))
      est.crossJoin(broadcast(exact)).crossJoin(broadcast(sizes))
        .select(col("est_join"), col("exact_join"), col("n_a"), col("n_b"),
          (col("est_join") - col("exact_join")).as("overest"),
          (col("est_join") >= col("exact_join")).as("never_under"),
          (col("est_join").cast(dec) <= col("exact_join").cast(dec) +
            col("n_a").cast(dec) * col("n_b").cast(dec) * 3L / lit(w)
              .cast(dec)).as("bound_ok"))
    }
  }

  def cmsHeavyHitters(tokens: DataFrame, d: Int = 4, w: Int = 512,
                      minFracDenom: Long = 200L): DataFrame = {
    val seeds = explode(array((0 until d).map(lit): _*)).as("seed")
    val occ = tokens.select(col("token"))
    // One corpus scan total: the exact tf table (checkpointed — it is
    // vocab-sized) feeds the sketch cells (Σ tf per hashed bucket ≡ the
    // occurrence count), the estimates, and the stream total.
    val exact = graft.util.Checkpoints.truncate(
      occ.groupBy(col("token")).agg(count(lit(1)).as("exact_cnt")))
    val sketch = exact.select(col("token"), col("exact_cnt"), seeds)
      .groupBy(col("seed"),
        (Portable.hash32(col("token"), col("seed")) % w).as("bucket"))
      .agg(sum(col("exact_cnt")).as("cell_cnt"))
    val total = exact.agg(sum(col("exact_cnt")).as("_n"))
    exact.select(col("token"), col("exact_cnt"), seeds)
      .select(col("token"), col("exact_cnt"), col("seed"),
        (Portable.hash32(col("token"), col("seed")) % w).as("bucket"))
      .join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(col("token")).agg(max(col("exact_cnt")).as("exact_cnt"),
        min(col("cell_cnt")).as("est_cnt"))
      .crossJoin(broadcast(total))
      .filter(col("est_cnt") >= expr(s"_n DIV $minFracDenom"))
      .select(col("token"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overest"),
        (col("est_cnt") <= col("exact_cnt") + expr(s"4 * (_n DIV $w)")).as("bound_ok"))
  }
}
