package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (pareto-frontier) query — Börzsönyi/Kossmann/Stocker 2001
  * (ICDE, "The Skyline Operator"): the rows not dominated by any other
  * row, where q dominates p iff q ≥ p in EVERY dimension and > in at
  * least one. The workhorse of trade-off selection — "largest AND most
  * expensive", "highest quality AND longest document", "best recall AND
  * lowest latency" — that a plain ORDER BY cannot express.
  *
  * Naive evaluation is the O(n²) self-anti-join; the single-pass
  * sort-and-running-max trick is a GLOBAL-order window (one partition —
  * the exact anti-pattern this repo bans). This implementation is the
  * repo's binned-prefilter + exact-residual discipline:
  *
  *  1. x is range-bucketed into B cells off a 1-row broadcast (min, max).
  *  2. Per-bucket max(y) → a ≤B-row table; its strict-suffix max
  *     `suff(b) = max_{b' > b} maxy(b')` is a B²-bounded self-join,
  *     broadcast back. Every point in a strictly later bucket has
  *     strictly larger x, so a point with y ≤ suff(bucket) is PROVABLY
  *     dominated — discarded by a narrow filter on the scan.
  *  3. Survivors (frontier-sized: per bucket, only points strictly above
  *     every later bucket's ceiling) meet in an exact domination
  *     anti-join — a broadcast nested-loop over the pruned set only,
  *     never the corpus; this residual also resolves same-bucket
  *     domination, which the bucket bound cannot see.
  *
  * At 100 TB: one corpus scan + tiny broadcasts prune to ~frontier size;
  * the quadratic step touches only survivors. B trades prefilter
  * sharpness against the broadcast size. Ties: identical points do not
  * dominate each other (no strict dimension) — both surface, matching
  * the textbook definition and the oracle's NOT EXISTS replay.
  */
object Skyline {

  /** 2-D skyline maximizing (xCol, yCol), both integer-valued (quantize
    * reals first — the [[Stats.corrExact]] contract).
    */
  def skyline2D(df: DataFrame, idCol: String, xCol: String, yCol: String,
                buckets: Int = 64): DataFrame = {
    val pts = df.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val range = pts.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"))
    // integer bucket index in [0, B): (x - xmin) * B DIV (span + 1)
    val withB = pts.crossJoin(broadcast(range))
      .withColumn("b", expr(
        s"(x - xmin) * CAST($buckets AS BIGINT) DIV (xmax - xmin + 1)"))
      .select(col("id"), col("x"), col("y"), col("b"))
    val bmax = withB.groupBy(col("b")).agg(max(col("y")).as("maxy"))
    val suff = bmax.as("lo")
      .join(bmax.as("hi"), col("hi.b") > col("lo.b"))
      .groupBy(col("lo.b").as("b")).agg(max(col("hi.maxy")).as("suffy"))
    val cand0 = withB.join(broadcast(suff), Seq("b"), "left")
      .filter(col("suffy").isNull || col("y") > col("suffy"))
      .select(col("id"), col("x"), col("y"))
    // the residual references the candidate set TWICE (both sides of the
    // domination anti-join): without truncation the whole scan + pruning
    // pipeline replans per side (9 nested-loop nodes, repeated corpus
    // scans — caught by PlanSpec). Candidates are frontier-sized, so
    // materializing them is cheap; the residual then runs over stored
    // blocks only.
    val cand = graft.util.Checkpoints.truncate(cand0)
    cand.as("p").join(cand.as("q"),
        col("q.x") >= col("p.x") && col("q.y") >= col("p.y") &&
          (col("q.x") > col("p.x") || col("q.y") > col("p.y")),
        "left_anti")
      .select(col("id"), col("x"), col("y"))
  }
}
