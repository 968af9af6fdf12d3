package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (north-star extension over the `events` table).
  *
  * Gap-based sessions: a new session starts when the gap to the user's
  * previous event exceeds `gapMicros`. Classic two-window formulation —
  * lag -> boundary flag -> running sum = session index — then one
  * aggregation per (user, session). Both windows share the same
  * partitioning (user_id), so Spark plans ONE shuffle for the whole query.
  *
  * Timestamps are handled as integer epoch-MICROSECONDS end-to-end: the
  * testdata parquet stores nanosecond timestamps, which Spark 4 reads only
  * as raw longs (spark.sql.legacy.parquet.nanosAsLong) while DuckDB
  * truncates to micros — integer division by 1000 reconciles the two
  * bit-exactly, and all session math stays in exact integer arithmetic.
  */
object Sessions {

  /** events must carry: user_id, event_id, ts_us (long, epoch micros). */
  def sessionize(events: DataFrame, gapMicros: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val flagged = events
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Ordered funnel: for each user, the earliest time of step 1, then the
    * earliest step-2 event STRICTLY AFTER it, and so on — the
    * conversion-path query of event analytics. `stage` = how many steps
    * the user completed (sequential, so it equals the count of non-null
    * step times).
    *
    * Scale shape: one min-agg plus one user-keyed equi-join per step,
    * all on the same user_id key (the exchanges line up and AQE reuses
    * the partitioning). No windows — per-step minima are hash aggs with
    * map-side partials.
    *
    * events must carry: user_id, ts_us, event_type.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    var acc = events.select(col("user_id")).distinct()
    steps.zipWithIndex.foreach { case (step, i) =>
      val cname = s"t${i + 1}"
      val candidates =
        if (i == 0) events.filter(col("event_type") === step)
        else {
          val prev = s"t$i"
          events.filter(col("event_type") === step)
            .join(acc.select(col("user_id"), col(prev))
              .filter(col(prev).isNotNull), "user_id")
            .filter(col("ts_us") > col(prev))
        }
      val mins = candidates.groupBy(col("user_id")).agg(min(col("ts_us")).as(cname))
      acc = acc.join(mins, Seq("user_id"), "left")
    }
    acc.withColumn("stage",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _))
  }

  /** Conversion funnel with a per-transition time window: step i+1
    * counts only if it happens AFTER step i and WITHIN `windowMicros`
    * of it — the product-analytics semantics ("purchased within 7 days
    * of the first click"), where the unbounded [[funnel]] over-credits
    * conversions that took a quarter. Same shape as [[funnel]] — one
    * filtered scan + user-keyed min-agg + equi-join per step, no window
    * function — with the extra exact timestamp bound `ts ≤ t_prev + W`.
    */
  def windowedFunnel(events: DataFrame, steps: Seq[String],
                     windowMicros: Long): DataFrame = {
    require(steps.nonEmpty && windowMicros > 0)
    var acc = events.select(col("user_id")).distinct()
    steps.zipWithIndex.foreach { case (step, i) =>
      val cname = s"t${i + 1}"
      val candidates =
        if (i == 0) events.filter(col("event_type") === step)
        else {
          val prev = s"t$i"
          events.filter(col("event_type") === step)
            .join(acc.select(col("user_id"), col(prev))
              .filter(col(prev).isNotNull), "user_id")
            .filter(col("ts_us") > col(prev) &&
              col("ts_us") <= col(prev) + lit(windowMicros))
        }
      val mins = candidates.groupBy(col("user_id")).agg(min(col("ts_us")).as(cname))
      acc = acc.join(mins, Seq("user_id"), "left")
    }
    acc.withColumn("stage",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _))
  }

  /** Cohort retention: users belong to the cohort of their first active
    * day; the output counts distinct active users per (cohort,
    * day_offset) — the table every retention curve is drawn from.
    * Two user-keyed hash aggs and one user-keyed equi-join.
    *
    * events must carry: user_id, day (long day number).
    */
  def retention(events: DataFrame): DataFrame = {
    val first = events.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    events.join(first, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Growth accounting (the SaaS-metrics ledger popularized by Social
    * Capital): per period, decompose the active-user delta into new
    * (first-ever period), retained (also active the period before),
    * resurrected (active before a gap, back now), and churned (active
    * last period, gone this one — attributed to the period they went
    * missing). n_active(w) = new + retained + resurrected, and
    * n_active(w) − n_active(w−1) = new + resurrected − churned — the
    * identity GrowthSpec asserts.
    *
    * Shape: the corpus collapses FIRST into the distinct (user, period)
    * activity grid (one hash agg, checkpointed — three derivations
    * reuse it), a per-user first-period agg, one shifted full-outer
    * self-equi-join on (user, period), and a per-period exact rollup.
    * No window at all — the lifecycle classification is a join, not an
    * order.
    */
  def growthAccounting(activity: DataFrame, userCol: String,
                       periodCol: String): DataFrame = {
    val weekly = graft.util.Checkpoints.truncate(
      activity.select(col(userCol).as("u"), col(periodCol).as("w"))
        .distinct())
    val first = weekly.groupBy(col("u")).agg(min(col("w")).as("fw"))
    val cur = weekly.select(col("u"), col("w"), lit(1L).as("c"))
    val prv = weekly.select(col("u"), (col("w") + 1L).as("w"),
      lit(1L).as("p"))
    cur.join(prv, Seq("u", "w"), "full")
      .join(first, Seq("u"))
      .groupBy(col("w"))
      .agg(
        sum(when(col("c") === 1L && col("w") === col("fw"), 1L)
          .otherwise(0L)).as("n_new"),
        sum(when(col("c") === 1L && col("p") === 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("c") === 1L && col("p").isNull && col("w") > col("fw"),
          1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("c").isNull && col("p") === 1L, 1L).otherwise(0L))
          .as("n_churned"))
  }
}
