package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB path.
  *
  * A `groupBy(key)` over a key with a hot value (one species covering half
  * the continent, one language covering half the corpus) funnels the hot
  * key's entire volume through one reducer. Salting splits each key into
  * `saltBuckets` sub-keys for the partial phase, then recombines — the hot
  * key's work spreads across `saltBuckets` tasks and the final phase only
  * sees `saltBuckets` pre-aggregated rows per key.
  *
  * The salt is derived deterministically from carrier columns (not rand()),
  * so results are reproducible and oracle-checkable: the output is
  * IDENTICAL to the unsalted aggregation, only the plan shape differs.
  * (AQE's skewedJoin handles join skew at runtime; aggregation skew still
  * benefits from explicit salting when partial aggregation alone can't
  * reduce — e.g. distinct-heavy or object aggregates like the JTS union.)
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates.
    *
    * @param carriers columns whose hash spreads the hot key (must be
    *                 high-cardinality within the hot key)
    * @param partials (partialAgg, outputName, finalAgg) triples — e.g.
    *                 count: (count(lit(1)), "n", c => sum(c));
    *                 sum:   (sum(x), "sum_x", c => sum(c))
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], carriers: Seq[Column],
                      saltBuckets: Int,
                      partials: Seq[(Column, String, Column => Column)]): DataFrame = {
    require(partials.nonEmpty, "saltedAggregate needs at least one aggregate")
    val salt = pmod(hash(carriers: _*), lit(saltBuckets)).as("_salt")
    val phase1 = df
      .withColumn("_salt", salt)
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._1.as(s"_p0"),
        partials.tail.zipWithIndex.map { case ((c, _, _), i) => c.as(s"_p${i + 1}") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._3(col("_p0")).as(partials.head._2),
        partials.tail.zipWithIndex.map { case ((_, name, fin), i) =>
          fin(col(s"_p${i + 1}")).as(name)
        }: _*)
  }

  /** Skew-salted equi-join: the big (skewed) side takes a deterministic
    * salt in [0, saltBuckets); the small side replicates once per salt
    * value, so `(key, salt)` stays an equi-join and a hot key's rows
    * spread over `saltBuckets` tasks instead of one. Output is IDENTICAL
    * to the plain join — only the plan shape changes.
    *
    * When to reach for this instead of AQE's runtime skew-join split:
    * shuffled-HASH joins (AQE splits only sort-merge), aggregate-after-
    * join pipelines where the salt can carry into the partial agg, and
    * engines/configs where AQE is off. Replication cost = |small| ×
    * saltBuckets rows — the small side must actually be small.
    *
    * The join strategy is PINNED to shuffled-hash on both sides: the
    * replicated side is built from `explode(sequence(...))`, and a
    * Generate node wrecks Catalyst's size estimate — left to stats, the
    * optimizer can decide the ×saltBuckets-replicated side is "small"
    * and BROADCAST it, which both negates the parallelism fix (every
    * task sees every key again) and risks a driver OOM when the
    * replicated side carries embeddings. The r15 sf10 bench measured
    * exactly this failure on the FastSS join; the hint makes the shape
    * immune to stats/AQE drift (SkewSpec pins it).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 carriers: Seq[Column], saltBuckets: Int): DataFrame = {
    val sc = "__skew_salt"
    require(!big.columns.contains(sc) && !small.columns.contains(sc),
      s"saltedJoin: input already carries a '$sc' column")
    val salted = big.withColumn(sc, pmod(hash(carriers: _*), lit(saltBuckets)))
    val replicated = small.withColumn(sc,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.hint("shuffle_hash").join(replicated.hint("shuffle_hash"),
      Seq(key, sc)).drop(sc)
  }

  /** The measurement that decides whether [[saltedAggregate]]/[[saltedJoin]]
    * (or AQE's skew split) is needed at all: the per-key row-count
    * distribution of a prospective shuffle key, as one summary row —
    * key cardinality, hottest-key share of all rows, exact p50/p99 of
    * per-key counts, and `skew_ratio` = max/mean (1.0 = perfectly uniform;
    * the straggler factor a key-partitioned shuffle of this data would
    * see). Run it BEFORE committing a pipeline to groupBy/join on a key —
    * at 100 TB a hot key found here is a salted plan instead of a dead
    * executor found in production.
    *
    * Shape: one keyed hash agg (map-side partials) collapses the data to
    * |keys| count rows; the summary is a partial+final scalar aggregate
    * over those counts. The raw table is never sorted or funneled.
    */
  def skewProfile(df: DataFrame, keys: Seq[String], label: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum(col("cnt")).cast("long").as("n_rows"),
        max(col("cnt")).cast("long").as("max_cnt"),
        expr("percentile(cnt, 0.5)").as("p50_cnt"),
        expr("percentile(cnt, 0.99)").as("p99_cnt"))
      .select(lit(label).as("key_set"), col("n_keys"), col("n_rows"),
        col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
        (col("max_cnt").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        (col("max_cnt").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
}
