package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Byte-pair-encoding merge training (Sennrich et al. 2016) as pure
  * DataFrame algebra — the vocabulary-induction step a training pipeline
  * runs before [[TextAnalysis.encodeTokens]] can exist.
  *
  * Classic BPE trains on the WORD DICTIONARY, not the raw corpus: one
  * corpus scan builds (word, count), and every merge round then runs over
  * the dictionary — vocabulary-sized (bounded, ~10^6-10^7 at web scale),
  * so the per-round work is independent of corpus size. Per round:
  *   1. adjacent-pair counts weighted by word count (explode + hash agg),
  *   2. the best pair by a deterministic total order (count desc, then
  *      lexicographic) via ONE `min_by` aggregate — no sort,
  *   3. a greedy left-to-right rewrite of every word's piece array.
  *
  * Design choice for cross-engine determinism: SELF-PAIR rules (a == b)
  * are excluded from selection. With a != b, no two merge sites can
  * overlap (adjacent matches would force a == b), so the greedy rewrite
  * is positionally pure — each site merges independently — and both
  * engines express it as identical filter/transform array lambdas. A
  * self-pair's greedy semantics depend on run parity, which would need an
  * order-carrying fold that ANSI-SQL list functions cannot replay.
  *
  * The dictionary is checkpointed per round (the kmeans/Contiguity
  * iteration pattern) so the plan stays flat instead of nesting one
  * rewrite lambda per round.
  */
object Bpe {

  /** @return one row per dictionary word: (word, cnt, n_pieces, segmented)
    *         where `segmented` is the space-joined piece sequence after
    *         `rounds` greedy merges
    */
  def bpeMerges(docs: DataFrame, rounds: Int, textCol: String = "text"): DataFrame = {
    var dict = docs
      .select(explode(Portable.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("t",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))
    for (_ <- 1 to rounds) {
      val pr = dict
        .select(col("cnt"),
          explode(when(size(col("t")) >= 2,
            transform(sequence(lit(0), size(col("t")) - 2),
              i => struct(element_at(col("t"), i + 1).as("a"),
                element_at(col("t"), i + 2).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("cnt"))
        .filter(col("a") =!= col("b")) // see scaladoc: self-pairs excluded
        .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("total"))
      // argmax with (count desc, a asc, b asc) tie-break as ONE hash agg
      val rule = pr
        .agg(min_by(struct(col("a"), col("b")),
          struct((-col("total")).as("nt"), col("a"), col("b"))).as("r"))
        .select(col("r.a").as("ra"), col("r.b").as("rb"))
      // a DRY round (no a != b pair left anywhere) yields a null rule —
      // the rewrite must be a no-op, not a null-comparison token eater
      dict = dict.crossJoin(broadcast(rule))
        .withColumn("t", when(col("ra").isNull, col("t"))
          .otherwise(mergePair(col("t"), col("ra"), col("rb"))))
        .drop("ra", "rb")
      // eager=false: lineage is truncated at plan level either way; the
      // per-round dict (referenced twice next round) materializes once
      // into cached blocks inside the final action instead of a separate
      // driver-blocking job per merge round
      dict = graft.util.Checkpoints.truncate(dict, eager = false)
    }
    dict.select(col("word"), col("cnt"),
      size(col("t")).cast("long").as("n_pieces"),
      array_join(col("t"), " ").as("segmented"))
  }

  /** Greedy left-to-right merge of every (a, b) site in one piece array.
    * Requires a != b, which makes sites non-overlapping: position i is
    * consumed iff a merge starts at i-1, and merge starts never chain.
    * Every element_at sits behind a `when` bounds guard — ANSI mode
    * errors on out-of-range indices rather than returning null.
    */
  private def mergePair(t: Column, a: Column, b: Column): Column = {
    val n = size(t)
    val kept = filter(sequence(lit(0), n - 1), i =>
      when(i >= 1,
        !(element_at(t, i + 1) === b && element_at(t, i) === a))
        .otherwise(lit(true)))
    transform(kept, i =>
      when(i <= n - 2,
        when(element_at(t, i + 1) === a && element_at(t, i + 2) === b,
          concat(a, b)).otherwise(element_at(t, i + 1)))
        .otherwise(element_at(t, i + 1)))
  }
}
