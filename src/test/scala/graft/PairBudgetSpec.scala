package graft

import graft.operators.Dedup
import graft.util.PairBudget

/** Output-budget guard for blocked pair generation (r13 verdict item 5):
  * the budget must be a NO-OP when the candidate mass fits, must drop the
  * LARGEST (hub) blocks first when it doesn't — with the dropped
  * block/pair counts reported, never silently — and the derived cap must
  * be a pure function of the block-size histogram.
  */
class PairBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("capFor keeps smallest blocks within budget and reports drops") {
    // blocks: 3× size 2 (1 pair each), 2× size 3 (3 pairs), 1× size 10
    // (45 pairs) — total 54 candidate pairs
    val blocked = (
      (1 to 3).flatMap(b => Seq.fill(2)(s"s$b")) ++
      (4 to 5).flatMap(b => Seq.fill(3)(s"m$b")) ++
      Seq.fill(10)("hub")
    ).zipWithIndex.toDF("k", "id")
    // budget 10: size-2 blocks (3 pairs) + size-3 blocks (6 pairs) = 9
    // fit; the size-10 hub (45 pairs) must be dropped
    val r = PairBudget.capFor(blocked, Seq("k"), budget = 10L, what = "spec")
    assert(r.cap === 3L)
    assert(r.keptPairs === 9L)
    assert(r.droppedBlocks === 1L)
    assert(r.droppedPairs === 45L)
    val kept = PairBudget.applyCap(blocked, Seq("k"), r.cap)
    assert(kept.count() === 12L) // the 10 hub members gone
    assert(kept.filter($"k" === "hub").count() === 0L)

    // generous budget: nothing dropped, cap covers the largest block
    val all = PairBudget.capFor(blocked, Seq("k"), budget = 100L, what = "spec")
    assert(all.droppedBlocks === 0L && all.cap === 10L &&
      all.keptPairs === 54L)
    assert(PairBudget.applyCap(blocked, Seq("k"), all.cap).count() ===
      blocked.count())
  }

  test("capFor keeps size-1 blocks even under a zero budget") {
    val blocked = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("d", 5))
      .toDF("k", "id")
    val r = PairBudget.capFor(blocked, Seq("k"), budget = 0L, what = "spec")
    assert(r.cap === 1L) // singletons generate zero pairs — always free
    assert(r.keptPairs === 0L)
    assert(r.droppedBlocks === 1L && r.droppedPairs === 1L)
  }

  test("fuzzyStringJoin budget is a no-op when candidates fit") {
    val strs = Seq(
      (1L, "colorado"), (2L, "colorade"), (3L, "montana"),
      (4L, "montanna"), (5L, "wyoming"), (6L, "wyomingg"))
      .toDF("id", "s")
    val free = Dedup.fuzzyStringJoin(strs, q = 2, maxDist = 2, stopDenom = 1L)
      .as[(Long, Long, Long)].collect().toSet
    val budgeted = Dedup.fuzzyStringJoin(strs, q = 2, maxDist = 2,
        stopDenom = 1L, maxPairs = Some(1000000L))
      .as[(Long, Long, Long)].collect().toSet
    assert(budgeted === free)
    assert(free.nonEmpty)
  }

  test("fuzzyStringJoin budget degrades to a sound subset, never garbage") {
    // a hub gram ('aa' shared by everyone) plus distinctive tails; with a
    // tight budget the hub block is dropped, so survivors must still be
    // TRUE ed<=2 pairs found via their distinctive grams
    val strs = (1L to 12L).map(i => (i, s"aaaa_tail$i"))
      .toDF("id", "s")
    val got = Dedup.fuzzyStringJoin(strs, q = 2, maxDist = 2,
        stopDenom = 1L, maxPairs = Some(20L))
      .as[(Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.functions.{col, levenshtein}
    val brute = strs.toDF("id", "s").as("a")
      .crossJoin(strs.toDF("id", "s").as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("d"))
      .filter(col("d") <= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.subsetOf(brute), "every budgeted pair must be a true pair" +
      " with its exact distance")
  }

  test("setSimJoin budget: no-op when prefix blocks fit, sound subset " +
      "when a hub shingle is dropped") {
    // 4 near-dup docs sharing rare shingles + a hub shingle ('the the
    // the' k=3 window) present in every doc
    val docs = (1L to 8L).map { i =>
      val tail = if (i % 2 == 0) s"alpha beta gamma delta${i / 2}"
      else s"alpha beta gamma delta${(i + 1) / 2} extra"
      (i, s"the the the the $tail")
    }.toDF("doc_id", "text")
    val free = Dedup.setSimJoin(docs, k = 3, num = 1, den = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val roomy = Dedup.setSimJoin(docs, k = 3, num = 1, den = 2,
        maxPairs = Some(1000000L))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(roomy === free, "under-budget cap must not change the output")
    assert(free.nonEmpty)
    val tight = Dedup.setSimJoin(docs, k = 3, num = 1, den = 2,
        maxPairs = Some(3L))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(tight.subsetOf(free),
      "budgeted candidates must be a subset of the exact join — the " +
        "verify stage keeps every surviving pair a TRUE Jaccard match")
  }
}
