package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.TextHash

/** Deduplication operators — bucketed by construction.
  *
  * Every fuzzy variant follows the same scale-safe shape:
  *   1. per-doc signature (narrow, codegen'd scalar algebra — the
  *      graft.plans.TextHash expressions: one pass over the text, NO
  *      shuffle/window; r2's posexplode+window+md5-agg formulation spent
  *      ~40 s/side of the sf0.1 bench here),
  *   2. candidate generation via an EQUI-JOIN on a band/bucket key
  *      (shuffled hash join on the key — never an all-pairs cartesian),
  *   3. exact verification only on candidates.
  * At 100 TB the join key cardinality keeps bucket populations small, so the
  * verify stage is linear-ish in true-duplicate count, not quadratic in docs.
  *
  * Nothing here persists: signatures are cheap narrow projections (re-scan
  * beats caching a corpus-sized intermediate at 100 TB), and the subtrees
  * referenced twice (band self-join sides, candidate pairs in the verify)
  * share their shuffle via Spark's ReuseExchange — no leaked cache blocks
  * across a long-lived session.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content, keep the minimum id per group
    * (deterministic — `dropDuplicates` keeps an arbitrary row). Output one
    * row per distinct content with its multiplicity.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-k-shingles as rows: (doc_id, shingle) — one narrow
    * codegen'd projection (WordShinglesExpr dedupes within the doc), then
    * explode. No shuffle, no window: shingling is per-document scalar work.
    */
  def shingleRows(docs: DataFrame, k: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextHash.wordShingles(docs.sparkSession, col(textCol), k)).as("shingle"))

  /** Per-doc MinHash signature: `numHashes` portable 32-bit min-hashes over
    * word `k`-shingles, as WIDE columns (mh0..mhN-1) — ONE narrow pass
    * (MinHashSigExpr computes all seeds' mins in a single text traversal;
    * docs with < k tokens have no shingles and drop out, as in the oracle).
    */
  def minhashSignature(docs: DataFrame, k: Int, numHashes: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextHash.minhashSig(docs.sparkSession, col(textCol), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +:
        (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"mh$i")): _*)

  /** LSH banding over the wide signature: per band, sort its min-hashes and
    * fold into one key (row-level column math), then explode the tiny
    * (band, key) structs to rows. Docs sharing any (band, key) are
    * candidates. bandSize = numHashes / numBands.
    */
  def minhashBands(sigWide: DataFrame, numHashes: Int, bandSize: Int): DataFrame = {
    val nBands = numHashes / bandSize
    val bandStructs = (0 until nBands).map { b =>
      val members = (0 until bandSize).map(j => col(s"mh${b * bandSize + j}"))
      struct(lit(b).as("band"),
        Portable.polyFold(array_sort(array(members: _*))).as("band_key"))
    }
    sigWide
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** MinHash-LSH near-duplicate pairs: band equi-join -> distinct candidate
    * pairs -> exact Jaccard verification (shingle-set join, again an
    * equi-join on the shingle) -> threshold.
    * Returns (a_id, b_id, jaccard), a_id < b_id.
    */
  def minhashPairs(docs: DataFrame, k: Int, numHashes: Int, bandSize: Int,
                   minJaccard: Double, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // The signature is a narrow codegen'd projection, so recomputing it on
    // each self-join side costs one extra text pass; the identical band
    // shuffles below it are deduplicated by ReuseExchange. No persist —
    // nothing to leak into a long-lived session.
    val sig = minhashSignature(docs, k, numHashes, idCol, textCol)
    val bands = minhashBands(sig, numHashes, bandSize)
    val l = bands.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
    val r = bands.select(col("band"), col("band_key"), col("doc_id").as("b_id"))
    val candidates = l.join(r, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    verifyJaccard(docs, candidates, k, idCol, textCol).filter(col("jaccard") >= minJaccard)
  }

  /** TF-WEIGHTED near-dup pairs — weighted Jaccard
    * J_w = Σ min(w_a, w_b) / Σ max(w_a, w_b) over CAPPED bigram term
    * frequencies, via the integer-replication reduction (Chum, Philbin,
    * Zisserman, BMVC 2008 §3 "min-Hash and tf-idf weighting"): an element
    * of integer weight w behaves as w distinct replicas (e, 1..w), and
    * PLAIN set Jaccard over replica sets equals weighted Jaccard over the
    * capped weights — so plain MinHash over replicas estimates J_w and
    * banding generates candidates with the usual S-curve. Plain MinHash
    * scores "spark spark spark spark report" vs "spark report" as
    * near-identical (same shingle SET); the weighted form does not — the
    * repetition signal matters exactly for the boilerplate/spam documents
    * a training-corpus dedup is pointed at.
    *
    * Verification is EXACT: J_w recomputed from the tf tables
    * (Σ max = tw_a + tw_b − Σ min, so only the intersection is joined).
    * Like [[minhashPairs]], the published set is banding-candidates ∩
    * exact-threshold — deterministic because both halves are.
    *
    * Scale shape: the tf table is one (doc, element)-keyed hash agg (the
    * standard term-table shuffle); replication multiplies rows by ≤ the
    * weight cap (bounded, default 3); the signature is `numHashes` min
    * aggs in ONE doc-keyed groupBy (no row blow-up per hash); candidates
    * come from the band equi-join; the verify joins touch candidate pairs
    * only. No window, no cartesian, no collect.
    */
  def weightedMinhashPairs(docs: DataFrame, numHashes: Int = 16,
                           bandSize: Int = 4, maxW: Int = 3,
                           minJw: Double = 0.5, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    require(numHashes % bandSize == 0)
    // codegen'd multiset shingles: the Column-algebra HOF form re-split
    // the whole document once per array element (interpreted lambdas do
    // no common-subexpression reuse) — O(tokens²) string work per doc
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(TextHash.wordShinglesAll(docs.sparkSession, col(textCol), 2))
        .as("e"))
    val tf = sh.groupBy(col("doc_id"), col("e"))
      .agg(least(count(lit(1)), lit(maxW.toLong)).as("w"))
    val rep = tf.select(col("doc_id"), col("e"),
      explode(sequence(lit(1L), col("w"))).as("occ"))
    val sigCols = (0 until numHashes).map { h =>
      min(Portable.hash32(concat_ws("#", lit(h.toString), col("e"), col("occ"))))
        .as(s"h$h")
    }
    val sig = rep.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val nBands = numHashes / bandSize
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until bandSize).map(i => col(s"h${b * bandSize + i}")): _*)
          .as("key"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("band_key"))
    val candidates = bands
      .select(col("band"), col("band_key"), col("doc_id").as("a_id"))
      .join(bands.select(col("band"), col("band_key"), col("doc_id").as("b_id")),
        Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
    val sizes = tf.groupBy(col("doc_id")).agg(sum(col("w")).as("tw"))
    val inter = candidates
      .join(tf.select(col("doc_id").as("a_id"), col("e"), col("w").as("wa")), "a_id")
      .join(tf.select(col("doc_id").as("b_id"), col("e"), col("w").as("wb")),
        Seq("b_id", "e"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(least(col("wa"), col("wb"))).as("n_min"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("tw").as("tw_a")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("tw").as("tw_b")), "b_id")
      .withColumn("jw", col("n_min").cast("double") /
        (col("tw_a") + col("tw_b") - col("n_min")).cast("double"))
      .filter(col("jw") >= minJw)
      .select("a_id", "b_id", "n_min", "tw_a", "tw_b", "jw")
  }

  /** Asymmetric containment pairs — `|A∩B| / |A|` (and `/ |B|`) over
    * shingle sets: detects SUBSET duplication (one document quoted or
    * embedded inside another), which symmetric Jaccard under-scores when
    * the containing document is much larger.
    *
    * Candidate generation is RARE-SHINGLE co-occurrence (df <= maxDf),
    * NOT minhash banding: LSH band collision probability tracks
    * symmetric Jaccard, so a small doc fully contained in a big one —
    * jaccard |A|/|B|, arbitrarily low — would rarely band-collide,
    * which is exactly the pair this operator exists to find. A contained
    * doc shares ALL its shingles with its container, so any one of its
    * rare shingles triggers the candidate. Verification is the same
    * count-join shape as [[verifyJaccard]] — no arrays cross the
    * shuffle, divisions are the only floats.
    */
  def containmentPairs(docs: DataFrame, k: Int, maxDf: Long,
                       minContainment: Double, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    // The shingle table feeds FIVE consumers below (df counts, both sides
    // of the rare-shingle self-join, sizes, both intersection probes);
    // without truncation Spark re-runs the shingle explosion per consumer
    // (r12→r13 bisect: the recomputation was most of q_containment's warm
    // cost). One materialization, key-domain-sized, lineage-safe.
    // NOT repartitioned before the checkpoint: the blocks do inherit scan
    // parallelism (one row-group locally, so consumers read one block in
    // one task), but an r16 experiment inserting an explicit repartition
    // measured 2.96 s -> 3.82 s — every consumer re-shuffles sh anyway,
    // so the extra exchange buys nothing the consumers' own exchanges
    // don't already provide.
    val sh = graft.util.Checkpoints.truncate(
      shingleRows(docs, k, idCol, textCol))
    // Candidate pairs straight from a per-shingle doc-id array: ONE
    // groupBy shuffle + map-side pair expansion replaces the former
    // rare-self-join shape (df count, join-back, self-join = three
    // shuffles over the shingle table). The pair list per rare shingle is
    // ≤ C(maxDf,2), bounded by construction.
    // df first (always-skinny counts), THEN collect doc lists for rare
    // shingles only: a single collect_set pass would materialize one
    // array row per shingle INCLUDING boilerplate — a df=10M stop shingle
    // is an 80 MB aggregation row, the exact unbounded-state shape a
    // 100 TB corpus breaks on. Rare arrays are ≤ maxDf by construction.
    val dfCnt = graft.util.Checkpoints.truncate(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") >= 2))
    val docsPerShingle = sh
      .join(dfCnt.filter(col("_df") <= maxDf).select(col("shingle")), "shingle")
      .groupBy(col("shingle"))
      .agg(sort_array(collect_set(col(idCol))).as("_ds"))
    val pairsCol = flatten(transform(
      sequence(lit(0), size(col("_ds")) - 2),
      i => transform(slice(col("_ds"), i + 2, size(col("_ds"))),
        b => struct(element_at(col("_ds"), i + 1).as("a_id"), b.as("b_id")))))
    // EXACT intersection with NO per-pair arrays, decomposed by shingle
    // document frequency. Every shared shingle has df ≥ 2 and is either
    // RARE (df ≤ maxDf) — counted for free as the MULTIPLICITY of the
    // pair expansion above, which emits (a,b) once per rare shingle
    // containing both — or a STOP shingle (df > maxDf), counted by a
    // count-join restricted to surviving candidates. The r15 array shape
    // (per-doc shingle arrays + array_intersect per pair) shipped ~5 KB
    // of array payload per candidate through the b_id shuffle: at sf10
    // that is 45.8M expansion rows (measured Σ C(df,2) over rare
    // shingles) × ~5 KB ≈ 200+ GB of shuffle — it filled the disk in the
    // r16 verify slice. Here nothing wider than (a_id, b_id, shingle)
    // ever crosses a shuffle.
    val rare = docsPerShingle
      .select(explode(pairsCol).as("_p"))
      .select(col("_p.a_id"), col("_p.b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_rare"))
    // Per-doc shingle count AND stop-shingle count in ONE pass (r17; the
    // r16 shape ran two separate aggs over sh — sizes, and a count over
    // the stop join — then attached them with FOUR candidate joins): tag
    // each shingle row with its df (left join — df<2 rows have no dfCnt
    // entry and are never stop) and fold both counts map-side. Halves the
    // candidate-side joins to one per side.
    val docStats = sh
      .join(dfCnt, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("sz"),
        sum(when(col("_df") > maxDf, 1L).otherwise(0L)).as("n_stop_doc"))
      .select(col(idCol).as("doc_id"), col("sz"), col("n_stop_doc"))
    val stopSh = sh
      .join(dfCnt.filter(col("_df") > maxDf).select(col("shingle")), "shingle")
      .select(col("shingle"), col(idCol).as("doc_id"))
    // Upper-bound prune BEFORE the stop count-join: shared stop shingles
    // ≤ min(|stop(a)|, |stop(b)|), so best-case containment is
    // (n_rare + that bound) / min(sz_a, sz_b); a pair below the threshold
    // on the bound can never pass. Most candidates share one rare shingle
    // and die here, so the stop expansion runs only on plausible pairs.
    val bounded = rare
      .join(docStats.select(col("doc_id").as("a_id"), col("sz").as("sz_a"),
        col("n_stop_doc").as("_sca")), "a_id")
      .join(docStats.select(col("doc_id").as("b_id"), col("sz").as("sz_b"),
        col("n_stop_doc").as("_scb")), "b_id")
      .filter((col("n_rare") + least(col("_sca"), col("_scb"))).cast("double") /
        least(col("sz_a"), col("sz_b")).cast("double") >= minContainment)
      .drop("_sca", "_scb")
    val nStop = bounded.select(col("a_id"), col("b_id"))
      .join(stopSh.select(col("doc_id").as("a_id"), col("shingle"))
        .hint("shuffle_hash"), "a_id")
      .join(stopSh.select(col("doc_id").as("b_id"), col("shingle"))
        .hint("shuffle_hash"), Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_stop"))
    bounded
      .join(nStop, Seq("a_id", "b_id"), "left")
      .na.fill(0L, Seq("n_stop"))
      .withColumn("n_inter", col("n_rare") + col("n_stop"))
      .withColumn("c_a", col("n_inter").cast("double") / col("sz_a").cast("double"))
      .withColumn("c_b", col("n_inter").cast("double") / col("sz_b").cast("double"))
      .filter(col("c_a") >= minContainment || col("c_b") >= minContainment)
      .select("a_id", "b_id", "n_inter", "sz_a", "sz_b", "c_a", "c_b")
  }

  /** Incremental dedup — deduplicate NEW documents against an EXISTING
    * corpus without re-pairing the old corpus against itself: the
    * append-only rebuild path ([[TrainPrep.corpusDiff]]'s `added` set is
    * exactly this operator's input). Two tiers, same recipes as the full
    * dedup but with candidate generation restricted to (old, new):
    *   1. exact — anti-join on the content hash of the old corpus;
    *   2. near-dup — MinHash banding where the band equi-join takes the
    *      OLD side left and the NEW side right, so candidate volume is
    *      |new| × collision rate, never |corpus|².
    * Output: the new documents that survive both tiers (their old-corpus
    * duplicates removed), ready to append.
    *
    * @param isNew predicate built ONLY from `col(idCol)` separating the
    *              new slice from the old corpus (it is re-applied to the
    *              band table, which carries just the id; id spaces must
    *              be disjoint)
    */
  def dedupIncrement(corpus: DataFrame, isNew: Column, k: Int, numHashes: Int,
                     bandSize: Int, minJaccard: Double,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val old = corpus.filter(!isNew)
    val neu = corpus.filter(isNew)
    val exactSurvivors = neu
      .withColumn("_ch", md5(col(textCol)))
      .join(old.select(md5(col(textCol)).as("_ch")).distinct(), Seq("_ch"), "left_anti")
      .drop("_ch")
    val bands = minhashBands(minhashSignature(corpus, k, numHashes, idCol, textCol),
      numHashes, bandSize)
    val candidates = bands.filter(!isNew)
      .select(col("band"), col("band_key"), col("doc_id").as("a_id"))
      .join(bands.filter(isNew)
        .select(col("band"), col("band_key"), col("doc_id").as("b_id")),
        Seq("band", "band_key"))
      .select("a_id", "b_id").distinct()
    val nearDupNew = verifyJaccard(corpus, candidates, k, idCol, textCol)
      .filter(col("jaccard") >= minJaccard)
      .select(col("b_id").as(idCol)).distinct()
    exactSurvivors.join(nearDupNew, Seq(idCol), "left_anti")
  }

  /** Estimator-quality measurement for the MinHash path — the sketch
    * analog of [[Similarity.annRecall]]: for every LSH candidate pair,
    * the signature-agreement estimate of Jaccard (the statistic MinHash
    * IS) next to the exact shingle-set Jaccard, with the absolute error.
    * This is how a pipeline picks numHashes: the observed error
    * distribution against ground truth at a sample scale.
    *
    * Deterministic: agreement counts are integer, the estimate divides
    * by a power-of-two hash count (exact), and the exact Jaccard is the
    * same count-join double the dedup path grades.
    */
  def minhashError(docs: DataFrame, k: Int, numHashes: Int, bandSize: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = minhashSignature(docs, k, numHashes, idCol, textCol)
    val bands = minhashBands(sig, numHashes, bandSize)
    val l = bands.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
    val r = bands.select(col("band"), col("band_key"), col("doc_id").as("b_id"))
    val candidates = l.join(r, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val sigA = sig.select(col("doc_id").as("a_id") +:
      (0 until numHashes).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
    val sigB = sig.select(col("doc_id").as("b_id") +:
      (0 until numHashes).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
    val est = candidates.join(sigA, "a_id").join(sigB, "b_id")
      .select(col("a_id"), col("b_id"),
        (0 until numHashes)
          .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1L).otherwise(0L))
          .reduce(_ + _).as("n_agree"))
      .withColumn("est_jaccard", col("n_agree").cast("double") / numHashes)
    est.join(verifyJaccard(docs, candidates, k, idCol, textCol), Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"), col("n_agree"), col("est_jaccard"),
        col("jaccard"), abs(col("est_jaccard") - col("jaccard")).as("abs_err"))
  }

  /** Exact Jaccard over word-k-shingle sets for given candidate pairs.
    *
    * Count-join formulation — |A∩B| from an equi-join on (doc, shingle),
    * |A∪B| = |A|+|B|-|A∩B| — rather than materializing per-doc shingle
    * arrays and intersecting per pair: no arrays cross the shuffle, every
    * stage is codegen'd, and the intersect cost scales with candidate
    * count, not corpus size. Same integers, so the same jaccard double.
    */
  def verifyJaccard(docs: DataFrame, pairs: DataFrame, k: Int,
                    idCol: String, textCol: String): DataFrame = {
    // referenced three times below (a-side, b-side, sizes); each reference
    // is a narrow re-scan (shingling is one codegen'd pass), and the two
    // shuffles they feed are on different keys anyway — cheaper than
    // leaking persisted blocks across a 40-query session
    val ex = shingleRows(docs, k, idCol, textCol)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(ex.select(col("doc_id").as("a_id"), col("shingle")), "a_id")
      .join(ex.select(col("doc_id").as("b_id"), col("shingle")), Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("a_id", "b_id"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sz_a")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("sz_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("n_inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_inter")).cast("double")).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit j, sum +1/-1 votes from
    * each token's hash bit j; bit set iff the vote is positive.
    *
    * One narrow codegen'd pass (SimHash64Expr) — no token explode, no
    * per-bit vote aggregation, no shuffle at all for the signature.
    * Semantically identical to the per-(doc,bit) relational formulation.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextHash.simhash64(docs.sparkSession, col(textCol)).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<= 3
    * guarantees exact recall with 4 disjoint 16-bit bands: 3 differing bits
    * cannot touch all 4 bands). Band equi-join, then exact popcount verify.
    *
    * 16-bit bands (not bytes): expected bucket population is N/65536 per
    * band value, so candidate volume stays near-linear in true duplicates —
    * 8-bit bands put ~N/256 docs in every bucket, which is quadratic
    * blow-up on any real corpus.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxHamming < 4, s"4-band LSH guarantees recall only for hamming<4, got $maxHamming")
    val sh = simhash(docs, idCol, textCol)
    // 4 16-bit bands per doc via explode of a literal struct array
    // (row-level, no join) — logical shift + mask, sign-safe
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        expr(s"shiftrightunsigned(simhash, ${b * 16}) & 65535").as("band_val"))
    }
    val banded = sh
      .select($"doc_id", $"simhash", explode(array(bandStructs: _*)).as("bb"))
      .select($"doc_id", $"simhash", $"bb.band".as("band"), $"bb.band_val".as("band_val"))
    val l = banded.select($"band", $"band_val", $"doc_id".as("a_id"), $"simhash".as("sh_a"))
    val r = banded.select($"band", $"band_val", $"doc_id".as("b_id"), $"simhash".as("sh_b"))
    l.join(r, Seq("band", "band_val"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        bit_count($"sh_a".bitwiseXOR($"sh_b")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  /** Exact character-n-gram Jaccard over a bounded sample (the exact-verify
    * companion to MinHash; all-pairs is intentionally restricted to the
    * sampled block — at scale the candidate generator is always LSH).
    */
  /** Edit-distance similarity join via q-gram candidate generation
    * (Gravano et al. 2001, "Approximate String Joins in a Database
    * (Almost) for Free"): pairs within levenshtein ≤ `maxDist` must share
    * at least one positional-free q-gram once |s| ≥ q·(maxDist+1), and
    * their lengths differ by ≤ maxDist — so candidates come from a gram
    * EQUI-join + length filter, and only candidates pay the O(|a|·|b|)
    * exact distance. The all-pairs formulation is corpus² and plans a
    * nested loop; this stays hash-join shaped.
    *
    * maxDist=1 short-circuits to FastSS deletion-variant blocking (see
    * [[fastSsJoin]]) — complete and output-bounded on any population; the
    * q-gram machinery below is the maxDist ≥ 2 path.
    *
    * STOP-GRAMS (gram path only): a gram shared by a constant fraction of the corpus (a
    * common stem, 'ing', 'er ') would make its join key quadratic — the
    * exact skew that kills naive similarity joins at 100 TB. Grams with
    * df · stopDenom > |corpus| are therefore dropped from candidate
    * generation (the [[containment]] rare-shingle trick with a
    * FRACTIONAL cap, so the threshold scales with the corpus instead of
    * rotting like an absolute df cap). Trade-off, deterministic and
    * replayed identically by the oracle: a pair whose ONLY shared grams
    * are stop-grams is not reported (a string made of nothing but
    * stop-grams generates no candidates at all).
    *
    * Input: (id, s). Output: (a_id, b_id, dist) for exact
    * levenshtein(a, b) ≤ maxDist among gram-candidate pairs, id-ordered.
    * Strings shorter than q generate NO grams (guarded — `sequence` with
    * start > stop would otherwise descend and emit phantom grams via
    * substr's position-0 quirks) and therefore no candidates; the oracle's
    * `range(1, ...)` is ascending-only and agrees.
    *
    * `maxPairs` (default None = unchanged semantics): optional candidate-
    * pair budget via [[graft.util.PairBudget]] — a per-block size cap
    * derived from the block-size histogram keeps the candidate join at or
    * under the budget, dropping oversized (hub) blocks LOUDLY (WARN log
    * with dropped block/pair counts), so a pathological corpus degrades
    * with a visible report instead of quadratically.
    */
  def fuzzyStringJoin(strings: DataFrame, q: Int, maxDist: Int,
                      stopDenom: Long = 8L,
                      maxPairs: Option[Long] = None): DataFrame = {
    // maxDist=1 dispatches to FastSS deletion-variant blocking (Bocek,
    // Hunt & Stiller 2007): every ed≤1 pair shares a single-character-
    // deletion variant (substitution → delete the edited position from
    // both; indel → the shorter string IS a variant of the longer), so
    // candidates come from an equi-join on L+1 variants per string —
    // COMPLETE with no stop-gram drop-outs, and output-bounded blocks
    // even on low-entropy string populations. The q-gram path below is
    // provably blind to exactly those populations: on id-like strings
    // every bigram is a digit pair with corpus-fraction df, so no prefix
    // is selective (measured at sf1: 388 s raw grams, still >15 min with
    // ED-Join prefix filtering, vs linear-scaling deletion variants).
    if (maxDist == 1) return fastSsJoin(strings, maxPairs)
    val grams = strings
      .select(col("id"), length(col("s")).as("_len"),
        explode(when(length(col("s")) >= q, array_distinct(
            transform(sequence(lit(1), length(col("s")) - (q - 1)),
              i => col("s").substr(i, lit(q)))))
          .otherwise(array().cast("array<string>"))).as("g"))
    val total = strings.agg(count(lit(1)).as("_n"))
    val rare = grams.groupBy(col("g")).agg(count(lit(1)).as("_df"))
      .crossJoin(broadcast(total))
      .filter(col("_df") * stopDenom <= col("_n"))
      .select(col("g"), col("_df"))
    // ED-Join PREFIX filtering (Xiao, Wang & Lin 2008, "Ed-Join: an
    // efficient algorithm for similarity joins with edit distance
    // constraints"): an edit changes ≤ q grams per side, so two strings
    // within maxDist share a gram among the q·maxDist+1 GLOBALLY-RAREST
    // grams of each (total order: df, then gram). Joining prefix×prefix
    // therefore finds every true pair the any-shared-gram join finds —
    // the verified output is IDENTICAL, proven set-cover-style — while
    // block sizes drop from "df of every sub-stop gram" (measured
    // quadratic on digit-heavy id strings: 388 s at sf1) to the df of
    // each string's most distinctive grams. The per-id window is
    // string-length-bounded, never corpus-bounded.
    val prefixLen = q * maxDist + 1
    val prunedAll = grams.join(broadcast(rare), Seq("g"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("_df"), col("g"))))
      .filter(col("_rk") <= prefixLen)
    val pruned = maxPairs match {
      case Some(budget) =>
        val cap = graft.util.PairBudget
          .capFor(prunedAll, Seq("g"), budget, "fuzzyStringJoin")
        graft.util.PairBudget.applyCap(prunedAll, Seq("g"), cap.cap)
      case None => prunedAll
    }
    // the candidate distinct shuffles (a_id, b_id) ONLY — carrying the
    // string payload through this exchange (the r8 shape) moves
    // string-pair bytes for every gram co-occurrence; the strings are
    // re-joined ONCE per side afterwards, id-keyed, for the exact verify
    val candIds = pruned
      .select(col("g"), col("id").as("a_id"), col("_len").as("_la"))
      .join(pruned.select(col("g"), col("id").as("b_id"), col("_len").as("_lb")), "g")
      .filter(col("a_id") < col("b_id") &&
        abs(col("_la") - col("_lb")) <= maxDist)
      .select(col("a_id"), col("b_id")).distinct()
    candIds
      .join(strings.select(col("id").as("a_id"), col("s").as("s_a")), Seq("a_id"))
      .join(strings.select(col("id").as("b_id"), col("s").as("s_b")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** FastSS ed≤1 similarity join: emit each string plus its L
    * single-character-deletion variants, equi-join on the variant, verify
    * with exact levenshtein. One narrow shuffle keyed by near-full-string
    * variants (always high-entropy), blocks sized by true neighbor
    * density. Used by [[fuzzyStringJoin]] for maxDist=1.
    */
  private def fastSsJoin(strings: DataFrame,
                         maxPairs: Option[Long] = None): DataFrame = {
    val varsAll = strings.select(col("id"), length(col("s")).as("_len"),
      explode(array_union(
        array(col("s")),
        // sequence(1, 0) would DESCEND for the empty string — guard it
        when(length(col("s")) >= 1,
          transform(sequence(lit(1), length(col("s"))),
            i => concat(col("s").substr(lit(1), i - 1),
              col("s").substr(i + 1, length(col("s"))))))
          .otherwise(array().cast("array<string>"))))
        .as("v"))
    val vars = maxPairs match {
      case Some(budget) =>
        val cap = graft.util.PairBudget
          .capFor(varsAll, Seq("v"), budget, "fastSsJoin")
        graft.util.PairBudget.applyCap(varsAll, Seq("v"), cap.cap)
      case None => varsAll
    }
    // shuffle_hash: Generate (explode) wrecks size estimates and Catalyst
    // may BROADCAST the variant side, pinning candidate generation to the
    // scan's partitioning (q_edit_dist_join measured ONE task at sf10).
    // Both sides must exchange on the high-cardinality variant key.
    val candIds = vars
      .select(col("v"), col("id").as("a_id"), col("_len").as("_la"))
      .hint("shuffle_hash")
      .join(vars.select(col("v"), col("id").as("b_id"), col("_len").as("_lb"))
        .hint("shuffle_hash"), "v")
      .filter(col("a_id") < col("b_id") && abs(col("_la") - col("_lb")) <= 1)
      .select(col("a_id"), col("b_id")).distinct()
    candIds
      .join(strings.select(col("id").as("a_id"), col("s").as("s_a")), Seq("a_id"))
      .join(strings.select(col("id").as("b_id"), col("s").as("s_b")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= 1)
  }

  /** Deterministic bounded id-sample: keep rows whose id divides the
    * modulus ceil(N / targetSample), so the SAMPLE SIZE stays ~targetSample
    * no matter how large the corpus grows (a fixed modulus grows the
    * sample linearly and any pairwise stage over it quadratically — the
    * classic today-small constant that kills a 100× scale-up). The modulus
    * is derived inside the plan (count → broadcast), never collected.
    *
    * PRECONDITION: ids must be dense (≈ 0..N contiguous, as the synthetic
    * doc_id is). For sparse, hashed, or non-numeric id spaces
    * `id % mod === 0` selects an id-correlated, possibly EMPTY subset —
    * use [[boundedHashSample]], which keys on a hash of the id instead.
    */
  def boundedIdSample(docs: DataFrame, idCol: String, targetSample: Int): DataFrame = {
    val mod = docs.agg(
      greatest(lit(1L), ceil(count(lit(1)) / targetSample)).as("_mod"))
    docs.crossJoin(broadcast(mod))
      .filter(col(idCol) % col("_mod") === 0)
      .drop("_mod")
  }

  /** Id-distribution-free variant of [[boundedIdSample]]: keys the modulus
    * test on the PORTABLE 32-bit hash of the id (md5-derived, non-negative
    * — see [[graft.functions.Portable.hash32]], so `% mod === 0` needs no
    * pmod), making the sample uniform for ANY id regime — sparse longs,
    * snowflake/UUID strings, hashed keys. The sample size is binomial
    * around targetSample (hash-uniform keep probability 1/mod) rather than
    * the dense-id variant's exact count; the set is content-addressed, so
    * it is reproducible across runs and stable as the corpus grows.
    * DuckDB mirror of the keep test:
    * `('0x' || substr(md5('<seed>#' || CAST(id AS VARCHAR)), 1, 8))::BIGINT % mod = 0`.
    */
  def boundedHashSample(docs: DataFrame, idCol: String, targetSample: Int,
                        seed: Int = 7): DataFrame = {
    val mod = docs.agg(
      greatest(lit(1L), ceil(count(lit(1)) / targetSample)).as("_mod"))
    docs.crossJoin(broadcast(mod))
      .filter(graft.functions.Portable.hash32(col(idCol), seed) % col("_mod") === 0)
      .drop("_mod")
  }

  def ngramJaccardSample(docs: DataFrame, n: Int, targetSample: Int, minJaccard: Double,
                         idCol: String = "doc_id", textCol: String = "text",
                         hashedIds: Boolean = false): DataFrame = {
    // CharNgramsExpr: codegen'd, distinct by construction, and EMPTY for
    // docs shorter than n chars (the r2 HOF formulation generated a
    // descending sequence there and emitted bogus grams)
    val sets = (if (hashedIds) boundedHashSample(docs, idCol, targetSample)
                else boundedIdSample(docs, idCol, targetSample))
      .select(col(idCol).as("doc_id"),
        TextHash.charNgrams(docs.sparkSession, col(textCol), n).as("g"))
    // The broadcast-nested-loop pair join streams the left side; a single
    // parquet split would serialize all |sample|²/2 array intersections on
    // one task. Spread the streamed side across the cluster's cores — a
    // hardcoded constant caps the pair stage at that many tasks no matter
    // how many executors exist.
    val a = sets.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id").as("a_id"), col("g").as("g_a"))
    val b = sets.select(col("doc_id").as("b_id"), col("g").as("g_b"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        TextHash.arrayJaccard(docs.sparkSession, col("g_a"), col("g_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Chain-friendly exact dedup: keep the minimum-id row per distinct
    * content as ONE partitioned-window pass over the input, all columns
    * retained. The complement to [[exact]] (which aggregates away the
    * payload): embedding THIS in a pipeline adds a single md5-keyed
    * shuffle, whereas `exact` + semi-join-back makes Spark recompute the
    * pipeline's upstream once per join side.
    */
  def dropExactDuplicates(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("_rn", row_number().over(
        Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Repeated-SPAN scrubbing — token-granular exact substring dedup in the
    * spirit of Lee et al. 2021 ("Deduplicating Training Data Makes
    * Language Models Better"): any word k-gram occurring more than once
    * ACROSS THE CORPUS (or twice within one document) marks its k token
    * positions for removal, and documents are rebuilt from the surviving
    * tokens. Unlike document-level dedup this kills boilerplate embedded
    * in otherwise-unique pages (headers, license blocks, navigation), the
    * dominant duplication mode in web corpora. This is the conservative
    * drop-ALL-occurrences variant; exact-duplicate documents scrub to
    * empty (run after [[dropExactDuplicates]] in a real pipeline).
    *
    * Scale shape: the gram table is |corpus tokens| rows shuffled once on
    * the gram key — the honest, inherent cost of substring-level dedup
    * (the suffix-array formulation pays an equivalent sort); duplicate
    * detection is a hash agg with map-side partials, cover expansion and
    * the rebuild are equi-joins on (id, pos). No cartesian anywhere. At
    * 100 TB the gram join key would be a 64-bit content hash rather than
    * the gram string (8 bytes/row shuffled instead of ~50); the string is
    * kept here so the DuckDB oracle replays EXACT semantics with no
    * collision caveat.
    */
  def repeatedSpans(docs: DataFrame, k: Int, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), split(col(textCol), " ").as("t"))
    val grams = base.select(col(idCol), posexplode(
        when(size(col("t")) >= k,
          transform(sequence(lit(0), size(col("t")) - k),
            i => array_join(slice(col("t"), i + 1, lit(k)), " ")))
        .otherwise(array().cast("array<string>"))).as(Seq("gpos", "gram")))
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("gram")
    val cov = grams.join(dup, Seq("gram"), "left_semi")
      .select(col(idCol), explode(sequence(col("gpos"), col("gpos") + (k - 1))).as("pos"))
      .distinct()
    val toks = base.select(col(idCol), posexplode(col("t")).as(Seq("pos", "tok")))
    val kept = toks.join(cov, Seq(idCol, "pos"), "left_anti")
    val agg = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
    base.select(col(idCol), size(col("t")).cast("long").as("n_tokens"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Content-defined chunking + chunk-level dedup stats — the
    * boilerplate/shared-fragment detector between document-level dedup
    * (misses partial overlap) and [[repeatedSpans]] (exact k-gram cover):
    * documents split into variable-length chunks at CONTENT-DEFINED
    * boundaries (a token whose portable hash is ≡ 0 mod `mask` opens a
    * new chunk — the token-granular analog of Rabin-fingerprint CDC used
    * by storage dedup), so a shared passage yields the same chunks
    * regardless of where it sits in each document. The output is one row
    * per distinct chunk with its occurrence count and distinct-document
    * count: `n_occ > 1` chunks are the shared boilerplate.
    *
    * Scale shape: chunk assignment is a running count of boundary flags —
    * a window PARTITIONED BY document (never global); chunk assembly is a
    * (doc, chunk) hash agg; the final stats agg keys on the chunk hash.
    * Expected chunk length = `mask` tokens, so the chunk table is
    * ~1/mask of the token table.
    */
  def cdcChunks(docs: DataFrame, mask: Int = 16, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(Portable.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = toks
      .withColumn("bd",
        when(Portable.hash32(col("tok")) % mask === 0, 1L).otherwise(0L))
      .withColumn("chunk", sum(col("bd")).over(w))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("n_toks"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("ctext"))
    chunks
      .groupBy(md5(col("ctext")).as("chunk_hash"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("n_toks")).as("n_toks"))
  }

  /** EXACT set-similarity self-join at Jaccard ≥ num/den over word
    * k-shingle sets, via prefix filtering (Chaudhuri et al. 2006;
    * Xiao et al. 2008, PPJoin — the public all-pairs algorithm): order
    * every document's shingles globally by (df asc, shingle asc) and keep
    * only its PREFIX — the first `n − ⌈t·n⌉ + 1` rarest shingles; two sets
    * with Jaccard ≥ t must share a prefix shingle, so the candidate stage
    * is an equi-join on prefix shingles only. Guaranteed lossless (unlike
    * MinHash banding) yet never all-pairs: prefixes are the RAREST
    * shingles, so join-key fan-out is bounded by true near-neighbor
    * density — the df-ordering does for free what fuzzyStringJoin's
    * stop-gram pruning does explicitly. A length filter
    * (den·min ≥ num·max) prunes candidates whose sizes alone forbid t.
    *
    * The threshold is a RATIONAL num/den: prefix length, length filter
    * and the final verify (`den·inter ≥ num·union`) are all exact integer
    * arithmetic — no float ceil whose rounding could differ across
    * engines. Verification joins the candidate pairs back to the full
    * shingle lists (id-keyed equi-joins), counts the intersection, and
    * emits exact sizes with one final double division for display.
    *
    * Scale: one df aggregation, one id-keyed window (rank + size share a
    * single exchange), a prefix-shingle equi-join, and two id-keyed
    * verify joins. PPJoin's positional refinement is omitted — it prunes
    * constants, not the asymptotic shape.
    *
    * `maxPairs` (default None = unchanged semantics): optional
    * candidate-pair budget via [[graft.util.PairBudget]] applied to the
    * prefix-shingle blocks — the join key whose fan-out is the one
    * quadratic term. Oversized (hub-shingle) blocks drop LOUDLY (WARN +
    * accounting); pairs sharing only dropped shingles are lost, the
    * visible-degradation contract shared with [[fuzzyStringJoin]].
    * Interaction with the positional filter (r16 ADVICE): the filter's
    * bound assumes the joined token is the pair's FIRST common prefix
    * token (it drops the overlap-so-far term). When a cap drops that
    * token's block, a borderline pair can also fail the positional bound
    * on every LATER shared prefix token and be lost — i.e. under a cap
    * the candidate set may shrink slightly beyond PairBudget's
    * dropped-pairs accounting. Acceptable under the same
    * visible-degradation contract; uncapped behavior is exact.
    */
  def setSimJoin(docs: DataFrame, k: Int, num: Int, den: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 maxPairs: Option[Long] = None): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need 0 < num/den <= 1")
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select(col(idCol).as("id"),
      explode(TextHash.wordShingles(docs.sparkSession, col(textCol), k)).as("sh"))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("id"))
    val ranked = sh.join(dfreq, "sh")
      .withColumn("rank", row_number().over(byDoc.orderBy(col("df"), col("sh"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byDoc))
    val prefix0 = ranked
      .filter(col("rank") <= expr(s"n - (n * $num + ${den - 1}) DIV $den + 1"))
      .select(col("sh"), col("id"), col("n"), col("rank"))
    val prefix = maxPairs match {
      case Some(budget) =>
        val cap = graft.util.PairBudget
          .capFor(prefix0, Seq("sh"), budget, "setSimJoin").cap
        graft.util.PairBudget.applyCap(prefix0, Seq("sh"), cap)
      case None => prefix0
    }
    // shuffle_hash for the same reason as fastSsJoin's candidate join:
    // prefix comes through explode + window, whose size estimates can
    // flip Catalyst to a broadcast that serializes candidate generation
    val cand = prefix.select(col("sh"), col("id").as("a_id"), col("n").as("na"),
        col("rank").as("pa"))
      .hint("shuffle_hash")
      .join(prefix.select(col("sh"), col("id").as("b_id"), col("n").as("nb"),
        col("rank").as("pb"))
        .hint("shuffle_hash"), "sh")
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("na"), col("nb")) * den >= greatest(col("na"), col("nb")) * num)
      // PPJoin positional filter (Xiao, Wang, Lin, Yu, WWW 2008 §3.2): a
      // prefix token at sorted position p leaves at most n−p later tokens
      // to overlap, so a pair can reach the Jaccard-α overlap bound
      // α = ⌈num·(na+nb)/(num+den)⌉ only if 1 + min(na−pa, nb−pb) ≥ α —
      // cross-multiplied to stay in exact integers. Prunes CANDIDATES
      // only; the exact-intersection verify below already decides
      // membership, so the output set is unchanged (r16: the unfiltered
      // fan-out cost 44 CPU-s for 256 result rows at sf0.1).
      .filter((lit(1L) + least(col("na") - col("pa"), col("nb") - col("pb")))
        * (num + den) >= (col("na") + col("nb")) * num)
      .select(col("a_id"), col("b_id")).distinct()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("id").as("a_id"), col("sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("n_union"))
      .filter(col("inter") * den >= col("n_union") * num)
      .withColumn("jaccard",
        col("inter").cast("double") / col("n_union").cast("double"))
  }

  /** Quality-aware canonical selection: per exact-content group, keep the
    * row with the HIGHEST score (ties → lowest id) instead of
    * [[dropExactDuplicates]]' lowest-id rule — what a production dedup
    * actually wants when duplicates differ in metadata quality (fetch
    * recency, source reliability, parse cleanliness). Window-free
    * two-pass (r11 ADVICE: the one-pass `max_by(…, struct(quality,
    * -id))` form assumed a NUMERIC id — UnaryMinus fails analysis on the
    * string/UUID ids the sparse-id samplers exist for): pass 1 is an
    * md5-keyed hash agg for (group size, max quality); pass 2 keeps only
    * rows AT that max and `min_by`s the full row struct on the raw id —
    * no negation, so the id may be any orderable type. Both aggs fold
    * map-side; the join is a broadcast-able hash-keyed equi-join (one
    * row per group on the build side), so the exchange count matches the
    * old one-pass shape at scale. Adds `n_dups` (the group size) to the
    * surviving row.
    */
  def keepBestPerContent(scored: DataFrame, qualityCol: String,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val keyed = scored.withColumn("_ch", md5(col(textCol)))
    val best = keyed.groupBy(col("_ch"))
      .agg(count(lit(1)).as("n_dups"), max(col(qualityCol)).as("_bq"))
    val all = struct(scored.columns.map(col): _*)
    keyed
      .join(best, Seq("_ch"))
      .filter(col(qualityCol) === col("_bq"))
      .groupBy(col("_ch"))
      .agg(min_by(all, col(idCol)).as("_best"), max(col("n_dups")).as("n_dups"))
      .select(col("_best.*"), col("n_dups"))
  }

  /** Near-duplicate CLUSTERS from a candidate-pair list — what a real
    * dedup pipeline needs after pair generation: similarity is not
    * transitive, but keep-one-per-group semantics are, so the pair graph's
    * connected components define the duplicate groups (A~B, B~C ⇒ one
    * cluster even when A!~C). Reuses [[Contiguity.connectedComponents]]
    * verbatim — a pair graph and a cell-adjacency graph are the same
    * problem, and the large-star/small-star contraction scales to
    * billion-edge pair sets where chained self-joins would not.
    *
    * Output: (idCol, cluster_id = min member id, is_rep ∈ {0,1}) for every
    * node in `nodes`, singletons included (their own representative) —
    * downstream keeps `is_rep = 1` rows.
    */
  def pairClusters(pairs: DataFrame, nodes: DataFrame, idCol: String,
                   aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val e = pairs.select(lit(1).as("k"), col(aCol).as("a"), col(bCol).as("b"))
    val n = nodes.select(lit(1).as("k"), col(idCol).as("node"))
    Contiguity.connectedComponents(e, n, Seq("k"))
      .select(col("node").as(idCol), col("comp").as("cluster_id"),
        (col("node") === col("comp")).cast("int").as("is_rep"))
  }

  /** Winnowing fingerprint overlap (Schleimer, Wilkerson, Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * algorithm): hash every token k-gram, slide a window of `w` consecutive
    * hashes, keep each window's MINIMUM — a ~2/(w+1)-density fingerprint
    * sample with the paper's guarantee that any shared token run of length
    * ≥ w+k-1 yields at least one shared fingerprint. Detects PARTIAL
    * overlap (a copied paragraph inside an otherwise-unrelated pair) that
    * whole-document MinHash dilutes away.
    *
    * Returns (a_id, b_id, shared) pairs sharing ≥ `minShared` fingerprints.
    *
    * Scale shape: gram hashing and window minima are per-row codegen'd
    * array algebra (no shuffle, no UDF); the fingerprint table shuffles
    * once for the df count; stop-fingerprints (df > maxDf — boilerplate
    * shared by everything) are dropped BEFORE the pair join, so the
    * equi-join on `f` is bounded by maxDf² per fingerprint, never
    * quadratic in the corpus. Same stop-gram discipline as
    * [[substringDedup]]/[[fuzzyJoinQGram]].
    */
  def winnowPairs(docs: DataFrame, k: Int = 4, w: Int = 4, maxDf: Long = 20,
                  minShared: Long = 2, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // Fused codegen'd text→fingerprints expression (null for <k-token
    // docs): gram hashing + deque window minima + distinct in one O(grams)
    // pass. The previous Column-algebra form paid twice — the gram lambda
    // re-evaluated the full-document split per element (interpreted
    // lambdas do no common-subexpression reuse: O(tokens²) string work per
    // doc), and the window lambda cost O(grams·w) interpreted evals even
    // over a materialized array (the r16 skipgram law: a HOF lambda in a
    // hot path runs ~10× over the equivalent whole-array expression).
    val fp = docs
      .select(col(idCol),
        explode(TextHash.winnowFingerprints(
          docs.sparkSession, col(textCol), k, w)).as("f"))
    val keep = fp.join(
      fp.groupBy(col("f")).agg(count(lit(1)).as("d"))
        .filter(col("d") <= maxDf).select(col("f")), "f")
    keep.select(col("f"), col(idCol).as("a_id"))
      .join(keep.select(col("f"), col(idCol).as("b_id")), "f")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
