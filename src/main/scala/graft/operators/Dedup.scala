package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Deduplication operators — bucketed by construction.
  *
  * Every fuzzy variant follows the same scale-safe shape:
  *   1. per-doc signature (narrow, codegen'd scalar algebra),
  *   2. candidate generation via an EQUI-JOIN on a band/bucket key
  *      (shuffled hash join on the key — never an all-pairs cartesian),
  *   3. exact verification only on candidates.
  * At 100 TB the join key cardinality keeps bucket populations small, so the
  * verify stage is linear-ish in true-duplicate count, not quadratic in docs.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content, keep the minimum id per group
    * (deterministic — `dropDuplicates` keeps an arbitrary row). Output one
    * row per distinct content with its multiplicity.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-k-shingles as rows: (doc_id, shingle).
    *
    * posexplode + window-lead instead of a `transform(slice(...))` lambda:
    * the HOF form re-evaluates `split(text)` per lambda element (O(tokens²)
    * per doc — Catalyst inlines the project into the lambda body), while
    * this shape tokenizes once per row and builds each shingle from lead()
    * in one codegen'd window pass. One shuffle, by doc_id.
    */
  def shingleRows(docs: DataFrame, k: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(Portable.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        concat_ws(" ", (0 until k).map(j =>
          if (j == 0) col("tok") else lead(col("tok"), j).over(w)): _*).as("shingle"),
        lead(col("tok"), k - 1).over(w).as("last_tok"))
      .filter(col("last_tok").isNotNull)
      .select(col("doc_id"), col("shingle"))
      .distinct()
  }

  /** Per-doc MinHash signature: `numHashes` portable 32-bit min-hashes over
    * word `k`-shingles, as WIDE columns (mh0..mhN-1) from a single groupBy.
    *
    * One aggregation, `numHashes` min columns — the hash-family fan-out is
    * column-wise, not row-wise: no crossJoin row duplication, map-side
    * partial mins, and the shuffle carries one `numHashes`-long row per doc
    * per partition regardless of shingle count.
    */
  def minhashSignature(docs: DataFrame, k: Int, numHashes: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val mins = (0 until numHashes).map { i =>
      min(Portable.hash32(col("shingle"), i)).as(s"mh$i")
    }
    shingleRows(docs, k, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
  }

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
    // The bands/pairs intermediates are REUSED on both sides of self-joins
    // (and again by the verify stage). Without materialization Catalyst
    // recomputes the whole signature subtree once per reference — four
    // concurrent window+agg pipelines fighting for execution memory. They
    // are tiny (numBands rows per doc; candidate pairs only), so persist
    // them: one computation, then cheap equi-joins.
    val sig = minhashSignature(docs, k, numHashes, idCol, textCol)
    val bands = minhashBands(sig, numHashes, bandSize).persist()
    val l = bands.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
    val r = bands.select(col("band"), col("band_key"), col("doc_id").as("b_id"))
    val candidates = l.join(r, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct().persist()
    verifyJaccard(docs, candidates, k, idCol, textCol).filter(col("jaccard") >= minJaccard)
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
    // referenced three times below (a-side, b-side, sizes) — materialize once
    val ex = shingleRows(docs, k, idCol, textCol).persist()
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

  /** 32-bit SimHash over whitespace tokens: per bit j, sum +1/-1 votes from
    * each token's hash bit j; bit set iff the vote is positive.
    *
    * One groupBy with 32 conditional-sum columns (partial+final agg with
    * map-side combine) — NOT a ×32 bit-dimension explode: the shuffle
    * carries one 32-column row per doc per partition, independent of token
    * count. Semantically identical to the per-(doc,bit) formulation.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val votes = (0 until 32).map { j =>
      sum(when(expr(s"shiftright(h, $j) & 1") === 1, 1L).otherwise(-1L)).as(s"v$j")
    }
    docs
      .select(col(idCol).as("doc_id"), explode(Portable.tokens(col(textCol))).as("tok"))
      .withColumn("h", Portable.hash32(col("tok")))
      .groupBy($"doc_id")
      .agg(votes.head, votes.tail: _*)
      .select($"doc_id",
        (0 until 32).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (<= 3
    * guarantees exact recall with 4 byte-bands: 4 differing bits cannot
    * avoid all 4 bytes). Byte-band equi-join, then exact popcount verify.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = simhash(docs, idCol, textCol)
    // 4 byte-bands per doc via explode of a literal struct array (row-level,
    // no join) — each byte of the signature is one LSH band
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("byte_band"),
        expr(s"shiftright(simhash, ${b * 8}) & 255").as("byte_val"))
    }
    val banded = sh
      .select($"doc_id", $"simhash", explode(array(bandStructs: _*)).as("bb"))
      .select($"doc_id", $"simhash", $"bb.byte_band".as("byte_band"),
        $"bb.byte_val".as("byte_val"))
    val l = banded.select($"byte_band", $"byte_val",
      $"doc_id".as("a_id"), $"simhash".as("sh_a"))
    val r = banded.select($"byte_band", $"byte_val",
      $"doc_id".as("b_id"), $"simhash".as("sh_b"))
    l.join(r, Seq("byte_band", "byte_val"))
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
  def ngramJaccardSample(docs: DataFrame, n: Int, sampleMod: Int, minJaccard: Double,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sets = docs.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol).as("doc_id"),
        array_distinct(transform(sequence(lit(1), length(col(textCol)) - (n - 1)),
          i => col(textCol).substr(i, lit(n)))).as("g"))
    // The broadcast-nested-loop pair join streams the left side; a single
    // parquet split would serialize all |sample|²/2 array intersections on
    // one task. Spread the streamed side across the executor cores.
    val a = sets.repartition(16)
      .select(col("doc_id").as("a_id"), col("g").as("g_a"))
    val b = sets.select(col("doc_id").as("b_id"), col("g").as("g_b"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
