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

  /** Per-doc MinHash signature: `numHashes` portable 32-bit min-hashes over
    * word `k`-shingles. One row per (doc, hash index).
    */
  def minhashSignature(docs: DataFrame, k: Int, numHashes: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seeds = (0 until numHashes).toDF("seed")
    docs
      .select(col(idCol).as("doc_id"), explode(array_distinct(
        Portable.wordShingles(col(textCol), k))).as("shingle"))
      .crossJoin(broadcast(seeds))
      .groupBy($"doc_id", $"seed")
      .agg(min(Portable.hash32(col("shingle"), col("seed"))).as("minhash"))
  }

  /** LSH banding: fold each band's min-hashes into one key; docs sharing any
    * (band, key) are candidates. bandsize = numHashes / numBands.
    */
  def minhashBands(sig: DataFrame, bandSize: Int): DataFrame =
    sig
      .withColumn("band", col("seed").divide(bandSize).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(Portable.polyFold(array_sort(collect_list(col("minhash")))).as("band_key"))

  /** MinHash-LSH near-duplicate pairs: band equi-join -> distinct candidate
    * pairs -> exact Jaccard verification (shingle-set join, again an
    * equi-join on the shingle) -> threshold.
    * Returns (a_id, b_id, jaccard), a_id < b_id.
    */
  def minhashPairs(docs: DataFrame, k: Int, numHashes: Int, bandSize: Int,
                   minJaccard: Double, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val sig = minhashSignature(docs, k, numHashes, idCol, textCol)
    val bands = minhashBands(sig, bandSize)
    val l = bands.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
    val r = bands.select(col("band"), col("band_key"), col("doc_id").as("b_id"))
    val candidates = l.join(r, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    verifyJaccard(docs, candidates, k, idCol, textCol).filter(col("jaccard") >= minJaccard)
  }

  /** Exact Jaccard over word-k-shingle sets for given candidate pairs. */
  def verifyJaccard(docs: DataFrame, pairs: DataFrame, k: Int,
                    idCol: String, textCol: String): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      array_distinct(Portable.wordShingles(col(textCol), k)).as("sh"))
    val a = sets.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
    pairs.join(a, "a_id").join(b, "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens: per bit j, sum +1/-1 votes from
    * each token's hash bit j; bit set iff the vote is positive.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bits = (0 until 32).toDF("bit")
    docs
      .select(col(idCol).as("doc_id"), explode(Portable.tokens(col(textCol))).as("tok"))
      .withColumn("h", Portable.hash32(col("tok")))
      .crossJoin(broadcast(bits))
      .groupBy($"doc_id", $"bit")
      .agg(sum(when(expr("shiftright(h, bit) & 1") === 1, 1L)
        .otherwise(-1L)).as("vote"))
      .groupBy($"doc_id")
      .agg(sum(when($"vote" > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L))
        .as("simhash"))
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
    val bands = (0 until 4).toDF("byte_band")
    val banded = sh.crossJoin(broadcast(bands))
      .withColumn("byte_val", expr("shiftright(simhash, byte_band * 8) & 255"))
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
    val a = sets.select(col("doc_id").as("a_id"), col("g").as("g_a"))
    val b = sets.select(col("doc_id").as("b_id"), col("g").as("g_b"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
