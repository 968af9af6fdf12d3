package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Training-corpus preparation operators — the two assignment steps every
  * LLM data pipeline runs after filtering/dedup: reproducible splitting
  * and sequence packing.
  *
  * Both are DESIGNED deterministic: no RNG, no dependence on row order,
  * partition count, or cluster size — re-running on a different cluster
  * yields byte-identical assignments, which is what makes dataset
  * versioning and incremental rebuilds possible at 100 TB.
  */
object TrainPrep {

  /** Deterministic hash split: the portable md5 hash of the id column,
    * mod 100, cut at cumulative percentages. A document's split NEVER
    * changes as the corpus grows (content-addressed, not position-based)
    * — the property that keeps eval sets stable across dataset versions.
    * Pure per-row scalar: no shuffle, stays in whole-stage codegen.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)] = Seq(("train", 80), ("val", 10), ("test", 10))): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = Portable.hash32(col(idCol)) % 100
    val cuts = splits.scanLeft(("", 0)) { case ((_, acc), (n, p)) => (n, acc + p) }.tail
    val assign = cuts.tail.foldLeft(when(bucket < cuts.head._2, cuts.head._1)) {
      case (c, (n, hi)) => c.when(bucket < hi, n)
    }
    df.withColumn("split", assign)
  }

  /** Stratified deterministic sampling: per-stratum keep rates (e.g.
    * downsample an over-represented language), decided by the portable id
    * hash mod 1000 against the stratum's rate — content-addressed like
    * [[deterministicSplit]], so the sample is reproducible and a kept
    * document stays kept when the corpus grows. Strata absent from
    * `rates` default to `defaultRate`. Per-row scalar: no shuffle.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1))
    val bucket = Portable.hash32(col(idCol), seed = 7) % 1000
    val cut = rates.foldLeft(lit((defaultRate * 1000).toInt)) { case (c, (k, r)) =>
      when(col(strataCol) === k, lit((r * 1000).toInt)).otherwise(c)
    }
    df.filter(bucket < cut)
  }

  /** GPT-style sequence packing (concat-and-chunk): documents are laid
    * out in a fixed deterministic order and cut into fixed-capacity token
    * bins; each document is assigned the bin where its first token lands
    * (`bin = tokens_before DIV capacity`), with `offset` its position in
    * that bin.
    *
    * Scale shape: a GLOBAL concatenation order would be a single-partition
    * sort, so the corpus is first sharded by a deterministic id hash and
    * packed independently per shard — one hash exchange, then a
    * per-shard window cumsum. Shards are the unit of parallelism for the
    * downstream writer (one output stream per shard).
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
                    capacity: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", Portable.hash32(col(idCol)) % shards)
      .withColumn("n_tokens", tokenCount)
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"tokens_before DIV $capacity"))
      .withColumn("offset", col("tokens_before") % capacity)
      .drop("tokens_before")
  }

  /** Strided sliding context windows over each document's token sequence —
    * the BERT-style per-document windowing that turns long documents into
    * fixed-size training examples with `window - stride` tokens of overlap
    * (the alternative to [[packSequences]]' concat-and-chunk: windows never
    * cross document boundaries, at the cost of duplicated overlap tokens).
    *
    * Contract: documents with at least `window` tokens emit
    * `(n - window) DIV stride + 1` full windows starting at
    * 0, stride, 2·stride, …  (tail tokens not covered by a full window are
    * truncated — the standard strided-training convention); shorter
    * documents emit their whole token sequence as one partial window, so
    * no document vanishes from the training set.
    *
    * Scale shape: a pure per-row array expand (sequence → transform →
    * posexplode) — no shuffle, no window function, whole-stage-codegen
    * friendly; output rows ≈ corpus_tokens / stride however the input is
    * partitioned.
    */
  def contextWindows(docs: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = docs.select(col(idCol), Portable.tokens(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") > 0)
      .withColumn("_nw",
        when(col("_n") < window, lit(1))
          .otherwise(expr(s"CAST((_n - $window) DIV $stride AS INT) + 1")))
    toks.select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_nw") - 1),
          i => struct(
            (i * stride).cast("long").as("start"),
            array_join(slice(col("_t"), i * stride + 1, lit(window)), " ").as("win_text"),
            least(lit(window), col("_n") - i * stride).cast("long").as("n_tok"))))
          .as(Seq("win_id", "w")))
      .select(col(idCol), col("win_id").cast("long").as("win_id"),
        col("w.start").as("start"), col("w.n_tok").as("n_tok"),
        col("w.win_text").as("win_text"))
  }

  /** Token-budget domain mixing — the mixture-weights step of pretraining
    * data assembly: each domain (language, source, quality bin) gets a
    * token BUDGET, and documents are admitted in a deterministic
    * content-addressed pseudo-random order until their domain's running
    * token total reaches the budget. Hash-ordered admission makes the mix
    * a uniform sample of the domain AND reproducible: like
    * [[deterministicSplit]], an admitted document stays admitted when
    * unrelated documents are added (it can only be displaced by new
    * documents hashing ahead of it within its own domain's budget).
    *
    * Scale shape: a per-domain cumulative sum is inherently sequential,
    * and a naive `Window.partitionBy(domain)` funnels a whole domain —
    * possibly most of a 100 TB corpus — through ONE task. So, exactly like
    * [[packSequences]], the domain is sharded by id hash: a per-(domain,
    * shard) window cumsum runs in parallel, per-shard token totals (a
    * domains×shards-row table) get prefix offsets, and the final running
    * total is local_cum + shard_offset — equal, by exact long arithmetic,
    * to one global cumsum in the (shard, hash, id) admission order.
    */
  def domainMix(docs: DataFrame, domainCol: String, idCol: String,
                tokenCount: Column, budgets: Map[String, Long],
                defaultBudget: Long, shards: Int = 64): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (c, (k, v)) =>
      when(col(domainCol) === k, lit(v)).otherwise(c)
    }
    val base = docs
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("mix_shard", Portable.hash32(col(idCol), seed = 13) % shards)
      .withColumn("mix_ord", Portable.hash32(col(idCol), seed = 11))
    val wLocal = Window.partitionBy(col(domainCol), col("mix_shard"))
      .orderBy(col("mix_ord"), col(idCol))
    val local = base.withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
    // shard totals + exclusive prefix: domains×shards rows — broadcast-sized
    val wShard = Window.partitionBy(col(domainCol)).orderBy(col("mix_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base
      .groupBy(col(domainCol), col("mix_shard"))
      .agg(sum(col("n_tokens")).as("shard_tokens"))
      .withColumn("shard_offset", coalesce(sum(col("shard_tokens")).over(wShard), lit(0L)))
      .select(col(domainCol), col("mix_shard"), col("shard_offset"))
    local.join(broadcast(offsets), Seq(domainCol, "mix_shard"))
      .withColumn("cum_tokens", col("local_cum") + col("shard_offset"))
      .filter(col("cum_tokens") <= budget)
      .drop("local_cum")
  }

  /** Weighted deterministic sampling — keep each row with probability
    * equal to a per-row weight column (e.g. a quality score in [0,1]):
    * the importance-sampling step that biases a corpus toward high-value
    * documents WITHOUT a hard cutoff. Content-addressed like
    * [[stratifiedSample]] (hash-uniform in [0,1) compared to the
    * weight), so the kept set is reproducible and stable as the corpus
    * grows. Pure per-row scalar — no shuffle.
    */
  def weightedSample(df: DataFrame, weightCol: String, idCol: String): DataFrame =
    df.filter(Portable.hash32(col(idCol), seed = 23).cast("double") <
      col(weightCol) * lit(4294967296.0))

  /** Per-domain quality gate — keep the top `keepNum/keepDen` fraction of
    * each domain by a score column (the dynamic-threshold variant of
    * quality filtering: a fixed global cutoff over- or under-prunes
    * domains with different score distributions). The keep fraction is a
    * RATIONAL so the per-domain target count is exact integer math:
    * `target = ceil(n * keepNum / keepDen)`.
    *
    * Semantics = "global rank within domain by (score desc, id asc) <=
    * target", but the implementation never runs a per-domain global sort
    * (one domain can be most of a 100 TB corpus): a HISTOGRAM of distinct
    * (domain, score) values — score-granularity-sized, not corpus-sized —
    * takes a cumulative count in score-descending order to find each
    * domain's cutoff score and how many boundary slots remain; rows above
    * the cutoff all pass, and only the cutoff-score TIE GROUP is ranked
    * (a window partitioned by (domain, score), so each tie group sorts in
    * parallel). Equal, row for row, to the rank formulation the oracle
    * runs.
    */
  def qualityGate(scored: DataFrame, domainCol: String, scoreCol: String,
                  idCol: String, keepNum: Int, keepDen: Int): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum)
    val hist = scored.groupBy(col(domainCol), col(scoreCol))
      .agg(count(lit(1)).as("nq"))
    val wCum = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(domainCol))
    val cuts = hist
      .withColumn("cum", sum(col("nq")).over(wCum))
      .withColumn("n", sum(col("nq")).over(wAll))
      .withColumn("target", expr(s"(n * $keepNum + ${keepDen - 1}) div $keepDen"))
      .withColumn("above", col("cum") - col("nq"))
      .filter(col("above") < col("target") && col("target") <= col("cum"))
      .select(col(domainCol), col(scoreCol).as("cut_score"),
        (col("target") - col("above")).as("slots"))
    val wTie = Window.partitionBy(col(domainCol), col(scoreCol))
      .orderBy(col(idCol))
    scored
      .join(broadcast(cuts), Seq(domainCol))
      .withColumn("tie_rn", row_number().over(wTie))
      .filter(col(scoreCol) > col("cut_score") ||
        (col(scoreCol) === col("cut_score") && col("tie_rn") <= col("slots")))
      .drop("cut_score", "slots", "tie_rn")
  }

  /** Length-bucketed batch assembly — the padding-efficiency step of
    * fine-tuning / eval data prep: grouping similar-length documents into
    * fixed-size batches bounds the padding waste of batch-max-length
    * padding (a corpus batched at random wastes ~half its compute on pad
    * tokens). Documents land in a token-length bucket, take a
    * deterministic content-addressed order within it, and are cut into
    * batches of `batchSize`; the output is per-batch packing stats
    * (`padding = n_docs * max_len − sum_len`, the exact pad-token count).
    *
    * Scale shape: like [[packSequences]], the within-bucket order is
    * sharded by id hash — windows partition by (bucket, shard), so no
    * bucket funnels through one task; every batch stays inside one
    * (bucket, shard) pair by construction.
    */
  def lengthBuckets(docs: DataFrame, idCol: String, tokenCount: Column,
                    bucketWidth: Int, maxBucket: Int, batchSize: Int,
                    shards: Int = 16): DataFrame = {
    val base = docs
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("bucket", least(expr(s"n_tokens div $bucketWidth"), lit(maxBucket)))
      .withColumn("lb_shard", Portable.hash32(col(idCol), seed = 17) % shards)
      .withColumn("lb_ord", Portable.hash32(col(idCol), seed = 19))
    val w = Window.partitionBy(col("bucket"), col("lb_shard"))
      .orderBy(col("lb_ord"), col(idCol))
    base
      .withColumn("seq", row_number().over(w).cast("long") - 1)
      .withColumn("batch", expr(s"seq div $batchSize"))
      .groupBy(col("bucket"), col("lb_shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_len"))
      .withColumn("padding", col("n_docs") * col("max_len") - col("sum_len"))
  }

  /** Corpus version diff — the dataset-versioning primitive: given two
    * versions of a corpus, classify every document id as added / removed /
    * changed / unchanged by comparing content hashes. With the
    * content-addressed split and sampling above, this is what makes
    * incremental rebuilds auditable: the diff IS the changelog, and
    * downstream stages need only reprocess `added ∪ changed`.
    *
    * Scale shape: one id-keyed full outer shuffle join of two narrow
    * (id, md5) projections — the text columns are never shuffled.
    */
  def corpusDiff(oldV: DataFrame, newV: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val o = oldV.select(col(idCol), md5(col(textCol)).as("old_hash"))
    val n = newV.select(col(idCol), md5(col(textCol)).as("new_hash"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
  }

  /** Inverse of [[corpusDiff]] — APPLY a changelog to a snapshot and
    * produce the next corpus version: `op ∈ {i, u, d}` rows insert,
    * update, or delete by id (the lakehouse upsert/merge primitive that
    * makes incremental corpus rebuilds cheap: reprocess the changelog,
    * not the corpus).
    *
    * Scale shape: ONE id-keyed full-outer shuffle join; both sides carry
    * the payload column (inherent — the payload is what changes), but
    * nothing else is shuffled and no window or sort appears. Change ids
    * must be unique per changelog (standard CDC contract).
    */
  def applyDiff(snapshot: DataFrame, changes: DataFrame,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = snapshot.select(col(idCol), col(textCol).as("_old"))
    val c = changes.select(col(idCol), col("op"), col(textCol).as("_new"))
    s.join(c, Seq(idCol), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "d")
      .select(col(idCol), coalesce(col("_new"), col("_old")).as(textCol))
  }

  /** Whitespace word n-grams as an array column (empty when the document
    * has fewer than n tokens — `sequence` would otherwise count DOWN).
    */
  def wordNgrams(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact-k uniform sample PER STRATUM (deterministic): the k rows with
    * the smallest content-addressed hash in each group — per-domain eval
    * sets, per-source spot-check samples, anywhere "exactly k of each"
    * beats [[stratifiedSample]]'s expected-rate keep.
    *
    * Never sorts a whole group in one task (the trap: `row_number over
    * (partition by group order by hash)` funnels a 100 TB domain through
    * one task): a 4096-bucket histogram of the hash's high bits locates
    * each group's k-th-smallest-hash bucket via a cumulative count over
    * the buckets-sized table; rows in buckets strictly below pass
    * outright, and only the boundary bucket's ~n/4096 rows rank locally.
    * Same two-level cutoff as the winsorize rewrite / qualityGate.
    * Groups smaller than k keep every row. Content-addressed, so the
    * sample is reproducible and stable as the corpus grows.
    */
  def groupSampleExact(docs: DataFrame, groupCol: String, idCol: String,
                       k: Int, seed: Int = 31): DataFrame = {
    require(k > 0)
    val base = docs
      .withColumn("_h", Portable.hash32(col(idCol), seed))
      .withColumn("_bkt", (col("_h") / 1048576L).cast("long")) // 2^20 -> 4096 buckets
    val hist = base.groupBy(col(groupCol), col("_bkt"))
      .agg(count(lit(1)).as("_nb"))
    val wCum = Window.partitionBy(groupCol).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("_cum", sum(col("_nb")).over(wCum))
      .withColumn("_n", sum(col("_nb")).over(wAll))
      .withColumn("_k", least(lit(k.toLong), col("_n"))) // small groups keep all
    val targets = cum
      .filter(col("_cum") - col("_nb") < col("_k") && col("_k") <= col("_cum"))
      .select(col(groupCol), col("_bkt").as("_tb"),
        (col("_k") - (col("_cum") - col("_nb"))).as("_r"))
    val joined = base.join(broadcast(targets), Seq(groupCol))
    val below = joined.filter(col("_bkt") < col("_tb"))
    val wIn = Window.partitionBy(col(groupCol)).orderBy(col("_h"), col(idCol))
    val boundary = joined.filter(col("_bkt") === col("_tb"))
      .withColumn("_rn", row_number().over(wIn).cast("long"))
      .filter(col("_rn") <= col("_r"))
      .drop("_rn")
    below.union(boundary).drop("_h", "_bkt", "_tb", "_r")
  }

  /** Temperature-based domain mixture sampling — the data-mixing step of
    * pre-training corpus assembly (GPT-3/Pile style): raw domain
    * proportions are flattened by reweighting each domain `d` to
    * `w_d = n_d^(1/τ)`, so over-represented domains are down-sampled and
    * small domains keep presence. τ is FIXED at 2 (`w_d = sqrt(n_d)`)
    * because sqrt is IEEE-754-exact in every engine while a general
    * `pow(x, 1/τ)` is libm-dependent — the one tau the oracle can replay
    * bit-for-bit. Per-domain keep probability
    * `p_d = min(1, budget * w_d / Σw / n_d)` targets `budget` kept docs in
    * expectation, distributed ∝ sqrt(n_d); each row keeps via the
    * content-addressed hash test (the [[weightedSample]] rule), so the
    * sample is reproducible and stable under corpus growth.
    *
    * The Σw normalizer is an ORDERED fold over the domain-sorted weight
    * list (domains are a dimension — the list is small), because a plain
    * double `sum` would let partitioning pick the addition order and leak
    * into every p_d.
    *
    * Scale shape: one domain-count aggregate, a broadcast of the
    * domains-sized prob table, and a per-row hash filter — the corpus
    * shuffles zero times. Returns the kept rows with `n_docs` and `p`
    * attached for observability.
    */
  def temperatureMix(docs: DataFrame, domainCol: String, idCol: String,
                     budget: Long, seed: Int = 29): DataFrame = {
    val stats = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", sqrt(col("n_docs").cast("double")))
    val denom = stats.agg(
      aggregate(
        transform(
          array_sort(collect_list(struct(col(domainCol).as("d"), col("w")))),
          s => s.getField("w")),
        lit(0.0), (acc, x) => acc + x).as("denom"))
    val probs = stats.crossJoin(broadcast(denom))
      .withColumn("p", least(lit(1.0),
        col("w") * lit(budget.toDouble) / col("denom") /
          col("n_docs").cast("double")))
      .select(col(domainCol), col("n_docs"), col("p"))
    docs.join(broadcast(probs), Seq(domainCol))
      .filter(Portable.hash32(col(idCol), seed).cast("double") <
        col("p") * lit(4294967296.0))
  }

  /** Train/eval decontamination — the standard pre-training hygiene step:
    * drop every training document that shares at least one word n-gram
    * with the held-out evaluation set, so benchmark answers can't leak
    * into the training corpus (the 13-gram collision rule of GPT-3-style
    * pipelines; n is a parameter because the right value tracks tokenizer
    * and document length).
    *
    * Scale shape: the eval side is benchmark-sized (thousands of docs) —
    * its distinct n-grams BROADCAST; the train side explodes to n-grams
    * only inside a semi-join that never leaves the exchange-free
    * broadcast path, then the surviving ids anti-join back against the
    * original rows. No shuffle touches the corpus until the final
    * anti-join on doc ids.
    */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, n: Int = 13,
                    idCol: String = "doc_id", textCol: String = "text",
                    broadcastEval: Boolean = true): DataFrame = {
    // word n-grams come from the CODEGEN shingle expression (one pass per
    // row, distinct by construction — exactly what a collision join
    // needs), not an interpreted transform/slice/array_join HOF chain
    def grams(df: DataFrame) = graft.plans.TextHash
      .wordShingles(df.sparkSession, col(textCol), n)
    val evalGrams = evalDocs.select(explode(grams(evalDocs)).as("g")).distinct()
    // broadcastEval=false: when the "eval" side is NOT benchmark-sized
    // (e.g. decontaminating against another corpus), fall back to a
    // shuffled hash semi-join on the gram key
    val evalSide = if (broadcastEval) broadcast(evalGrams) else evalGrams
    val contaminated = train
      .select(col(idCol), explode(grams(train)).as("g"))
      .join(evalSide, Seq("g"), "left_semi")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bloom-pruned decontamination — the same CONTRACT as [[decontaminate]]
    * (bit-identical output), different scale path. When the eval side's
    * distinct n-grams are too many to ship comfortably as an exact
    * broadcast set (decontaminating against another corpus, or very long
    * benchmark suites), a Bloom filter over the eval grams (Spark's public
    * sketch via `DataFrameStatFunctions.bloomFilter`) broadcasts at a
    * fraction of the exact set's size, and every train gram probes it
    * MAP-SIDE — at fpp=0.01, ~99% of corpus grams die inside the scan
    * stage before any join. False positives cannot reach the output: the
    * survivors still pass through the exact semi-join, which now reads a
    * bloom-pruned sliver of the corpus instead of every exploded gram.
    *
    * The probe is a Scala UDF by necessity, not oversight: the sketch is
    * an opaque object (like the JTS union buffer), not expressible in
    * relational algebra — and it sits AFTER the codegen'd shingle
    * expression, so the hot n-gram loop stays in whole-stage codegen.
    */
  def decontaminateBloom(train: DataFrame, evalDocs: DataFrame, n: Int = 13,
                         idCol: String = "doc_id", textCol: String = "text",
                         fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame) = graft.plans.TextHash
      .wordShingles(df.sparkSession, col(textCol), n)
    val evalGrams = evalDocs.select(explode(grams(evalDocs)).as("g")).distinct()
    // two passes over the EVAL side (count, then build) — it is the small
    // side by contract, and the sketch builder needs a capacity up front
    val expected = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("g", expected, fpp)
    val bloomBc = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bloomBc.value.mightContain(g))
    val contaminated = train
      .select(col(idCol), explode(grams(train)).as("g"))
      .filter(mightContain(col("g")))
      .join(broadcast(evalGrams), Seq("g"), "left_semi") // exact: kills bloom FPs
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** DSIR-style importance scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score each
    * document by how much its HASHED UNIGRAM features look like a target
    * distribution (e.g. high-quality English) versus the raw corpus, then
    * keep the top scorers.
    *
    * Deviation from the paper, on purpose: DSIR's per-feature weight is
    * `log(p_target/p_raw)`; a transcendental `log` is not guaranteed
    * bit-identical across libm implementations, so the cross-engine-graded
    * score uses the exact integer cross-difference
    * `s(b) = (tgt(b)+1)*(R+B) - (raw(b)+1)*(T+B)` — the add-one-smoothed
    * `p_target(b) - p_raw(b)` scaled by `(T+B)(R+B)` — which preserves
    * each feature's sign and is EXACT in 64-bit integers, making the
    * per-document sum associative and partitioning-independent (a double
    * log-sum would let Spark's agg order perturb the top-k cutoff).
    *
    * Scale shape: ONE explode pass builds the per-document bucket
    * histogram (doc_id × ≤B rows, far smaller than the token stream);
    * bucket totals and the two corpus totals are aggs over that histogram;
    * the B-row score table broadcasts back onto it; the final top-N is
    * `orderBy().limit()` — Spark plans TakeOrdered (per-partition heap +
    * driver merge of N), never a global sort. Overflow headroom: scores
    * are ~(tokens)², fine to ~3e9 tokens per job at int64; shard beyond.
    */
  def dsirScores(docs: DataFrame, targetPred: Column, idCol: String = "doc_id",
                 textCol: String = "text", numBuckets: Int = 256,
                 topN: Int = 100): DataFrame = {
    val b = lit(numBuckets.toLong)
    val docBuckets = docs
      .select(col(idCol), targetPred.as("tgt"),
        explode(Portable.tokens(col(textCol))).as("t"))
      .groupBy(col(idCol), col("tgt"),
        (Portable.hash32(col("t")) % numBuckets).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val bucketTotals = docBuckets.groupBy(col("bucket"))
      .agg(sum(col("n")).as("raw_cnt"),
        sum(when(col("tgt"), col("n")).otherwise(0L)).as("tgt_cnt"))
    val totals = bucketTotals
      .agg(sum(col("raw_cnt")).as("r"), sum(col("tgt_cnt")).as("t"))
    // s multiplies two corpus-scale token totals (~N² — wraps a long at
    // N ≈ 3·10⁹ tokens) and dsir_score sums doc_len·s on top → the whole
    // score path is staged through DECIMAL(38,0) (q_monthly_hhi class).
    // The returned dsir_score keeps its BIGINT schema — a representational
    // bound (the magnitude is only used for ordering, which the decimal
    // path decides before the cast).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val scores = bucketTotals.crossJoin(broadcast(totals))
      .select(col("bucket"),
        ((col("tgt_cnt").cast(dec) + 1L) * (col("r").cast(dec) + b) -
          (col("raw_cnt").cast(dec) + 1L) * (col("t").cast(dec) + b)).as("s"))
    docBuckets.join(broadcast(scores), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("n").cast(dec) * col("s")).as("_dsir"))
      .orderBy(col("_dsir").desc, col(idCol))
      .limit(topN)
      .select(col(idCol), col("_dsir").cast("long").as("dsir_score"))
  }

  /** Two-level k-anonymity generalization (Sweeney 2002): rows whose
    * quasi-identifier pair `(qi1, qi2)` occurs < k times first GENERALIZE
    * the finer attribute (`qi2 → '*'`), and rows still in a group < k
    * after that are fully SUPPRESSED (`'*','*'`) — the
    * generalize-then-suppress ladder privacy review runs before training
    * data leaves a tenant.
    *
    * Returns one row per input row: (idCol, gen_q1, gen_q2 STRING, level
    * INT 0/1/2). Deterministic — group membership alone decides the level.
    *
    * Scale shape: two hash aggs over the quasi-identifier space (bounded
    * by |dom(qi1)| × |dom(qi2)|, small by definition for quasi-identifiers
    * — that is WHY they re-identify) broadcast back onto the rows; no
    * window over the corpus, no sort.
    */
  def kAnonymize(df: DataFrame, idCol: String, qi1: String, qi2: String,
                 k: Int): DataFrame = {
    val g0 = df.groupBy(col(qi1), col(qi2)).agg(count(lit(1)).as("cnt0"))
    val a0 = df.select(col(idCol), col(qi1), col(qi2))
      .join(broadcast(g0), Seq(qi1, qi2))
    val pass0 = a0.filter(col("cnt0") >= k)
      .select(col(idCol), col(qi1).cast("string").as("gen_q1"),
        col(qi2).cast("string").as("gen_q2"), lit(0).as("level"))
    val rem = a0.filter(col("cnt0") < k)
    val g1 = rem.groupBy(col(qi1)).agg(count(lit(1)).as("cnt1"))
    val rest = rem.join(broadcast(g1), Seq(qi1))
    val pass1 = rest.filter(col("cnt1") >= k)
      .select(col(idCol), col(qi1).cast("string").as("gen_q1"),
        lit("*").as("gen_q2"), lit(1).as("level"))
    val suppressed = rest.filter(col("cnt1") < k)
      .select(col(idCol), lit("*").as("gen_q1"), lit("*").as("gen_q2"),
        lit(2).as("level"))
    pass0.unionByName(pass1).unionByName(suppressed)
  }

  /** Differentially-private histogram release via the GEOMETRIC MECHANISM
    * (Ghosh, Roughgarden, Sundararajan, STOC 2009) — the discrete,
    * utility-optimal analogue of Laplace noise. Counts per group get
    * two-sided-geometric noise with ratio α = 1/2 (ε = ln 2 per release),
    * then groups whose NOISY count falls below `threshold` are suppressed
    * — the k-anonymity-style tail guard that stops tiny (re-identifying)
    * groups from being published at all. The companion of [[kAnonymize]]:
    * that operator privatizes the microdata, this one the aggregates.
    *
    * Noise here is SEEDED, not sampled: the magnitude of a Geometric(1/2)
    * variable equals the trailing-zero count of a uniform random integer,
    * so each group derives two independent portable hashes and reads the
    * noise off an integer CASE ladder — pure 64-bit arithmetic, no libm,
    * bit-identical in any engine, and reproducible across reruns (a DP
    * release that changed on every rerun would leak the true count by
    * averaging; fixing the randomness to the group key is the standard
    * "salted seed" deployment. A production release would keep the salt
    * secret; the fixed literal here is the testable stand-in.)
    *
    * Scale shape: one hash agg over the group domain (partial+final),
    * then per-row scalar noise — no second shuffle, no window, no
    * collect. The released histogram is group-domain-sized.
    */
  def dpCounts(df: DataFrame, q1: String, q2: String,
               threshold: Long = 5L): DataFrame = {
    // trailing-zero ladder: P(geo = k) = 2^-(k+1) for k < 12, cap at 12.
    // h is uniform on [0, 2^32) — h odd → 0, h ≡ 2 (mod 4) → 1, …
    def geo(h: Column): Column =
      (1 to 11).foldLeft(when(h % 2 === 1, 0)) { (c, k) =>
        val m = 1L << (k + 1)
        c.when(h % m === (m >> 1), k)
      }.otherwise(12)
    val key = concat_ws("|", col(q1).cast("string"), col(q2).cast("string"))
    val noise = (geo(Portable.hash32(key, 101)) -
      geo(Portable.hash32(key, 202))).cast("long")
    df.groupBy(col(q1), col(q2)).agg(count(lit(1)).as("n"))
      .select(col(q1), col(q2), (col("n") + noise).as("noisy_n"),
        noise.as("noise"))
      .filter(col("noisy_n") >= threshold)
  }

  /** Distinct l-diversity guard (Machanavajjhala et al., ICDE 2006 —
    * "l-Diversity: Privacy Beyond k-Anonymity"). k-anonymity bounds GROUP
    * SIZE but a group of 50 rows that all share one sensitive value still
    * discloses that value for everyone in it (the homogeneity attack);
    * l-diversity additionally requires ≥ l DISTINCT sensitive values per
    * published quasi-identifier group. Groups below the bar have their
    * quasi-identifiers suppressed to '*' (rows are kept — the sensitive
    * column itself is the payload being studied, the QIs are what
    * re-identify). Completes the privacy trio with [[kAnonymize]]
    * (microdata group size) and [[dpCounts]] (aggregate release).
    *
    * Scale shape: one hash agg over the quasi-identifier domain (count
    * distinct of the sensitive value per group — Spark plans the standard
    * two-phase Expand+agg, still bounded by |QI domain| × |sensitive
    * domain|) broadcast back onto the rows; per-row scalar decision, no
    * window, no sort.
    */
  def lDiversity(df: DataFrame, idCol: String, qi1: String, qi2: String,
                 sensitive: Column, l: Int): DataFrame = {
    val d = df.select(col(idCol), col(qi1), col(qi2), sensitive.as("sv"))
    val g = d.groupBy(col(qi1), col(qi2))
      .agg(countDistinct(col("sv")).as("ldiv"))
    d.join(broadcast(g), Seq(qi1, qi2))
      .select(col(idCol),
        when(col("ldiv") >= l, col(qi1).cast("string")).otherwise("*").as("gen_q1"),
        when(col("ldiv") >= l, col(qi2).cast("string")).otherwise("*").as("gen_q2"),
        (col("ldiv") >= l).cast("int").as("released"),
        col("ldiv"))
  }

  /** T5-style span corruption (Raffel et al. 2020, JMLR 21 §3.1.4) —
    * the denoising objective's data side: ~maskPct% of token positions
    * are masked, CONTIGUOUS masked runs collapse to one sentinel in the
    * input, and the target spells each span out behind its sentinel
    * (`input: "a <X1> d"  target: "<X1> b c"`). Deciding masks by the
    * portable hash of (doc, position) instead of an RNG makes the
    * corruption a pure function of the document — rebuild the corpus on
    * any cluster and byte-identical training pairs come out, and a
    * checkpoint-resumed epoch sees the same masks it saw before.
    *
    * Scale shape: posexplode → per-DOCUMENT window (lag + prefix sum
    * number the masked runs; key = doc_id, never corpus-wide) → one
    * doc-keyed agg assembling both sequences with order-pinned sorted
    * collects. Masks are per-position scalars; nothing iterates.
    */
  def spanCorruption(docs: DataFrame, textCol: String = "text",
                     maskPct: Int = 15): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val m = Portable.hash32(concat_ws("#", col("doc_id"), col("pos"))) % 100 < maskPct
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val winRun = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = toks
      .withColumn("m", m)
      .withColumn("run_start", col("m") && !lag(col("m"), 1, false).over(win))
      .withColumn("rid", sum(col("run_start").cast("long")).over(winRun))
    val emitIn = when(!col("m"), col("tok"))
      .when(col("run_start"), concat(lit("<X"), col("rid"), lit(">")))
    val emitTgt = when(col("m") && col("run_start"),
        concat(lit("<X"), col("rid"), lit("> "), col("tok")))
      .when(col("m"), col("tok"))
    def joined(emit: Column) = array_join(transform(
      array_sort(collect_list(when(emit.isNotNull, struct(col("pos"), emit.as("t"))))),
      x => x.getField("t")), " ")
    marked.groupBy(col("doc_id"))
      .agg(sum(col("m").cast("long")).as("n_masked"),
        coalesce(max(when(col("m"), col("rid"))), lit(0L)).as("n_spans"),
        joined(emitIn).as("input_text"),
        joined(emitTgt).as("target_text"))
  }

  /** Deterministic global training-order shuffle. Every epoch of LLM
    * training wants the corpus in a fresh pseudo-random order; at 100 TB
    * "shuffle the rows" must mean a DERIVED SORT KEY, not an RNG — the
    * portable hash of (epoch, id) gives every document a reproducible
    * position, so two clusters (or a rerun after preemption) materialize
    * byte-identical epochs. `shard = key mod nShards` splits the order
    * into independently consumable files (data-loader workers each read
    * their own shard stream).
    *
    * This assignment is a PURE PROJECTION — no shuffle, no window, stays
    * in whole-stage codegen; the global order is defined by (shard,
    * sort_key, id), not computed. Materializing that order is
    * [[writeShuffled]]'s job and the only place a sort exists.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int = 16,
                    epoch: Int = 0): DataFrame = {
    require(nShards > 0)
    val key = Portable.hash32(col(idCol), epoch)
    df.withColumn("sort_key", key)
      .withColumn("shard", (key % nShards).cast("int"))
  }

  /** Materialize one epoch's order: range-partition by (shard, sort_key,
    * id) — so part-file index order IS global order — and sort within
    * partitions. The classic write-once-read-sequentially layout: the
    * sort cost is paid once per epoch by the writer; readers stream part
    * files in filename order with zero further shuffling. Range
    * partitioning samples boundaries at runtime, so FILE CUTS may differ
    * between runs, but the row SEQUENCE across the cut points is the
    * derived total order — reproducible by construction (asserted in
    * TrainPrepSpec by re-reading part files in filename order).
    */
  def writeShuffled(df: DataFrame, idCol: String, path: String,
                    nShards: Int = 16, epoch: Int = 0,
                    nFiles: Int = 16): Unit = {
    shuffleShards(df, idCol, nShards, epoch)
      .repartitionByRange(nFiles, col("shard"), col("sort_key"), col(idCol))
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))
      .write.mode("overwrite").parquet(path)
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998: key k goes to argmax_s hash(s, k). Unlike
    * `hash(k) % S`, resizing S → S+1 relocates only ~1/(S+1) of keys
    * (each key moves only if the NEW shard wins its rendezvous), which
    * is what makes it the assignment of record for shard maps that grow:
    * embedding-index shards, per-worker corpus splits, cache placement.
    *
    * All-narrow evaluation: the S candidate weights are a LITERAL-sized
    * array built per row ([[graft.functions.Portable.hash32]] of
    * "s#key"), argmax via array_position(arr, array_max(arr)) — first
    * max wins, a deterministic tie-break both engines share. No explode,
    * no join, NO SHUFFLE: shard assignment at 100 TB is a pure map over
    * the scan, composable with any downstream write partitioning.
    */
  /** Tercile bucket assignment for an INTEGER-VALUED metric via the
    * value-histogram cutoff rule (no corpus-wide NTILE sort): cutoffs
    * are the smallest values whose cumulative count clears N/3 and
    * 2N/3 (cross-multiplied: 3·cum ≥ N and 3·cum ≥ 2N — exact longs),
    * and a unit's bucket (1..3) counts the cutoffs at or below its
    * value. The building block for RFM-style segmentation.
    * Returns the input plus `<valueCol>_b`.
    */
  private def tercile(units: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = units.groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum(col("_c")).over(w))
    val n = hist.agg(sum(col("_c")).as("_n"))
    val cuts = cum.crossJoin(broadcast(n))
      .select(
        min(when(col("_cum") * 3 >= col("_n"), col("_v"))).as("_t1"),
        min(when(col("_cum") * 3 >= col("_n") * 2, col("_v"))).as("_t2"))
    units.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_b",
        (lit(1) + when(col(valueCol) > col("_t1"), 1).otherwise(0)
          + when(col(valueCol) > col("_t2"), 1).otherwise(0)).cast("int"))
      .drop("_t1", "_t2")
  }

  /** RFM segmentation (Hughes 1994 — the classic behavioral customer
    * taxonomy): each unit scored 1–3 on Recency (lower age = better,
    * callers pass age so bucket 3 = most recent is age bucket 1
    * INVERTED here: we report the raw tercile of the given metric —
    * semantics of direction belong to the caller's column choice),
    * Frequency, and Monetary value, then grouped into the 27 "RFM
    * cells" — the segmentation marketing/retention teams actually run.
    *
    * Exact integer cutoffs: each metric's terciles come from its VALUE
    * HISTOGRAM via cross-multiplied cumulative counts (no NTILE — a
    * corpus-wide single-partition sort); buckets count cutoffs ≤ value,
    * so ties land deterministically in the same bucket on both engines.
    *
    * Scale shape: three histogram aggs (each quantization-bounded) with
    * bounded windows, three 1-row cutoff broadcasts onto the unit
    * table, one final 27-ary census agg. The unit table is scanned
    * once per metric plus once for the census.
    */
  def rfmSegments(units: DataFrame, rCol: String, fCol: String,
                  mCol: String): DataFrame = {
    val b = tercile(tercile(tercile(units, rCol), fCol), mCol)
    b.groupBy(col(s"${rCol}_b").as("r_b"), col(s"${fCol}_b").as("f_b"),
        col(s"${mCol}_b").as("m_b"))
      .agg(count(lit(1)).as("n_units"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007, ICDE) — the
    * third rung of the anonymization ladder after [[kAnonymize]] and
    * [[lDiversity]]: a class can be k-anonymous AND l-diverse yet still
    * leak (90% of one class has the sensitive value vs 10% globally —
    * skewness attack). t-closeness bounds the distance between each
    * equivalence class's sensitive distribution and the GLOBAL one.
    * Distance here is total variation, ½Σ|p−q| — the categorical-domain
    * metric the paper uses when no value hierarchy exists, and the one
    * that stays EXACT: cross-multiplied to |c_cs·N − c_g·n_c| the Σ is
    * an exact-long sum, and tv = Σ/(2·n_c·N) is ONE double division per
    * class. Absent (class, value) cells count as 0 via the class ×
    * sensitive-domain expansion (both bounded by definition — QIs
    * re-identify BECAUSE their domains are small).
    *
    * Scale shape: three hash aggs (class-value, class, global), the
    * global domain broadcast, one class-keyed sum. Output: one row per
    * class — (qi1, qi2, n_class, tv).
    */
  def tCloseness(df: DataFrame, qi1: String, qi2: String,
                 sensitive: Column): DataFrame = {
    val d = df.select(col(qi1), col(qi2), sensitive.as("sv"))
    val cs = d.groupBy(col(qi1), col(qi2), col("sv"))
      .agg(count(lit(1)).as("c_cs"))
    val cls = d.groupBy(col(qi1), col(qi2)).agg(count(lit(1)).as("n_c"))
    val glob = d.groupBy(col("sv")).agg(count(lit(1)).as("c_g"))
    val total = d.agg(count(lit(1)).as("nn"))
    cls.crossJoin(broadcast(glob)).crossJoin(broadcast(total))
      .join(cs, Seq(qi1, qi2, "sv"), "left")
      .select(col(qi1), col(qi2), col("n_c"), col("nn"),
        abs(coalesce(col("c_cs"), lit(0L)) * col("nn") -
          col("c_g") * col("n_c")).as("term"))
      .groupBy(col(qi1), col(qi2), col("n_c"), col("nn"))
      .agg(sum(col("term")).as("tv_num"))
      .select(col(qi1), col(qi2), col("n_c").as("n_class"),
        (col("tv_num").cast("double") /
          (lit(2L) * col("n_c") * col("nn")).cast("double")).as("tv"))
  }

  /** Preference-pair construction — the DPO/RLHF data-prep step: per
    * group (prompt cluster / source / topic), pair the highest-scored
    * response with the lowest as (chosen, rejected). The score is an
    * INTEGER column (a classifier logit, a quality rank — the
    * [[graft.operators.Stats.corrExact]] quantize-first contract) so the
    * argmax/argmin are exact struct-orderings with deterministic ties:
    * chosen breaks toward the SMALLER id at equal score (max_by on
    * (score, −id)), rejected likewise (min_by on (score, id)). Groups
    * whose best and worst tie (no signal) are dropped — a pair with zero
    * margin teaches nothing and its orientation would be arbitrary.
    *
    * Scale shape: ONE group-keyed hash agg (max_by + min_by, both
    * map-side foldable) — no window, no self-join; the corpus is
    * scanned once.
    */
  def preferencePairs(scored: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    scored.select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        s.as("sc"))
      .groupBy(col("grp"))
      .agg(
        max_by(struct(col("id"), col("sc")),
          struct(col("sc"), (-col("id")).cast("long"))).as("_c"),
        min_by(struct(col("id"), col("sc")),
          struct(col("sc"), col("id"))).as("_r"))
      .filter(col("_c.sc") > col("_r.sc"))
      .select(col("grp"), col("_c.id").as("chosen_id"),
        col("_c.sc").as("chosen_score"),
        col("_r.id").as("rejected_id"), col("_r.sc").as("rejected_score"),
        (col("_c.sc") - col("_r.sc")).as("margin"))
  }

  def rendezvousShard(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0 && numShards <= 1024, "literal-array regime")
    val weights = array((0 until numShards).map(s =>
      graft.functions.Portable.hash32(col(idCol), s)): _*)
    df.withColumn("shard",
      (array_position(weights, array_max(weights)) - 1L).cast("int"))
  }

  /** Per-source boilerplate scrub — the C4/RefinedWeb cleaning step that
    * [[graft.QueriesX.qChunkDedup]]'s global chunk dedup does NOT cover:
    * navigation menus, cookie banners, and footers repeat across many
    * pages of the SAME source but are near-unique globally, so the
    * detection key is (source, chunk), and the threshold is FRACTIONAL in
    * the source's page count (an absolute df cap would rot as a source
    * grows — the scale lesson from the fuzzy join's stop-grams). A chunk
    * is boilerplate within a source when it appears in at least
    * ceil(n_docs / denom) distinct documents of that source
    * (df · denom ≥ n_docs, integer arithmetic only).
    *
    * Scale shape: one chunk explosion pass, two (source, chunk)-keyed hash
    * aggs (doc-distinct df, then threshold), a broadcast-sized per-source
    * doc count, and one left join back — all equi-keyed, partial-
    * aggregable, no windows. A pathologically common chunk is a skew key
    * on the join; AQE skew-split applies.
    *
    * Output per participating doc (≥ k tokens): n_chunks, n_boiler
    * (chunk instances flagged), n_kept.
    */
  def boilerplateScrub(docs: DataFrame, k: Int, denom: Long,
                       idCol: String = "doc_id", textCol: String = "text",
                       srcCol: String = "source"): DataFrame = {
    val toks = docs
      .select(col(idCol), col(srcCol), split(col(textCol), " ").as("_t"))
      .filter(size(col("_t")) >= k)
    val chunks = toks.select(col(idCol), col(srcCol),
      posexplode(transform(
        sequence(lit(0), (size(col("_t")) / k).cast("int") - 1),
        i => array_join(slice(col("_t"), i * k + 1, lit(k)), " ")))
        .as(Seq("pos", "chunk")))
    val nd = toks.groupBy(col(srcCol)).agg(count(lit(1)).as("_nd"))
    val dfc = chunks.select(col(srcCol), col("chunk"), col(idCol)).distinct()
      .groupBy(col(srcCol), col("chunk")).agg(count(lit(1)).as("_df"))
    val boiler = dfc.join(broadcast(nd), Seq(srcCol))
      .filter(col("_df") * denom >= col("_nd"))
      .select(col(srcCol), col("chunk"), lit(1).as("_b"))
    chunks.join(boiler, Seq(srcCol, "chunk"), "left")
      .groupBy(col(idCol), col(srcCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_b").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("n_kept", col("n_chunks") - col("n_boiler"))
  }
}
