package graft

import graft.operators.TrainPrep
import org.apache.spark.sql.functions._

/** Invariants of the training-prep operators: determinism (the property
  * that makes dataset versioning possible), capacity accounting, and
  * stability of split membership under corpus growth.
  */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, ("tok " * (i % 40 + 1)).trim)).toDF("doc_id", "text")

  test("split is exhaustive, deterministic, and roughly proportional") {
    val d = TrainPrep.deterministicSplit(docs(2000), "doc_id")
    val counts = d.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 2000)
    assert(counts("train") > 1400 && counts("train") < 1800) // ~80%
    // deterministic: recompute equals itself
    val again = TrainPrep.deterministicSplit(docs(2000), "doc_id")
    assert(d.exceptAll(again).isEmpty)
  }

  test("a document's split never changes when the corpus grows") {
    val small = TrainPrep.deterministicSplit(docs(100), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val big = TrainPrep.deterministicSplit(docs(2000), "doc_id")
      .filter($"doc_id" <= 100).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(small === big) // content-addressed, not position-based
  }

  test("packing: offset is in range and bins advance with the cumsum") {
    val packed = TrainPrep.packSequences(docs(500), "doc_id",
      size(split($"text", " ")).cast("long"), capacity = 64, shards = 4)
    assert(packed.filter($"offset" < 0 || $"offset" >= 64).count() === 0)
    // within a shard, ordering by doc_id, bins are non-decreasing and the
    // bin of each doc equals (tokens before it) DIV capacity
    val rows = packed.orderBy("shard", "doc_id")
      .select("shard", "doc_id", "n_tokens", "bin", "offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, _, n, bin, off) =>
        assert(bin === cum / 64)
        assert(off === cum % 64)
        cum += n
      }
    }
  }

  test("stratified sample: rates honored per stratum, kept set stable under growth") {
    val d = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val kept = TrainPrep.stratifiedSample(d, "lang", "doc_id", Map("en" -> 0.25))
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("fr") === 2000) // default rate 1.0 keeps everything
    assert(counts("en") > 350 && counts("en") < 650) // ~25% of 2000
    // content-addressed: the kept subset of a prefix equals the prefix of the kept set
    val keptSmall = TrainPrep.stratifiedSample(
      d.filter($"doc_id" <= 1000), "lang", "doc_id", Map("en" -> 0.25))
    assert(keptSmall.exceptAll(kept.filter($"doc_id" <= 1000)).isEmpty)
  }

  test("every document lands in exactly one shard/bin") {
    val packed = TrainPrep.packSequences(docs(300), "doc_id",
      size(split($"text", " ")).cast("long"), capacity = 128, shards = 2)
    assert(packed.count() === 300)
    assert(packed.select("doc_id").distinct().count() === 300)
    assert(packed.select("shard").distinct().count() === 2)
  }

  test("wordNgrams: boundary counts, short docs empty") {
    val d = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), TrainPrep.wordNgrams(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(d(0)._2 === Seq("a b c", "b c d"))
    assert(d(1)._2 === Seq.empty) // 2 tokens < n=3: empty, not sequence-down
  }

  test("decontaminate drops exactly the train docs sharing an n-gram with eval") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),     // shares "quick brown fox" with eval
      (2L, "entirely different words here"),
      (3L, "brown fox quick")                // same words, no shared 3-gram
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a quick brown fox runs")).toDF("doc_id", "text")
    val clean = TrainPrep.decontaminate(train, eval_, n = 3)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    // broadcast path: the corpus-side join must be a BroadcastHashJoin
    val p = clean.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("corpusDiff classifies added/removed/changed/unchanged by content hash") {
    val v1 = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new")).toDF("doc_id", "text")
    val out = TrainPrep.corpusDiff(v1, v2)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("domainMix admits by budget in hash order, stable under growth and partitioning") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = (1L to 80L).map(i => (i, if (i % 2 == 0) "a" else "b", "x " * 10))
      .toDF("doc_id", "dom", "text")
    def mix(df: org.apache.spark.sql.DataFrame) =
      TrainPrep.domainMix(df, "dom", "doc_id",
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(col("text"), " ")),
        budgets = Map("a" -> 120L), defaultBudget = 200L, shards = 8)
    val out = mix(docs).select("doc_id", "dom", "n_tokens", "cum_tokens").collect()
    // every admitted doc's running total respects its domain budget
    assert(out.forall(r => r.getLong(3) <= (if (r.getString(1) == "a") 120L else 200L)))
    // tokens per doc = 11 ("x "*10 splits to 11) -> a admits 10 docs (110<=120),
    // b admits 18 (198<=200) of the 40 in each domain
    val byDom = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byDom === Map("a" -> 10, "b" -> 18))
    // growth stability: adding docs to domain b NEVER changes domain a's mix
    val grown = mix(docs.union(
      (1000L to 1040L).map(i => (i, "b", "y " * 5)).toDF("doc_id", "dom", "text")))
      .select("doc_id", "dom").collect()
    assert(grown.filter(_.getString(1) == "a").map(_.getLong(0)).sorted.toSeq ===
      out.filter(_.getString(1) == "a").map(_.getLong(0)).sorted.toSeq)
    // partition invariance: the sharded cumsum equals itself on any layout
    val repart = mix(docs.repartition(13)).select("doc_id").as[Long].collect().sorted.toSeq
    assert(repart === out.map(_.getLong(0)).sorted.toSeq)
  }

  test("decontaminateBloom matches the exact path bit-for-bit, even at an absurd fpp") {
    val train = (1L to 60L).map { i =>
      (i, if (i % 5 == 0) s"shared gram alpha beta tail$i" else s"doc $i unique words only here")
    }.toDF("doc_id", "text")
    val eval_ = Seq((1000L, "the shared gram alpha beta ending")).toDF("doc_id", "text")
    val exact = TrainPrep.decontaminate(train, eval_, n = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // fpp=0.5: the bloom passes masses of false positives — the exact
    // verify join must kill every one of them
    val bloomed = TrainPrep.decontaminateBloom(train, eval_, n = 4, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(bloomed === exact)
    assert(exact.nonEmpty && !exact.exists(_ % 5 == 0)) // the contaminated docs really dropped
  }

  test("groupSampleExact: exactly min(k, n) per group, equal to the naive rank, no full-group sort") {
    val d = (1 to 900).map(i => (i.toLong, s"g${i % 3}"))
      .++((10001 to 10005).map(i => (i.toLong, "tiny")))
      .toDF("doc_id", "grp")
    val k = 25
    val sampled = TrainPrep.groupSampleExact(d, "grp", "doc_id", k)
      .select("grp", "doc_id").as[(String, Long)].collect()
    val sizes = sampled.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes === Map("g0" -> 25, "g1" -> 25, "g2" -> 25, "tiny" -> 5))
    // equals the naive per-group rank over (hash, id) — the semantics the
    // bucket cutoff must reproduce without ever sorting a whole group
    import org.apache.spark.sql.expressions.Window
    val naive = d
      .withColumn("h", graft.functions.Portable.hash32(col("doc_id"), 31))
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select("grp", "doc_id").as[(String, Long)].collect()
    assert(sampled.toSet === naive.toSet)
    // content-addressed: repartition-invariant
    val again = TrainPrep.groupSampleExact(d.repartition(13), "grp", "doc_id", k)
      .select("grp", "doc_id").as[(String, Long)].collect()
    assert(again.toSet === sampled.toSet)
  }

  test("temperatureMix flattens domain proportions and stays reproducible") {
    // three domains with 16:4:1 raw proportions — tau=2 reweights keep
    // RATES to 1:2:4 (p_d ∝ 1/sqrt(n_d)), flattening the mixture
    val d = (1 to 1600).map(i => (i.toLong, "big"))
      .++((2001 to 2400).map(i => (i.toLong, "mid")))
      .++((3001 to 3100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val kept = TrainPrep.temperatureMix(d, "lang", "doc_id", budget = 400)
    val rates = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
      .map { case (l, k) =>
        l -> k.toDouble / Map("big" -> 1600.0, "mid" -> 400.0, "small" -> 100.0)(l) }
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"),
      s"keep rates must invert domain size: $rates")
    // expectation accounting: budget split prop. to sqrt(n) = 40:20:10,
    // so expected kept = (400*40/70, 400*20/70, 400*10/70) ≈ (229, 114, 57);
    // binomial spread stays well within ±40%
    val total = kept.count()
    assert(total > 240 && total < 560, s"total kept $total far from budget 400")
    // content-addressed: identical sample set on rerun and under repartition
    val s1 = kept.select("doc_id").as[Long].collect().toSet
    val s2 = TrainPrep.temperatureMix(d.repartition(17), "lang", "doc_id", 400)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
  }

  test("applyDiff: inserts land, updates replace, deletes drop, rest untouched") {
    val snap = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val changes = Seq(
      (2L, "u", "two-v2"), (3L, "d", ""), (9L, "i", "nine")
    ).toDF("doc_id", "op", "text")
    val out = TrainPrep.applyDiff(snap, changes)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "one"), (2L, "two-v2"), (9L, "nine")))
  }

  test("qualityGate equals the per-domain rank formulation, ties broken by id") {
    import org.apache.spark.sql.expressions.Window
    // two domains with deliberate score ties straddling the cut boundary
    val scored = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8), (4L, "a", 0.8),
      (5L, "a", 0.7), (6L, "a", 0.6), (7L, "a", 0.5), (8L, "a", 0.4),
      (10L, "b", 0.3), (11L, "b", 0.3), (12L, "b", 0.2)
    ).toDF("doc_id", "lang", "quality")
    val kept = TrainPrep.qualityGate(scored, "lang", "quality", "doc_id",
      keepNum = 1, keepDen = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // reference: global rank within domain
    val w = Window.partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
    val expected = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"lang")))
      .filter($"rn" <= ($"n" * 1 + 1) / 2) // ceil(n/2) via integer math
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === expected)
    // domain a: ceil(8/2)=4 -> 0.9 + the three 0.8s (tie group exactly fills)
    assert(kept.filter(_ < 10) === Seq(1L, 2L, 3L, 4L))
    // domain b: ceil(3/2)=2 -> both 0.3s; the tie break keeps lower ids
    assert(kept.filter(_ >= 10) === Seq(10L, 11L))
  }

  test("qualityGate keeps exactly ceil(n*p) per domain on tie-heavy scores") {
    // deterministic pseudo-random scores drawn from a COARSE grid so tie
    // groups straddle cut boundaries in most domains
    val rnd = new scala.util.Random(7)
    val rows = for (d <- 'a' to 'e'; i <- 1 to (20 + rnd.nextInt(30)))
      yield (d.toString + i, d.toString, (rnd.nextInt(5) * 0.25))
    val scored = rows.toDF("doc_id", "lang", "quality")
    val kept = TrainPrep.qualityGate(scored, "lang", "quality", "doc_id", 1, 4)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val expected = rows.groupBy(_._2).map { case (d, rs) =>
      d -> ((rs.size + 3) / 4).toLong
    }
    assert(kept === expected)
  }

  test("lengthBuckets: batches respect size, padding is exact, layout is partition-invariant") {
    val d = docs(300)
    val out = TrainPrep.lengthBuckets(d, "doc_id",
      size(split($"text", " ")), bucketWidth = 8, maxBucket = 4, batchSize = 8)
    val rows = out.select("bucket", "lb_shard", "batch", "n_docs", "max_len", "sum_len", "padding")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._4).sum === 300, "every document lands in exactly one batch")
    assert(rows.forall(_._4 <= 8), "no batch exceeds batchSize")
    assert(rows.forall(r => r._7 === r._4 * r._5 - r._6), "padding accounting is exact")
    // only the LAST batch of a (bucket, shard) run may be partial
    val partials = rows.groupBy(r => (r._1, r._2))
      .map { case (_, rs) => rs.count(_._4 < 8) }
    assert(partials.forall(_ <= 1))
    val again = TrainPrep.lengthBuckets(d.repartition(13), "doc_id",
      size(split($"text", " ")), bucketWidth = 8, maxBucket = 4, batchSize = 8)
      .select("bucket", "lb_shard", "batch", "n_docs", "max_len", "sum_len", "padding")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2, r._3)).toSeq ===
      rows.sortBy(r => (r._1, r._2, r._3)).toSeq)
  }

  test("contextWindows: full-window coverage, overlap, short-doc and tail semantics") {
    val d = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")), // 10 toks: 3 full + tail drop
      (2L, "a b c"),                              // short: one partial window
      (3L, (1 to 4).map("s" + _).mkString(" "))   // exactly window: one window
    ).toDF("doc_id", "text")
    val r = TrainPrep.contextWindows(d, "doc_id", "text", window = 4, stride = 2)
      .select("doc_id", "win_id", "start", "n_tok", "win_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: (10-4)/2+1 = 4 full windows at starts 0,2,4,6; tokens 9..10
    // appear only inside the last window (start 6 covers 7..10)
    assert(r(1L).map(w => (w._3, w._5)) === Seq(
      0L -> "t1 t2 t3 t4", 2L -> "t3 t4 t5 t6",
      4L -> "t5 t6 t7 t8", 6L -> "t7 t8 t9 t10"))
    assert(r(1L).forall(_._4 === 4L))
    // doc 2 (< window): one partial window, n_tok = doc length
    assert(r(2L) === Seq((2L, 0L, 0L, 3L, "a b c")))
    // doc 3 (== window): exactly one full window
    assert(r(3L) === Seq((3L, 0L, 0L, 4L, "s1 s2 s3 s4")))
    // partition-independence of the expand
    val again = TrainPrep.contextWindows(d.repartition(5), "doc_id", "text", 4, 2)
      .select("doc_id", "win_id", "start", "n_tok", "win_text")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(again === r.values.flatten.toSet)
  }

  test("dsirScores: target-like held-out docs outrank raw-like, partition-invariant") {
    // targets (lang=en) speak 'alpha*'; the raw remainder speaks 'beta*'.
    // Two held-out non-target probes then differ only in which
    // distribution their tokens resemble.
    val d = ((1 to 20).map(i => (i.toLong, "alpha1 alpha2 alpha3", "en")) ++
      (21 to 40).map(i => (i.toLong, "beta1 beta2 beta3", "de")) ++
      Seq((98L, "alpha1 alpha2 alpha3", "xx"), (99L, "beta1 beta2 beta3", "xx")))
      .toDF("doc_id", "text", "lang")
    val scores = TrainPrep.dsirScores(d, col("lang") === "en")
      .as[(Long, Long)].collect().toMap
    assert(scores(98L) > scores(99L),
      "a doc drawn from the target distribution must outscore a raw-like doc")
    // an actual target doc and the target-like probe share token stats
    assert(scores(98L) === scores(1L))
    val again = TrainPrep.dsirScores(d.repartition(7), col("lang") === "en")
      .as[(Long, Long)].collect().toMap
    assert(again === scores)
  }

  test("kAnonymize: ladder levels honor k, partition the input, preserve ids") {
    // (A,x)=12 -> level 0; (A,y)=3 -> A-remainder 3 < k -> suppressed;
    // (B,x)=6 + (B,y)=5 -> B-remainder 11 >= k -> level 1
    val rows = (1 to 12).map(i => (i.toLong, "A", "x")) ++
      (13 to 15).map(i => (i.toLong, "A", "y")) ++
      (16 to 21).map(i => (i.toLong, "B", "x")) ++
      (22 to 26).map(i => (i.toLong, "B", "y"))
    val d = rows.toDF("id", "q1", "q2")
    val r = TrainPrep.kAnonymize(d, "id", "q1", "q2", k = 10)
      .as[(Long, String, String, Int)].collect()
    assert(r.length === 26, "every input row gets exactly one output row")
    assert(r.map(_._1).toSet === (1L to 26L).toSet)
    val byLevel = r.groupBy(_._4)
    assert(byLevel(0).length === 12 &&
      byLevel(0).forall(x => x._2 == "A" && x._3 == "x"))
    assert(byLevel(1).length === 11 &&
      byLevel(1).forall(x => x._2 == "B" && x._3 == "*"))
    assert(byLevel(2).length === 3 &&
      byLevel(2).forall(x => x._2 == "*" && x._3 == "*"))
    // the published-group invariant k-anonymity promises: every non-
    // suppressed (gen_q1, gen_q2) group has at least k members
    r.filter(_._4 < 2).groupBy(x => (x._2, x._3)).foreach { case (g, xs) =>
      assert(xs.length >= 10, s"group $g leaked with ${xs.length} < k rows")
    }
  }

  test("dpCounts: geometric noise matches the reference ladder, suppression holds") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hash32(s: String) = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    // the trailing-zero ladder: geo = min(tz(h), 12); tz(0) = 64 caps to 12
    def geo(h: Long) = math.min(java.lang.Long.numberOfTrailingZeros(h), 12)
    def noise(g1: String, g2: String) =
      geo(hash32(s"101#$g1|$g2")) - geo(hash32(s"202#$g1|$g2"))
    val truth = Map(("en", "s1") -> 100, ("fr", "s2") -> 3, ("zh", "s3") -> 1)
    val rows = truth.toSeq.flatMap { case ((a, b), n) =>
      Seq.fill(n)((a, b)) }.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val d = rows.toDF("id", "g1", "g2")
    val out = TrainPrep.dpCounts(d, "g1", "g2", threshold = 5L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val expect = truth.collect {
      case ((a, b), n) if n + noise(a, b) >= 5 =>
        (a, b) -> ((n + noise(a, b)).toLong, noise(a, b).toLong)
    }
    assert(out === expect, "released histogram must equal the reference mechanism")
    assert(out.contains(("en", "s1")), "a 100-count group always survives |noise| <= 12")
    assert(out.values.forall { case (noisy, nz) => noisy >= 5 && math.abs(nz) <= 12 })
    // rerun is byte-identical: the seeded mechanism is reproducible
    val again = TrainPrep.dpCounts(d.repartition(7), "g1", "g2", threshold = 5L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(again === out)
  }

  test("lDiversity suppresses homogeneous groups and releases diverse ones") {
    // group (A,x): 4 rows, sensitive values {1,2,3} -> l=3 released;
    // group (B,y): 5 rows all sensitive 7 -> homogeneity attack -> masked
    val rows = Seq(
      (1L, "A", "x", 1L), (2L, "A", "x", 2L), (3L, "A", "x", 3L), (4L, "A", "x", 1L),
      (5L, "B", "y", 7L), (6L, "B", "y", 7L), (7L, "B", "y", 7L),
      (8L, "B", "y", 7L), (9L, "B", "y", 7L))
    val d = rows.toDF("id", "q1", "q2", "sv")
    val r = TrainPrep.lDiversity(d, "id", "q1", "q2", col("sv"), l = 3)
      .as[(Long, String, String, Int, Long)].collect()
    assert(r.length === 9, "every row stays — only the QIs are masked")
    val released = r.filter(_._4 === 1)
    val masked = r.filter(_._4 === 0)
    assert(released.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
    assert(released.forall(x => x._2 == "A" && x._3 == "x" && x._5 == 3L))
    assert(masked.map(_._1).toSet === Set(5L, 6L, 7L, 8L, 9L))
    assert(masked.forall(x => x._2 == "*" && x._3 == "*" && x._5 == 1L))
  }

  test("span corruption round-trips: splicing targets back yields the original") {
    val d = (1 to 50).map(i =>
      (i.toLong, (1 to 30).map(j => s"w${(i * 31 + j) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val orig = d.as[(Long, String)].collect().toMap
    val r = TrainPrep.spanCorruption(d)
      .as[(Long, Long, Long, String, String)].collect()
    assert(r.length === 50)
    var sawMask = false
    r.foreach { case (id, nMasked, nSpans, in, tgt) =>
      assert(nMasked >= nSpans, "every span holds at least one masked token")
      if (nSpans > 0) sawMask = true
      val spans: Map[Int, String] = tgt.split("<X").filter(_.nonEmpty).map { p =>
        val i = p.indexOf('>'); (p.take(i).toInt, p.drop(i + 1).trim)
      }.toMap
      assert(spans.size.toLong === nSpans)
      val rebuilt = in.split(" ").flatMap { t =>
        if (t.startsWith("<X"))
          spans(t.stripPrefix("<X").stripSuffix(">").toInt).split(" ")
        else Array(t)
      }.mkString(" ")
      assert(rebuilt === orig(id), s"doc $id failed to round-trip")
    }
    assert(sawMask, "15% masking over 1500 tokens must mask something")
    // partition invariance
    val again = TrainPrep.spanCorruption(d.repartition(7))
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(again === r.toSet)
  }

  test("epoch shuffle: assignment is a shuffle-free projection; writer emits the global order") {
    val d = docs(500)
    val assigned = TrainPrep.shuffleShards(d, "doc_id", nShards = 8, epoch = 3)
    // pure projection: no exchange anywhere in the assignment plan
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "assignment must not shuffle")
    // epochs produce different orders; the same epoch reproduces exactly
    val e3 = assigned.select("doc_id", "sort_key").as[(Long, Long)].collect().toMap
    val e4 = TrainPrep.shuffleShards(d, "doc_id", nShards = 8, epoch = 4)
      .select("doc_id", "sort_key").as[(Long, Long)].collect().toMap
    assert(e3 !== e4, "different epochs must reorder")
    assert(TrainPrep.shuffleShards(d.repartition(7), "doc_id", nShards = 8, epoch = 3)
      .select("doc_id", "sort_key").as[(Long, Long)].collect().toMap === e3)

    // writer: part files read back IN FILENAME ORDER yield the derived
    // total order (shard, sort_key, doc_id) — the property data-loader
    // workers rely on
    val out = java.nio.file.Files.createTempDirectory("graft-shuffle").toString + "/epoch3"
    TrainPrep.writeShuffled(d, "doc_id", out, nShards = 8, epoch = 3, nFiles = 4)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parts.length >= 2, "range partitioning must produce multiple files")
    val seq = parts.toSeq.flatMap { f =>
      spark.read.parquet(f.getAbsolutePath)
        .select("shard", "sort_key", "doc_id")
        .as[(Int, Long, Long)].collect().toSeq
    }
    assert(seq.length === 500)
    assert(seq === seq.sorted, "concatenated part files must be globally ordered")
  }

  test("rfmSegments: exact tercile cutoffs, deterministic ties, full census") {
    // 9 units with clean terciles on every axis; r=f=m aligned so the
    // census concentrates on the diagonal cells
    val units = (1L to 9L).map(i => (i, i, i * 10L)).toDF("r_age", "f", "m")
    val r = TrainPrep.rfmSegments(units, "r_age", "f", "m")
      .as[(Int, Int, Int, Long)].collect().sortBy(t => (t._1, t._2, t._3)).toList
    // cutoffs at cum*3 >= 9 / >= 18 -> t1 = value 3, t2 = value 6:
    // buckets {1..3}->1, {4..6}->2, {7..9}->3, three units each
    assert(r === List((1, 1, 1, 3L), (2, 2, 2, 3L), (3, 3, 3, 3L)))
    // ties on a bucket boundary land in the same bucket (cutoff <= rule)
    val tied = Seq((1L, 1L, 5L), (1L, 1L, 5L), (1L, 1L, 5L), (1L, 1L, 9L))
      .toDF("r_age", "f", "m")
    val rt = TrainPrep.rfmSegments(tied, "r_age", "f", "m")
      .as[(Int, Int, Int, Long)].collect().toSet
    // m histogram {5:3, 9:1}: cum(5)=3 clears BOTH 3cum>=4 and >=8, so
    // t1=t2=5 -> the three 5s share bucket 1 and the 9 jumps to 3 (a
    // dominant tie swallows the middle bucket - the documented cutoff
    // rule, deterministic on both engines)
    assert(rt === Set((1, 1, 1, 3L), (1, 1, 3, 1L)))
    // partition invariance
    val again = TrainPrep.rfmSegments(units.repartition(5), "r_age", "f", "m")
      .as[(Int, Int, Int, Long)].collect().sortBy(t => (t._1, t._2, t._3)).toList
    assert(again === r)
  }

  test("tCloseness: skewed class scores high, mirror-of-global scores zero") {
    import org.apache.spark.sql.functions.{col, when}
    // global sv distribution: a:4, b:4 (N=8). class (1,x) mirrors it ->
    // tv = 0; class (2,y) is all-a (skewness attack) -> p=(1,0) q=(.5,.5)
    // -> tv = 1/2
    val rows = Seq(
      (1, "x", "a"), (1, "x", "a"), (1, "x", "b"), (1, "x", "b"),
      (2, "y", "a"), (2, "y", "a"),
      (3, "z", "b"), (3, "z", "b")).toDF("q1", "q2", "sv")
    val r = TrainPrep.tCloseness(rows, "q1", "q2", col("sv"))
      .as[(Int, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(r((1, "x")) === ((4L, 0.0)))
    assert(r((2, "y")) === ((2L, 0.5)))
    assert(r((3, "z")) === ((2L, 0.5)))
    // partition invariance
    val again = TrainPrep.tCloseness(rows.repartition(5), "q1", "q2", col("sv"))
      .as[(Int, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(again === r)
  }

  test("preferencePairs: argmax/argmin with deterministic ties, zero-margin drop") {
    val scored = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 30L), ("s1", 4L, -5L),
      ("s2", 10L, 7L), ("s2", 11L, 7L), // all-equal -> dropped
      ("s3", 20L, 0L)                   // singleton  -> dropped
    ).toDF("src", "doc", "score")
    val r = TrainPrep.preferencePairs(scored, "src", "doc", "score")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    // chosen: max score 30, tie (2,3) -> smaller id 2; rejected: -5 @ 4
    assert(r.head === (("s1", 2L, 30L, 4L, -5L, 35L)))
    val again = TrainPrep.preferencePairs(scored.repartition(7),
      "src", "doc", "score")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(again.toSeq === r.toSeq)
  }

  test("rendezvousShard: stable, shuffle-free, and minimally relocating on grow") {
    val ids = (1L to 2000L).toDF("doc_id")
    val s16 = TrainPrep.rendezvousShard(ids, "doc_id", 16)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    // all shards in range and populated (2000 keys over 16 shards)
    assert(s16.values.forall(s => s >= 0 && s < 16))
    assert(s16.values.toSet.size === 16)
    // growing 16 -> 17: keys move ONLY to the new shard (the HRW
    // property `hash(s,k)` is unchanged for existing s — a key moves iff
    // shard 16 wins its rendezvous), and only a small fraction
    val s17 = TrainPrep.rendezvousShard(ids, "doc_id", 17)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val moved = s16.keys.filter(k => s16(k) != s17(k)).toSeq
    assert(moved.forall(k => s17(k) === 16), "relocations must target the new shard")
    assert(moved.size < 2000 / 17 * 2, s"moved ${moved.size}, expected ~1/17")
    // narrow plan: no exchange before assignment
    val plan = TrainPrep.rendezvousShard(ids, "doc_id", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shard assignment must not shuffle:\n$plan")
    // partition invariance
    val again = TrainPrep.rendezvousShard(ids.repartition(9), "doc_id", 16)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(again === s16)
  }
}
