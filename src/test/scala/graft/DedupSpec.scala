package graft

import graft.operators.{Dedup, Sessions}
import graft.plans.DotFold
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Dedup / similarity / session operators on small synthetic frames. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "a b")                                          // too short for k=3
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val r = Dedup.exact(docs).orderBy("keep_id").collect()
    val dup = r.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) === 1L) // keep_id = min(1, 4)
    assert(r.length === 4)        // 5 docs, one pair collapsed
  }

  test("shingleRows matches wordShingles set semantics") {
    val viaRows = Dedup.shingleRows(docs, 3).as[(Long, String)].collect().toSet
    val viaArr = docs.select(col("doc_id"),
        explode(array_distinct(Portable.wordShingles(col("text"), 3))).as("s"))
      .as[(Long, String)].collect().toSet
    assert(viaRows === viaArr)
    assert(!viaRows.exists(_._1 == 5L)) // short doc -> no shingles
  }

  test("minhash LSH finds exact and near duplicates with jaccard") {
    val pairs = Dedup.minhashPairs(docs, 3, 8, 2, 0.2)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    // exact dup pair (1,4): jaccard 1.0, always found (identical signatures)
    assert(pairs.get((1L, 4L)).contains(1.0))
    // near-dup (1,2): 7 shingles each, 6 shared -> j = 6/8 = 0.75
    pairs.get((1L, 2L)).foreach(j => assert(j === 0.75))
    // doc 3 shares no shingles with anything -> never in the output
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash 16-bit banding achieves exact recall at hamming <= 3") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val brute = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 3
    } yield (a, b, hd.toLong)).toSet
    val banded = Dedup.simhashPairs(docs, 3).as[(Long, Long, Long)].collect().toSet
    assert(banded === brute)
  }

  test("simhash of identical docs is identical") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(4L))
  }

  test("char n-grams: short docs yield no phantom pairs; surrogate pairs never split") {
    import graft.plans.TextHashUtil
    import org.apache.spark.unsafe.types.UTF8String
    // two sampled docs shorter than n=3 chars: empty gram sets -> jaccard
    // null (not NaN) -> filtered, not emitted
    val short = Seq((0L, "ab"), (20L, "x")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardSample(short, n = 3, targetSample = 20, minJaccard = 0.0)
      .collect().isEmpty)
    // non-BMP character (surrogate pair in UTF-16): grams slice by code
    // point, so no gram contains a lone surrogate half
    val grams = TextHashUtil.charNgrams(UTF8String.fromString("ab😀cd"), 3)
    val strs = (0 until grams.numElements()).map(grams.getUTF8String(_).toString)
    assert(strs === Seq("ab😀", "b😀c", "😀cd"))
    assert(strs.forall(g => g.codePointCount(0, g.length) == 3))
  }

  test("boundedIdSample size stays ~targetSample as N grows 10x") {
    def sampled(n: Long): Long = Dedup.boundedIdSample(
      spark.range(n).select($"id".as("doc_id")), "doc_id", 25).count()
    // dense ids: mod = ceil(N/25) keeps exactly ceil(N/mod) = 25 rows at
    // both sizes — the pair stage downstream is constant, not quadratic
    assert(sampled(100L) === 25L)
    assert(sampled(1000L) === 25L)
    // degenerate corpus smaller than the target: mod clamps to 1, keep all
    assert(sampled(10L) === 10L)
  }

  test("keepBestPerContent keeps the highest-quality member, min id on ties") {
    val scored = Seq(
      (1L, "dup text", 0.2), (2L, "dup text", 0.9), (3L, "dup text", 0.9),
      (4L, "unique", 0.1)
    ).toDF("doc_id", "text", "quality")
    val kept = Dedup.keepBestPerContent(scored, "quality")
      .select("doc_id", "n_dups").as[(Long, Long)].collect().toMap
    // quality 0.9 beats 0.2; the 2-vs-3 tie breaks to the LOWER id
    assert(kept === Map(2L -> 3L, 4L -> 1L))
  }

  test("boundedHashSample stays uniform on sparse ids where the dense modulus breaks") {
    // sparse snowflake-ish ids: stride divisible by the derived modulus
    // (mod = ceil(1000/25) = 40), offset 17 — every id ≡ 17 (mod 40), so
    // the dense-id sampler returns the EMPTY set (the r9 failure mode),
    // while the hash-keyed variant still draws a ~targetSample subset
    val sparse = spark.range(1000L)
      .select(($"id" * 1000000L + 17L).as("doc_id"))
    assert(Dedup.boundedIdSample(sparse, "doc_id", 25).count() === 0L)
    val n = Dedup.boundedHashSample(sparse, "doc_id", 25).count()
    // binomial(1000, 1/40): mean 25, essentially always within [5, 60]
    assert(n > 5L && n < 60L, s"hash sample size $n outside plausible band")
    // content-addressed: same corpus -> identical sample set across runs
    val s1 = Dedup.boundedHashSample(sparse, "doc_id", 25)
      .as[Long].collect().toSet
    val s2 = Dedup.boundedHashSample(sparse, "doc_id", 25)
      .as[Long].collect().toSet
    assert(s1 === s2)
    // dense ids: both regimes produce a bounded sample of the same order
    val dense = spark.range(1000L).select($"id".as("doc_id"))
    val nd = Dedup.boundedHashSample(dense, "doc_id", 25).count()
    assert(nd > 5L && nd < 60L)
  }

  test("fuzzyStringJoin candidate distinct shuffles ids only, no strings") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter          => unwrap(i.child)
      case other                    => other
    }
    val strings = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sitting"))
      .toDF("id", "s")
    // stopDenom=1 disables the fractional stop-gram cap (df*8 > 3 would
    // otherwise drop EVERY gram of a 3-string corpus)
    val df = Dedup.fuzzyStringJoin(strings, q = 2, maxDist = 2, stopDenom = 1L)
    // exchanges only exist post-EnsureRequirements, and AQE hides the tree
    // behind AdaptiveSparkPlanExec — plan once with AQE off for the audit
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // No shuffle exchange anywhere in the plan may carry a string PAIR —
    // the r8 regression moved (s_a, s_b) through the candidate distinct
    // for every gram co-occurrence. Since the r13 ED-Join prefix window,
    // the candidate distinct reuses the window's id-partitioning (no
    // exchange of its own — one shuffle fewer), so the assertion is on
    // every exchange: at most ONE string column (the bounded-width gram
    // key), never the verify pair.
    val exchanges =
      try df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(exchanges.nonEmpty, "expected shuffle exchanges in the gram path")
    for (e <- exchanges) {
      val strCols = e.output.filter(_.dataType == StringType).map(_.name)
      assert(strCols.lengthCompare(1) <= 0,
        s"exchange carries a string pair: ${strCols.mkString(",")}")
    }
    // and the join still finds the real matches
    val got = df.as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 1)))
  }

  test("DotFold matches the interpreted HOF fold bit-for-bit") {
    DotFold.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)((Seq.fill(64)(rnd.nextFloat()), Seq.fill(64)(rnd.nextFloat())))
    val df = vecs.toDF("a", "b")
    val r = df.select(
      DotFold.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    r.foreach(row => assert(row.getDouble(0) === row.getDouble(1)))
  }

  test("sessionize splits on gap and aggregates bounds") {
    val events = Seq(
      (10L, 1L, 1000000L), (10L, 2L, 2000000L),        // session 1: 2 events
      (10L, 3L, 2000000000L),                           // session 2 (gap > 30s)
      (20L, 4L, 5000000L)                               // other user
    ).toDF("user_id", "event_id", "ts_us")
    val s = Sessions.sessionize(events, gapMicros = 30000000L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect()
    assert(s === Array((10L, 1L, 2L, 1000000L), (10L, 2L, 1L, 0L), (20L, 1L, 1L, 0L)))
  }

  test("funnel: steps must occur in order, stage counts completed prefix") {
    val ev = Seq(
      // user 1: full ordered path
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE first view -> stuck at stage 1
      (2L, "click", 50L), (2L, "view", 100L),
      // user 3: purchase without click -> stage 1 only
      (3L, "view", 10L), (3L, "purchase", 20L),
      // user 4: no funnel events at all
      (4L, "error", 5L)
    ).toDF("user_id", "event_type", "ts_us")
    val out = Sessions.funnel(ev, Seq("view", "click", "purchase"))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("retention: cohorts anchor to the first active day") {
    val ev = Seq(
      (1L, 10L), (1L, 10L), (1L, 12L),  // cohort 10, offsets 0 and 2
      (2L, 10L), (2L, 11L),             // cohort 10, offsets 0 and 1
      (3L, 11L)                         // cohort 11, offset 0
    ).toDF("user_id", "day")
    val out = Sessions.retention(ev)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((10L, 0L, 2L), (10L, 1L, 1L), (10L, 2L, 1L), (11L, 0L, 1L)))
  }

  test("repeatedSpans scrubs cross-document and within-document k-gram repeats") {
    val docs = Seq(
      // docs 1 and 2 share the 3-gram "common header line" at different
      // positions; everything else is unique and survives
      (1L, "common header line alpha beta gamma delta"),
      (2L, "intro words common header line epsilon zeta"),
      // doc 3 repeats a 3-gram WITHIN itself -> both occurrences scrubbed
      (3L, "p q r p q r tail"),
      // doc 4 shares nothing
      (4L, "totally unique content here"),
      // doc 5 is shorter than k
      (5L, "ab cd")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(docs, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((7L, 4L, "alpha beta gamma delta")))
    assert(out(2L) === ((7L, 4L, "intro words epsilon zeta")))
    // "p q r p q r" repeats "p q r" (positions 0-2 and 3-5) and ALSO the
    // grams "q r p" / "r p q" appear once each - only the repeated gram's
    // cover is scrubbed, leaving "tail"
    assert(out(3L) === ((7L, 1L, "tail")))
    assert(out(4L) === ((4L, 4L, "totally unique content here")))
    assert(out(5L) === ((2L, 2L, "ab cd")))
  }

  test("cdc chunks: shared passage yields the same chunk at different offsets") {
    // the identical 12-token passage sits at offset 0 in doc 1 and offset 3
    // in doc 2 — document-level dedup sees two distinct docs, but CDC
    // boundaries are content-defined, so the interior chunks align
    val passage = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, passage),
      (2L, s"pre1 pre2 pre3 $passage"),
      (3L, "unrelated text entirely here")
    ).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, mask = 4)
    // at least one chunk (a fully interior one) must be seen by both docs
    assert(chunks.filter($"n_docs" >= 2).count() >= 1,
      "the shared passage must produce at least one cross-document chunk")
    // chunk token counts conserve the corpus token count
    val totalToks = chunks.agg(sum($"n_occ" * $"n_toks")).as[Long].head()
    assert(totalToks === docs.select(size(split($"text", " "))).as[Int].collect().sum)
  }

  test("dedupIncrement drops exact and near old-dups, keeps fresh and new-new dups") {
    val old = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")
    )
    val neu = Seq(
      (101L, "alpha beta gamma delta epsilon zeta"),        // exact dup of 1
      (102L, "alpha beta gamma delta epsilon zeta eta"),    // near dup of 1
      (103L, "totally different words appear here now"),    // fresh
      (104L, "totally different words appear here now")     // dup of 103 — NEW-new: kept
    )
    val corpus = (old ++ neu).toDF("doc_id", "text")
    val out = Dedup.dedupIncrement(corpus, col("doc_id") >= 100L,
        k = 3, numHashes = 8, bandSize = 2, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 101 exact-dropped; 102 near-dropped; 103/104 survive (incremental
    // dedup is old-vs-new only — new-vs-new is the next full pass's job)
    assert(out === Seq(103L, 104L))
  }

  test("containment flags a quoted subset that symmetric jaccard would miss") {
    val small = "alpha beta gamma delta epsilon"
    val big = s"intro words first then $small and much more trailing content here"
    val corpus = Seq((1L, small), (2L, big),
      (3L, "unrelated text with different words")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, k = 3, maxDf = 10,
        minContainment = 0.9)
      .select("a_id", "b_id", "c_a", "c_b")
      .as[(Long, Long, Double, Double)].collect()
    // every 3-shingle of the small doc appears in the big doc: c_a = 1.0,
    // while jaccard would be only |small| / |big|
    assert(out.length === 1)
    val (a, b, ca, cb) = out.head
    assert(a === 1L && b === 2L && ca === 1.0 && cb < 0.5)
  }

  test("pairClusters: transitive closure over non-transitive pairs, singletons kept") {
    // A~B and B~C but no A~C pair: keep-one semantics still require one
    // cluster; D is a singleton and its own representative
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val out = Dedup.pairClusters(pairs, nodes, "doc_id")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (10L, 10L, 1), (11L, 10L, 0), (99L, 99L, 1)))
  }

  test("fuzzyStringJoin equals brute force with pruning off; stays sound with it on") {
    // random strings over a 12-letter alphabet; stopDenom = 1 disables
    // stop-gram pruning, so the q-gram candidate filter must be COMPLETE
    // (|s| >= q*(maxDist+1)) and the result equal all-pairs filtering
    val rnd = new scala.util.Random(31)
    val strs = (1L to 120L).map { i =>
      val len = 4 + rnd.nextInt(4)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(12)).toChar).mkString)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    val got = Dedup.fuzzyStringJoin(strs.toDF("id", "s"), q = 2, maxDist = 1,
        stopDenom = 1L)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture must contain 1-edit pairs")
    // a universal stem ('stemN' for all rows) makes EVERY gram a
    // stop-gram — the population the q-gram path is blind to. The r13
    // FastSS deletion-variant path (maxDist=1) must find the COMPLETE
    // true pair set here, not a sound subset: this is the regression
    // test for the 5,379-of-72,077 drop-out the gram path had.
    val stems = (1L to 60L).map(i => (i, s"stem${i % 20}"))
    val found = Dedup.fuzzyStringJoin(stems.toDF("id", "s"), q = 2, maxDist = 1)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    val trueStem = (for {
      (ia, sa) <- stems; (ib, sb) <- stems if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(found === trueStem,
      "FastSS must be complete on an all-stop-gram population")
    assert(trueStem.nonEmpty, "stem fixture must contain 1-edit pairs")
    // ed<=1 across a length-0/1 boundary exercises the empty-string
    // variant guard (sequence(1,0) would descend without it)
    val tiny = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, "ab")).toDF("id", "s")
    val tinyGot = Dedup.fuzzyStringJoin(tiny, q = 2, maxDist = 1)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(tinyGot === Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1),
      (2L, 4L, 1), (3L, 4L, 1)))
  }

  test("setSimJoin: prefix filtering is lossless vs brute-force Jaccard") {
    // 40 docs over a small word pool so shingle collisions are plentiful,
    // plus planted near-dup pairs that must survive
    val pool = Vector("red", "blue", "fox", "dog", "cat", "sun", "sky", "sea")
    def text(i: Long): String =
      (0 until 12).map(j => pool(((i * 7 + j * j + j) % pool.size).toInt)).mkString(" ")
    val base = (1L to 40L).map(i => (i, text(i)))
    val planted = Seq(
      (101L, text(3) + " extra"), // near-dup of 3
      (102L, text(3)))            // exact dup of 3
    val d = (base ++ planted).toDF("doc_id", "text")
    val got = Dedup.setSimJoin(d, k = 3, num = 1, den = 2)
      .select("a_id", "b_id", "inter", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force in Scala over the same distinct-shingle sets
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = (base ++ planted).map { case (i, t) => (i, shingles(t)) }
    val want = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      inter = (sa intersect sb).size.toLong
      union = (sa union sb).size.toLong
      if inter * 2 >= union
    } yield (ia, ib, inter, union)).toSet
    assert(got === want, "prefix-filtered join must equal brute force exactly")
    assert(want.exists { case (a, b, _, _) => (a, b) == (3L, 101L) || (a, b) == (3L, 102L) },
      "planted near-dups must be present in the ground truth")
  }

  test("winnowing: a shared run >= w+k-1 tokens is always detected, partition-invariant") {
    // doc 2 copies a 12-token run from doc 1 into otherwise-disjoint text;
    // doc 3 shares nothing. k=4, w=4 => guarantee threshold is 7 tokens.
    val runA = (20 to 31).map("a" + _).mkString(" ")
    val d = Seq(
      (1L, ((1 to 19) ++ (32 to 60)).map("a" + _).mkString(" ") + " " + runA),
      (2L, (1 to 24).map("b" + _).mkString(" ") + " " + runA + " " +
        (25 to 48).map("b" + _).mkString(" ")),
      (3L, (1 to 60).map("c" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, k = 4, w = 4, maxDf = 100, minShared = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "the 12-token copied run must surface at least one shared fingerprint")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      "an unrelated doc must share no fingerprints")
    val again = Dedup.winnowPairs(d.repartition(5), k = 4, w = 4,
        maxDf = 100, minShared = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(again === pairs)
  }

  test("fused winnow/shingle expressions equal the Column-algebra forms") {
    // random-ish docs incl. boundary shapes: <k tokens, exactly k, <w grams
    val d = (Seq((100L, "x y z"), (101L, "p q r s"), (102L, "a a a a a a")) ++
      (1L to 40L).map(i => (i,
        (0 until (3 + (i % 17)).toInt).map(j => s"t${(i * 7 + j * j) % 23}")
          .mkString(" ")))).toDF("doc_id", "text")
    val (k, w) = (4, 4)
    val toks = Portable.tokens(col("text"))
    val hs = transform(sequence(lit(1), size(toks) - (k - 1)), i =>
      Portable.hash32(concat_ws(" ", slice(toks, i, lit(k)))))
    val h = col("h")
    val oldFps = d.filter(size(toks) >= k).select(col("doc_id"), hs.as("h"))
      .select(col("doc_id"), explode(when(size(h) >= w,
          array_distinct(transform(sequence(lit(1), size(h) - (w - 1)), j =>
            array_min(slice(h, j, lit(w))))))
        .otherwise(array(array_min(h)))).as("f"))
      .as[(Long, Long)].collect().toSet
    val newFps = d.select(col("doc_id"),
        explode(graft.plans.TextHash.winnowFingerprints(
          spark, col("text"), k, w)).as("f"))
      .as[(Long, Long)].collect().toSet
    assert(newFps === oldFps,
      "fused winnowFingerprints must emit the identical (doc, fp) set")
    val oldSh = d.select(col("doc_id"),
        explode(Portable.wordShingles(col("text"), 2)).as("s"))
      .as[(Long, String)].collect().sorted.toSeq
    val newSh = d.select(col("doc_id"),
        explode(graft.plans.TextHash.wordShinglesAll(spark, col("text"), 2))
          .as("s"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(newSh === oldSh,
      "wordShinglesAll must emit the identical shingle MULTISET")
  }

  test("weighted minhash sees repetition that plain set-Jaccard hides") {
    // docs 1 and 2 have the SAME bigram set {«x y», «y x»} ∪ {«x y»}:
    // plain set Jaccard(1,2) = 0.5, but the capped tf vectors are
    // {xy:3, yx:2} vs {xy:1} -> J_w = 1/(5+1-1) = 0.2 — the repeated
    // boilerplate dilutes the weighted score below the 0.5 link bar.
    // Docs 1 and 3 are identical -> J_w = 1 exactly, always published.
    val d = Seq(
      (1L, "x y x y x y"),
      (2L, "x y"),
      (3L, "x y x y x y")).toDF("doc_id", "text")
    val out = Dedup.weightedMinhashPairs(d, minJw = 0.5)
      .select("a_id", "b_id", "jw").as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 3L, 1.0)),
      "identical docs link at exactly 1.0; the repetition-diluted pair must not")
    val rep = Dedup.weightedMinhashPairs(d.repartition(5), minJw = 0.5)
      .select("a_id", "b_id", "jw").as[(Long, Long, Double)].collect().toSet
    assert(rep === out)
  }
}
