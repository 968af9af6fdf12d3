package graft

import graft.operators.Stats

/** Exact-arithmetic correlation: textbook values on crafted data and
  * bit-determinism across partitionings (the whole point of carrying the
  * moment sums as longs).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("corrExact hits ±1 (to sqrt rounding) on perfectly (anti)correlated columns") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 30L), ("b", 2L, 20L), ("b", 3L, 10L))
      .toDF("g", "x", "y")
    val r = Stats.corrExact(df, Seq("g"), "x", "y")
      .select("g", "corr").as[(String, Double)].collect().toMap
    // the moment sums are exact; the only slack is √a·√b ≈ √(ab) (1 ulp)
    assert(math.abs(r("a") - 1.0) < 1e-15)   // y = 2x
    assert(math.abs(r("b") + 1.0) < 1e-15)   // y = 40 - 10x
  }

  test("corrExact stays within [-1, 1] on random integer data") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map { i =>
      (s"g${i % 8}", rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)
    }
    val r = Stats.corrExact(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .select("corr").as[Double].collect()
    assert(r.length === 8)
    for (c <- r) assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr=$c")
  }

  test("corrExact matches the closed form and is partition-independent") {
    val rows = (1 to 97).map(i => ("g", i.toLong, ((i * 7919) % 101).toLong))
    val a = Stats.corrExact(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .select("corr").as[Double].head()
    val b = Stats.corrExact(rows.toDF("g", "x", "y").repartition(7), Seq("g"), "x", "y")
      .select("corr").as[Double].head()
    assert(a === b, "float last-bits leaked partition layout")
    val n = rows.size.toDouble
    val (sx, sy) = (rows.map(_._2).sum.toDouble, rows.map(_._3).sum.toDouble)
    val sxx = rows.map(r => r._2 * r._2).sum.toDouble
    val syy = rows.map(r => r._3 * r._3).sum.toDouble
    val sxy = rows.map(r => r._2 * r._3).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(a - expected) < 1e-12)
  }

  test("cohensKappa: textbook value, perfect agreement, chance-level labels") {
    // classic worked example: N=50, agree=35 (20 yes-yes + 15 no-no),
    // yes-margins 25/30, no-margins 25/20 -> R = 25*30 + 25*20 = 1250
    // kappa = (50*35 - 1250)/(50*50 - 1250) = 500/1250 = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Stats.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((50L, 35L, 1250L, 0.4)))
    // perfect agreement -> kappa exactly 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Stats.cohensKappa(perfect, "a", "b")
      .select("kappa").as[Double].head() === 1.0)
    // one labeler constant while truth is split: agreement equals chance
    // -> kappa exactly 0
    val chance = Seq(("x", "x"), ("y", "x"), ("x", "x"), ("y", "x"))
      .toDF("a", "b")
    assert(Stats.cohensKappa(chance, "a", "b")
      .select("kappa").as[Double].head() === 0.0)
  }

  test("linregExact: exact line recovered, hand-checked fit, partition invariance") {
    // exact line y = 3x + 7 -> slope/intercept/r2 recovered exactly
    val line = Seq((1L, 10L), (2L, 13L), (3L, 16L), (4L, 19L))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = Stats.linregExact(line, Seq("g"), "x", "y")
      .select("n", "slope", "intercept", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(r === ((4L, 3.0, 7.0, 1.0)))
    // hand-checked non-exact fit: points (0,0),(1,1),(2,1)
    // n=3 sx=3 sy=2 sxx=5 sxy=3 -> slope=(9-6)/(15-9)=0.5
    // intercept=(2*5-3*3)/(15-9)=1/6; r2=9/(6*(3*2-4))=0.75
    val fit = Seq((0L, 0L), (1L, 1L), (2L, 1L))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val f = Stats.linregExact(fit, Seq("g"), "x", "y")
      .select("slope", "intercept", "r2").as[(Double, Double, Double)].head()
    assert(f._1 === 0.5)
    assert(f._2 === 1.0 / 6.0)
    assert(f._3 === 0.75)
    // large cents-scale values whose sum-of-squares exceeds Long range
    // stay exact, and the result is bit-identical across partitionings
    val big = (1L to 4000L).map(i => ("g", i % 97, (i % 97) * 4000000L + i % 13))
      .toDF("g", "x", "y")
    val a = Stats.linregExact(big.repartition(1), Seq("g"), "x", "y")
      .select("slope", "intercept", "r2").as[(Double, Double, Double)].head()
    val b = Stats.linregExact(big.repartition(17), Seq("g"), "x", "y")
      .select("slope", "intercept", "r2").as[(Double, Double, Double)].head()
    assert(a === b)
    assert(math.abs(a._1 - 4000000.0) < 1.0)
  }

  test("benfordDigits: BigInt-replayed contribs, sub-1 exclusion, digit census") {
    // digits: 1 (from 1.5), 1 (from 199.0), 2, 9; 0.4 excluded (< 1)
    val vals = Seq(1.5, 199.0, 25.0, 900.0, 0.4).toDF("v")
    val r = Stats.benfordDigits(vals, "v")
      .as[(Int, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    // ALL nine digits emit — a zero-observation digit is the most anomalous
    // audit outcome and must appear as (n_obs = 0, full chi^2 contribution),
    // not vanish (the r12-advice inner-join bug)
    assert(r.keySet === (1 to 9).toSet)
    assert(r(1)._2 === 2L)
    assert(r(2)._2 === 1L && r(9)._2 === 1L)
    assert((3 to 8).forall(d => r(d)._2 === 0L))
    // replay expected/contrib with independent BigInt arithmetic
    val two40 = BigInt(1) << 40
    val c = Stats.BenfordScaled.toMap
    for ((d, (_, obs, expd, contrib)) <- r) {
      val n = BigInt(4); val cd = BigInt(c(d))
      assert(expd === (n * cd).toDouble / two40.toDouble)
      val diff = BigInt(obs) * two40 - n * cd
      assert(contrib === (diff * diff).toDouble / (two40 * n * cd).toDouble)
    }
    // a perfectly Benford-ish heavy-1 sample scores digit 1 near zero:
    // 30 of 100 values lead with 1 -> (O*2^40 - N*C1) is small
    val many = ((1 to 30).map(_ => 10.0) ++ (31 to 100).map(i => 200.0 + i))
      .toDF("v")
    val m = Stats.benfordDigits(many, "v")
      .as[(Int, Long, Double, Double)].collect().map(t => t._1 -> t._4).toMap
    assert(m(1) < 0.01, s"digit-1 contrib should be tiny, got ${m(1)}")
  }

  test("corrMatrix agrees bit-for-bit with pairwise corrExact, any partitioning") {
    val rows = (1L to 500L).map(i =>
      ("g", i % 37, (i % 37) * 3 + i % 11, (i * 7919) % 101))
      .toDF("g", "a", "b", "c")
    val mat = Stats.corrMatrix(rows.repartition(9), Seq("a", "b", "c"))
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(mat.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((x, y), (n, corr)) <- mat) {
      val single = Stats.corrExact(rows, Seq("g"), x, y)
        .select("n", "corr").as[(Long, Double)].head()
      assert(n === single._1)
      assert(corr === single._2, s"pair ($x,$y)")
    }
    // strong positive dependence a->b shows up; a vs pseudo-random c is weak
    assert(mat(("a", "b"))._2 > 0.9)
    assert(math.abs(mat(("a", "c"))._2) < 0.2)
  }

  test("aucExact: tie-aware hand example, perfect and inverted separation") {
    // pos scores {3,2}, neg {1,2}: 3 concordant pairs + 1 tie
    // -> concordant2 = 7, auc = 7/8
    val d = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("score", "y")
    val r = Stats.aucExact(d, "score", "y")
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((2L, 2L, 7L, 0.875)))
    // perfect separation -> exactly 1; inverted labels -> exactly 0
    val sep = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("score", "y")
    assert(Stats.aucExact(sep, "score", "y")
      .select("auc").as[Double].head() === 1.0)
    val inv = sep.withColumn("y",
      !org.apache.spark.sql.functions.col("y"))
    assert(Stats.aucExact(inv, "score", "y")
      .select("auc").as[Double].head() === 0.0)
    // partition invariance (histogram collapse is the corpus boundary)
    val big = (1L to 3000L).map(i => ((i * 31) % 97, (i * 7919) % 3 == 0))
      .toDF("score", "y")
    val x1 = Stats.aucExact(big.repartition(1), "score", "y")
      .as[(Long, Long, Long, Double)].head()
    val x17 = Stats.aucExact(big.repartition(17), "score", "y")
      .as[(Long, Long, Long, Double)].head()
    assert(x1 === x17)
  }

  test("rateShrinkage pulls small samples to the global rate, leaves big ones") {
    // global: 50/100 = 0.5; key small: 2/2 raw 1.0; key big: 48/98
    val rows = Seq.fill(2)(("small", true)) ++
      Seq.fill(48)(("big", true)) ++ Seq.fill(50)(("big", false))
    val r = Stats.rateShrinkage(rows.toDF("k", "hit"), Seq("k"), "hit",
        priorStrength = 20L)
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // small: (2*100 + 20*50) / (100*(2+20)) = 1200/2200 = 6/11
    assert(r("small") === (("small", 2L, 2L, 1200.0 / 2200.0)))
    // big: (48*100 + 20*50)/(100*118) = 5800/11800
    assert(r("big") === (("big", 98L, 48L, 5800.0 / 11800.0)))
    // m = 0 degenerates to the raw rate
    val raw = Stats.rateShrinkage(rows.toDF("k", "hit"), Seq("k"), "hit", 0L)
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t._4).toMap
    assert(raw("small") === 1.0)
  }

  test("quantileNormalize: identical-marginal mapping, monotone, identity on pooled") {
    // two groups measuring the same latent ranks with different stretch:
    // a = {10, 20, 30}, b = {100, 200, 300} -> pooled sorted
    // {10,20,30,100,200,300}; midranks map a/b's 1st/2nd/3rd values to
    // the pooled values at quantiles 1/6, 3/6, 5/6
    val d = Seq(("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 100L), ("b", 200L), ("b", 300L)).toDF("g", "v")
    val m = Stats.quantileNormalize(d, "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    // block midpoint: pos2 of the k-th of 3 = 2k-1 of 6; target =
    // smallest pooled t with 6*cum >= pos2*6 -> cum>=1,3,5 -> 10,30,200
    assert(m(("a", 10L)) === 10L && m(("b", 100L)) === 10L)
    assert(m(("a", 20L)) === 30L && m(("b", 200L)) === 30L)
    assert(m(("a", 30L)) === 200L && m(("b", 300L)) === 200L)
    // monotone within each group
    val byG = Stats.quantileNormalize(d, "g", "v")
      .as[(String, Long, Long, Long)].collect().groupBy(_._1)
    for ((_, rows) <- byG) {
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted === sorted.sorted)
    }
    // a single group IS the pool: midrank of each distinct value lands
    // back on itself when counts are symmetric
    val solo = Seq(("x", 1L), ("x", 2L), ("x", 3L)).toDF("g", "v")
    val sm = Stats.quantileNormalize(solo, "g", "v")
      .as[(String, Long, Long, Long)].collect().map(t => t._2 -> t._4).toMap
    assert(sm === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // partition invariance
    val again = Stats.quantileNormalize(d.repartition(7), "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    assert(again === m)
  }

  test("giniExact: textbook values without any global sort") {
    // perfectly even distribution -> gini exactly 0
    val even = Seq(5L, 5L, 5L, 5L).toDF("v")
    assert(Stats.giniExact(even, "v").select("gini").as[Double].head() === 0.0)
    // all mass on one unit of n: G = (n-1)/n
    val one = (Seq(10L) ++ Seq.fill(9)(0L)).toDF("v")
    assert(Stats.giniExact(one, "v").select("gini").as[Double].head() === 0.9)
    // hand example {1,2,3,4}: sorted ranks sum 2*(1+4+9+16)=60,
    // G = (60 - 5*10)/(4*10) = 0.25
    val h = Seq(1L, 2L, 3L, 4L).toDF("v")
    val r = Stats.giniExact(h, "v").as[(Long, Long, Double)].head()
    assert(r === ((4L, 10L, 0.25)))
    // ties handled by the rank-block identity: {1,1,4} ->
    // 2*(1*1+1*2+4*3) = 30; G = (30 - 4*6)/(3*6) = 1/3
    val t = Seq(1L, 1L, 4L).toDF("v")
    assert(Stats.giniExact(t, "v").select("gini").as[Double].head() === 1.0 / 3.0)
    // partition invariance
    val big = (1L to 2000L).map(i => (i * 7919) % 50).toDF("v")
    val a = Stats.giniExact(big.repartition(1), "v").as[(Long, Long, Double)].head()
    val b = Stats.giniExact(big.repartition(13), "v").as[(Long, Long, Double)].head()
    assert(a === b)
  }

  test("ksTwoSample: hand-computed D, identical distributions give 0, shift detected") {
    // sample 1: {1,2}; sample 2: {2,3}. CDF gaps (scaled by n1*n2=4):
    // v=1: |1*2-0*2|=2; v=2: |2*2-1*2|=2; v=3: 0 -> D=2/4=0.5 at v=1
    val d = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "g")
    val r = Stats.ksTwoSample(d, "v", "g")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r === ((2L, 2L, 1L, 2L, 0.5)))
    // identical samples -> D exactly 0
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "g")
    assert(Stats.ksTwoSample(same, "v", "g")
      .select("d").as[Double].head() === 0.0)
    // a pure location shift is fully detected: disjoint supports -> D = 1
    val shift = ((1L to 50L).map(v => (v, true)) ++
      (101L to 150L).map(v => (v, false))).toDF("v", "g")
    assert(Stats.ksTwoSample(shift, "v", "g")
      .select("d").as[Double].head() === 1.0)
  }

  test("cuped: expectation preserved, variance-explaining covariate nulls out") {
    // y = 2x exactly -> theta = 2, adjusted means all collapse to the
    // GLOBAL mean of y (the covariate explains everything)
    val perfect = Seq(("a", 1L, 2L), ("a", 3L, 6L), ("b", 2L, 4L), ("b", 4L, 8L))
      .toDF("cohort", "x", "y")
    val r = Stats.cuped(perfect, "cohort", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("a")._5 === 2.0) // theta = slope
    assert(r("a")._4 === 5.0) // global mean y = 20/4
    assert(r("b")._4 === 5.0)
    // x uncorrelated with y (x constant) -> theta undefined guard not
    // needed here; use x with zero covariance instead: theta = 0 and
    // adjusted = raw means
    val zero = Seq(("a", 1L, 7L), ("a", 3L, 7L), ("b", 1L, 9L), ("b", 3L, 9L))
      .toDF("cohort", "x", "y")
    val rz = Stats.cuped(zero, "cohort", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(rz("a")._5 === 0.0)
    assert(rz("a")._3 === rz("a")._4)
    assert(rz("b")._3 === 9.0 && rz("b")._4 === 9.0)
    // partition invariance
    val again = Stats.cuped(perfect.repartition(5), "cohort", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(again === r)
  }

  test("twoProportionZ: textbook value, zero on identical cohorts, sign") {
    // cohort a: 40/100, cohort b: 30/100 -> pooled 0.35
    // z = 0.1 / sqrt(0.35*0.65*(0.02)) = 0.1/sqrt(0.004550)
    val rows = (Seq.fill(40)(("a", true)) ++ Seq.fill(60)(("a", false)) ++
      Seq.fill(30)(("b", true)) ++ Seq.fill(70)(("b", false)))
    val r = Stats.twoProportionZ(rows.toDF("c", "hit"), "c", "hit")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 === 100L && r._2 === 40L && r._3 === 100L && r._4 === 30L)
    val expected = (0.4 - 0.3) /
      math.sqrt(0.35 * (1.0 - 0.35) * (1.0 / 100 + 1.0 / 100))
    assert(r._5 === expected)
    // identical cohorts -> z exactly 0; swapped rates flip the sign
    val same = Seq(("a", true), ("a", false), ("b", true), ("b", false))
    assert(Stats.twoProportionZ(same.toDF("c", "hit"), "c", "hit")
      .select("z").as[Double].head() === 0.0)
    val flipped = rows.map { case (c, h) => (if (c == "a") "b" else "a", h) }
    assert(Stats.twoProportionZ(flipped.toDF("c", "hit"), "c", "hit")
      .select("z").as[Double].head() === -r._5)
  }

  test("bootstrapCi brackets the point estimate and is partition-invariant") {
    val d = (1L to 2000L).map(i => (i, (i % 97) * 3 + 10)).toDF("id", "v")
    val r = Stats.bootstrapCi(d, "id", "v")
      .as[(Double, Double, Double, Int)].head()
    val (point, lo, hi, b) = r
    assert(b === 50)
    assert(lo < hi, s"degenerate interval: $r")
    assert(lo <= point && point <= hi,
      s"point estimate outside its own CI: $r")
    // a 63% subsample of 2000 near-uniform values cannot move the mean
    // far: the band must be tight relative to the value range (~300)
    assert(hi - lo < 30, s"implausibly wide CI: $r")
    val again = Stats.bootstrapCi(d.repartition(7), "id", "v")
      .as[(Double, Double, Double, Int)].head()
    assert(again === r, "hash-seeded resampling must be reproducible")
  }

  test("mannWhitneyU: hand examples, tie handling, partition invariance") {
    // A = {1,2}, B = {3,4}: U1 = 0 (total dominance by B),
    // z = -4 / (2·√(240/144)) — the exact double expression
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("v", "g")
    val r = Stats.mannWhitneyU(d, "v", "g", "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert((r._1, r._2, r._3) === ((2L, 2L, 0L)))
    assert(r._4 === -4.0 / (2.0 * math.sqrt(240.0 / 144.0)))
    // mirrored cohorts: U1 = n1·n2 (max), z flips sign exactly
    val m = Stats.mannWhitneyU(d, "v", "g", "b", "a")
      .as[(Long, Long, Long, Double)].head()
    assert(m._3 === 8L && m._4 === -r._4)
    // A = {1,2}, B = {2,3}: average rank of the tied 2s is 2.5,
    // R1 = 3.5 -> 2·U1 = 2·3.5 - n1(n1+1) = 1
    val t = Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")).toDF("v", "g")
    assert(Stats.mannWhitneyU(t, "v", "g", "a", "b")
      .select("u1_x2").as[Long].head() === 1L)
    // histogram collapse is the corpus boundary: partition-invariant
    val big = (1L to 4000L).map(i =>
      ((i * 31) % 50, if ((i * 7919) % 3 == 0) "a" else "b")).toDF("v", "g")
    val x1 = Stats.mannWhitneyU(big.repartition(1), "v", "g", "a", "b")
      .as[(Long, Long, Long, Double)].head()
    val x17 = Stats.mannWhitneyU(big.repartition(17), "v", "g", "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(x1 === x17)
  }

  test("kendallTauB: ±1 on monotone data, textbook tie value, invariance") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val r = Stats.kendallTauB(up, "x", "y")
      .as[(Long, Long, Long, Double)].head()
    assert((r._1, r._2, r._3) === ((3L, 3L, 0L)))
    // √a·√b ≈ √(ab) slack: deterministic but 1 ulp off exact ±1
    assert(math.abs(r._4 - 1.0) < 1e-15)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(math.abs(Stats.kendallTauB(down, "x", "y")
      .select("tau_b").as[Double].head() + 1.0) < 1e-15)
    // x=(1,1,2), y=(1,2,2): C=1, D=0, dx2=dy2=4 -> tau_b = 2/(√4·√4) = 0.5
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    assert(Stats.kendallTauB(tied, "x", "y")
      .select("tau_b").as[Double].head() === 0.5)
    val big = (1L to 3000L).map(i => ((i * 31) % 40, (i * 17) % 11))
      .toDF("x", "y")
    val x1 = Stats.kendallTauB(big.repartition(1), "x", "y")
      .as[(Long, Long, Long, Double)].head()
    val x17 = Stats.kendallTauB(big.repartition(17), "x", "y")
      .as[(Long, Long, Long, Double)].head()
    assert(x1 === x17)
  }

  test("trendTest: z² = 20 on a perfect staircase, zero on flat, sign flip") {
    // w=1: 0/10, w=2: 5/10, w=3: 10/10 -> T=300, bracket=600, z=√20
    val rows = (1 to 10).flatMap(_ => Seq((1L, false), (3L, true))) ++
      (1 to 5).flatMap(_ => Seq((2L, true), (2L, false)))
    val d = rows.toDF("w", "y")
    val r = Stats.trendTest(d, "w", "y")
      .as[(Long, Long, Long, Double)].head()
    assert((r._1, r._2, r._3) === ((30L, 15L, 300L)))
    assert(math.abs(r._4 - math.sqrt(20.0)) < 1e-12)
    // flat proportions: T = 0, z = 0
    val flat = (1 to 6).flatMap(i => Seq((i % 3 + 1L, true), (i % 3 + 1L, false)))
      .toDF("w", "y")
    assert(Stats.trendTest(flat, "w", "y")
      .select("t_stat", "z").as[(Long, Double)].head() === ((0L, 0.0)))
    // inverted outcome flips the statistic's sign exactly
    val inv = d.withColumn("y",
      !org.apache.spark.sql.functions.col("y"))
    assert(Stats.trendTest(inv, "w", "y")
      .select("t_stat").as[Long].head() === -300L)
  }
}
