package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Portable hash/fold primitives — cross-engine contract pinned to known
  * values (the DuckDB side computes `('0x'||substr(md5(s),1,8))::BIGINT`).
  */
class PortableSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq("x").toDF("v").select(c).collect()(0).get(0)
  }

  test("hash32 matches DuckDB md5-prefix semantics (known value)") {
    // DuckDB: SELECT ('0x' || substr(md5('hello'),1,8))::BIGINT -> 1564557354
    assert(one(Portable.hash32(lit("hello"))) === 1564557354L)
  }

  test("hash32 seeded variants differ and are deterministic") {
    val h0 = one(Portable.hash32(lit("abc"), 0))
    val h1 = one(Portable.hash32(lit("abc"), 1))
    assert(h0 !== h1)
    assert(one(Portable.hash32(lit("abc"), 0)) === h0)
  }

  test("fastHash backend: Column xxhash64 path == native hash32Fast, domain [0, 2^32)") {
    import spark.implicits._
    val samples = Seq("hello", "0#a b c", "7#", "über-doc", "", "x" * 300)
    // Column-level fast path (what Portable.hash32 emits under the flag)
    val colVals = samples.toDF("v")
      .select(xxhash64(col("v")).bitwiseAND(lit(0xFFFFFFFFL)).as("h"))
      .collect().map(_.getLong(0))
    // Native fast path (what MinHashSigExpr/SimHash64Expr use under the flag)
    val natVals = samples.map(graft.plans.TextHashUtil.hash32Fast)
    assert(colVals.toSeq === natVals)
    assert(colVals.forall(h => h >= 0L && h < 4294967296L))
  }

  test("fastHash flag routes hash32 to the xxhash64 backend (same domain)") {
    val md5Val = one(Portable.hash32(lit("hello"))).asInstanceOf[Long]
    sys.props("graft.fast.hash") = "1"
    try {
      val fastVal = one(Portable.hash32(lit("hello"))).asInstanceOf[Long]
      assert(fastVal !== md5Val)
      assert(fastVal === graft.plans.TextHashUtil.hash32Fast("hello"))
    } finally sys.props.remove("graft.fast.hash")
    assert(one(Portable.hash32(lit("hello"))) === md5Val) // back to md5
  }

  test("polyFold folds left with mod 1e9+7") {
    val expected = Seq(5L, 6L, 7L).foldLeft(0L)((a, x) => (a * 31 + x) % 1000000007L)
    assert(one(Portable.polyFold(array(lit(5L), lit(6L), lit(7L)))) === expected)
  }

  test("wordShingles: k=3 over 5 tokens yields 3 shingles; short doc empty") {
    import spark.implicits._
    val sh = Seq("a b c d e").toDF("t")
      .select(Portable.wordShingles(col("t"), 3)).collect()(0).getSeq[String](0)
    assert(sh === Seq("a b c", "b c d", "c d e"))
    val empty = Seq("a b").toDF("t")
      .select(Portable.wordShingles(col("t"), 3)).collect()(0).getSeq[String](0)
    assert(empty === Seq())
  }

  test("cosine of identical vectors is 1.0; orthogonal is 0.0") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      Portable.cosine(col("a"), col("a")).as("same"),
      Portable.cosine(col("a"), col("b")).as("orth")).collect()(0)
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 0.0)
  }
}
