package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.TextHashUtil

/** SQL function surface: every custom expression callable by name from SQL
  * after GraftFunctions.registerAll, and injectable via the
  * `spark.sql.extensions=graft.GraftExtensions` route.
  */
class ExtensionsSpec extends SparkSpec {

  test("registerAll exposes the expressions as SQL functions") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT simhash64('the quick brown fox') AS sh,
        |  word_shingles('a b c d', 3) AS ws,
        |  char_ngrams('abcd', 3) AS ng,
        |  array_jaccard(array('a','b'), array('b','c')) AS j,
        |  minhash_sig('a b c d', 3, 4) AS mh,
        |  dot_fold(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  ngram_dup_frac(split('a b a b a b', ' '), 2) AS df
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) ===
      TextHashUtil.simhash64(org.apache.spark.unsafe.types.UTF8String
        .fromString("the quick brown fox")))
    assert(r.getSeq[String](1) === Seq("a b c", "b c d"))
    assert(r.getSeq[String](2) === Seq("abc", "bcd"))
    assert(r.getDouble(3) === 1.0 / 3.0)
    assert(r.getSeq[Long](4).length === 4)
    assert(r.getDouble(5) === 11.0)
    // bigrams of "a b a b a b": [a b, b a, a b, b a, a b] -> 3 duplicate
    // occurrences of 5 grams
    assert(r.getDouble(6) === 3.0 / 5.0)
  }

  test("GraftExtensions injects the same function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; same builders list
    assert(GraftFunctions.builders.map(_._1).toSet ===
      Set("dot_fold", "word_shingles", "minhash_sig", "simhash64",
        "char_ngrams", "array_jaccard", "ngram_dup_frac", "token_moments"))
  }
}
