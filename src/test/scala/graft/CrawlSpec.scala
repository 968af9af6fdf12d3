package graft

import graft.operators.{Crawl, Incremental}
import org.apache.spark.sql.functions._

/** URL canonicalization on hand-picked forms, and incremental aggregate
  * maintenance group lifecycle.
  */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizeUrl: case, default port, tracking params, fragment, root slash") {
    val cases = Seq(
      "HTTPS://Example.ORG:443/Path/A?utm_source=x&id=5#frag"
        -> "https://example.org/Path/A?id=5",
      "http://Host.com:80/p?id=1&utm_campaign=y&x=2"
        -> "http://host.com/p?id=1&x=2",
      "https://a.b/p?utm_a=1&utm_b=2"      // all params tracking → no query
        -> "https://a.b/p",
      "HTTP://A.B/"                        // bare root slash collapses
        -> "http://a.b",
      "https://ok.org/path/sub?keep=1"     // nothing to fix → unchanged
        -> "https://ok.org/path/sub?keep=1",
      "https://x.y:8443/p"                 // NON-default port survives
        -> "https://x.y:8443/p")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Crawl.canonicalizeUrl(col("u")).as("c"))
      .as[(String, String)].collect().toMap
    for ((raw, want) <- cases)
      assert(got(raw) === want, s"raw=$raw")
  }

  test("applyAggDelta creates, updates and retires groups") {
    val oldAgg = Seq(("a", 3L, 30L), ("b", 1L, 10L)).toDF("k", "n", "s")
    val delta = Seq(
      ("a", 2L, 15L),    // grows
      ("b", -1L, -10L),  // retires (count hits 0)
      ("c", 4L, 7L))     // created from nothing
      .toDF("k", "dn", "ds")
    val r = Incremental.applyAggDelta(oldAgg, delta, "k")
      .as[(String, Long, Long)].collect().toSet
    assert(r === Set(("a", 5L, 45L), ("c", 4L, 7L)))
  }
}
