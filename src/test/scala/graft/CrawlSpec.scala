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

  test("canonicalizeUrl is idempotent and structurally clean on generated URLs") {
    // a canonicalizer that isn't idempotent drifts dedup keys between a
    // first-pass and re-crawled corpus — the property that matters most
    val rnd = new scala.util.Random(42)
    val schemes = Seq("http", "https", "HTTP", "HTTPS")
    val hosts = Seq("Example.org", "a.b.C", "WWW.Site.io")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/p", "/p/Q2", "/Deep/path")
    val params = Seq("utm_source=x", "utm_campaign=abc", "id=7", "a=b",
      "fbclid=zz", "gclid=1", "keep=Y")
    val frags = Seq("", "#frag", "#x?y")
    val urls = (1 to 300).map { _ =>
      val qs = rnd.shuffle(params).take(rnd.nextInt(4))
      schemes(rnd.nextInt(4)) + "://" + hosts(rnd.nextInt(3)) +
        ports(rnd.nextInt(4)) + paths(rnd.nextInt(5)) +
        (if (qs.isEmpty) "" else "?" + qs.mkString("&")) +
        frags(rnd.nextInt(3))
    }
    val r = urls.toDF("u")
      .select(Crawl.canonicalizeUrl(col("u")).as("c1"))
      .withColumn("c2", Crawl.canonicalizeUrl(col("c1")))
      .as[(String, String)].collect()
    for ((c1, c2) <- r) {
      assert(c1 === c2, s"not idempotent: $c1 -> $c2")
      assert(!c1.contains("utm_") && !c1.contains("fbclid") && !c1.contains("gclid"),
        s"tracking survived: $c1")
      assert(!c1.contains("#"), s"fragment survived: $c1")
      assert(!c1.endsWith("?") && !c1.endsWith("&"), s"dangling separator: $c1")
      // default ports are scheme-relative: :80 is only default for http,
      // :443 only for https (https://host:80 is a real non-default port)
      assert(!(c1.startsWith("http://") &&
        (c1.contains(":80/") || c1.endsWith(":80"))), s"default port survived: $c1")
      assert(!(c1.startsWith("https://") &&
        (c1.contains(":443/") || c1.endsWith(":443"))), s"default port survived: $c1")
    }
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
