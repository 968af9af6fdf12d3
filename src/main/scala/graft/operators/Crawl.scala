package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-side URL hygiene: canonicalization before any URL-keyed dedup.
  * Every web-scale corpus pipeline dedups fetches by canonical URL first
  * (cheaper than any content hash — it prunes refetches before download);
  * the canonical form must be a pure deterministic string function so the
  * same URL always lands on the same dedup key.
  *
  * Steps (RE2-safe regexes, so Spark and any RE2 engine agree):
  *  1. lowercase the scheme and host (path/query stay case-sensitive),
  *  2. drop default ports (:80 for http, :443 for https),
  *  3. strip tracking params (utm_*, fbclid, gclid) wherever they sit in
  *     the query string, then tidy separators (?& / trailing ? &),
  *  4. drop the fragment,
  *  5. collapse a bare trailing slash on the path root.
  */
object Crawl {

  def canonicalizeUrl(url: Column): Column = {
    // 1. scheme+host lowercase: split at the first '/' after "//"
    val hostLower = concat(
      lower(regexp_extract(url, "^([^/]*//[^/]+)", 1)),
      regexp_replace(url, "^[^/]*//[^/]+", ""))
    // 2. default ports — the boundary must cover ALL of /, ?, # and end,
    //    or `https://host:443?q` keeps its port while `https://host:443`
    //    loses it and canonicalization stops being idempotent (caught by
    //    CrawlSpec's generated-URL property)
    val noPort = regexp_replace(hostLower, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    val noPort2 = regexp_replace(noPort, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    // 4. fragment first (so tracking-param tidy can't resurrect it)
    val noFrag = regexp_replace(noPort2, "#.*$", "")
    // 3. tracking params: kill "key=value" for utm_*/fbclid/gclid, then
    //    tidy leftover separators
    val noTrack = regexp_replace(noFrag, "(utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    // tidy order matters: collapse '&' runs, then a leading '?&', then
    // trailing separators ('?&&x' → '?&x' → '?x'; '?id=1&' → '?id=1')
    val tidy1 = regexp_replace(noTrack, "&&+", "&")
    val tidy2 = regexp_replace(tidy1, "\\?&+", "?")
    val tidy3 = regexp_replace(tidy2, "[?&]+$", "")
    // 5. bare root slash
    regexp_replace(tidy3, "^([^/]*//[^/?#]+)/$", "$1")
  }
}
