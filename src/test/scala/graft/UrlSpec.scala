package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL parse algebra (w1/w2/w3): hand-computed component pins over
  * every hostile shape the fixture plants, independent of the fixture
  * construction — plus the domain-filter verdict logic. */
class UrlSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def parse(url: String): (String, String, String, Long, String, String, String) = {
    val r = graft.functions.Url.withParsed(Seq(url).toDF("url"))
      .select("scheme", "userinfo", "host", "port", "reg_domain",
        "path", "query")
      .collect().head
    (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
      r.getString(4), r.getString(5), r.getString(6))
  }

  test("hostile URL shapes parse to the expected components") {
    // (url, scheme, userinfo, host, port, reg_domain, path, query)
    val cases = Seq(
      ("site-3.com/p/42", "", "", "site-3.com", 0L, "site-3.com", "/p/42", ""),
      ("https://shop.site-1.co.uk:8443/cart?item=9", "https", "",
        "shop.site-1.co.uk", 8443L, "site-1.co.uk", "/cart", "item=9"),
      ("http://u7:pw@site-2.com/account", "http", "u7:pw",
        "site-2.com", 0L, "site-2.com", "/account", ""),
      ("https://xn--ste-5-kva.de/page/5", "https", "",
        "xn--ste-5-kva.de", 0L, "xn--ste-5-kva.de", "/page/5", ""),
      ("HTTPS://WWW.Site-4.COM./Index/4", "https", "",
        "www.site-4.com", 0L, "site-4.com", "/Index/4", ""),
      ("https://site-5.com/search?q=a5&lang=en#r5", "https", "",
        "site-5.com", 0L, "site-5.com", "/search", "q=a5&lang=en"),
      ("https://a.b.news.site-6.org/6", "https", "",
        "a.b.news.site-6.org", 0L, "site-6.org", "/6", ""),
      ("http://blog.site-7.org", "http", "",
        "blog.site-7.org", 0L, "site-7.org", "", ""),
      ("http://10.0.8.19/admin", "http", "",
        "10.0.8.19", 0L, "10.0.8.19", "/admin", ""),
      ("http://news.site-9.co.uk/story/9", "http", "",
        "news.site-9.co.uk", 0L, "site-9.co.uk", "/story/9", ""),
      ("https://hub.crawl-hub.com/t/src0/10", "https", "",
        "hub.crawl-hub.com", 0L, "crawl-hub.com", "/t/src0/10", ""),
      // a '?' inside the fragment is NOT a query (the anchored twin pin)
      ("https://x.com/p#frag?notquery", "https", "", "x.com", 0L, "x.com",
        "/p", ""),
      // single-label host: its own registrable domain
      ("http://localhost:8080/x", "http", "", "localhost", 8080L,
        "localhost", "/x", ""),
      // EMPTY userinfo before '@' (a real crawl shape): the strip is
      // gated on the authority containing '@', so host must not carry
      // a leading '@' that would dodge blocklist/cap matching
      ("http://@site-3.com/x", "http", "", "site-3.com", 0L,
        "site-3.com", "/x", ""))
    cases.foreach { case (u, sc, ui, h, pt, rd, pa, q) =>
      assert(parse(u) === ((sc, ui, h, pt, rd, pa, q)), s"url: $u")
    }
  }

  test("canonUrl collapses credentials, casing, scheme default, and fragments to one key") {
    val urls = Seq(
      "http://u1:pw@site-2.com/account",
      "http://u99:pw@site-2.com/account", // different credentials, same page
      "blog.site-7.org", // schemeless frontier entry, empty path
      "http://blog.site-7.org",
      "HTTP://BLOG.Site-7.ORG.", // casing + DNS root dot
      "https://x.com/p#frag1", "https://x.com/p#frag2") // fragments
    val keys = graft.functions.Url.withParsed(urls.toDF("url"))
      .select(graft.functions.Url.canonUrl.as("k"))
      .collect().map(_.getString(0))
    assert(keys(0) === "http://site-2.com/account" && keys(1) === keys(0))
    assert(keys(2) === "http://blog.site-7.org/" &&
      keys(3) === keys(2) && keys(4) === keys(2))
    assert(keys(5) === "https://x.com/p" && keys(6) === keys(5))
    // a port and a query stay part of resource identity
    assert(graft.functions.Url.withParsed(
        Seq("https://h.com:8443/a?b=1").toDF("url"))
      .select(graft.functions.Url.canonUrl).collect().head.getString(0)
      === "https://h.com:8443/a?b=1")
  }

  test("urlOf takes the sign-of-dividend arm on negative doc_ids (DuckDB % parity)") {
    // the twin's CASE uses plain '%' (sign of dividend): -3 % 11 = -3
    // matches no WHEN and falls to the ELSE hub shape with the signed
    // id embedded — the Spark side must construct the identical bytes
    val out = Seq((-3L, "src1")).toDF("doc_id", "source")
      .select(graft.functions.Url.urlOf(col("doc_id"), col("source")).as("url"))
      .collect().head.getString(0)
    assert(out === "https://hub.crawl-hub.com/t/src1/-3")
  }

  test("w3 blocklist + per-domain cap verdicts are exhaustive and precedence-ordered") {
    val dir = SparkTestBase.sfDir
    val out = SparkEntry.queries("w3_domain_filter")(spark, dir).collect()
    assert(out.nonEmpty)
    val verdicts = out.map(_.getString(3)).toSet
    assert(verdicts.subsetOf(Set("blocked", "over_cap", "kept")))
    // every blocked row names a blocklisted domain, regardless of rank
    out.filter(_.getString(3) == "blocked").foreach { r =>
      assert(graft.queries.WebQueries.BlockedDomains.contains(r.getString(1))) }
    // no kept row exceeds the cap
    out.filter(_.getString(3) == "kept").foreach { r =>
      assert(r.getLong(2) <= graft.queries.WebQueries.DomainCapDocs) }
    assert(verdicts.contains("blocked"), "fixture must exercise the blocklist")
    graft.queries.Caches.release(spark, dir)
  }

  test("w2 rollup: domains repeat with real mass and dup counts stay within doc counts") {
    val dir = SparkTestBase.sfDir
    val out = SparkEntry.queries("w2_domain_rollup")(spark, dir).collect()
    assert(out.length > 5, "rollup must see many registrable domains")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1),
        s"dup docs exceed docs for ${r.getString(0)}")
      assert(r.getLong(4) <= 10000L)
    }
    assert(out.exists(_.getLong(1) > 1), "domains must repeat across docs")
    graft.queries.Caches.release(spark, dir)
  }
}
