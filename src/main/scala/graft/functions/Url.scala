package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain modality (SURVEY extension; r15 verdict gap #1): parse,
  * canonicalize, and roll up crawl URLs — the day-one operators of
  * every production crawl curation stack (C4, RefinedWeb, Dolma all
  * filter by URL/domain before anything else).
  *
  * Everything here is pure builtin Column algebra — codegen'd,
  * RE2-safe (no backreferences, ASCII classes), and replayed
  * value-identically by the DuckDB twin in
  * [[graft.queries.WebQueries]]:
  *
  *  - scheme: `^([A-Za-z][A-Za-z0-9+.-]*)://` (RFC 3986 §3.1),
  *    lowercased; '' when the crawl frontier recorded a bare
  *    authority (schemeless URLs are routine in link extraction);
  *  - authority = prefix of the rest up to the first `/?#`; userinfo
  *    splits at the FIRST `@` (an unencoded `@` cannot appear in
  *    userinfo per the RFC, so the first one ends it); port is the
  *    trailing `:digits`, reported 0 when absent;
  *  - host canonicalization: lowercase + strip one trailing dot (the
  *    DNS root-label form `example.com.` resolves identically);
  *  - registrable domain: last two labels, or last THREE when the
  *    last two are a multi-label public suffix from the committed
  *    [[MultiLabelSuffixes]] table (a deterministic PSL subset — at
  *    production scale the full public-suffix list lands as a
  *    broadcastable table and the CASE becomes a join, same algebra);
  *    IPv4 hosts are their own registrable domain (no label
  *    structure to roll up).
  */
object Url {

  /** Committed multi-label public suffixes — the PSL rows the fixture
    * exercises. Order-insensitive membership set. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au", "co.jp", "co.in", "com.br")

  /** Deterministic crawl-URL fixture from (doc_id, source) — the
    * htmlDoc discipline applied to URLs, so the DuckDB twin replays
    * the construction byte-for-byte. Eleven hostile shapes rotate by
    * doc_id % 11 (missing scheme, port, userinfo, punycode,
    * uppercase + trailing dot, query + fragment, deep subdomain, bare
    * host, IPv4, multi-label suffix, shared hub domain), and hosts
    * repeat by doc_id % 13 so domain rollups and per-domain caps have
    * real mass. */
  def urlOf(id: Column, source: Column): Column = {
    val d = id.cast("string")
    // sign-of-dividend `%`, NOT pmod: the DuckDB twin's `%` keeps the
    // dividend's sign, so a negative doc_id must take the same arm
    // (negative remainder → no WHEN matches → the ELSE hub shape) and
    // embed the same "-k" label text in both engines
    val i13 = (id % lit(13L)).cast("string")
    val shape = id % lit(11L)
    val src = lower(regexp_replace(coalesce(source, lit("nosrc")),
      "[^A-Za-z0-9]", ""))
    when(shape === 0, concat(lit("site-"), i13, lit(".com/p/"), d))
      .when(shape === 1,
        concat(lit("https://shop.site-"), i13, lit(".co.uk:8443/cart?item="), d))
      .when(shape === 2,
        concat(lit("http://u"), d, lit(":pw@site-"), i13, lit(".com/account")))
      .when(shape === 3,
        concat(lit("https://xn--ste-"), i13, lit("-kva.de/page/"), d))
      .when(shape === 4,
        concat(lit("HTTPS://WWW.Site-"), i13, lit(".COM./Index/"), d))
      .when(shape === 5,
        concat(lit("https://site-"), i13, lit(".com/search?q=a"), d,
          lit("&lang=en#r"), d))
      .when(shape === 6, concat(lit("https://a.b.news.site-"), i13, lit(".org/"), d))
      .when(shape === 7, concat(lit("http://blog.site-"), i13, lit(".org")))
      .when(shape === 8,
        concat(lit("http://10.0."), i13, lit("."),
          (id % lit(251L)).cast("string"), lit("/admin")))
      .when(shape === 9,
        concat(lit("http://news.site-"), i13, lit(".co.uk/story/"), d))
      .otherwise(concat(lit("https://hub.crawl-hub.com/t/"), src, lit("/"), d))
  }

  /** Canonical RESOURCE URL from the parsed components (w4's recrawl
    * key): schemeless frontier entries default to http, userinfo is
    * dropped (credentials are not part of resource identity), the
    * fragment is already excluded by the parse, an empty path
    * canonicalizes to '/', the default port is omitted. Two fetches of
    * the same page — different crawl entries, credentials, fragments,
    * host casing — collapse to one key. Pure builtin algebra over a
    * [[withParsed]] frame; the SQL twin
    * ([[graft.queries.WebQueries.canonUrlSql]]) mirrors it CASE by
    * CASE, null url propagating to a null key in both engines. */
  def canonUrl: Column =
    concat(
      when(col("scheme") === "", lit("http")).otherwise(col("scheme")),
      lit("://"), col("host"),
      when(col("port") > 0, concat(lit(":"), col("port").cast("string")))
        .otherwise(lit("")),
      when(col("path") === "", lit("/")).otherwise(col("path")),
      when(col("query") === "", lit("")).otherwise(concat(lit("?"), col("query"))))

  /** Add parsed components of the `url` column to `df`:
    * scheme, userinfo, host, port, reg_domain, path, query.
    * A null url yields all-null fields (port included) — the same
    * propagation the SQL twin's CASE chains produce.
    *
    * STAGED through named projections, never one nested Column tree:
    * a single expression would re-inline each shared step (`rest`,
    * `authority`, `hostport`) at every use site, exploding the tree
    * exponentially past codegen's method limit. Catalyst's
    * CollapseProject keeps multiply-referenced non-cheap aliases
    * staged, so each step runs once per row. */
  def withParsed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val url = col("url")
    df
      .withColumn("_schemeraw",
        regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
      .withColumn("_rest", when(col("_schemeraw") === "", url)
        .otherwise(url.substr(length(col("_schemeraw")) + lit(4), length(url))))
      .withColumn("_auth", regexp_extract(col("_rest"), "^([^/?#]*)", 1))
      .withColumn("_after", col("_rest")
        .substr(length(col("_auth")) + lit(1), length(col("_rest"))))
      .withColumn("userinfo", regexp_extract(col("_auth"), "^([^@]*)@", 1))
      // strip is gated on the authority CONTAINING '@', not on userinfo
      // being non-empty: 'http://@host/x' (a real crawl shape) has an
      // EMPTY userinfo that must still be stripped, else host carries a
      // leading '@' and silently misses blocklist/cap matching
      .withColumn("_hostport", when(instr(col("_auth"), "@") > 0,
        col("_auth")
          .substr(length(col("userinfo")) + lit(2), length(col("_auth"))))
        .otherwise(col("_auth")))
      .withColumn("_portstr", regexp_extract(col("_hostport"), ":([0-9]+)$", 1))
      .withColumn("host", regexp_replace(
        lower(regexp_replace(col("_hostport"), ":[0-9]+$", "")), "\\.$", ""))
      .withColumn("port",
        when(col("_portstr") === "", lit(0L))
          .otherwise(col("_portstr").cast("long")))
      .withColumn("path", regexp_extract(col("_after"), "^([^?#]*)", 1))
      .withColumn("query", regexp_extract(col("_after"), "^[^#?]*\\?([^#]*)", 1))
      .withColumn("scheme", lower(col("_schemeraw")))
      .withColumn("_labels", split(col("host"), "\\."))
      .withColumn("_n", size(col("_labels")))
      // try_element_at: a single-label host has no [-2]; NULL here is
      // harmless (the n <= 2 arm wins) and matches DuckDB's
      // out-of-range list index
      .withColumn("_last2", concat(try_element_at(col("_labels"), lit(-2)),
        lit("."), try_element_at(col("_labels"), lit(-1))))
      .withColumn("reg_domain",
        when(col("host").rlike("^[0-9]+(\\.[0-9]+){3}$") || col("_n") <= 2,
          col("host"))
          .when(col("_last2").isin(MultiLabelSuffixes: _*) && col("_n") >= 3,
            concat(try_element_at(col("_labels"), lit(-3)), lit("."),
              col("_last2")))
          .otherwise(col("_last2")))
      .drop("_schemeraw", "_rest", "_auth", "_after", "_hostport", "_portstr",
        "_labels", "_n", "_last2")
  }
}
