package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Branch pins for the graft.functions.Html extraction algebra — each
  * test nails one documented contract the t47 hash gate alone would
  * only catch in aggregate (and, for the truncation/nesting/entity
  * branches, the exact failure a wrong regex would introduce).
  */
class HtmlSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def ex(html: String): (Long, Long, String, Long) = {
    val r = Seq(html).toDF("h")
      .select(graft.functions.Html.extract(col("h")).as("r"))
      .select("r.n_blocks", "r.n_boiler", "r.text", "r.n_chars")
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
  }

  test("step order: script/style subtrees drop whole BEFORE tag stripping") {
    // stripping tags first would leak `var a = 1 < 2;` and `.x > .y`
    // into the text (the `<`/`>` in the bodies break naive tag regexes)
    val (_, _, txt, _) =
      ex("""<p>keep</p><script type="a">var a = 1 < 2;</script><style>.x > .y { k: v }</style>""")
    assert(txt === "keep", s"script/style bodies must not leak: '$txt'")
  }

  test("non-greedy span removal: content between two script blocks survives") {
    val (_, _, txt, _) =
      ex("<script>a()</script><p>mid</p><script>b()</script>")
    assert(txt === "mid", s"greedy .* would swallow the middle block: '$txt'")
  }

  test("truncation: an unterminated trailing tag survives as visible text") {
    // a truncated crawl payload ends mid-attribute; the fragment has no
    // closing `>` so the tag-strip regex cannot match — degrade, don't die
    val (nb, _, txt, _) = ex("""<p>body</p><div>tail <span data-q="""")
    assert(nb === 2L)
    assert(txt === "body\ntail <span data-q=\"",
      s"the tagless fragment must survive as text: '$txt'")
  }

  test("entity decode is single-pass: each & consumed once, so &amp;lt; yields literal &lt;") {
    val (_, _, txt, _) =
      ex("<p>&amp;lt;tag&amp;gt; &#39;q&#39; &quot;w&quot; a &amp; b</p>")
    assert(txt === "&lt;tag&gt; 'q' \"w\" a & b",
      s"a multi-pass decoder would doubly decode &amp;lt; to '<': '$txt'")
    // the numeric spelling of the same pin: &#38; is '&', and the pass
    // must NOT re-scan its own output
    val (_, _, txt2, _) = ex("<p>&#38;lt;x&#38;gt; and &#38;#60; twice</p>")
    assert(txt2 === "&lt;x&gt; and &#60; twice",
      s"numeric-amp must not re-decode its tail: '$txt2'")
  }

  test("numeric references: decimal, hex, uppercase-X decode; invalid stay literal") {
    val (_, _, txt, _) = ex(
      "<p>d&#233;j&#xE0; vu &#XE9; ok; bad: &#0; &#55296; &#xD800; &#999999; &nope;</p>")
    assert(txt === "déjà vu é ok; bad: &#0; &#55296; &#xD800; &#999999; &nope;",
      s"BMP non-surrogate decode + degrade-don't-die literals: '$txt'")
  }

  test("nbsp: named, numeric, and RAW U+00A0 all normalize to plain space") {
    val (_, _, txt, _) = ex("<p>a&nbsp;b &#160; c &#xA0; d   e</p>")
    assert(txt === "a b c d e", s"NBSP must collapse to single spaces: '$txt'")
  }

  test("comments drop whole: markup and a bare > inside must not leak the tail") {
    // pre-r15 the tag-strip regex ate `<!-- note <div` up to the first
    // `>` and the remainder `tail -->` leaked as visible text
    val (_, _, txt, _) = ex("<p>keep</p><!-- note <div class=\"x\"> tail -->")
    assert(txt === "keep", s"comment tail leaked: '$txt'")
  }

  test("conditional comments drop whole, including block elements inside") {
    val (nb, _, txt, _) =
      ex("<p>keep</p><!--[if lt IE 9]><p>Upgrade &#38;lt; IE</p><![endif]-->")
    assert(nb === 1L && txt === "keep",
      s"conditional-comment body must not become blocks/text: ($nb, '$txt')")
  }

  test("a lone <!-- inside a script must not eat past the script's end") {
    // the legacy JS-hiding idiom: script bodies may open a comment they
    // never close — script removal runs FIRST, so the comment pass
    // never sees it (order pin)
    val (_, _, txt, _) =
      ex("<script>//<!-- hide()</script><p>keep</p><!-- real --><p>two</p>")
    assert(txt === "keep\ntwo", s"comment-in-script order broke: '$txt'")
  }

  test("CDATA sections drop whole, raw angle brackets and ampersands included") {
    val (_, _, txt, _) = ex("<p>keep</p><![CDATA[raw < angle & bytes]]>")
    assert(txt === "keep", s"CDATA body leaked: '$txt'")
  }

  test("noscript/svg/template subtrees drop whole; template's <li> is no block boundary") {
    val (nb, _, txt, _) = ex(
      "<p>keep</p><noscript><p>enable js</p></noscript>" +
        "<svg viewBox=\"0 0 8 8\"><path d=\"M0 0L8 8\"/><text>plot</text></svg>" +
        "<template><li>stamp row</li></template>")
    assert(nb === 1L && txt === "keep",
      s"fallback/vector/stamp content must not extract: ($nb, '$txt')")
  }

  test("entities decode AFTER tag stripping: encoded angle brackets are never markup") {
    // &lt;script&gt; is TEXT; decoding before the strip would turn it
    // into a live tag and delete the sentence
    val (_, _, txt, _) = ex("<p>use &lt;script&gt; tags wisely</p>")
    assert(txt === "use <script> tags wisely", s"'$txt'")
  }

  test("nested-markup anchors count zero link text; plain anchors count") {
    // anchor wrapping <b> has no [^<]* body -> al = 0 -> block kept even
    // though most of its words sit inside the anchor
    val (nb1, nboil1, txt1, _) =
      ex("""<p>go <a href="x">the <b>deep</b> archive link</a> now</p>""")
    assert((nb1, nboil1) === ((1L, 0L)) && txt1 === "go the deep archive link now")
    // the same block with a PLAIN anchor is link-dense and drops
    val (nb2, nboil2, txt2, _) =
      ex("""<p>go <a href="x">the deep archive link</a> now</p>""")
    assert((nb2, nboil2) === ((1L, 1L)) && txt2 === "",
      s"plain-anchor block must drop as boilerplate: '$txt2'")
  }

  test("link-density boundary is integer-exact: 2*anchor == len keeps, +1 drops") {
    val (_, b1, t1, _) = ex("""<li><a href="/">abc</a>def</li>""") // 2*3 <= 6
    assert(b1 === 0L && t1 === "abcdef", s"boundary block must be KEPT: '$t1'")
    val (_, b2, t2, _) = ex("""<li><a href="/">abcd</a>def</li>""") // 2*4 > 7
    assert(b2 === 1L && t2 === "", s"past-boundary block must DROP: '$t2'")
  }

  test("block segmentation: inline tags do not break flow, block tags do") {
    val (nb, _, txt, nch) =
      ex("<div>one <b>bold</b> flow</div><p>two</p><span>three</span>")
    // span is inline: 'three' joins the block opened by </p>'s newline
    assert(nb === 3L && txt === "one bold flow\ntwo\nthree", s"'$txt'")
    assert(nch === txt.length.toLong)
  }

  test("whitespace: space/tab/CR runs collapse, counts come from cleaned text") {
    val (nb, nboil, txt, _) = ex("<p>a \t b\r\rc</p><p>   </p>")
    // the all-whitespace block cleans to empty and is not counted
    assert((nb, nboil) === ((1L, 0L)) && txt === "a b c", s"'$txt'")
  }

  test("t48 funnel: chrome-invariant dedup collapses same-content pages, budget cuts") {
    import org.apache.spark.sql.functions.length
    val dir = java.nio.file.Files.createTempDirectory("graft_t48").toString
    // the same body text behind three DIFFERENT doc_ids: the full
    // extracted texts differ (title/h1 carry the id) but the content
    // key (kept blocks 3+) is identical -> they must dedup to one.
    // Body is >= 300 chars of 'the'-marked English so the quality gate
    // passes and the route lands on 'en'; doc 9's body is unique.
    val body = ("the quick brown fox jumps over the lazy dog and the " * 7).trim
    val other = ("a slow green turtle walks under the busy bridge today " * 7).trim
    Seq((1L, body), (2L, body), (3L, body), (9L, other))
      .map { case (i, t) => (i, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t48_crawl_funnel")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    // 4 routed to en, 2 survive dedup (1 of the triplicate + doc 9),
    // the 40% token budget keeps exactly the larger one
    val (nRouted, nDedup, nKept) = out("en")
    assert(nRouted === 4L, s"all four pages route to en: $out")
    assert(nDedup === 2L,
      s"chrome-invariant dedup must collapse the id-differing triplicate: $out")
    assert(nKept === 1L, s"the 40% budget keeps one of two equal-ish docs: $out")
    graft.queries.Caches.release(spark, dir)
  }

  test("e30 crawl classify: chrome-differing pages dedup on content; near and novel hold") {
    import org.apache.spark.sql.functions.{length, md5}
    val dir = java.nio.file.Files.createTempDirectory("graft_e30").toString
    // distinct words, so the shingle set is large and one changed word
    // perturbs only ~3 of ~48 shingles (content J ≈ 0.88 ≥ 0.8)
    val body = (1 to 50).map(i => s"word$i").mkString(" ")
    val near = body.replace("word25", "changed25")
    val other = (1 to 50).map(i => s"other$i").mkString(" ")
    // corpus: 1 (the article), 2 (unrelated); batch: 10 = SAME body
    // behind DIFFERENT page bytes (ids sit in title/h1/nav), 20 = near
    // variant, 30 = novel
    Seq((1L, body), (2L, other), (10L, body), (20L, near), (30L, "x " * 40))
      .map { case (i, t) => (i, t.trim, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // sanity: the PAGE BYTES of docs 1 and 10 differ (byte-level dedup
    // would see nothing), yet e30 classifies 10 as an exact dup of 1
    val pages = Seq(1L, 10L).toDF("doc_id")
      .select(md5(graft.queries.TextQueries.htmlDoc(col("doc_id"), lit(body))))
      .collect().map(_.getString(0)).toSet
    assert(pages.size === 2, "fixture broken: page bytes must differ")
    val out = SparkEntry.queries("e30_crawl_classify")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(out(10L) === (("exact", Some(1L))),
      s"chrome-differing same-content page must classify exact: ${out(10L)}")
    assert(out(20L)._1 === "near" && out(20L)._2 === Some(1L),
      s"one-word variant must classify near against the article: ${out(20L)}")
    assert(out(30L) === (("novel", None)), s"${out(30L)}")
    graft.queries.Caches.release(spark, dir)
  }

  test("extraction lands once (WET artifact): consumers serve the same files, no re-extraction in-plan") {
    import org.apache.spark.sql.functions.length
    val dir = java.nio.file.Files.createTempDirectory("graft_wet").toString
    val body = ("the quick brown fox jumps over the lazy dog and the " * 7).trim
    Seq((1L, body), (2L, body), (30L, body + " extra tail words here"))
      .map { case (i, t) => (i, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // build once, memo returns the same path; the landed files are
    // byte-untouched across every downstream consumer
    val p1 = graft.queries.TextQueries.extractionLandingPathFor(spark, dir)
    val files0 = Option(new java.io.File(p1).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(files0.nonEmpty, "landing must materialize parquet files")
    SparkEntry.queries("t48_crawl_funnel")(spark, dir).collect()
    SparkEntry.queries("e30_crawl_classify")(spark, dir).collect()
    SparkEntry.queries("t47_html_extract")(spark, dir).collect()
    val p2 = graft.queries.TextQueries.extractionLandingPathFor(spark, dir)
    assert(p2 === p1, "every consumer must serve the SAME landing")
    val files1 = Option(new java.io.File(p1).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(files1 === files0, "consumers must not rewrite the landed extraction")
    // and no consumer re-extracts in-plan: the markup algebra's
    // signature patterns must be absent from the serving plans
    Seq("t47_html_extract", "t48_crawl_funnel", "e30_crawl_classify").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.toString
      assert(!plan.contains("</script>"),
        s"$q must serve from the landing, not re-run extraction in-plan")
    }
    graft.queries.Caches.release(spark, dir)
    assert(!new java.io.File(p1).exists(), "release must reclaim the landing")
  }

  test("t47 gate shape: the constructed fixture hits every planted branch") {
    val docs = Seq((7L, "seven word doc about spark engines"),
      (8L, "eight word doc")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), graft.functions.Html.extract(
        graft.queries.TextQueries.htmlDoc(col("doc_id"), col("text"))).as("r"))
      .select(col("doc_id"), col("r.n_blocks"), col("r.n_boiler"), col("r.text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 7 (doc_id % 7 == 0): truncated tail block survives as text
    val (nb7, nboil7, t7) = out(7L)
    assert((nb7, nboil7) === ((9L, 3L)), s"doc 7: ($nb7, $nboil7)")
    assert(t7.endsWith("archived copy <span data-q=\""), s"truncated branch lost: '$t7'")
    assert(t7.contains("Report 'D7' is &lt;curated&gt;"), s"entity order broke: '$t7'")
    assert(t7.contains("seven word doc about spark engines"))
    assert(t7.contains("See the full archive and the FAQ for details."))
    assert(t7.contains("Grade: élite tier é marked &lt;keep&gt; not &#xD800; nor &#0; here."),
      s"entity paragraph mis-decoded: '$t7'")
    assert(!t7.contains("Home") && !t7.contains("About & contact"),
      s"nav boilerplate leaked: '$t7'")
    assert(!t7.contains("track(") && !t7.contains("margin"), s"script/style leaked: '$t7'")
    assert(!t7.contains("build 2026") && !t7.contains("miss"),
      s"comment tail leaked: '$t7'")
    assert(!t7.contains("Please upgrade"), s"conditional comment leaked: '$t7'")
    assert(!t7.contains("raw < angle"), s"CDATA leaked: '$t7'")
    assert(!t7.contains("Enable scripts") && !t7.contains("plot") &&
      !t7.contains("stamp"), s"noscript/svg/template leaked: '$t7'")
    // doc 8: well-formed tail, same structure minus the truncated block
    val (nb8, nboil8, t8) = out(8L)
    assert((nb8, nboil8) === ((8L, 3L)) && t8.endsWith("for details."),
      s"doc 8: ($nb8, $nboil8, '$t8')")
  }

  test("extraction lifecycle: append leaves base untouched, forget erases the carve, compact == lambda serve") {
    import org.apache.spark.sql.functions.length
    val dir = java.nio.file.Files.createTempDirectory("graft_wetlc").toString
    val body = ("some repeated words for the extraction fixture body " * 6).trim
    // ids cover every lifecycle slice: base {1,8,15,50}, delta (%10==3)
    // {3,13,23,43}, deleted (e24's carve: %10!=0 && %7==1) {1,8,15,43}
    // — incl. the delta∩deleted overlap (43) and a %7==1 id the carve
    // spares because %10==0 (50)
    val ids = Seq(1L, 3L, 8L, 13L, 15L, 23L, 43L, 50L)
    ids.map(i => (i, s"doc $i " + body, "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val (basePath, deltaPath) = graft.queries.TextQueries.e31LandingFor(spark, dir)
    def mtimes(p: String) = Option(new java.io.File(p).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val base0 = mtimes(basePath)
    assert(base0.nonEmpty && mtimes(deltaPath).nonEmpty,
      "both lifecycle landings must materialize")
    // the landings carve exactly at the wave boundary
    assert(spark.read.parquet(basePath).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 8L, 15L, 50L))
    assert(spark.read.parquet(deltaPath).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(3L, 13L, 23L, 43L))
    // append serves the whole corpus, each doc once
    val e31 = SparkEntry.queries("e31_extract_append")(spark, dir).collect()
    assert(e31.map(_.getLong(0)).toSeq === ids, s"${e31.map(_.getLong(0)).toSeq}")
    // forget erases exactly the deletion carve
    val e32 = SparkEntry.queries("e32_extract_forget")(spark, dir).collect()
    assert(e32.map(_.getLong(0)).toSeq === Seq(3L, 13L, 23L, 50L),
      s"${e32.map(_.getLong(0)).toSeq}")
    // compact serves the identical rows from ONE table (row-for-row)
    val e33 = SparkEntry.queries("e33_extract_compact")(spark, dir).collect()
    assert(e33.toSeq === e32.toSeq, "compacted serve must equal the lambda serve")
    // the append/compact legs never touched the landed base files
    assert(mtimes(basePath) === base0, "lifecycle legs must not rewrite the base")
    // and no leg re-extracts in-plan: serving is parquet reads only
    Seq("e31_extract_append", "e32_extract_forget", "e33_extract_compact").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan.toString
      assert(!plan.contains("</script>"),
        s"$q must serve from landed files, not re-run the markup algebra")
    }
    val compactPath = graft.queries.TextQueries.e33CompactFor(spark, dir)
    graft.queries.Caches.release(spark, dir)
    Seq(basePath, deltaPath, compactPath).foreach(p =>
      assert(!new java.io.File(p).exists(), s"release must reclaim $p"))
  }
}
