package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming: windowed aggregation parity with the batch twin
  * and stateful sessionization. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming windowCounts emits closed windows equal to the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      val events = Seq(
        Event(ts(0), 1, "click", 1.0), Event(ts(10), 2, "view", 2.5),
        Event(ts(20), 1, "click", 3.0), Event(ts(70), 3, "click", 4.0))
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      input.addData(Event(ts(600), 9, "late", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .select("win_start", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStream.windowCounts((events :+ Event(ts(600), 9, "late", 0.0)).toDF())
        .collect()
        .filter(_.getAs[Timestamp]("win_start").getTime < ts(600 - 120).getTime)
        .map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize closes per-user sessions after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: three events within the gap; user 2: one event
      input.addData(
        Event(ts(0), 1, "click", 1.0), Event(ts(5), 1, "view", 2.0),
        Event(ts(20), 1, "click", 3.0), Event(ts(2), 2, "view", 10.0))
      q.processAllAvailable()
      // far-future event advances the watermark past both timeouts
      input.addData(Event(ts(300), 3, "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[EventStream.UserSession]
        .collect().map(s => s.user_id -> s).toMap
      assert(sessions.contains(1L) && sessions.contains(2L))
      assert(sessions(1L).n_events === 3 && sessions(1L).sum_value === 6.0)
      assert(sessions(1L).duration_sec === 1200.0)
      assert(sessions(2L).n_events === 1 && sessions(2L).duration_sec === 0.0)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.dedupEvents(events)
      .writeStream.format("memory").queryName("dedup_ev").outputMode("append").start()
    try {
      input.addData((1L, ts(0), "click"), (2L, ts(1), "view"),
        (1L, ts(2), "click"), (3L, ts(3), "view"), (2L, ts(4), "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup_ev").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L), s"duplicates not dropped: $ids")
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Event]
    val dim = spark.createDataFrame(Seq((1L, "gold"), (2L, "basic")))
      .toDF("uid", "tier")
    val q = EventStream.enrichEvents(input.toDF(), dim, "uid")
      .select("user_id", "event_type", "tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(Event(ts(0), 1, "click", 1.0), Event(ts(1), 2, "view", 2.0),
        Event(ts(2), 9, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), Option(r.get(2)))).toSet
      assert(rows === Set((1L, Some("gold")), (2L, Some("basic")), (9L, None)))
    } finally q.stop()
  }

  test("stream-static point-in-time enrichment ≡ the AsOfJoin batch kernel") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // SCD2 dim: key 1 has two contiguous versions split at t=10; key 2
    // starts at t=5 (facts before it must enrich to null)
    val dim = spark.createDataFrame(Seq(
      (1L, 1L, 0L, Option(10L), "A"), (1L, 2L, 10L, Option.empty[Long], "B"),
      (2L, 1L, 5L, Option.empty[Long], "C")))
      .toDF("custkey", "ver", "valid_from", "valid_to", "payload")
    val factRows = Seq((1L, 0L), (1L, 9L), (1L, 10L), (1L, 15L),
      (2L, 3L), (2L, 5L), (3L, 7L))
    val input = MemoryStream[(Long, Long)]
    val streamFacts = input.toDF().toDF("custkey", "t")
    val q = EventStream.enrichPointInTime(streamFacts, dim, "custkey", col("t"))
      .select(streamFacts("custkey"), col("t"), col("ver"), col("payload"))
      .writeStream.format("memory").queryName("pit").outputMode("append").start()
    try {
      input.addData(factRows.take(3): _*)
      q.processAllAvailable()
      input.addData(factRows.drop(3): _*) // micro-batch split must not matter
      q.processAllAvailable()
      val streamed = spark.table("pit").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)), Option(r.get(3)))).toSet
      val facts = spark.createDataFrame(factRows).toDF("custkey", "t")
      val batch = graft.operators.AsOfJoin.join(facts,
          dim.select(col("custkey"), col("valid_from"), col("ver"), col("payload")),
          Seq("custkey"), col("t"), col("valid_from"),
          Seq("ver", "payload"), col("ver"), "v")
        .select(col("custkey"), col("t"), col("v.ver"), col("v.payload"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)), Option(r.get(3)))).toSet
      assert(streamed === batch,
        s"interval-containment stream != as-of batch:\n$streamed\n$batch")
      assert(streamed.contains((1L, 10L, Some(2L), Some("B"))),
        "boundary fact must land in the LATER version (inclusive valid_from)")
      assert(streamed.contains((2L, 3L, None, None)) && streamed.contains((3L, 7L, None, None)))
    } finally q.stop()
  }

  test("stream-stream attribution join emits exactly the batch pair set") {
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts, user_id) rows — attribute() needs ids, which the
    // Event case class doesn't carry
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    def named(s: MemoryStream[(Long, Timestamp, Long)]) =
      s.toDS().toDF("event_id", "ts", "user_id")
    val q = EventStream.attribute(named(clicks), named(purchases), 30)
      .select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      // user 1: clicks at t0/t20 qualify for the t25 purchase; the t100
      // click is later than the purchase → excluded.
      // user 2: click at t0 is outside the 30-min window of the t45 purchase.
      val clickRows = Seq((1L, ts(0), 1L), (2L, ts(20), 1L), (3L, ts(100), 1L),
        (4L, ts(0), 2L))
      val purchaseRows = Seq((10L, ts(25), 1L), (11L, ts(45), 2L))
      clicks.addData(clickRows: _*)
      purchases.addData(purchaseRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventStream.attribute(
        clickRows.toDF("event_id", "ts", "user_id"),
        purchaseRows.toDF("event_id", "ts", "user_id"), 30)
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((10L, 1L), (10L, 2L)), s"batch twin semantics drifted: $batch")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("left-outer attribution emits unmatched clicks only after the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    def named(s: MemoryStream[(Long, Timestamp, Long)]) =
      s.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.attributeWithTimeout(named(clicks), named(purchases), 30)
      .writeStream.format("memory").queryName("attr_lo").outputMode("append").start()
    try {
      // user 1 clicks and buys inside the window; user 2 clicks and never buys
      clicks.addData((101L, ts(0), 1L), (102L, ts(0), 2L))
      purchases.addData((201L, ts(10), 1L))
      q.processAllAvailable()
      val early = spark.table("attr_lo").collect().map(_.getLong(0)).toSet
      assert(!early.contains(102L),
        "negative emitted before the watermark could rule out a late purchase")
      // advance both watermarks far past the window, twice (eviction
      // runs on the batch after the watermark moves)
      for (m <- Seq(300, 600)) {
        clicks.addData((100L + m, ts(m), 9L)); purchases.addData((200L + m, ts(m), 9L))
        q.processAllAvailable()
      }
      val streamed = spark.table("attr_lo").collect()
        .filter(_.getLong(0) <= 102).map(r => r.getLong(0) -> Option(r.get(3))).toMap
      assert(streamed === Map(101L -> Some(201L), 102L -> None),
        s"left-outer attribution wrong: $streamed")
      // batch twin: the same kernel over bounded frames (watermarks are
      // no-ops there, the join is a plain left join)
      val cdf = Seq((101L, ts(0), 1L), (102L, ts(0), 2L)).toDF("event_id", "ts", "user_id")
      val pdf = Seq((201L, ts(10), 1L)).toDF("event_id", "ts", "user_id")
      val batch = EventStream.attributeWithTimeout(cdf, pdf, 30).collect()
        .map(r => r.getLong(0) -> Option(r.get(3))).toMap
      assert(streamed === batch, s"stream != batch twin: $streamed vs $batch")
    } finally q.stop()
  }

  test("streaming 3-sigma anomaly gate flags the planted outlier, matching its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // static reference corpus: 20 steady values + one gross outlier per
    // type (the outlier must be IN the stats source too — the gate's
    // contract is yesterday's corpus, warts included)
    val ref = ((1 to 20).map(i => (i.toLong, ts(i), "click", 10.0 + (i % 3))) :+
      (99L, ts(30), "click", 1000.0)) ++ (1 to 10).map(i => (200L + i, ts(i), "view", 5.0))
    val refDf = ref.toDF("event_id", "ts", "event_type", "value")
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val q = EventStream.flagAnomalies(
        input.toDS().toDF("event_id", "ts", "event_type", "value"), refDf)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      input.addData(ref: _*)
      q.processAllAvailable()
      val streamed = spark.table("anom").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStream.flagAnomalies(refDf, refDf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed === Set((99L, "click", 100000L)), s"flag set drifted: $streamed")
    } finally q.stop()
  }

  test("foreachBatch parquet sink lands batches idempotently by batch id") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Event]
    val q = EventStream.sinkToParquet(input.toDF(), dir)
      .option("checkpointLocation", s"$dir/_chk").start()
    try {
      input.addData(Event(ts(0), 1, "click", 1.0), Event(ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(ts(2), 3, "click", 3.0))
      q.processAllAvailable()
      val batchDirs = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("batch_")).sorted
      assert(batchDirs.nonEmpty, "no batch directories landed")
      val total = batchDirs.map(b => spark.read.parquet(s"$dir/$b").count()).sum
      assert(total === 3L)
      // idempotency: overwriting the same batch path again (a replay)
      // does not change the landed row count
      spark.read.parquet(s"$dir/${batchDirs.head}").write
        .mode("overwrite").parquet(s"$dir/${batchDirs.head}_replay")
      val replayed = spark.read.parquet(s"$dir/${batchDirs.head}_replay").count()
      assert(replayed === spark.read.parquet(s"$dir/${batchDirs.head}").count())
    } finally q.stop()
  }

  test("restart from checkpoint resumes without reprocessing landed batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val input = MemoryStream[Event]
    def start() = EventStream.sinkToParquet(input.toDF(), s"$dir/out")
      .option("checkpointLocation", s"$dir/chk").start()
    val q1 = start()
    try {
      input.addData(Event(ts(0), 1, "click", 1.0), Event(ts(1), 2, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // same checkpoint: committed batch 0 must not replay
    try {
      input.addData(Event(ts(2), 3, "click", 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val landed = spark.read.parquet(s"$dir/out/batch_*")
    assert(landed.count() === 3L, "restart duplicated or dropped events")
    assert(landed.select("value").distinct().count() === 3L)
  }

  test("file-source streaming read of the fixture matches the batch row count") {
    val stream = EventStream.readEvents(spark, SparkTestBase.sfDir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("ev_raw").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_raw").count()
      val batch = Tables.events(spark, SparkTestBase.sfDir).count()
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming near-dup gate ≡ first-doc-per-simhash batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docsSeq = Seq(
      (1L, base),
      (2L, "one two three four five six seven eight"),
      (3L, base), // exact repeat — guaranteed signature collision
      (4L, "red green blue cyan magenta yellow black white"),
      (5L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup: may or may not collide
      (6L, base), // another repeat
      (7L, "hi"), // under 3 words: no shingles → exact-text key
      (8L, "yo"), // distinct short doc — must ALSO be admitted
      (9L, "hi")) // short repeat — rejected on the exact-text key
    // batch twin: first doc per dedup key (signature, or exact text for
    // shingle-less short docs), arrival order
    def key(t: String) = {
      val sh = graft.functions.Hashing.wordShingles(t, 3)
      if (sh.isEmpty) "raw:" + t
      else "sig:" + graft.functions.Hashing.simhashPoly(sh)
    }
    val expected = docsSeq
      .groupBy { case (_, t) => key(t) }.values.map(_.map(_._1).min).toSeq.sorted
    assert(expected.size < docsSeq.size, "fixture plants at least one collision")
    assert(Seq(7L, 8L).forall(expected.contains),
      "distinct short docs must not collide on the degenerate simhash")
    assert(!expected.contains(9L), "short exact repeat must be rejected")

    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.admitNovelDocs(docs)
      .writeStream.format("memory").queryName("novel_docs").outputMode("append").start()
    try {
      input.addData(docsSeq.zipWithIndex.map { case ((id, t), i) => (id, ts(i), t) }: _*)
      q.processAllAvailable()
      val admitted = spark.table("novel_docs").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(admitted === expected,
        s"stream admissions $admitted must equal the batch twin $expected")
    } finally q.stop()
  }

  test("streaming incremental-dedup classification ≡ the batch d18 query") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sfDir
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    // the batch twin's classification of the same arrivals vs the same
    // persistent corpus
    val expected = graft.queries.DedupQueries
      .queries("d18_incremental_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -2.0 else r.getDouble(3))))
      .toMap
    assert(expected.values.exists(_._1 == "exact") || expected.values.exists(_._1 == "near"),
      "fixture plants batch-corpus duplicates")

    val arrivals = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.classifyArrivals(
        input.toDF().toDF("ts", "doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("classified")
      .outputMode("append").start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      // advance the watermark past every arrival so the agg emits
      input.addData((ts(600), -999L, "watermark advancer sentinel document row"))
      q.processAllAvailable()
      val streamed = spark.table("classified")
        .filter(col("doc_id") =!= -999L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -2.0 else r.getDouble(3))))
        .toMap
      assert(streamed === expected,
        "stream classification must equal the batch d18 twin")
      // state is the (ts, doc_id) aggregation groups within the
      // watermark horizon — bounded by arrivals, NOT by corpus size
      // (the corpus side is stateless stream-static) or stream length
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon ${arrivals.size + 1}")
    } finally q.stop()
  }

  test("streaming crawl classification ≡ the batch e30 query (markup in, verdicts out)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sfDir
    val expected = graft.queries.DedupQueries
      .queries("e30_crawl_classify")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -2.0 else r.getDouble(3))))
      .toMap
    assert(expected.values.exists(_._1 != "novel"),
      "fixture plants cross-split content duplicates")
    // the crawl shape: PAGES (raw markup) on both sides — the stream
    // must extract in-flight, map-side, before classifying
    val pages = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.queries.TextQueries.htmlDoc(col("doc_id"), col("text")).as("html"))
    val corpusPages = pages.filter(col("doc_id") % 10 =!= 0)
    val arrivals = pages.filter(col("doc_id") % 10 === 0).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.classifyCrawlArrivals(
        input.toDF().toDF("ts", "doc_id", "html"), corpusPages)
      .writeStream.format("memory").queryName("crawl_classified")
      .outputMode("append").start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, h), i) =>
        (ts(i % 60), id, h) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L, "<p>watermark advancer page</p>"))
      q.processAllAvailable()
      val streamed = spark.table("crawl_classified")
        .filter(col("doc_id") =!= -999L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -2.0 else r.getDouble(3))))
        .toMap
      assert(streamed === expected,
        "in-stream extract+classify must equal the batch e30 twin")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon ${arrivals.size + 1}")
    } finally q.stop()
  }

  test("streaming substring admission ≡ the batch d26 query") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sfDir
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> ((r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    val expected = graft.queries.DedupQueries
      .queries("d26_substring_admission")(spark, dir)
      .collect().map(key).toMap
    assert(expected.values.exists(_._4 > 0),
      "fixture plants cross-split shared substrings")
    val idx = spark.table(graft.queries.DedupQueries.d26LandingFor(spark, dir))
    val corpusDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val arrivals = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.admitArrivalsBySubstring(
        input.toDF().toDF("ts", "doc_id", "text"), idx, corpusDocs)
      .writeStream.format("memory").queryName("admissions_d26")
      .outputMode("append").start()
    try {
      // spread arrivals over several micro-batch event times; the
      // per-DOC hot-hash cap makes the verdict batching-invariant
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L,
        "watermark advancer sentinel document row long enough to clear the sixty character gram floor"))
      q.processAllAvailable()
      val streamed = spark.table("admissions_d26")
        .filter(col("doc_id") =!= -999L).collect().map(key).toMap
      assert(streamed === expected,
        "stream admission must equal the batch d26 twin")
      // state is one aggregation group per arrival in the horizon —
      // independent of corpus size (both corpus joins are stateless
      // stream-static) and of stream length
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon ${arrivals.size + 1}")
    } finally q.stop()
  }

  test("streaming winnow admission ≡ the batch d34 query") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sfDir
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> ((r.getBoolean(1),
      r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) -1L else r.getLong(4)))
    val expected = graft.queries.DedupQueries
      .queries("d34_winnow_admission")(spark, dir)
      .collect().map(key).toMap
    assert(expected.values.exists(_._1), "fixture plants cross-split matches")
    val idx = spark.table(graft.queries.DedupQueries.d34LandingFor(spark, dir))
    val corpusDocs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull &&
        org.apache.spark.sql.functions.length(col("text")) >= 27)
      .select("doc_id", "text")
    val arrivals = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.admitArrivalsByFingerprint(
        input.toDF().toDF("ts", "doc_id", "text"), idx, corpusDocs)
      .writeStream.format("memory").queryName("admissions_d34")
      .outputMode("append").start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L,
        "watermark advancer sentinel row comfortably past the floor"))
      q.processAllAvailable()
      val streamed = spark.table("admissions_d34")
        .filter(col("doc_id") =!= -999L).collect().map(key).toMap
      assert(streamed === expected,
        "stream winnow admission must equal the batch d34 twin")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon ${arrivals.size + 1}")
    } finally q.stop()
  }

  test("streaming domain admission ≡ the windowed batch twin, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = SparkTestBase.sfDir
    val cap = 1L
    // a crawl feed: two 1-hour windows of arrivals, sources from the
    // fixture so the URL construction has its full shape rotation
    // (incl. the blocked crawl-hub shape)
    val arrivals = Tables.documents(spark, dir)
      .filter(col("doc_id") < 120).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .map { case (id, src) => (ts((id % 120).toInt), id, src) }
    assert(arrivals.size >= 100, "fixture too small for two windows")
    val blocked = graft.queries.WebQueries.blockedFrame(spark, dir)
    // batch twin: the same parse + blocklist join + per-(window,
    // domain) doc_id-ordered rank — w3's algebra windowed by hour
    val parsedBatch = graft.functions.Url.withParsed(
        arrivals.toDF("ts", "doc_id", "source")
          .withColumn("url",
            graft.functions.Url.urlOf(col("doc_id"), col("source"))))
      .withColumn("win_start", window(col("ts"), "1 hour").getField("start"))
      .join(broadcast(blocked), Seq("reg_domain"), "left")
      .withColumn("rank_in_domain", row_number().over(
        Window.partitionBy("win_start", "reg_domain").orderBy("doc_id"))
        .cast("long"))
      .withColumn("verdict",
        when(coalesce(col("is_blocked"), lit(false)), "blocked")
          .when(col("rank_in_domain") > cap, "over_cap")
          .otherwise("kept"))
      .select("win_start", "doc_id", "reg_domain", "rank_in_domain", "verdict")
    val expected = parsedBatch.collect().map(_.toSeq).toSet
    val verdicts = expected.map(_.apply(4).asInstanceOf[String])
    assert(verdicts === Set("kept", "over_cap", "blocked"),
      s"fixture must exercise all three verdicts, got $verdicts")
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.admitByDomain(
        input.toDF().toDF("ts", "doc_id", "source"), blocked, cap)
      .writeStream.format("memory").queryName("domain_admission")
      .outputMode("append").start()
    try {
      // split ACROSS micro-batches inside each window: ranks must be
      // doc_id-ordered on window close, not arrival-ordered
      val (a, b) = arrivals.partition(_._2 % 2 == 0)
      input.addData(b: _*)
      q.processAllAvailable()
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L, "advancer"))
      q.processAllAvailable()
      val streamed = spark.table("domain_admission")
        .filter(col("doc_id") =!= -999L).collect().map(_.toSeq).toSet
      assert(streamed === expected,
        "stream domain admission must equal the windowed batch twin")
      // state is watermark-bounded: after the advancer closes both
      // arrival windows, only the advancer's own group remains
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 1,
        s"state $stateRows rows — closed windows were not evicted")
    } finally q.stop()
    graft.queries.Caches.release(spark, dir)
  }

  test("streaming mixture sampling ≡ the batch decision against the landed rates; stateless") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = SparkTestBase.sfDir
    val rates = graft.queries.DedupQueries.mixtureRatesFor(spark, dir)
    val base = Tables.documents(spark, dir).select("doc_id", "source")
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getString(1))).toSeq
    // every fixture doc, plus a source the store never counted
    // (unrated) and a null-id arrival (hash null → skipped)
    val arrivals = (base ++ Seq((Some(999999L), "never-seen-source"),
        (None, base.head._2)))
      .zipWithIndex.map { case ((id, src), i) => (ts(i % 30), id, src) }
    val arrivalsDf = arrivals.toDF("ts", "doc_id", "source")
    // independent batch twin: d35's decision written out longhand
    val u = pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L,
      lit(1000000007L)) % 1048576L
    val expected = arrivalsDf
      .join(rates.select(col("src"), col("rate")),
        col("source") <=> col("src"), "left")
      .select(col("ts"), col("doc_id"), col("source"),
        when(col("rate").isNull, "unrated")
          .when(u < col("rate") * 1048576.0, "sampled")
          .otherwise("skipped").as("verdict"))
      .collect().map(_.toSeq).toSet
    assert(expected.map(_.apply(3).asInstanceOf[String]) ===
      Set("sampled", "skipped", "unrated"),
      "fixture must exercise all three verdicts")
    val input = MemoryStream[(Timestamp, Option[Long], String)]
    val q = EventStream.sampleArrivals(
        input.toDF().toDF("ts", "doc_id", "source"), rates)
      .writeStream.format("memory").queryName("mixture_sampling")
      .outputMode("append").start()
    try {
      val (a, b) = arrivals.partition(_._2.exists(_ % 2 == 0))
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val streamed = spark.table("mixture_sampling")
        .collect().map(_.toSeq).toSet
      assert(streamed === expected,
        "stream mixture verdicts must equal the batch decision")
      // stateless: the corpus statistics live in the landed store
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum === 0L,
        "mixture sampling must carry no stream state")
    } finally q.stop()
    graft.queries.Caches.release(spark, dir)
  }

  test("streaming recrawl keep-newest ≡ the batch w6 feed verdicts, state = frontier size") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // ids ≡ 7 (mod 11) take the blog URL shape (no doc_id in the URL),
    // so ids equal mod 143 share a canonical URL; +143 raises fetch_day
    // (= id·7 mod 100) by 1, +143·99 lowers it by 1 — every triple
    // exercises admit, admit-fresher, and STALE in feed order. Shape-0
    // ids (0, 11, 22) are unique-URL controls; a duplicated id is an
    // equal-freshness re-fetch (admitted — ties are "at least as
    // fresh"); null ids form the null-URL group (null fetch_day never
    // freshens, admitted while the frontier has no dated fetch).
    val bases = Seq(7L, 18L, 29L, 40L)
    val ids: Seq[Option[Long]] =
      (bases.flatMap(b => Seq(b, b + 143L, b + 143L * 99)) ++
        Seq(0L, 11L, 22L, 7L)).map(Some(_)) ++ Seq(None, None)
    val arrivals = ids.zipWithIndex.map { case (id, i) => (ts(i), id, "web") }
    val arrivalsDf = arrivals.toDF("ts", "doc_id", "source")
    val batch = graft.functions.Url.withParsed(
        arrivalsDf.withColumn("url",
          graft.functions.Url.urlOf(col("doc_id"), col("source"))))
      .withColumn("canon_url", graft.functions.Url.canonUrl)
      .withColumn("fetch_day", (col("doc_id") * lit(7L)) % lit(100L))
      .select(col("doc_id"), col("canon_url"), col("fetch_day"))
      .withColumn("prev_best", max("fetch_day").over(
        Window.partitionBy("canon_url").orderBy(col("doc_id").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("verdict",
        when(col("prev_best").isNull || col("fetch_day") >= col("prev_best"),
          "admitted").otherwise("stale"))
      .drop("prev_best")
    val expected = batch.collect().map(_.toSeq).toSet
    assert(expected.map(_.apply(3).asInstanceOf[String]) ===
      Set("admitted", "stale"),
      "fixture must exercise both feed verdicts")
    val input = MemoryStream[(Timestamp, Option[Long], String)]
    val q = EventStream.recrawlKeepNewest(
        input.toDF().toDF("ts", "doc_id", "source"))
      .writeStream.format("memory").queryName("recrawl_feed")
      .outputMode("append").start()
    try {
      // feed order = doc_id ascending (nulls last), split across three
      // micro-batches as consecutive slices so each URL's re-fetches
      // SPAN batches — the frontier must carry across micro-batches
      val ordered = arrivals.sortBy(_._2.getOrElse(Long.MaxValue))
      ordered.grouped((ordered.size + 2) / 3).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("recrawl_feed").collect().map(_.toSeq).toSet
      assert(streamed === expected,
        "stream recrawl verdicts must equal the batch w6 twin row-for-row")
      // state is the frontier: one row per canonical URL with a dated
      // fetch (the null-URL group never updates state)
      val nUrls = batch.filter(col("canon_url").isNotNull)
        .select("canon_url").distinct().count()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows === nUrls,
        s"state $stateRows rows != $nUrls frontier URLs")
    } finally q.stop()
  }

  test("streaming count-min sketch across micro-batches ≡ the batch sketch cell-for-cell") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq("the quick brown fox jumps over the lazy dog",
      "the cat sat on the mat", "a b c a b a")
    val batch2 = Seq("the dog barks at the quick fox",
      "x y z x y x w w w w", "lone")
    val input = MemoryStream[String]
    val q = EventStream.sketchTokens(input.toDF().toDF("text"))
      .writeStream.format("memory").queryName("cm_sketch")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*) // second micro-batch must MERGE into the cells
      q.processAllAvailable()
      val streamed = spark.table("cm_sketch")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = EventStream.sketchTokens(
        (batch1 ++ batch2).toDF("text"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch,
        "stream sketch must equal the batch sketch cell-for-cell (cells are additive)")
      // the scale contract: state is the cell space, not the vocabulary
      assert(streamed.size <= 4096, "sketch state exceeded the fixed cell space")
    } finally q.stop()
  }

  test("streaming HLL registers across micro-batches ≡ the batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq("the quick brown fox jumps over the lazy dog",
      "the cat sat on the mat", "alpha beta gamma delta")
    val batch2 = Seq("the dog barks at the quick fox",
      "epsilon zeta eta theta iota kappa", "alpha beta")
    val input = MemoryStream[String]
    val q = EventStream.sketchRegisters(input.toDF().toDF("text"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*) // register MAX must merge, not re-add
      q.processAllAvailable()
      val streamed = spark.table("hll_regs")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = EventStream.sketchRegisters((batch1 ++ batch2).toDF("text"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed === batch,
        "stream registers must equal the batch registers exactly (max is the merge)")
      assert(streamed.size <= 256, "register state exceeded the fixed register space")
    } finally q.stop()
  }

  test("streaming composed ingest verdict ≡ the batch e15 query") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sfDir
    def opt[T](r: org.apache.spark.sql.Row, i: Int, get: Int => T): Option[T] =
      if (r.isNullAt(i)) None else Some(get(i))
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> ((r.getString(1),
      opt(r, 2, r.getLong), opt(r, 3, r.getDouble), r.getLong(4),
      opt(r, 5, r.getLong), r.getLong(6), r.getDouble(7), r.getBoolean(8),
      opt(r, 9, r.getLong), opt(r, 10, r.getDouble), r.getBoolean(11)))
    val expected = graft.queries.DedupQueries
      .queries("e15_ingest_verdict")(spark, dir)
      .collect().map(key).toMap
    // the fixture must exercise every axis or the parity proves nothing
    assert(expected.values.exists(v => v._1 != "novel"), "band axis fires")
    assert(expected.values.exists(_._4 > 0), "substring axis fires")
    assert(expected.values.exists(_._9.nonEmpty), "semantic axis fires")
    assert(expected.values.exists(!_._11), "some arrival is rejected")
    assert(expected.values.exists(_._11), "some arrival is admitted")
    val corpusDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val bandIdx = spark.table(
      graft.queries.DedupQueries.bandLandingFor(spark, dir))
    val gramIdx = spark.table(
      graft.queries.DedupQueries.d26LandingFor(spark, dir))
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val corpusVecs = vecs.filter(col("vec_id") % 10 =!= 0)
    val arrivals = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.ingestVerdict(
        input.toDF().toDF("ts", "doc_id", "text"),
        corpusDocs, bandIdx, gramIdx, vecs, corpusVecs, cacheScope = dir)
      .writeStream.format("memory").queryName("ingest_verdict")
      .outputMode("append").start()
    try {
      // arrivals spread over several micro-batch event times: every
      // cap/argmax is per-document, so the verdict must not depend on
      // which micro-batch a doc rode in on
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L, "watermark advancer"))
      q.processAllAvailable()
      val streamed = spark.table("ingest_verdict")
        .filter(col("doc_id") =!= -999L).collect().map(key).toMap
      assert(streamed === expected,
        "stream composed verdict must equal the batch e15 result")
      // ONE aggregation group per arrival in the horizon — state does
      // not multiply with the number of axes, which is the point of
      // folding all evidence through a single aggregation
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon ${arrivals.size + 1}")
      // scale pin: the semantic axis must probe the gid-bucketed corpus
      // index (stream-static equi-join), never brute-force the corpus —
      // the executed micro-batch plan carries no cartesian/nested-loop
      val lastPlan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!lastPlan.contains("CartesianProduct") &&
          !lastPlan.contains("BroadcastNestedLoopJoin"),
        "streaming ingest-verdict plan must stay free of cartesian/nested-loop joins")
    } finally q.stop()
  }

  test("streaming FULL ingest verdict ≡ the batch e34 query on all six axes") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.sfDir
    val expected = graft.queries.DedupQueries
      .queries("e34_full_ingest_verdict")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // every NEW axis must exercise both branches or the parity proves
    // nothing (the dedup axes are pinned by the e15 twin test)
    def colIdx(name: String) = Seq("status", "match_id", "similarity",
      "sub_partners", "sub_match", "sub_dup_chars", "sub_coverage",
      "sub_admit", "sem_match", "sem_cosine", "dedup_admit", "pred_lang",
      "lang_margin", "lang_ok", "xent3_bits", "ppl_ok", "reg_domain",
      "hist_docs", "domain_verdict", "domain_ok", "admit").indexOf(name)
    assert(expected.values.map(_(colIdx("pred_lang"))).toSet.size > 1,
      "language axis fires")
    assert(expected.values.exists(_(colIdx("ppl_ok")) == false),
      "perplexity axis rejects someone")
    assert(expected.values.map(_(colIdx("domain_verdict"))).toSet ===
      Set("ok", "over_cap", "blocked"), "domain axis fires on all branches")
    assert(expected.values.exists(_(colIdx("admit")) == true), "someone admitted")
    assert(expected.values.exists(_(colIdx("admit")) == false), "someone rejected")
    val corpusDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val bandIdx = spark.table(
      graft.queries.DedupQueries.bandLandingFor(spark, dir))
    val gramIdx = spark.table(
      graft.queries.DedupQueries.d26LandingFor(spark, dir))
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val corpusVecs = vecs.filter(col("vec_id") % 10 =!= 0)
    val langProfile = graft.queries.PipelineQueries.langProfileFor(spark, dir)
    val c3 = spark.read.schema(graft.queries.TextQueries.lm3CountSchema)
      .parquet(graft.queries.TextQueries.lm3CountsLandingFor(spark, dir))
    val blocklist = graft.queries.WebQueries.blockedFrame(spark, dir)
    val hist = spark.read.schema(graft.queries.WebQueries.domainStatSchema)
      .parquet(graft.queries.WebQueries.e34DomainHistFor(spark, dir))
    val arrivals = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text", "source", "lang").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    val input = MemoryStream[(Timestamp, Long, String, String, String)]
    val q = EventStream.fullIngestVerdict(
        input.toDF().toDF("ts", "doc_id", "text", "source", "lang"),
        corpusDocs, bandIdx, gramIdx, vecs, corpusVecs,
        langProfile, c3, blocklist, hist, cacheScope = dir)
      .writeStream.format("memory").queryName("full_ingest_verdict")
      .outputMode("append").start()
    try {
      // arrivals spread over several micro-batch event times; plus a
      // planted NULL-TEXT arrival (-998) — unroutable (lang_ok false),
      // unscoreable (xent null → ppl_ok true), and its -998 % 11 = -8
      // URL shape falls to the blocked crawl-hub ELSE branch
      input.addData(arrivals.zipWithIndex.map { case ((id, t, src, lg), i) =>
        (ts(i % 60), id, t, src, lg) }: _*)
      q.processAllAvailable()
      input.addData((ts(61), -998L, null, "srcX", "en"))
      q.processAllAvailable()
      input.addData((ts(600), -999L, "watermark advancer", "srcY", "en"))
      q.processAllAvailable()
      val streamedAll = spark.table("full_ingest_verdict")
        .filter(col("doc_id") =!= -999L).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val planted = streamedAll(-998L)
      assert(planted(colIdx("pred_lang")) == null &&
        planted(colIdx("lang_ok")) == false,
        s"null-text arrival must be unroutable: $planted")
      assert(planted(colIdx("xent3_bits")) == null &&
        planted(colIdx("ppl_ok")) == true,
        s"null-text arrival must be unscoreable but not rejected: $planted")
      assert(planted(colIdx("domain_verdict")) == "blocked" &&
        planted(colIdx("admit")) == false,
        s"planted arrival must be domain-blocked: $planted")
      val streamed = streamedAll - (-998L)
      assert(streamed === expected,
        "stream full verdict must equal the batch e34 result")
      // ONE aggregation group per arrival in the horizon — the point
      // of folding all six axes through a single aggregation
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 2,
        s"state $stateRows exceeds the arrival horizon ${arrivals.size + 2}")
      val lastPlan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!lastPlan.contains("CartesianProduct") &&
          !lastPlan.contains("BroadcastNestedLoopJoin"),
        "streaming full-verdict plan must stay free of cartesian/nested-loop joins")
    } finally q.stop()
  }

  test("streaming language ID equals the batch t39 verdicts micro-batch-invariantly") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestBase.sfDir
    val expected = graft.queries.PipelineQueries
      .queries("t39_lang_id")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred_lang"), r.getAs[Long]("score"), r.getAs[Long]("margin"))))
      .toMap
    assert(expected.nonEmpty, "batch gate scored no documents")
    // arrivals = the scored split's PLANTED text (production docs
    // arrive already in their language; the planting is the fixture's
    // multilingual stand-in, same transform as the batch side)
    val arrivals = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 3 &&
        col("doc_id") % 5 === 0)
      .select(col("doc_id"), graft.queries.PipelineQueries.plantedLangText.as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val profile = graft.queries.PipelineQueries.langProfileFor(spark, dir)
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.identifyLanguage(
        input.toDF().toDF("ts", "doc_id", "text"), profile)
      .writeStream.format("memory").queryName("lang_id")
      .outputMode("append").start()
    try {
      // spread over micro-batch event times: per-language sums are
      // associative and the fold is per document, so the verdict must
      // not depend on the batching
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L, "watermark advancer"))
      q.processAllAvailable()
      val streamed = spark.table("lang_id")
        .filter(col("doc_id") =!= -999L).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(streamed === expected,
        "stream language verdicts must equal the batch t39 result")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon")
    } finally q.stop()
    graft.queries.Caches.release(spark, dir)
  }

  test("streaming WET ingest lands micro-batches that read back equal to the batch delta landing") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestBase.sfDir
    // arrivals = e31's wave as raw pages (the same markup construction
    // the batch delta landing extracts from)
    val pages = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull &&
        coalesce(col("doc_id") % 10 === 3, lit(false)))
      .select(col("doc_id"), col("source"),
        graft.queries.TextQueries.htmlDoc(col("doc_id"), col("text")).as("html"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(pages.size >= 2, "fixture wave too small to split into micro-batches")
    val outDir = java.nio.file.Files.createTempDirectory("graft_wet_stream").toString
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val q = EventStream.sinkToParquet(
        EventStream.extractArrivals(
          input.toDF().toDF("ts", "doc_id", "source", "html")), outDir)
      .option("checkpointLocation", s"$outDir/_chk").start()
    try {
      val (w1, w2) = pages.splitAt(pages.size / 2)
      input.addData(w1.map { case (id, src, h) => (ts(1), id, src, h) }: _*)
      q.processAllAvailable()
      input.addData(w2.map { case (id, src, h) => (ts(2), id, src, h) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "source", "n_blocks", "n_boiler", "text", "content")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val batchDirs = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.startsWith("batch_")).sorted
    assert(batchDirs.size >= 2, s"expected >=2 landed micro-batches: ${batchDirs.toSeq}")
    val streamed = rows(spark.read
      .schema(graft.queries.TextQueries.extractionSchema)
      .parquet(batchDirs.map(b => s"$outDir/$b"): _*))
    val landedDelta = rows(spark.read
      .schema(graft.queries.TextQueries.extractionSchema)
      .parquet(graft.queries.TextQueries.e31LandingFor(spark, dir)._2))
    assert(streamed.length === pages.size)
    assert(streamed === landedDelta,
      "stream-landed WET rows must equal the batch delta landing row-for-row")
    graft.queries.Caches.release(spark, dir)
  }

  test("streaming tokenizer serve ≡ the batch t52 encode, incl. OOV fallback and wordless pages") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestBase.sfDir
    val expected = graft.queries.PipelineQueries
      .queries("t52_bpe_doc_tokens")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(expected.nonEmpty, "batch gate charged no documents")
    val vocab = spark.read.schema(graft.queries.PipelineQueries.bpeVocabSchema)
      .parquet(graft.queries.PipelineQueries.bpeModelFor(spark, dir) + "/vocab")
    assert(vocab.filter(col("w").isin("zzqqxv", "wv")).count() === 0,
      "planted words must be out-of-vocabulary")
    val arrivals = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ++
      Seq((-5L, "zzqqxv wv"), (-6L, ""), (-7L, null.asInstanceOf[String]))
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.encodeArrivals(
        input.toDF().toDF("ts", "doc_id", "text"), vocab)
      .writeStream.format("memory").queryName("bpe_serve")
      .outputMode("append").start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L, "watermark advancer"))
      q.processAllAvailable()
      val streamed = spark.table("bpe_serve")
        .filter(col("doc_id") =!= -999L).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      expected.foreach { case (id, row) =>
        assert(streamed(id) === row, s"doc $id diverged from the batch gate") }
      // planted OOV arrival: both words miss the vocab, tokens = chars
      assert(streamed(-5L) === ((2L, 2L, 8L)), s"${streamed(-5L)}")
      // wordless arrival still reports zeros (the sentinel branch)
      assert(streamed(-6L) === ((0L, 0L, 0L)), s"${streamed(-6L)}")
      // null-text arrival is OMITTED entirely — the batch gate filters
      // text IS NOT NULL before its doc spine, so a (0,0,0) sentinel
      // row here would diverge from the batch twin
      assert(!streamed.contains(-7L), "null-text arrival must be absent")
      assert(streamed.size === expected.size + 2)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon")
    } finally q.stop()
    graft.queries.Caches.release(spark, dir)
  }

  test("streaming perplexity gate ≡ the batch t53 scores, doc-for-doc and bit-for-bit") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkTestBase.sfDir
    val expected = SparkEntry.queries("t53_lm_perplexity")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(expected.nonEmpty, "batch gate scored no documents")
    val (c2, c1, vDf) = graft.queries.TextQueries.lmTrainCounts(spark, dir)
    val v = vDf.collect()(0).getLong(0)
    // arrivals = the held-out split's documents, spread over micro-batches
    val arrivals = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("doc_id") % 5 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.scoreArrivals(
        input.toDF().toDF("ts", "doc_id", "text"), c2, c1, v)
      .writeStream.format("memory").queryName("lm_score")
      .outputMode("append").start()
    try {
      input.addData(arrivals.zipWithIndex.map { case ((id, t), i) =>
        (ts(i % 60), id, t) }: _*)
      q.processAllAvailable()
      input.addData((ts(600), -999L, "watermark advancer text"))
      q.processAllAvailable()
      val streamed = spark.table("lm_score")
        .filter(col("doc_id") =!= -999L).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
      assert(streamed === expected,
        "stream scores must equal the batch t53 result exactly")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= arrivals.size + 1,
        s"state $stateRows exceeds the arrival horizon")
    } finally q.stop()
    graft.queries.Caches.release(spark, dir)
  }

  test("streaming sequence packing ≡ the batch grouped prefix sum across micro-batch splits") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStream.packSequences(
        input.toDF().toDF("doc_id", "source", "toks"))
      .writeStream.format("memory").queryName("packed").outputMode("append").start()
    try {
      // monotone ids per source, sources interleaved, widths chosen so
      // 512-boundaries fall both inside a micro-batch and across one —
      // the per-source state must carry the prefix over the split
      val all = Seq(
        (1L, "a", 300L), (2L, "b", 500L), (3L, "a", 100L),
        (4L, "a", 200L), (5L, "b", 20L), (6L, "a", 700L),
        (7L, "b", 512L), (8L, "a", 1L))
      input.addData(all.take(3): _*)
      q.processAllAvailable()
      input.addData(all.slice(3, 6): _*)
      q.processAllAvailable()
      input.addData(all.drop(6): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      val streamed = spark.table("packed").collect().map(key).toSet
      val batch = graft.operators.GlobalOrder
        .withRunningTotalWithin(all.toDF("doc_id", "source", "toks"),
          "cum", Seq("source"), col("toks"), col("doc_id"))
        .select(col("doc_id"), col("source"), col("toks"), col("cum"),
          expr("cum div 512").as("seq_first"), expr("cum % 512").as("seq_off"),
          expr("(cum + toks - 1) div 512").as("seq_last"),
          (expr("(cum + toks - 1) div 512") - expr("cum div 512")).as("n_crossings"))
        .collect().map(key).toSet
      assert(streamed === batch,
        "stream manifest must equal the batch grouped prefix sum")
      assert(streamed.size === 8)
      // a doc wider than a whole sequence must cross boundaries
      assert(streamed.exists(t => t._1 === 6L && t._8 >= 1L))
    } finally q.stop()
  }
}
