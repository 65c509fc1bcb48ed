package graft.queries

import graft.Tables
import graft.functions.Cleaning
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators for the training-data pipeline surface
  * (builder brief): token counting, quality scoring, language-ID
  * heuristic, fingerprinting, exact dedup, and the events-table window
  * aggregation (batch analog of the streaming ingest).
  *
  * All are pure Column expressions — codegen'd, scan-pruned, and shuffle
  * only at the declared groupBys — so they hold at 100 TB: per-row text
  * scoring is embarrassingly parallel, and exact dedup is one hash
  * shuffle on the fingerprint.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** t45's winnowed (doc_id, fp_pos, fp_h) fingerprint selection
    * (K = 20, W = 8), shared with d33's match pipeline so the index
    * and its consumer provably select identically. See the t45 query
    * comment for the encoding and the coverage guarantee. */
  private[queries] def winnowedFingerprints(docsIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val K = 20; val W = 8; val ENC = 1L << 22
    // The single-Long encoding h·2²² + (2²²−1−i) only holds positions
    // < 2²² (≈4.19M grams ≈ a 4 MB document); past that the position
    // term goes negative and selection/decoding silently corrupt. The
    // operator's documented doc-size contract is len ≤ 2²²+K−1; docs
    // over it fail LOUDLY here instead of mis-fingerprinting (both
    // engines share the encoding, so the oracle could never catch a
    // silent overflow). QualitySpec exercises the guard; the t45 twin
    // carries the same error() guard so neither engine can silently
    // mis-fingerprint an oversized doc.
    // r17 optimization round (guide §1.2 step 1 + §2.3/§2.4): the
    // selection runs as ONE native O(L) deque pass per document
    // (GraftWinnowed ≡ the previous explode + per-doc window-min +
    // distinct formulation — WinnowKernelSpec pins set equality), so
    // no per-position row is ever exploded, shuffled, or sorted. The
    // ScanFan fan-out parallelizes the per-doc pass across cores on
    // the one-row-group fixtures (identity on a real multi-split
    // table); the narrow text rows are the only bytes exchanged.
    val docs = graft.operators.ScanFan.byKey(
      docsIn.filter(col("text").isNotNull && length(col("text")) >= K + W - 1),
      col("doc_id"))
      .withColumn("text",
        when(length(col("text")) <= lit(ENC + K - 1), col("text"))
          .otherwise(raise_error(concat(
            lit("winnow: document exceeds the 2^22 gram-position encoding limit (doc_id="),
            col("doc_id"), lit(")")))))
    docs.select(col("doc_id"),
        explode(graft.plans.GraftWinnowed.column(col("text"), K, W)).as("e"))
      .select(col("doc_id"),
        (lit(ENC - 1) - col("e") % lit(ENC)).cast("long").as("fp_pos"),
        expr(s"e div ${ENC}L").as("fp_h"))
  }

  private def toks(text: Column): Column = split(trim(text), "\\s+")

  /** t53's (doc_id, lhs, rhs) word-bigram stream — one zip_with pass
    * per doc, shared by the batch gate and (via [[lmTrainCounts]]) the
    * streaming scorer's static side. */
  private[graft] def lmPairsOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = graft.operators.ScanFan.byKey(
      df.filter(col("text").isNotNull), col("doc_id"))
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .filter(size(col("w")) >= 2)
    .select(col("doc_id"), explode(expr(
      "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
        " (a, b) -> struct(a AS lhs, b AS rhs))")).as("p"))
    .select(col("doc_id"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))

  /** The t53 model's ONE sufficient statistic: the (lhs, rhs, c2)
    * bigram count table over the given doc slice. Left-context totals
    * and the smoothing vocabulary both DERIVE from it exactly
    * (c1 = Σ c2 by lhs; V = |distinct rhs|), so this single additive
    * table is the whole model of record — what t54 lands and what
    * t55's refresh adds delta counts into. */
  private[graft] def lmC2Of(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lmPairsOf(docs)
      .groupBy("lhs", "rhs").agg(count(lit(1)).cast("long").as("c2"))

  /** t53's training split (t39's % 5 convention). */
  private def lmTrainDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)

  /** Derive the full model from the c2 store: (c2, c1, v). Shared by
    * the batch gates (t53 recompute / t54 landed / t55 refreshed) and
    * the streaming scorer so every consumer provably scores against
    * the same model algebra. */
  private[graft] def lmModelOf(c2: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    (c2,
      c2.groupBy("lhs").agg(sum("c2").cast("long").as("c1")),
      c2.agg(countDistinct("rhs").cast("long").as("v")))

  private[graft] def lmTrainCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    lmModelOf(lmC2Of(lmTrainDocs(s, dir)))

  /** Per-document cap on the DISTINCT bigram types the scoring fold
    * collects into one row: 2¹⁶ types ≈ a few MB of struct row at
    * most, where an uncapped collect_list on a book-length crawl
    * document (10⁶+ words — routine) builds a ~100 MB single row (the
    * same O(width) blind spot the t23/d21 O(L²) fixes closed). The
    * kept prefix is the (lhs, rhs)-sorted FIRST [[LmDocTypeCap]] types
    * — deterministic in both engines (binary string order), so the
    * truncation itself is twin-replayable — and the drop is EXPLICIT:
    * `n_types_dropped` reports it, never silent. */
  private[graft] val LmDocTypeCap = 65536L

  /** The held-out scoring pass from a (c2, c1, v) model — t53's body,
    * shared by the recompute / landed / refreshed gates. Per-doc row
    * width is bounded by [[LmDocTypeCap]]: types rank by (lhs, rhs)
    * inside the doc-partitioned window (the same shuffle the fold's
    * groupBy needs anyway), the fold scores the kept prefix normalized
    * by ITS occurrence mass (n_scored), and totals over ALL types
    * (n_bigrams, n_types) ride the unordered window so the report
    * stays exact even when the fold truncates. */
  private def lmScoreWith(s: org.apache.spark.sql.SparkSession, dir: String,
      model: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)): org.apache.spark.sql.DataFrame = {
    // cache the c2 table: c1 and v derive from it, so all three
    // consumers substitute the in-memory relation instead of re-running
    // the count lineage (corpus pair extraction for t53, the signed
    // store merge for t55/t57) three times per score
    val (c2raw, c1raw, vraw) = model
    val c2 = Caches.trackCached(dir, c2raw)
    // r17: cache the derived left-context totals and vocabulary scalar
    // too (same memo contract), and the held-split featurization that
    // is identical lineage across the t53/t54/t55/t57 legs
    val c1 = Caches.trackCached(dir, c1raw)
    val v = Caches.trackCached(dir, vraw)
    val wDoc = Window.partitionBy("doc_id")
    val held = Caches.trackCached(dir,
      lmPairsOf(Tables.documents(s, dir).filter(col("doc_id") % 5 === 0))
        .groupBy("doc_id", "lhs", "rhs").agg(count(lit(1)).cast("long").as("m"))
        .withColumn("rk", row_number().over(
          wDoc.orderBy(col("lhs").asc, col("rhs").asc)))
        .withColumn("n_bigrams", sum("m").over(wDoc).cast("long"))
        .withColumn("n_types", count(lit(1)).over(wDoc).cast("long")))
    held.filter(col("rk") <= lit(LmDocTypeCap))
      .join(c2, Seq("lhs", "rhs"), "left")
      .join(c1, Seq("lhs"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("n_bigrams"), col("n_types"),
        struct(col("lhs"), col("rhs"), col("m"),
          (coalesce(col("c2"), lit(0L)) + lit(1L)).as("num"),
          (coalesce(col("c1"), lit(0L)) + col("v")).as("den")).as("t"))
      .groupBy("doc_id").agg(
        max("n_bigrams").as("n_bigrams"), max("n_types").as("n_types"),
        sum(col("t.m")).cast("long").as("n_scored"),
        sort_array(collect_list(col("t"))).as("ts"))
      .select(col("doc_id"), col("n_bigrams"),
        round(expr(
          """-aggregate(ts, CAST(0.0 AS DOUBLE),
            |  (acc, x) -> acc + x.m * log2(x.num / CAST(x.den AS DOUBLE)))
            | / n_scored""".stripMargin), 6).as("xent_bits"),
        greatest(col("n_types") - lit(LmDocTypeCap), lit(0L))
          .cast("long").as("n_types_dropped"))
      .orderBy("doc_id")
  }

  /** T54's landed LM count store — the tokenizer-model discipline
    * (t50's) applied to the perplexity model: the c2 table lands once
    * per (JVM, dir) and every serve derives c1/V from the landed rows
    * (vocab-sized aggregates — no document is re-paired). */
  private val lmLanding =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] val lmCountSchema = "lhs STRING, rhs STRING, c2 BIGINT"

  private[graft] def lmCountsLandingFor(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val memo = lmLanding.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) lmLanding.remove(dir, memo)
    lmLanding.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_t54_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { lmLanding.remove(d); () })
      Caches.trackPath(d, out)
      lmC2Of(lmTrainDocs(s, d)).write.mode("overwrite").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** T55's pre-delta store: c2 over the training split MINUS the
    * refresh batch (PipelineQueries.bpeIsDelta's % 9 == 4 carve —
    * the same arrival wave the BPE refresh absorbs). */
  private val lmStore =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def lmStoreLandingFor(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val memo = lmStore.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) lmStore.remove(dir, memo)
    lmStore.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_t55_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { lmStore.remove(d); () })
      Caches.trackPath(d, out)
      lmC2Of(lmTrainDocs(s, d).filter(!PipelineQueries.bpeIsDelta))
        .write.mode("overwrite").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** t58's (doc_id, w1, w2, w3) word-trigram stream — one transform
    * pass per doc. size(w) >= 3 is load-bearing: Spark's sequence()
    * DESCENDS when stop < start, so a 2-word doc would otherwise
    * fabricate indices. */
  private[graft] def lm3TriplesOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = graft.operators.ScanFan.byKey(
      df.filter(col("text").isNotNull), col("doc_id"))
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .filter(size(col("w")) >= 3)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(w) - 2), i -> struct(" +
        "element_at(w, i) AS w1, element_at(w, i + 1) AS w2," +
        " element_at(w, i + 2) AS w3))")).as("p"))
    .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"),
      col("p.w3").as("w3"))

  /** The t58 model's ONE sufficient statistic: the (w1, w2, w3, c3)
    * trigram count table over the given doc slice. EVERY other table
    * the interpolated scorer needs derives from it exactly — trigram
    * context totals (Σ by w1,w2), middle-bigram counts (Σ by w2,w3),
    * middle-context totals (Σ by w2), final-word unigrams (Σ by w3),
    * N (Σ all) and the smoothing V (|distinct w3|) — so this single
    * additive table is the whole model of record: what t59 lands,
    * what t60's refresh adds delta counts into, what t61's forget
    * subtracts from. */
  private[graft] def lm3C3Of(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lm3TriplesOf(docs)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).cast("long").as("c3"))

  /** The interpolated-trigram scoring pass from a c3 table — t58's
    * body, shared by the recompute / landed / refreshed / forgotten
    * gates. Jelinek–Mercer interpolation with fixed weights
    * λ = (0.5, 0.3, 0.2):
    *
    *   p(w3|w1,w2) = 0.5·c3/ctx2 + 0.3·cmid/c1ctx + 0.2·(c1+1)/(N+V)
    *
    * — trigram ML estimate backing off through the middle bigram to a
    * Laplace-floored unigram (the CCNet/KenLM-class shape t53's
    * bigram surrogate lacked: an unseen context costs by how unusual
    * its PARTS are, not a flat smoothing floor). Cross-engine DOUBLE
    * contract: every ratio is a BIGINT pair divided once, the three
    * terms combine left-associatively with double-literal weights
    * both engines parse identically, and the per-doc fold is t53's —
    * (w1, w2, w3)-sorted sequential sum of m·log2(p), LmDocTypeCap
    * row-width bound, round(·, 6) absorbing log2's last-ulp. Scale:
    * all count tables are vocabulary-sized derivations of c3 (five
    * hash joins + one 1-row broadcast), no document re-paired. */
  private def lm3ScoreWith(s: org.apache.spark.sql.SparkSession, dir: String,
      c3In: org.apache.spark.sql.DataFrame,
      heldDocs: org.apache.spark.sql.DataFrame = null)
      : org.apache.spark.sql.DataFrame = {
    // CACHED: six consumers read the c3 table (the direct join, four
    // derivation aggregates, and the (N, V) scalar); uncached, each
    // would re-run the whole count lineage — for t58 the corpus
    // trigram extraction, for t60/t61 the store read + delta/deletion
    // merge — six times per score. r17: the vocab-sized DERIVATIONS
    // are cached too (a serving system keeps the derived model
    // resident, not just the raw counts), so repeat serves against
    // the same c3 skip the four aggregates — the same per-dir memo
    // contract, released with the rest.
    val c3 = Caches.trackCached(dir, c3In)
    val ctx2 = Caches.trackCached(dir,
      c3.groupBy("w1", "w2").agg(sum("c3").cast("long").as("ctx2")))
    val mid = Caches.trackCached(dir,
      c3.groupBy("w2", "w3").agg(sum("c3").cast("long").as("cmid")))
    val c1ctx = Caches.trackCached(dir,
      c3.groupBy("w2").agg(sum("c3").cast("long").as("c1ctx")))
    val uni = Caches.trackCached(dir,
      c3.groupBy("w3").agg(sum("c3").cast("long").as("c1")))
    val nv = Caches.trackCached(dir,
      c3.agg(sum("c3").cast("long").as("nn"),
        countDistinct("w3").cast("long").as("v")))
    val wDoc = Window.partitionBy("doc_id")
    // scored slice: the % 5 held-out split by default; e34 passes its
    // checkpointed arrival frame so the composed verdict re-reads no
    // arrival text. The default split's featurized frame is cached —
    // it is IDENTICAL lineage across the t58/t60/t61 JM legs and the
    // t62–t65 KN legs, which otherwise re-pair the held corpus once
    // per query (r17).
    val heldRaw = lm3TriplesOf(Option(heldDocs).getOrElse(
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).cast("long").as("m"))
      .withColumn("rk", row_number().over(
        wDoc.orderBy(col("w1").asc, col("w2").asc, col("w3").asc)))
      .withColumn("n_trigrams", sum("m").over(wDoc).cast("long"))
      .withColumn("n_types", count(lit(1)).over(wDoc).cast("long"))
    // cached for BOTH scored slices: the default %5 split is identical
    // lineage across the family's legs, and e34's arrival slice rides
    // the memoized checkpoint, so its plan is per-dir stable too
    val held = Caches.trackCached(dir, heldRaw)
    held.filter(col("rk") <= lit(LmDocTypeCap))
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(ctx2, Seq("w1", "w2"), "left")
      .join(mid, Seq("w2", "w3"), "left")
      .join(c1ctx, Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("p",
        when(col("ctx2").isNull, lit(0.0))
          .otherwise(lit(0.5) * (coalesce(col("c3"), lit(0L)).cast("double") /
            col("ctx2").cast("double"))) +
        when(col("c1ctx").isNull, lit(0.0))
          .otherwise(lit(0.3) * (coalesce(col("cmid"), lit(0L)).cast("double") /
            col("c1ctx").cast("double"))) +
        lit(0.2) * ((coalesce(col("c1"), lit(0L)) + lit(1L)).cast("double") /
          (col("nn") + col("v")).cast("double")))
      .select(col("doc_id"), col("n_trigrams"), col("n_types"),
        struct(col("w1"), col("w2"), col("w3"), col("m"), col("p")).as("t"))
      .groupBy("doc_id").agg(
        max("n_trigrams").as("n_trigrams"), max("n_types").as("n_types"),
        sum(col("t.m")).cast("long").as("n_scored"),
        sort_array(collect_list(col("t"))).as("ts"))
      .select(col("doc_id"), col("n_trigrams"),
        round(expr(
          """-aggregate(ts, CAST(0.0 AS DOUBLE),
            |  (acc, x) -> acc + x.m * log2(x.p)) / n_scored""".stripMargin), 6)
          .as("xent3_bits"),
        greatest(col("n_types") - lit(LmDocTypeCap), lit(0L))
          .cast("long").as("n_types_dropped"))
      .orderBy("doc_id")
  }

  /** The KNESER–NEY-style scoring pass from the SAME c3 table — t62's
    * body (t58's backoff upgraded from Jelinek–Mercer mixing to
    * absolute discounting with continuation counts). Every statistic
    * is still a derivation of the ONE additive c3 store, so the landed
    * / refresh / forget legs carry over unchanged:
    *
    *   p(w3|w1,w2) = max(c3−D,0)/ctx2 + D·N₁₊(w1,w2,·)/ctx2 · p_mid
    *   p_mid(w3|w2) = max(N₁₊(·,w2,w3)−D,0)/N₁₊(·,w2,·)
    *                  + D·N₁₊(w2,·)/N₁₊(·,w2,·) · p_uni
    *   p_uni(w3)   = (N₁₊(·,w3)+1)/(N₁₊(·,·)+V)
    *
    * with discount D = 0.75 — and because c3 rows are DISTINCT
    * (w1,w2,w3) triples, each N₁₊ continuation count is a plain
    * count(*)/count(distinct) aggregate over c3. An unseen trigram
    * context backs off to genuinely-diverse continuations ("seen after
    * many distinct contexts") instead of raw frequency — the KN
    * property that demotes boilerplate n-grams frequent in one
    * template only. Cross-engine DOUBLE contract, t58's discipline:
    * D = 3/4 keeps every ratio a BIGINT pair — max(4·c−3,0)/(4·n) —
    * divided exactly once; λ·p products and the two-term sums combine
    * in the same written order in both engines; the per-doc fold is
    * the shared (w1,w2,w3)-sorted capped sequential sum. p > 0 always:
    * the unigram floor is Laplace-smoothed and every λ ≥ 1/(4·n). */
  private def lm3KnScoreWith(s: org.apache.spark.sql.SparkSession, dir: String,
      c3In: org.apache.spark.sql.DataFrame,
      heldDocs: org.apache.spark.sql.DataFrame = null)
      : org.apache.spark.sql.DataFrame = {
    // CACHED: seven consumers read c3 (direct join + six aggregates).
    // r17: the vocab-sized continuation-count derivations and the
    // shared held-split featurization are cached on the same per-dir
    // memo contract as c3 (see lm3ScoreWith).
    val c3 = Caches.trackCached(dir, c3In)
    val ctx2 = Caches.trackCached(dir,
      c3.groupBy("w1", "w2").agg(sum("c3").cast("long").as("ctx2"),
        count(lit(1)).cast("long").as("n1f12")))
    val cont23 = Caches.trackCached(dir, c3.groupBy("w2", "w3")
      .agg(count(lit(1)).cast("long").as("cont23")))
    val cont2d = Caches.trackCached(dir,
      c3.groupBy("w2").agg(count(lit(1)).cast("long").as("cont2d"),
        countDistinct("w3").cast("long").as("n1f2")))
    val cont3 = Caches.trackCached(dir, c3.groupBy("w3")
      .agg(countDistinct("w2").cast("long").as("cont3")))
    // N₁₊(·,·) = distinct (w2,w3) pairs; V = distinct w3 (t58's V)
    val nv = Caches.trackCached(dir,
      c3.select(col("w2"), col("w3")).distinct()
        .agg(count(lit(1)).cast("long").as("ctot"),
          countDistinct("w3").cast("long").as("v")))
    val wDoc = Window.partitionBy("doc_id")
    val heldRaw = lm3TriplesOf(Option(heldDocs).getOrElse(
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).cast("long").as("m"))
      .withColumn("rk", row_number().over(
        wDoc.orderBy(col("w1").asc, col("w2").asc, col("w3").asc)))
      .withColumn("n_trigrams", sum("m").over(wDoc).cast("long"))
      .withColumn("n_types", count(lit(1)).over(wDoc).cast("long"))
    val held = Caches.trackCached(dir, heldRaw)
    val pUni = (coalesce(col("cont3"), lit(0L)) + lit(1L)).cast("double") /
      (col("ctot") + col("v")).cast("double")
    val pMid = when(col("cont2d").isNull, col("p_uni")).otherwise(
      greatest(lit(4L) * coalesce(col("cont23"), lit(0L)) - lit(3L), lit(0L))
        .cast("double") / (lit(4L) * col("cont2d")).cast("double") +
      (lit(3L) * col("n1f2")).cast("double") /
        (lit(4L) * col("cont2d")).cast("double") * col("p_uni"))
    val pKn = when(col("ctx2").isNull, col("p_mid")).otherwise(
      greatest(lit(4L) * coalesce(col("c3"), lit(0L)) - lit(3L), lit(0L))
        .cast("double") / (lit(4L) * col("ctx2")).cast("double") +
      (lit(3L) * col("n1f12")).cast("double") /
        (lit(4L) * col("ctx2")).cast("double") * col("p_mid"))
    held.filter(col("rk") <= lit(LmDocTypeCap))
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(ctx2, Seq("w1", "w2"), "left")
      .join(cont23, Seq("w2", "w3"), "left")
      .join(cont2d, Seq("w2"), "left")
      .join(cont3, Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("p_uni", pUni)
      .withColumn("p_mid", pMid)
      .withColumn("p", pKn)
      .select(col("doc_id"), col("n_trigrams"), col("n_types"),
        struct(col("w1"), col("w2"), col("w3"), col("m"), col("p")).as("t"))
      .groupBy("doc_id").agg(
        max("n_trigrams").as("n_trigrams"), max("n_types").as("n_types"),
        sum(col("t.m")).cast("long").as("n_scored"),
        sort_array(collect_list(col("t"))).as("ts"))
      .select(col("doc_id"), col("n_trigrams"),
        round(expr(
          """-aggregate(ts, CAST(0.0 AS DOUBLE),
            |  (acc, x) -> acc + x.m * log2(x.p)) / n_scored""".stripMargin), 6)
          .as("xent3kn_bits"),
        greatest(col("n_types") - lit(LmDocTypeCap), lit(0L))
          .cast("long").as("n_types_dropped"))
      .orderBy("doc_id")
  }

  /** e34's perplexity axis: score an arbitrary (doc_id, text) frame
    * against the LANDED t59 c3 store — serve-from-landed, so the
    * composed verdict's gate doubles as a landed ≡ recomputed proof. */
  private[queries] def lm3LandedScoreOf(s: org.apache.spark.sql.SparkSession,
      dir: String, held: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lm3ScoreWith(s, dir,
      s.read.schema(lm3CountSchema).parquet(lm3CountsLandingFor(s, dir)), held)

  /** T59's landed trigram count store (t54's discipline on c3). */
  private val lm3Landing =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] val lm3CountSchema =
    "w1 STRING, w2 STRING, w3 STRING, c3 BIGINT"

  private[graft] def lm3CountsLandingFor(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val memo = lm3Landing.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) lm3Landing.remove(dir, memo)
    lm3Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_t59_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { lm3Landing.remove(d); () })
      Caches.trackPath(d, out)
      lm3C3Of(lmTrainDocs(s, d)).write.mode("overwrite").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** T60's pre-delta store: c3 over the training split MINUS the
    * refresh batch (the same % 9 == 4 arrival carve as t55/t51). */
  private val lm3Store =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def lm3StoreLandingFor(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val memo = lm3Store.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) lm3Store.remove(dir, memo)
    lm3Store.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_t60_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { lm3Store.remove(d); () })
      Caches.trackPath(d, out)
      lm3C3Of(lmTrainDocs(s, d).filter(!PipelineQueries.bpeIsDelta))
        .write.mode("overwrite").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** T57's post-forget bigram counts: the full train-split store
    * (pre-delta landing + delta — t55's post-refresh version)
    * Z-set-merged with the e24 deletion batch's OWN c2 aggregate at
    * negative sign; zero-count rows drop, so nothing of a
    * deleted-only bigram survives (the no-resurrection pin in
    * QualitySpec) and V re-derives over the reduced table exactly as
    * a retrain would find it. */
  private[graft] def lmForgottenCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val store = s.read.schema(lmCountSchema).parquet(lmStoreLandingFor(s, dir))
    val delta = lmC2Of(lmTrainDocs(s, dir).filter(PipelineQueries.bpeIsDelta))
    val deleted = lmC2Of(lmTrainDocs(s, dir)
        .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1))
      .select(col("lhs"), col("rhs"), (-col("c2")).as("c2"))
    store.unionByName(delta).unionByName(deleted)
      .groupBy("lhs", "rhs").agg(sum("c2").cast("long").as("c2"))
      .filter(col("c2") > 0)
  }

  /** T61's post-forget trigram counts — [[lmForgottenCounts]]'s shape
    * on the c3 store (same e24 carve, same zero-drop no-resurrection
    * contract). */
  private[graft] def lm3ForgottenCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val store = s.read.schema(lm3CountSchema).parquet(lm3StoreLandingFor(s, dir))
    val delta = lm3C3Of(lmTrainDocs(s, dir).filter(PipelineQueries.bpeIsDelta))
    val deleted = lm3C3Of(lmTrainDocs(s, dir)
        .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1))
      .select(col("w1"), col("w2"), col("w3"), (-col("c3")).as("c3"))
    store.unionByName(delta).unionByName(deleted)
      .groupBy("w1", "w2", "w3").agg(sum("c3").cast("long").as("c3"))
      .filter(col("c3") > 0)
  }

  /** t47's HTML fixture construction — the Fixture.scala discipline
    * applied to markup: each document's crawl payload is BUILT
    * deterministically from (doc_id, text) so the DuckDB twin can
    * replay it byte-for-byte, and every hostile branch of the
    * [[graft.functions.Html]] algebra is planted:
    *
    *  - TWO script spans with the `<title>` between them — a greedy
    *    `.*</script>` would swallow the title, so the hash gate pins
    *    non-greedy span removal;
    *  - script/style bodies full of `<`/`>` that would leak as text if
    *    tags were stripped before subtree removal (step-order pin);
    *  - a link-dense `<ul>` nav whose `<li>` blocks are pure anchor
    *    text (boilerplate-drop pin), one anchor carrying `&amp;` so
    *    entity decode inside anchor-length counting is exercised;
    *  - an `<h1>` with `&#39;` and DOUBLE-ENCODED `&amp;lt;`/`&amp;gt;`
    *    — decoding amp first would turn them into live `<`/`>` (entity-
    *    order pin);
    *  - a content `<p>` carrying the document's own text;
    *  - a mixed `<p>` where one anchor wraps nested `<b>` markup
    *    (counts ZERO anchor chars per the documented `[^<]*` contract)
    *    and one is plain;
    *  - every 7th doc ends mid-attribute in an UNTERMINATED `<span` —
    *    the truncated-crawl branch where the tagless fragment survives
    *    as visible text (degrade-don't-die pin);
    *  - (crawl-robustness branches, r15) a CONDITIONAL comment in the
    *    head whose body contains a block element and an entity — must
    *    vanish whole; a body comment containing markup and a bare `>`
    *    (the tail-leak pin); a `<![CDATA[…]]>` section with raw `<`/`&`;
    *    `<noscript>`/`<svg>`/`<template>` subtrees (fallback/vector/
    *    stamp content, dropped whole — the `<li>` inside the template
    *    must NOT become a block boundary); and an entity `<p>` planting
    *    `&nbsp;` (→ space via the NBSP-aware collapse), decimal
    *    `&#233;` and hex `&#xE9;`/uppercase-X forms, the single-pass
    *    pins `&#38;lt;`/`&#38;gt;` (must yield literal `&lt;`/`&gt;`,
    *    never doubly decode), and the stay-literal forms `&#xD800;`
    *    (surrogate) and `&#0;`.
    */
  private[graft] def htmlDoc(id: Column, text: Column): Column = {
    val i = id.cast("string")
    concat(
      lit("<html><head><script type=\"text/javascript\">var a = 1 < 2 && n > 0;</script><title>Doc "),
      i,
      lit("</title><script>track(\"&amp;page="), i,
      lit("\");</script><style>.nav > li { margin: 0 2px; }</style>" +
        "<!--[if lt IE 9]><p>Please upgrade &#38;lt; IE</p><![endif]--></head><body>" +
        "<ul><li><a href=\"/\">Home</a></li>" +
        "<li><a href=\"/about\">About &amp; contact</a></li>" +
        "<li><a href=\"/doc/"), i, lit("\">Doc "), i,
      lit(" details page</a></li></ul>" +
        "<!-- build 2026 <div class=\"cache\"> miss -->" +
        "<![CDATA[raw < angle & bytes]]>" +
        "<noscript><p>Enable scripts for charts</p></noscript>" +
        "<svg viewBox=\"0 0 8 8\"><path d=\"M0 0L8 8\"/><text>plot</text></svg>" +
        "<template><li>stamp &nbsp;row</li></template>" +
        "<h1>Report &#39;D"), i,
      lit("&#39; is &amp;lt;curated&amp;gt;</h1><p>"), text,
      lit("</p><p>Grade:&nbsp;&#233;lite tier &#xE9; marked &#38;lt;keep&#38;gt;" +
        " not &#xD800; nor &#0; here.</p>" +
        "<p>See <a href=\"/ref\">the <b>full</b> archive</a>" +
        " and the <a href=\"/faq\">FAQ</a> for details.</p>"),
      when(id % 7 === 0, lit("<div>archived copy <span data-q=\""))
        .otherwise(lit("</body></html>")))
  }

  /** SQL twin of [[htmlDoc]] — byte-identical construction. */
  private[queries] def htmlDocSql(id: String, text: String): String =
    s"""('<html><head><script type="text/javascript">var a = 1 < 2 && n > 0;</script><title>Doc '
       | || CAST($id AS VARCHAR)
       | || '</title><script>track("&amp;page=' || CAST($id AS VARCHAR)
       | || '");</script><style>.nav > li { margin: 0 2px; }</style>'
       | || '<!--[if lt IE 9]><p>Please upgrade &#38;lt; IE</p><![endif]--></head><body>'
       | || '<ul><li><a href="/">Home</a></li>'
       | || '<li><a href="/about">About &amp; contact</a></li>'
       | || '<li><a href="/doc/' || CAST($id AS VARCHAR) || '">Doc ' || CAST($id AS VARCHAR)
       | || ' details page</a></li></ul>'
       | || '<!-- build 2026 <div class="cache"> miss -->'
       | || '<![CDATA[raw < angle & bytes]]>'
       | || '<noscript><p>Enable scripts for charts</p></noscript>'
       | || '<svg viewBox="0 0 8 8"><path d="M0 0L8 8"/><text>plot</text></svg>'
       | || '<template><li>stamp &nbsp;row</li></template>'
       | || '<h1>Report &#39;D' || CAST($id AS VARCHAR)
       | || '&#39; is &amp;lt;curated&amp;gt;</h1><p>' || $text
       | || '</p><p>Grade:&nbsp;&#233;lite tier &#xE9; marked &#38;lt;keep&#38;gt;'
       | || ' not &#xD800; nor &#0; here.</p>'
       | || '<p>See <a href="/ref">the <b>full</b> archive</a>'
       | || ' and the <a href="/faq">FAQ</a> for details.</p>'
       | || CASE WHEN $id % 7 = 0 THEN '<div>archived copy <span data-q="'
       |         ELSE '</body></html>' END)""".stripMargin.replace("\n", " ")

  /** The t47 twin's extraction replay as a WITH-body (no leading WITH,
    * ends at the `f` CTE: doc_id, n_blocks, n_boiler, text) — shared
    * by t47's gate and t48's composed funnel so the two twins cannot
    * drift. Patterns come LITERALLY from [[graft.functions.Html]]'s
    * constants (RE2 accepts the inline (?s), the shared escape-form
    * whitespace class, and the entity alternation verbatim); the
    * single-pass entity decode replays as the same mark → split →
    * per-segment fold (the one-element `list_transform` plays the
    * Spark side's bind trick), value-identical on every branch —
    * named, decimal, hex, stay-literal, and the `&#38;lt;`
    * consume-each-amp-once pin. */
  private[queries] def htmlExtractCteSql: String = htmlExtractCteSqlFor("TRUE")

  /** The kept set under e24/e25's deletion carve (the complement of
    * [[DedupQueries.e24Deleted]]'s predicate), as oracle SQL. The
    * IS NULL arm mirrors the engine's anti-join semantics: a null-id
    * doc never equi-matches the deletion batch, so it is KEPT — a bare
    * NOT(...) would evaluate to NULL and drop it from the twin. */
  private[queries] val e24DeletedKeptPredSql =
    "(doc_id IS NULL OR NOT (doc_id % 10 <> 0 AND doc_id % 7 = 1))"

  /** t53/t54/t55's shared twin (and, with the e24 kept-pred carving
    * the training slice, t57's): the full LM recompute from raw text. */
  private def lmPerplexityOracleSqlFor(trainKeptPred: String): String =
    s"""WITH pr AS (SELECT doc_id, string_split(text, ' ') AS w
      |            FROM documents WHERE text IS NOT NULL),
      | bp AS (SELECT doc_id, w[CAST(i AS INT)] AS lhs, w[CAST(i AS INT) + 1] AS rhs
      |   FROM pr, unnest(range(1, len(w))) AS t(i)),
      | tr AS (SELECT lhs, rhs FROM bp
      |   WHERE doc_id % 5 <> 0 AND ($trainKeptPred)),
      | c2 AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c2 FROM tr GROUP BY 1, 2),
      | c1 AS (SELECT lhs, CAST(count(*) AS BIGINT) AS c1 FROM tr GROUP BY 1),
      | vv AS (SELECT CAST(count(DISTINCT rhs) AS BIGINT) AS v FROM tr),
      | hd AS (SELECT doc_id, lhs, rhs, CAST(count(*) AS BIGINT) AS m
      |   FROM bp WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
      | rkd AS (SELECT *,
      |     row_number() OVER (PARTITION BY doc_id ORDER BY lhs, rhs) AS rk,
      |     CAST(sum(m) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
      |     CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_types
      |   FROM hd),
      | j AS (SELECT h.doc_id, h.lhs, h.rhs, h.m, h.n_bigrams, h.n_types,
      |     COALESCE(c2.c2, 0) + 1 AS num, COALESCE(c1.c1, 0) + vv.v AS den
      |   FROM rkd h LEFT JOIN c2 USING (lhs, rhs) LEFT JOIN c1 USING (lhs)
      |   CROSS JOIN vv WHERE h.rk <= 65536),
      | a AS (SELECT doc_id, max(n_bigrams) AS n_bigrams,
      |     max(n_types) AS n_types, CAST(sum(m) AS BIGINT) AS n_scored,
      |     list(struct_pack(m := m, num := num, den := den)
      |       ORDER BY lhs, rhs) AS ts
      |   FROM j GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      | round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ts,
      |     x -> x.m * log2(x.num / CAST(x.den AS DOUBLE)))),
      |   (acc, x) -> acc + x) / n_scored, 6) AS xent_bits,
      | CAST(greatest(n_types - 65536, 0) AS BIGINT) AS n_types_dropped
      |FROM a ORDER BY doc_id""".stripMargin

  private lazy val lmPerplexityOracleSql: String = lmPerplexityOracleSqlFor("TRUE")

  /** t58/t59/t60's shared twin (and, with the e24 kept-pred, t61's):
    * the full interpolated-trigram recompute from raw text. Every
    * double is built the same way the engine builds it — single
    * BIGINT-pair divisions, CAST(0.5 AS DOUBLE)-style weights (a bare
    * 0.5 parses as DECIMAL in DuckDB; the cast pins the exact double
    * literal), left-associative term sum — so log2 + round(·, 6) is
    * the only transcendental step on each side. */
  private[queries] def lm3OracleSqlFor(trainKeptPred: String,
      scorePred: String = "doc_id % 5 = 0"): String =
    s"""WITH pr AS (SELECT doc_id, string_split(text, ' ') AS w
      |            FROM documents WHERE text IS NOT NULL),
      | tp AS (SELECT doc_id, w[CAST(i AS INT)] AS w1,
      |     w[CAST(i AS INT) + 1] AS w2, w[CAST(i AS INT) + 2] AS w3
      |   FROM pr, unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3),
      | tr AS (SELECT w1, w2, w3 FROM tp
      |   WHERE doc_id % 5 <> 0 AND ($trainKeptPred)),
      | c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
      |   FROM tr GROUP BY 1, 2, 3),
      | x2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS ctx2
      |   FROM tr GROUP BY 1, 2),
      | md AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS cmid
      |   FROM tr GROUP BY 1, 2),
      | x1 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c1ctx FROM tr GROUP BY 1),
      | un AS (SELECT w3, CAST(count(*) AS BIGINT) AS c1 FROM tr GROUP BY 1),
      | nv AS (SELECT CAST(count(*) AS BIGINT) AS nn,
      |     CAST(count(DISTINCT w3) AS BIGINT) AS v FROM tr),
      | hd AS (SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS m
      |   FROM tp WHERE $scorePred GROUP BY 1, 2, 3, 4),
      | rkd AS (SELECT *,
      |     row_number() OVER (PARTITION BY doc_id ORDER BY w1, w2, w3) AS rk,
      |     CAST(sum(m) OVER (PARTITION BY doc_id) AS BIGINT) AS n_trigrams,
      |     CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_types
      |   FROM hd),
      | j AS (SELECT h.doc_id, h.w1, h.w2, h.w3, h.m, h.n_trigrams, h.n_types,
      |     (CASE WHEN x2.ctx2 IS NULL THEN CAST(0.0 AS DOUBLE)
      |       ELSE CAST(0.5 AS DOUBLE) *
      |         (COALESCE(c3.c3, 0) / CAST(x2.ctx2 AS DOUBLE)) END
      |      + CASE WHEN x1.c1ctx IS NULL THEN CAST(0.0 AS DOUBLE)
      |       ELSE CAST(0.3 AS DOUBLE) *
      |         (COALESCE(md.cmid, 0) / CAST(x1.c1ctx AS DOUBLE)) END
      |      + CAST(0.2 AS DOUBLE) *
      |         ((COALESCE(un.c1, 0) + 1) / CAST(nv.nn + nv.v AS DOUBLE))) AS p
      |   FROM rkd h LEFT JOIN c3 USING (w1, w2, w3) LEFT JOIN x2 USING (w1, w2)
      |   LEFT JOIN md USING (w2, w3) LEFT JOIN x1 USING (w2)
      |   LEFT JOIN un USING (w3) CROSS JOIN nv WHERE h.rk <= 65536),
      | a AS (SELECT doc_id, max(n_trigrams) AS n_trigrams,
      |     max(n_types) AS n_types, CAST(sum(m) AS BIGINT) AS n_scored,
      |     list(struct_pack(m := m, p := p) ORDER BY w1, w2, w3) AS ts
      |   FROM j GROUP BY doc_id)
      |SELECT doc_id, n_trigrams,
      | round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ts,
      |     x -> x.m * log2(x.p))), (acc, x) -> acc + x) / n_scored, 6)
      |   AS xent3_bits,
      | CAST(greatest(n_types - 65536, 0) AS BIGINT) AS n_types_dropped
      |FROM a ORDER BY doc_id""".stripMargin

  private lazy val lm3OracleSql: String = lm3OracleSqlFor("TRUE")

  /** t62/t63's twin: the Kneser–Ney-style recompute from raw text —
    * [[lm3KnScoreWith]]'s formula CASE by CASE. D = 3/4 keeps every
    * ratio a BIGINT pair (greatest(4·c−3,0) / CAST(4·n AS DOUBLE))
    * divided once; term order matches the engine expression exactly so
    * log2 + round(·,6) is the only transcendental step on each side. */
  private def lm3KnOracleSqlFor(trainKeptPred: String,
      scorePred: String = "doc_id % 5 = 0"): String =
    s"""WITH pr AS (SELECT doc_id, string_split(text, ' ') AS w
      |            FROM documents WHERE text IS NOT NULL),
      | tp AS (SELECT doc_id, w[CAST(i AS INT)] AS w1,
      |     w[CAST(i AS INT) + 1] AS w2, w[CAST(i AS INT) + 2] AS w3
      |   FROM pr, unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3),
      | tr AS (SELECT w1, w2, w3 FROM tp
      |   WHERE doc_id % 5 <> 0 AND ($trainKeptPred)),
      | c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
      |   FROM tr GROUP BY 1, 2, 3),
      | x2 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS ctx2,
      |     CAST(count(*) AS BIGINT) AS n1f12 FROM c3 GROUP BY 1, 2),
      | k23 AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS cont23
      |   FROM c3 GROUP BY 1, 2),
      | k2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont2d,
      |     CAST(count(DISTINCT w3) AS BIGINT) AS n1f2 FROM c3 GROUP BY 1),
      | k3 AS (SELECT w3, CAST(count(DISTINCT w2) AS BIGINT) AS cont3
      |   FROM c3 GROUP BY 1),
      | nv AS (SELECT CAST(count(*) AS BIGINT) AS ctot,
      |     CAST(count(DISTINCT w3) AS BIGINT) AS v
      |   FROM (SELECT DISTINCT w2, w3 FROM c3)),
      | hd AS (SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS m
      |   FROM tp WHERE $scorePred GROUP BY 1, 2, 3, 4),
      | rkd AS (SELECT *,
      |     row_number() OVER (PARTITION BY doc_id ORDER BY w1, w2, w3) AS rk,
      |     CAST(sum(m) OVER (PARTITION BY doc_id) AS BIGINT) AS n_trigrams,
      |     CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_types
      |   FROM hd),
      | j0 AS (SELECT h.doc_id, h.w1, h.w2, h.w3, h.m, h.n_trigrams, h.n_types,
      |     x2.ctx2, x2.n1f12, c3.c3, k23.cont23, k2.cont2d, k2.n1f2,
      |     ((COALESCE(k3.cont3, 0) + 1) / CAST(nv.ctot + nv.v AS DOUBLE)) AS p_uni
      |   FROM rkd h LEFT JOIN c3 USING (w1, w2, w3) LEFT JOIN x2 USING (w1, w2)
      |   LEFT JOIN k23 USING (w2, w3) LEFT JOIN k2 USING (w2)
      |   LEFT JOIN k3 USING (w3) CROSS JOIN nv WHERE h.rk <= 65536),
      | j1 AS (SELECT *, CASE WHEN cont2d IS NULL THEN p_uni
      |     ELSE (greatest(4 * COALESCE(cont23, 0) - 3, 0)
      |         / CAST(4 * cont2d AS DOUBLE))
      |       + ((3 * n1f2) / CAST(4 * cont2d AS DOUBLE)) * p_uni END AS p_mid
      |   FROM j0),
      | j AS (SELECT doc_id, w1, w2, w3, m, n_trigrams, n_types,
      |     CASE WHEN ctx2 IS NULL THEN p_mid
      |     ELSE (greatest(4 * COALESCE(c3, 0) - 3, 0)
      |         / CAST(4 * ctx2 AS DOUBLE))
      |       + ((3 * n1f12) / CAST(4 * ctx2 AS DOUBLE)) * p_mid END AS p
      |   FROM j1),
      | a AS (SELECT doc_id, max(n_trigrams) AS n_trigrams,
      |     max(n_types) AS n_types, CAST(sum(m) AS BIGINT) AS n_scored,
      |     list(struct_pack(m := m, p := p) ORDER BY w1, w2, w3) AS ts
      |   FROM j GROUP BY doc_id)
      |SELECT doc_id, n_trigrams,
      | round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ts,
      |     x -> x.m * log2(x.p))), (acc, x) -> acc + x) / n_scored, 6)
      |   AS xent3kn_bits,
      | CAST(greatest(n_types - 65536, 0) AS BIGINT) AS n_types_dropped
      |FROM a ORDER BY doc_id""".stripMargin

  private lazy val lm3KnOracleSql: String = lm3KnOracleSqlFor("TRUE")

  /** The extraction lifecycle gates' twin: the full markup-algebra
    * replay over the served doc slice, projecting every landed column
    * ([[extractGateOf]]'s shape). */
  private def extractLifecycleSqlFor(pred: String): String =
    s"""WITH ${htmlExtractCteSqlFor(pred)}
       |SELECT doc_id, n_blocks, n_boiler,
       | CAST(length(text) AS BIGINT) AS n_chars, text,
       | coalesce(array_to_string(string_split(text, chr(10))[3:], chr(10)), '')
       |   AS content
       |FROM f ORDER BY doc_id""".stripMargin

  private[queries] def htmlExtractCteSqlFor(pred: String): String = {
    val H = graft.functions.Html
    val tagRe = s"</?(?:${H.BlockTags})(?: [^>]*)?/?>"
    // the in-lambda `let`: bind v once as a lambda variable
    def bindSql(v: String, name: String)(body: String): String =
      s"list_transform([$v], $name -> $body)[1]"
    // one marked segment's decode — the SQL twin of Html.decodeSeg
    val decSeg = {
      val named = "CASE gp WHEN 'lt' THEN '<' WHEN 'gt' THEN '>' " +
        "WHEN 'quot' THEN '\"' WHEN 'amp' THEN '&' WHEN 'nbsp' THEN chr(160) ELSE " +
        bindSql(
          "CASE WHEN lower(gp[2:2]) = 'x' THEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
            "list_transform(regexp_extract_all(lower(gp[3:]), '.'), " +
            "gh -> CAST(strpos('0123456789abcdef', gh) - 1 AS BIGINT))), (ga, gb) -> ga * 16 + gb) " +
            "ELSE TRY_CAST(gp[2:] AS BIGINT) END", "gn")(
          "CASE WHEN gn BETWEEN 1 AND 65535 AND NOT (gn BETWEEN 55296 AND 57343) " +
            "THEN chr(CAST(gn AS INT)) ELSE '&' || gp || ';' END") +
        " END"
      s"CASE WHEN strpos(gs, '${H.M2}') = 0 THEN '${H.M1}' || gs ELSE " +
        bindSql(s"split_part(gs, '${H.M2}', 1)", "gp")(
          s"($named) || substr(gs, length(gp) + 2)") + " END"
    }
    def dec(x: String) =
      bindSql(s"regexp_replace($x, '${H.EntityRe}', '${H.M1}" + "\\1" + s"${H.M2}', 'g')", "gm")(
        s"CASE WHEN strpos(gm, '${H.M1}') = 0 THEN gm ELSE " +
          bindSql(s"string_split(gm, '${H.M1}')", "gsegs")(
            s"gsegs[1] || list_reduce(list_prepend('', gsegs[2:]), (gacc, gs) -> gacc || ($decSeg))") +
          " END")
    s"""h AS (SELECT doc_id, ${htmlDocSql("doc_id", "text")} AS html
       |           FROM documents WHERE text IS NOT NULL AND ($pred)),
       | s1 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
       |     '(?s)<script[^>]*>.*?</script>', '', 'g'),
       |     '(?s)<style[^>]*>.*?</style>', '', 'g'),
       |     '(?s)<!--.*?-->', '', 'g'),
       |     '(?s)<!\\[CDATA\\[.*?\\]\\]>', '', 'g'),
       |     '(?s)<noscript[^>]*>.*?</noscript>|<svg[^>]*>.*?</svg>|<template[^>]*>.*?</template>', '', 'g') AS h FROM h),
       | b AS (SELECT doc_id,
       |     string_split(regexp_replace(h, '$tagRe', chr(10), 'g'), chr(10)) AS bl
       |   FROM s1),
       | z AS (SELECT doc_id, list_filter(list_transform(bl, x -> struct_pack(
       |       t := trim(regexp_replace(${dec("regexp_replace(x, '<[^>]*>', '', 'g')")},
       |         '${H.WsClass}', ' ', 'g')),
       |       al := length(trim(regexp_replace(
       |         ${dec("coalesce(array_to_string(regexp_extract_all(x, '<a[^>]*>([^<]*)</a>', 1), ''), '')")},
       |         '${H.WsClass}', ' ', 'g'))))),
       |     s -> length(s.t) > 0) AS ne FROM b),
       | k AS (SELECT doc_id, ne, list_filter(ne, s -> s.al * 2 <= length(s.t)) AS kept
       |   FROM z),
       | f AS (SELECT doc_id, CAST(len(ne) AS BIGINT) AS n_blocks,
       |     CAST(len(ne) - len(kept) AS BIGINT) AS n_boiler,
       |     coalesce(array_to_string(list_transform(kept, s -> s.t), chr(10)), '')
       |       AS text FROM k)""".stripMargin
  }

  /** T47's extracted text LANDED — the WET-file convention under the
    * repo's own landing discipline (x19/d24/d26's contract, applied to
    * the most re-read artifact in a real crawl pipeline): the corpus
    * extraction runs ONCE per (JVM, dir) and lands as parquet with an
    * explicit schema; every crawl-family consumer — t47's gate, t48's
    * funnel, e30's classifier — serves from the landed files instead
    * of re-running the markup algebra (pre-r15, t48's three aggregate
    * branches re-extracted the corpus three times — two redundant
    * corpus-scale extraction scans per funnel run at 100 TB). The
    * artifact carries both the extracted `text` and the
    * chrome-invariant `content` key (kept blocks 3+ — the per-page
    * title/h1 lines dropped) because every consumer of one also reads
    * the other. At 100 TB the landing partitions by crawl batch and
    * appends per ingest wave (e20's lambda shape); a re-extraction —
    * algebra change, re-crawl — is a new landing. Every consumer's
    * oracle still recomputes extraction from raw markup, so each gate
    * IS a landed ≡ recomputed proof (the d24 pattern). */
  private val t47Landing =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] val extractionSchema =
    "doc_id BIGINT, source STRING, n_blocks BIGINT, n_boiler BIGINT, " +
      "text STRING, content STRING"

  private[graft] def extractionLandingPathFor(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val memo = t47Landing.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) t47Landing.remove(dir, memo)
    t47Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_t47_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { t47Landing.remove(d); () })
      Caches.trackPath(d, out)
      landExtraction(Tables.documents(s, d), out)
      out.getAbsolutePath
    })
  }

  /** The staged extraction projection (t7/t47's discipline): each
    * lambda subtree — cleanedBlocks → kept → joined text — computes
    * once per page, pure codegen expressions end to end. Input carries
    * (doc_id, source, html); output is the WET schema's column set.
    * Shared by the batch landings and the streaming ingest leg
    * ([[graft.streaming.EventStream.extractArrivals]]) so the two
    * engines' extraction cannot drift. */
  private[graft] def extractStaged(pages: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val H = graft.functions.Html
    pages
      .filter(col("html").isNotNull)
      .select(col("doc_id"), col("source"),
        H.cleanedBlocks(col("html")).as("_ne"))
      .select(col("doc_id"), col("source"), col("_ne"),
        H.keptBlocks(col("_ne")).as("_kept"))
      .select(col("doc_id"), col("source"), col("_ne"), col("_kept"),
        H.joinedText(col("_kept")).as("_txt"))
      .select(col("doc_id"), col("source"),
        size(col("_ne")).cast("long").as("n_blocks"),
        (size(col("_ne")) - size(col("_kept"))).cast("long").as("n_boiler"),
        col("_txt").as("text"),
        array_join(slice(split(col("_txt"), "\n"), 3, Int.MaxValue), "\n")
          .as("content"))
  }

  /** One extraction pass over `docs`, landed at `out` with the WET
    * schema — shared by the full t47 landing and the e31 lifecycle's
    * delta landing (identical algebra, different doc slices). */
  private def landExtraction(docs: org.apache.spark.sql.DataFrame,
      out: java.io.File): Unit =
    extractStaged(docs
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          htmlDoc(col("doc_id"), col("text")).as("html")))
      .write.mode("overwrite").parquet(out.getAbsolutePath)

  /** The landed extraction, read back with the explicit writer schema
    * (an empty corpus lands fileless — the s15 trap). */
  private[graft] def extractionLandingFor(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    landedExtraction(s, extractionLandingPathFor(s, dir))

  private def landedExtraction(s: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame =
    s.read.schema(extractionSchema).parquet(path)

  /** E31's arrival carve: the crawl wave that appends to the extraction
    * landing (disjoint from d34's % 10 == 0 admission wave so the two
    * lifecycle fixtures never alias). Null-id docs go to the BASE
    * (coalesce — a bare `% 10 === 3` is null-valued on a null id, so
    * both `f` and `!f` would drop the doc and base ∪ delta would
    * silently lose it vs the full-corpus oracle). */
  private[graft] def e31IsDelta: Column =
    coalesce(col("doc_id") % 10 === 3, lit(false))

  /** E31's split landings — the WET artifact's APPEND leg: the
    * pre-wave corpus extraction lands first as the immutable history
    * (base/), and the arriving crawl wave extracts ONCE at admission
    * and lands as separate delta files (delta/) — base files are never
    * read, rewritten, or re-extracted by an append (the e20/e22 lambda
    * shape on the extraction artifact; HtmlSpec pins base-file
    * stability across the lifecycle legs). At 100 TB an ingest wave
    * costs one wave-sized extraction pass + one parquet append,
    * regardless of history size. */
  private val e31Landing =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def e31LandingFor(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val memo = e31Landing.get(dir)
    if (memo != null && !(new java.io.File(memo._1).exists() &&
        new java.io.File(memo._2).exists()))
      e31Landing.remove(dir, memo)
    e31Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e31b_${pid}_$tag")
      val delta = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e31d_${pid}_$tag")
      Caches.track(d)(() => { e31Landing.remove(d); () })
      Caches.trackPath(d, base)
      Caches.trackPath(d, delta)
      // the base is history that was ALREADY extracted when the wave
      // arrives: it derives from the landed full extraction by a
      // parquet filter-copy (pure file work — no markup algebra); the
      // ONLY extraction the append leg pays is the wave itself
      extractionLandingFor(s, d).filter(!e31IsDelta)
        .write.mode("overwrite").parquet(base.getAbsolutePath)
      landExtraction(Tables.documents(s, d).filter(e31IsDelta), delta)
      (base.getAbsolutePath, delta.getAbsolutePath)
    })
  }

  /** E33's compacted landing: (base ∪ delta) ∖ deleted folded into ONE
    * parquet table — pure index-file work (no document is re-extracted;
    * the inputs are the e31 landings and the e24 deletion carve), the
    * cadence step that reclaims e32's serve-time tombstone anti-join
    * and e31's second file set. */
  private val e33Compacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def e33CompactFor(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val memo = e33Compacted.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) e33Compacted.remove(dir, memo)
    e33Compacted.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_e33_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { e33Compacted.remove(d); () })
      Caches.trackPath(d, out)
      val (basePath, deltaPath) = e31LandingFor(s, d)
      landedExtraction(s, basePath).unionByName(landedExtraction(s, deltaPath))
        .join(broadcast(DedupQueries.e24Deleted(Tables.documents(s, d))),
          Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** The lifecycle gates' shared projection: every column the landing
    * carries, character-exact (n_chars is recomputed from the served
    * text so a row whose text and length disagree cannot slip through;
    * `content` rides whole because compaction could corrupt it
    * independently of `text`). */
  private def extractGateOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("n_blocks"), col("n_boiler"),
        length(col("text")).cast("long").as("n_chars"), col("text"), col("content"))
      .orderBy("doc_id")

  private def countIn(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isin(words: _*)))

  // Marker-word sets for the language-ID heuristic (n-gram/stopword
  // scoring — the classic cheap langid approach).
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est"))

  val queries: Map[String, QueryFn] = Map(
    // ---- T36: equi-depth decile binning — the complement of t31's
    // fixed-WIDTH histogram: bins hold equal COUNTS, edges float. The
    // textbook formulation (`ntile(10) OVER (PARTITION BY source ...)`)
    // funnels each source through ONE task — a skew trap when one
    // source dominates a 100 TB corpus. Here the per-source rank comes
    // from [[graft.operators.GlobalOrder.withPositionWithin]] (range
    // shards rank in parallel; only per-shard counts cross a broadcast)
    // and the bin is integer arithmetic on (rank, group size), so the
    // largest source spreads over every executor. BIGINT throughout;
    // (n_chars, doc_id) ordering makes ranks — hence bins — total. ----
    "t36_equidepth_bins" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val ranked = graft.operators.GlobalOrder.withPositionWithin(
        d, "rk", Seq("source"),
        col("n_chars").asc_nulls_last, col("doc_id").asc_nulls_last)
      val sizes = d.groupBy("source").agg(count(lit(1)).cast("long").as("n_src"))
      // <=> attach — a USING join drops the null-source stratum
      ranked.join(broadcast(sizes.withColumnRenamed("source", "_src")),
          col("_src") <=> col("source")).drop("_src")
        .withColumn("bin", expr("(CAST(rk - 1 AS BIGINT) * 10) div n_src"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).cast("long").as("n"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("source", "bin")
    }),

    // ---- token counting: whitespace + regex (BPE-ish word/punct split) ----
    "t3_token_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(toks(col("text"))).as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_re_tokens"),
          length(col("text")).as("n_chars_computed"))
        .orderBy("doc_id")),

    // ---- quality scoring: length / punctuation / stopword ratios ----
    "t2_quality_score" -> ((s, dir) => {
      val t = toks(col("text"))
      // nullif the denominators: a zero-length doc (fixtures never
      // carry one; real corpora do) gets NULL ratios instead of an
      // ANSI DIVIDE_BY_ZERO that kills the whole scoring job
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(col("text")).as("char_len"),
          size(t).as("n_tokens"),
          round(length(regexp_replace(col("text"), "[^.,!?;:]", "")) * lit(1.0) /
            nullif(length(col("text")), lit(0)), 4).as("punct_ratio"),
          round(countIn(t, stopwords) * lit(1.0) / nullif(size(t), lit(0)), 4)
            .as("stopword_ratio"),
          round(length(regexp_replace(col("text"), "\\s", "")) * lit(1.0) /
            nullif(size(t), lit(0)), 4).as("avg_token_len"))
        .orderBy("doc_id")
    }),

    // ---- language-ID heuristic: marker-word scores, argmax with fixed
    // priority order, 'und' when nothing matches ----
    "t1_lang_id" -> ((s, dir) => {
      val t = toks(lower(col("text")))
      val scores = langMarkers.map { case (lang, ws) => lang -> countIn(t, ws) }
      val best = greatest(scores.map(_._2): _*)
      // Earlier languages win ties (en > es > de > fr), matching the
      // oracle's CASE chain.
      val pred2 = scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
        when(sc === best && best > 0, lit(lang)).otherwise(acc)
      }
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("labeled_lang"), pred2.as("pred_lang"))
        .orderBy("doc_id")
    }),

    // ---- T47: HTML → text extraction (graft.functions.Html) — the
    // trafilatura/WET-class first stage of a pretraining pipeline, run
    // over byte-real constructed crawl payloads (htmlDoc plants every
    // hostile branch). The extraction LANDS once per (JVM, dir) as the
    // WET artifact ([[extractionLandingPathFor]]) and this gate — like
    // every crawl-family consumer — SERVES from the landed files; the
    // twin replays construction AND the extraction algebra from raw
    // markup, so the hash gate proves landed ≡ recomputed character-
    // for-character (the d24 landed-index pattern). The build itself
    // is pure native string/regex expressions — codegen'd, no UDF, no
    // shuffle: a 100 TB crawl shard is a mapper. ----
    "t47_html_extract" -> ((s, dir) =>
      extractionLandingFor(s, dir)
        .select(col("doc_id"), col("n_blocks"), col("n_boiler"),
          length(col("text")).cast("long").as("n_chars"), col("text"))
        .orderBy("doc_id")),

    // ---- T48: the composed CRAWL-TO-CORPUS funnel — markup in,
    // curated text out: t47's extraction feeds e21's route → dedup →
    // budget shape. Stages: (1) serve the LANDED extraction (the WET
    // artifact — pre-r15 this funnel re-ran the markup algebra once
    // per aggregate branch, three corpus-scale extraction scans);
    // (2) chrome-invariant CONTENT key — kept blocks 3+ (the per-page
    // title/h1 lines drop), so two crawls of the same content that
    // differ only in chrome dedup together (landed as `content`);
    // (3) quality gate on extracted content length; (4) route by the
    // TRAINED trigram profile — t39's algebra, t49-validated on real
    // public text — via the per-document verdict frame
    // (PipelineQueries.langVerdictsAll, the memoized offline-train/
    // online-apply composition e21 established; pre-r15 this funnel
    // routed by t1's marker-word heuristic, the weakest classifier in
    // the repo, while the trained profile sat unused beside it);
    // (5) exact content dedup (md5, keep smallest doc_id); (6) per-
    // language 40% token budget via the skew-proof grouped prefix sum
    // (t37/e21's operator). Scale: the landing scan is a mapper,
    // routing one equi-join against the cached verdict frame (itself
    // one broadcast-profile join over the corpus), dedup one hash
    // shuffle, the budget one range-sharded prefix sum. ----
    "t48_crawl_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val content = extractionLandingFor(s, dir)
        .select(col("doc_id"), col("source"), col("content").as("c"))
      val q = content.filter(length(col("c")) >= 300)
        .withColumn("toks", size(split(col("c"), " ")).cast("long"))
      // a page too short/gram-less for a verdict still routes ('und'),
      // mirroring the twin's COALESCE over the left join. The routed
      // frame is CHECKPOINTED once (e15's featurization discipline):
      // the final report joins three aggregate branches whose lineages
      // would otherwise each recompute the landing scan + verdict
      // join + tokenization — the 3×-recompute shape the r14 verdict
      // flagged, now cut at the stage boundary.
      val routed = Caches.checkpointed(dir, q.join(
          PipelineQueries.langVerdictsAll(s, dir)
            .select(col("doc_id"), col("pred_lang")),
          Seq("doc_id"), "left")
        .withColumn("pred_lang", coalesce(col("pred_lang"), lit("und"))))
      val w = Window.partitionBy(md5(col("c"))).orderBy("doc_id")
      val canon = routed.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      // DOMAIN routing (r15 verdict gap: the funnel could route by
      // language but not by source site): each canon doc parses its
      // crawl URL and at most WebQueries.DomainCapDocs docs per
      // registrable domain survive (toks desc, doc_id — the C4/
      // RefinedWeb per-domain cap, a domain-partitioned window, no
      // global sort). The language budget then applies to the capped
      // set, and the report carries the per-language cap losses.
      // project the page content away FIRST: the domain window
      // shuffles its input, and canon's `c` column is the full
      // extracted text — KBs per row the cap never reads
      val wd = Window.partitionBy("reg_domain")
        .orderBy(col("toks").desc, col("doc_id"))
      val capped = graft.functions.Url.withParsed(
          canon.select(col("doc_id"), col("source"), col("pred_lang"), col("toks"))
            .withColumn("url",
              graft.functions.Url.urlOf(col("doc_id"), col("source"))))
        .withColumn("rnd", row_number().over(wd))
        .filter(col("rnd") <= lit(WebQueries.DomainCapDocs))
        .select("doc_id", "pred_lang", "toks")
      val ordered = graft.operators.GlobalOrder.withRunningTotalWithin(
        capped, "cum", Seq("pred_lang"),
        col("toks"), col("toks").desc, col("doc_id"))
      // ONE aggregate carries both the token budget and the post-cap
      // doc count, and the kept join's broadcast carries BOTH onward,
      // so the prefix-sum subtree (this query's expensive shape) is
      // evaluated exactly twice per run — budgets and kept — the same
      // count the pre-cap funnel had; n_domain_capped then derives
      // from the kept aggregate with no third consumption
      val budgets = ordered.groupBy("pred_lang")
        .agg(expr("CAST(sum(toks) * 4 div 10 AS BIGINT)").as("budget"),
          count(lit(1)).as("np"))
      val kept = ordered.join(broadcast(budgets), Seq("pred_lang"))
        .filter(col("cum") < col("budget"))
      routed.groupBy("pred_lang").agg(count(lit(1)).as("n_routed"))
        .join(canon.groupBy("pred_lang")
          .agg(count(lit(1)).as("n_dedup"), sum("toks").as("dedup_tokens")),
          Seq("pred_lang"))
        .join(kept.groupBy("pred_lang")
          .agg(max("budget").as("budget"), count(lit(1)).as("n_kept"),
            sum("toks").as("kept_tokens"), max("np").as("np")),
          Seq("pred_lang"))
        .withColumn("n_domain_capped", col("n_dedup") - col("np"))
        .drop("np")
        .orderBy("pred_lang")
    }),

    // ---- E31: extraction-landing APPEND — the WET artifact's ingest
    // leg (every other index family already has one: e20 bands, e22
    // grams, e27 winnow, x20 IVF): the pre-wave corpus lands as the
    // immutable base, the arriving crawl wave (doc_id % 10 == 3)
    // extracts ONCE at admission and lands as delta files, and serving
    // reads base ∪ delta — history is NEVER re-extracted (the plan is
    // two parquet scans; HtmlSpec pins base-file stability and the
    // absence of the markup algebra from the serve plan). The oracle
    // recomputes the FULL corpus extraction from raw markup, so the
    // hash gate proves appended-landing ≡ from-scratch extraction over
    // corpus ∪ wave, character-for-character on every column. ----
    "e31_extract_append" -> ((s, dir) => {
      val (basePath, deltaPath) = e31LandingFor(s, dir)
      extractGateOf(landedExtraction(s, basePath)
        .unionByName(landedExtraction(s, deltaPath)))
    }),

    // ---- E32: right-to-be-forgotten on the extraction landing —
    // e25/e28's cap-then-delete discipline has no analog here (no
    // build-time df cap: extraction is per-document pure), so forget
    // is the clean case: the deletion batch (e24's corpus carve)
    // tombstones documents out of the landed WET files at serve time
    // via a broadcast anti-join — base files never rewritten. The
    // oracle recomputes extraction over corpus ∖ deleted, so the gate
    // proves a forgotten page's text is gone from the served artifact
    // and every surviving page is byte-identical. ----
    "e32_extract_forget" -> ((s, dir) =>
      extractGateOf(extractionLandingFor(s, dir)
        .join(broadcast(DedupQueries.e24Deleted(Tables.documents(s, dir))),
          Seq("doc_id"), "left_anti"))),

    // ---- E33: extraction-landing COMPACTION — the cadence step that
    // folds (base ∪ delta) ∖ deleted into ONE parquet table
    // ([[e33CompactFor]] — pure index-file work, no re-extraction),
    // reclaiming e32's per-serve tombstone anti-join and e31's second
    // file set. The gate serves from the compacted table ALONE against
    // the same corpus-∖-deleted recompute oracle as e32, so hash
    // equality proves compaction lost and invented nothing. ----
    "e33_extract_compact" -> ((s, dir) =>
      extractGateOf(landedExtraction(s, e33CompactFor(s, dir)))),

    // ---- T53: bigram-LM perplexity scoring — the CCNet/KenLM-class
    // quality signal the heuristic gates (t7) and importance weights
    // (t46) don't give: train Laplace-smoothed word-bigram counts on
    // the corpus's training split (doc_id % 5 != 0 — t39's split
    // convention), then score each held-out document's cross-entropy
    // in bits per bigram; junk/shuffled text scores high, fluent
    // target-like text low (QualitySpec plants both). Cross-engine
    // DOUBLE contract is t18's: the per-doc sum folds SEQUENTIALLY
    // over the (lhs, rhs)-sorted term list so both engines add the
    // identical IEEE terms in the identical order, each term's ratio
    // is built from exact BIGINTs, and log2 rides round(·, 6).
    // Scale: the count tables are BIGRAM-VOCABULARY-sized (Heaps-law
    // sublinear — the t23 trick), the scoring pass is two hash joins
    // on (lhs[, rhs]) + one per-doc local fold, and V attaches by
    // broadcast; at 100 TB the counts are the landed artifact (t43's
    // additive-refresh shape applies verbatim). ----
    "t53_lm_perplexity" -> ((s, dir) =>
      lmScoreWith(s, dir, lmTrainCounts(s, dir))),

    // ---- T54: perplexity scoring from the LANDED count store — the
    // train-once/serve-many leg (t50's discipline on the LM): the c2
    // bigram table is the model's ONE sufficient statistic (c1 = Σ c2
    // by lhs and the smoothing V = |distinct rhs| both derive from it
    // exactly), so it lands alone and every serve reads landed rows +
    // two vocab-sized derivations — no document is ever re-paired.
    // Oracle is t53's full recompute: landed ≡ recomputed. ----
    "t54_lm_landed_score" -> ((s, dir) =>
      lmScoreWith(s, dir, lmModelOf(
        s.read.schema(lmCountSchema).parquet(lmCountsLandingFor(s, dir))))),

    // ---- T55: LM model REFRESH from the count store — t43/t51's
    // additive contract on the bigram table: the landed pre-delta
    // store absorbs the arrival batch's OWN aggregate (bigram counts
    // are additive over disjoint doc sets; c1 and V re-derive from the
    // merged table, so the non-additive-looking distinct count needs
    // no sketch — the store IS the distinct-rhs set), and scoring from
    // the merged model must hash-equal t53's full retrain. History is
    // never re-paired: refresh is O(delta + store). ----
    "t55_lm_refresh" -> ((s, dir) => {
      val store = s.read.schema(lmCountSchema).parquet(lmStoreLandingFor(s, dir))
      val delta = lmC2Of(lmTrainDocs(s, dir).filter(PipelineQueries.bpeIsDelta))
      val merged = store.unionByName(delta)
        .groupBy("lhs", "rhs").agg(sum("c2").cast("long").as("c2"))
      lmScoreWith(s, dir, lmModelOf(merged))
    }),

    // ---- T57: LM model FORGET from the count store — e17's signed
    // Z-set merge on the bigram table (t56's discipline on the LM,
    // closing the last lifecycle asymmetry: every index family AND
    // both model stores now have a forget leg). The full train-split
    // store (pre-delta landing + the delta batch — t55's post-refresh
    // version) absorbs the DELETED training docs' OWN c2 aggregate
    // with negative sign; zero-count rows drop, so a bigram that
    // lived only in deleted docs vanishes (no resurrection) and V =
    // |distinct rhs| re-derives over the reduced table exactly as a
    // retrain would find it. The erasure request is the e24 carve
    // (shared with every other forget leg). Oracle is the full
    // recompute with the kept training slice: forget-from-store ≡
    // retrain on train ∖ deleted, O(deleted + store) — history is
    // never re-paired. ----
    "t57_lm_forget" -> ((s, dir) =>
      lmScoreWith(s, dir, lmModelOf(lmForgottenCounts(s, dir)))),

    // ---- T58: interpolated TRIGRAM perplexity — the step from t53's
    // bigram-Laplace surrogate toward the CCNet/KenLM-class signal: a
    // Jelinek–Mercer trigram LM (λ = 0.5/0.3/0.2 through trigram →
    // middle bigram → Laplace-floored unigram) scoring each held-out
    // document's cross-entropy in bits per trigram. The whole model
    // derives from ONE additive c3 table ([[lm3C3Of]]), so the t54/
    // t55/t57 store lifecycle applies verbatim (t59/t60/t61). See
    // [[lm3ScoreWith]] for the cross-engine double contract. ----
    "t58_lm3_perplexity" -> ((s, dir) =>
      lm3ScoreWith(s, dir, lm3C3Of(lmTrainDocs(s, dir)))),

    // ---- T59: trigram scoring from the LANDED count store — the c3
    // table lands once per (JVM, dir) and every serve re-derives the
    // four context tables + (N, V) from landed rows (vocabulary-sized
    // aggregates — no document re-paired). Oracle is t58's full
    // recompute: landed ≡ recomputed. ----
    "t59_lm3_landed_score" -> ((s, dir) =>
      lm3ScoreWith(s, dir,
        s.read.schema(lm3CountSchema).parquet(lm3CountsLandingFor(s, dir)))),

    // ---- T60: trigram model REFRESH from the count store — t55's
    // additive contract on c3: the pre-delta store absorbs the
    // arrival batch's OWN aggregate, every derived table re-derives,
    // and scoring must hash-equal t58's full retrain. O(delta +
    // store); history never re-paired. ----
    "t60_lm3_refresh" -> ((s, dir) => {
      val store = s.read.schema(lm3CountSchema).parquet(lm3StoreLandingFor(s, dir))
      val delta = lm3C3Of(lmTrainDocs(s, dir).filter(PipelineQueries.bpeIsDelta))
      val merged = store.unionByName(delta)
        .groupBy("w1", "w2", "w3").agg(sum("c3").cast("long").as("c3"))
      lm3ScoreWith(s, dir, merged)
    }),

    // ---- T61: trigram model FORGET — t57's signed Z-set merge on c3
    // (the e24 erasure carve): subtract the deleted training docs'
    // own trigram aggregate, drop zero rows, rescore. Oracle is the
    // full recompute on train ∖ deleted. ----
    "t61_lm3_forget" -> ((s, dir) =>
      lm3ScoreWith(s, dir, lm3ForgottenCounts(s, dir))),

    // ---- T62: KNESER–NEY-style trigram perplexity — t58's backoff
    // upgraded to absolute discounting with continuation counts, all
    // derived from the SAME single additive c3 statistic (see
    // [[lm3KnScoreWith]]), so nothing about the store lifecycle
    // changes. QualitySpec pins that it separates fluent from
    // scrambled/OOV text at least as well as t58. ----
    "t62_lm3kn_perplexity" -> ((s, dir) =>
      lm3KnScoreWith(s, dir, lm3C3Of(lmTrainDocs(s, dir)))),

    // ---- T63: KN scoring served from the LANDED c3 store — because
    // the continuation counts are derivations of c3, t59's landed leg
    // carries over verbatim; the oracle recomputes from raw text, so
    // the gate is the landed ≡ recomputed proof for the KN model. ----
    "t63_lm3kn_landed" -> ((s, dir) =>
      lm3KnScoreWith(s, dir,
        s.read.schema(lm3CountSchema).parquet(lm3CountsLandingFor(s, dir)))),

    // ---- T64/T65: KN REFRESH and FORGET — t60/t61's store algebra
    // verbatim (the additive merge and the signed Z-set merge act on
    // c3 itself; the KN statistics re-derive from the merged rows), so
    // the KN model completes the full count-store lifecycle with zero
    // new store machinery. Oracles are the KN recompute over the
    // corresponding doc slices. ----
    "t64_lm3kn_refresh" -> ((s, dir) => {
      val store = s.read.schema(lm3CountSchema).parquet(lm3StoreLandingFor(s, dir))
      val delta = lm3C3Of(lmTrainDocs(s, dir).filter(PipelineQueries.bpeIsDelta))
      val merged = store.unionByName(delta)
        .groupBy("w1", "w2", "w3").agg(sum("c3").cast("long").as("c3"))
      lm3KnScoreWith(s, dir, merged)
    }),

    "t65_lm3kn_forget" -> ((s, dir) =>
      lm3KnScoreWith(s, dir, lm3ForgottenCounts(s, dir))),

    // ---- document fingerprinting: md5 over normalized text ----
    "t4_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(lower(Cleaning.cleanInvisibleChars(col("text")))).as("fingerprint"))
        .orderBy("doc_id")),

    // ---- exact dedup: hash-groupBy on normalized fingerprint ----
    "d1_dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(lower(Cleaning.cleanInvisibleChars(col("text")))).as("fp"))
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_doc_id")),

    // ---- rolling-hash fingerprinting: whole-doc polynomial hash plus
    // the minimum 8-gram window hash (winnowing-style selection) — all
    // modular arithmetic bounded under 2^63 so both engines compute the
    // identical BIGINT values (DuckDB errors on overflow, it doesn't
    // wrap). Runs as the native codegen'd GraftRollingHash expression —
    // one O(L) rolling pass per document (graft.plans.GraftRollingHash;
    // the round-4 substr(text,i,1) formulation was O(L²) per doc and the
    // interpreted higher-order-function rewrite still allocated a struct
    // per code point). The expression stages in its own projection so
    // the two-field split reads the materialized array. ----
    // ---- T45: winnowing fingerprint selection (Schleimer–Wilkerson–
    // Aiken's MOSS algorithm): per document, roll every K-gram hash in
    // one O(L) codegen pass (graft_gram_hashes), then select in each
    // window of W consecutive hashes the MINIMUM, rightmost on ties —
    // the selection rule with the guarantee t5's mod-p sampling lacks:
    // any substring of length ≥ K+W−1 shared by two documents shares a
    // selected fingerprint (no gap of W consecutive grams goes
    // unsampled), at expected density 2/(W+1). The min AND the
    // rightmost-tie rule ride one integer encoding
    // e = h·2²² + (2²²−1−pos), so a single ROWS-frame window-min is
    // the entire selection and both engines fold it identically
    // (h < 2³¹ and pos < 2²² keep e < 2⁵³ — exact in any engine).
    // Work is O(doc), never O(corpus): the window partitions by
    // doc_id, so documents parallelize freely and a 100 TB corpus is
    // a mapper plus per-doc local sorts. ----
    "t45_winnowing" -> ((s, dir) =>
      winnowedFingerprints(Tables.documents(s, dir))
        .orderBy("doc_id", "fp_pos", "fp_h")),

    "t5_rolling_hash" -> ((s, dir) => {
      graft.plans.GraftExtensions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"), expr("graft_rolling_hash(text)").as("_rh"))
        .select(col("doc_id"),
          expr("_rh[0]").as("doc_hash"),
          expr("_rh[1]").as("min_gram_hash"))
        .orderBy("doc_id")
    }),

    // ---- T7: composite quality-rule filter — the published
    // Gopher/C4-style heuristic gate a corpus pipeline applies before
    // training: word-count bounds, mean-word-length bounds, lexical
    // diversity, and stopword presence, with the FIRST failed rule as
    // the drop reason. Pure per-row Column expressions (codegen'd,
    // embarrassingly parallel — the 100 TB shape is a mapper). The
    // bounds compare the ROUNDED statistics so both engines take the
    // same branch at rule boundaries. ----
    "t7_quality_rules" -> ((s, dir) => {
      // Tokens materialize once per row (the lower+split pass), then the
      // four statistics read the array attribute, then the verdict reads
      // the stat attributes — without the staged projections each
      // derived column re-ran its own split and the verdict re-ran every
      // aggregate (codegen CSE does not reliably merge lambda-bearing
      // subtrees, and CollapseProject keeps multiply-referenced
      // non-cheap producers staged).
      val t = col("_t")
      val nW = size(t)
      val verdict = when(col("n_words") < 30 || col("n_words") > 90, lit("word_count"))
        .when(col("mean_word_len") < 3.0 || col("mean_word_len") > 8.0, lit("mean_word_len"))
        .when(col("distinct_ratio") < 0.4, lit("low_diversity"))
        .when(col("n_stopwords") === 0, lit("no_stopwords"))
        .otherwise(lit("ok"))
      Tables.documents(s, dir)
        .select(col("doc_id"), toks(lower(col("text"))).as("_t"))
        .select(col("doc_id"), nW.as("n_words"),
          round(aggregate(transform(t, w => length(w).cast("long")), lit(0L),
            (a, x) => a + x) * lit(1.0) / nW, 4).as("mean_word_len"),
          round(size(array_distinct(t)) * lit(1.0) / nW, 4).as("distinct_ratio"),
          countIn(t, stopwords).as("n_stopwords"))
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("distinct_ratio"), col("n_stopwords"),
          verdict.as("drop_reason"), (verdict === "ok").as("keep"))
        .orderBy("doc_id")
    }),

    // ---- T8: repetition scoring — duplicate-bigram fraction and top-
    // bigram share per document (the Gopher repetition signals that
    // catch boilerplate/looping text). Per-document counters need no
    // cross-row state, so this is a pure MAPPER: the native codegen'd
    // graft_bigram_stats expression folds each doc's adjacent pairs
    // through one transient hash map (the earlier explode + two hash
    // groupBys shipped every token-pair row through two aggregation
    // stages for the same three numbers — r4's 1.2 s → ~0.3 s, and no
    // shuffle at any scale). Docs with fewer than two tokens have no
    // bigrams and drop, exactly as they produced no explode rows. ----
    "t8_repetition" -> ((s, dir) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val stats = ColumnBridge.column(graft.plans.GraftBigramStats(
        ColumnBridge.expression(split(col("text"), " "))))
      Tables.documents(s, dir)
        .select(col("doc_id"), stats.as("_bs"))
        .select(col("doc_id"), expr("_bs[0]").as("n_bigrams"),
          expr("_bs[1]").as("n_distinct"), expr("_bs[2]").as("top_count"))
        .filter(col("n_bigrams") > 0)
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
          round(col("top_count") * lit(1.0) / col("n_bigrams"), 4).as("top_share"),
          round(lit(1.0) - col("n_distinct") * lit(1.0) / col("n_bigrams"), 4)
            .as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // ---- T66: repetition CHAR coverage — the MassiveText/Gopher
    // filter family t8 only approximates at the count level: per doc,
    // the fraction of characters claimed by the single most frequent
    // 3-gram (count × gram chars / doc chars, overlap-naive as
    // published) and the fraction of characters covered by DUPLICATED
    // bigrams (distinct covered token positions → token chars — d10's
    // coverage trick turned intra-document). One n per family here;
    // the other window sizes in the published filters are the same
    // plan with a different gram width. All ratios are BIGINT with one
    // division + round. Scale: every stage keys on doc_id (gram
    // counts, the top window, position coverage) — one doc-keyed
    // exchange family, no corpus-wide state. Null-doc_id rows lump
    // into one pseudo-doc in BOTH engines (null-safe attaches), the
    // group-key convention of the edge sweep. ----
    "t66_repetition_chars" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // fan-out before the token/gram explodes: every downstream stage
      // keys on doc_id, so the one doc-keyed exchange moves BEFORE the
      // explosion and the gram passes parallelize (r17, guide §2.5)
      val docs = graft.operators.ScanFan.byKey(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w")), col("doc_id"))
      val toks = Caches.trackCached(dir, docs
        .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "t"))))
      val tot = toks.groupBy("doc_id").agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(length(col("t"))).cast("long").as("n_chars"))
      def grams(n: Int) = docs.filter(size(col("w")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(w) - $n), i -> " +
            s"struct(i AS p, concat_ws('_', slice(w, i + 1, $n)) AS g))")).as("x"))
        .select(col("doc_id"), col("x.p").as("p"), col("x.g").as("g"))
      val wTop = Window.partitionBy("doc_id")
        .orderBy(col("c").desc, length(col("g")).desc, col("g").desc)
      val top3 = grams(3).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
        .select(col("doc_id").as("d3"), col("c").as("top3_count"),
          (length(col("g")) - lit(2)).cast("long").as("top3_g_chars"))
      val g2 = Caches.trackCached(dir, grams(2))
      val dup2 = g2.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("doc_id").as("dd"), col("g").as("dg"))
      val cov = g2
        .join(dup2, col("doc_id") <=> col("dd") && col("g") === col("dg"))
        .select(col("doc_id"), explode(expr("sequence(p, p + 1)")).as("cp"))
        .distinct()
        .join(toks.select(col("doc_id").as("td"), col("p").as("tp"),
          length(col("t")).as("lt")),
          col("doc_id") <=> col("td") && col("cp") === col("tp"))
        .groupBy("doc_id").agg(sum("lt").cast("long").as("dup2_chars"))
      tot
        .join(top3, col("doc_id") <=> col("d3"), "left")
        .join(cov.withColumnRenamed("doc_id", "dc"),
          col("doc_id") <=> col("dc"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_chars"),
          coalesce(col("top3_count"), lit(0L)).cast("long").as("top3_count"),
          round(when(col("n_chars") > 0,
            coalesce(col("top3_count") * col("top3_g_chars"), lit(0L)) * lit(1.0)
              / col("n_chars")).otherwise(lit(0.0)), 6).as("top3_char_frac"),
          coalesce(col("dup2_chars"), lit(0L)).as("dup2_chars"),
          round(when(col("n_chars") > 0,
            coalesce(col("dup2_chars"), lit(0L)) * lit(1.0) / col("n_chars"))
            .otherwise(lit(0.0)), 6).as("dup2_char_frac"))
        .orderBy(col("doc_id").asc_nulls_last)
    }),

    // ---- events: typed JSON metadata extraction — the ingest stage
    // that lifts semi-structured payloads into columns (get_json_object
    // is codegen'd; at scale this is a pure mapper feeding the same
    // hash-aggregate as any relational groupBy). ----
    "e_props_parse" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // ---- E3: the composed corpus-curation funnel — quality gate (t7's
    // rules) → exact dedup among survivors (d1's fingerprint, keep the
    // smallest doc_id) → deterministic 20% sample (d7's hash) → per-
    // source funnel counts. One pipeline showing the operators compose:
    // per-row scoring is a mapper, dedup is one fingerprint window,
    // stats one groupBy — three shuffles total at any scale. ----
    "e3_curation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Same staged-tokens shape as t7: one split pass, stats read the
      // array attribute, the gate reads the stat attributes.
      val t = col("_t")
      val nW = size(t)
      val meanLen = round(
        aggregate(transform(t, w => length(w).cast("long")), lit(0L), (a, x) => a + x) *
          lit(1.0) / nW, 4)
      val diversity = round(size(array_distinct(t)) * lit(1.0) / nW, 4)
      val fp = md5(lower(Cleaning.cleanInvisibleChars(col("text"))))
      val docs = Tables.documents(s, dir)
      val kept = docs
        .select(col("doc_id"), col("source"), col("text"),
          toks(lower(col("text"))).as("_t"))
        .select(col("doc_id"), col("source"), col("text"), nW.as("_nw"),
          meanLen.as("_mean"), diversity.as("_div"),
          countIn(t, stopwords).as("_nstop"))
        .filter(col("_nw") >= 30 && col("_nw") <= 90 &&
          col("_mean") >= 3.0 && col("_mean") <= 8.0 &&
          col("_div") >= 0.4 && col("_nstop") > 0)
        .withColumn("rn", row_number().over(Window.partitionBy(fp).orderBy("doc_id")))
        .withColumn("canon", col("rn") === 1)
        .withColumn("samp", col("canon") &&
          pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L,
            lit(1000000007L)) % 100 < 20)
      val raw = docs.groupBy("source").agg(count(lit(1)).as("n_raw"))
      val funnel = kept.groupBy("source").agg(
        count(lit(1)).as("nq"), count(when(col("canon"), 1)).as("nd"),
        count(when(col("samp"), 1)).as("ns"))
      raw.join(funnel, Seq("source"), "left")
        .select(col("source"), col("n_raw"),
          coalesce(col("nq"), lit(0L)).as("n_quality"),
          coalesce(col("nd"), lit(0L)).as("n_deduped"),
          coalesce(col("ns"), lit(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // ---- T18: per-document token entropy — the information-density
    // curation signal (low-entropy docs are templated/repetitive even
    // when t8's bigram tests pass). Entropy is a DOUBLE, so the
    // cross-engine contract is summation ORDER: token counts are
    // collected per doc, sorted lexicographically by token, and folded
    // SEQUENTIALLY (aggregate over a sort_array ↔ list_reduce over a
    // list(... ORDER BY)), so both engines add the identical IEEE
    // terms in the identical order — a bare SUM() would be
    // partition-order-dependent and could differ in the last ulp.
    // Scale: one (doc, token) count shuffle, one per-doc regroup; the
    // fold is map-side arithmetic. ----
    "t18_token_entropy" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      tf.groupBy("doc_id").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sort_array(collect_list(struct(col("t"), col("c")))).as("tc"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(expr(
            """aggregate(tc, CAST(0.0 AS DOUBLE),
              |  (acc, x) -> acc - (x.c / CAST(n_tokens AS DOUBLE))
              |    * log2(x.c / CAST(n_tokens AS DOUBLE)))""".stripMargin), 6)
            .as("entropy"))
        .orderBy("doc_id")
    }),

    // ---- T17: population-stability drift — per-bin PSI contributions
    // between the corpus's two halves (the data-quality monitor that
    // catches a drifting upstream before it poisons training). Doc
    // length bins are fixed-width (integer div — no quantile pass);
    // counts are exact BIGINT; each bin's PSI term (pa−pb)·ln(pa/pb)
    // is computed per ROW (one deterministic IEEE expression — no
    // cross-row double summation, which would be partition-order
    // dependent; the consumer sums the handful of bins). Bins missing
    // from a half are Laplace-smoothed with count+1 in the ratio, the
    // standard PSI guard against ln(0). Scale: two broadcast single-row
    // totals + one tiny bin aggregate. ----
    "t17_psi_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), expr("n_chars div 40").as("bin"),
          (col("doc_id") % 2 === 0).as("in_a"))
      val bins = docs.groupBy("bin").agg(
        count(when(col("in_a"), 1)).as("ca"),
        count(when(!col("in_a"), 1)).as("cb"))
      val tot = docs.agg(
        count(when(col("in_a"), 1)).as("na"),
        count(when(!col("in_a"), 1)).as("nb"))
      bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("ca"), col("cb"),
          round(expr(
            """((ca + 1) / CAST(na + 1 AS DOUBLE) - (cb + 1) / CAST(nb + 1 AS DOUBLE))
              | * ln(((ca + 1) / CAST(na + 1 AS DOUBLE)) / ((cb + 1) / CAST(nb + 1 AS DOUBLE)))"""
              .stripMargin), 8).as("psi_term"))
        .orderBy("bin")
    }),

    // ---- T6: top-k n-gram frequency — the vocabulary/boilerplate
    // analysis a corpus pipeline runs before dedup thresholds are set.
    // One explode + one hash groupBy with map-side partial aggregation,
    // then TakeOrdered for the limit — no global sort materializes. ----
    "t6_topk_ngrams" -> ((s, dir) =>
      DedupQueries.docShinglesOf(Tables.documents(s, dir))
        .select(explode(col("sh")).as("ngram"))
        .filter(col("ngram").isNotNull)
        .groupBy("ngram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ngram").asc)
        .limit(20)),

    // ---- events: batch sessionization — the driver-gated twin of
    // streaming.EventStream.sessionize: per-user sessions closed after
    // 30 min of inactivity, expressed as lag-gap flags + running sum
    // (the classic windowed formulation; state is partitioned by user,
    // exactly like the streaming state store). ----
    "e_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // nulls-LAST on the session order key (DuckDB's window default):
      // a null-ts event tails its user's stream and extends the last
      // session instead of opening the first (edge-fixture sweep)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc_nulls_last, col("event_id"))
      val gapUs = 30L * 60 * 1000000
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1)
            .otherwise(0))
        .withColumn("sess_no",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_no")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"),
          expr("(max(us) - min(us)) div 1000000").as("duration_sec"))
        .orderBy("user_id", "sess_no")
    }),

    // ---- events: click→purchase attribution — the batch twin of the
    // stream-stream join (streaming.EventStream.attribute): for each
    // purchase, the latest same-user click at most 30 min older, with
    // a deterministic tie-break. An equi-join on user_id with a range
    // residual + per-purchase argmax window — both shuffles key-hash
    // partitioned, no global sort until presentation. ----
    "e_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("us").as("cus"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("us").as("pus"))
      val w = Window.partitionBy("purchase_id").orderBy(col("cus").desc, col("click_id").desc)
      purchases.join(clicks, Seq("user_id"))
        .filter(col("cus") <= col("pus") && col("cus") >= col("pus") - 1800L * 1000000)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          expr("(pus - cus) div 1000000").as("gap_sec"))
        .orderBy("purchase_id")
    }),

    // ---- events: tumbling-window counts (batch analog of the streaming
    // ingest in graft.streaming) ----
    "e_window_counts" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("win.start").as("win_start"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("win_start", "event_type"))
  )

  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private val stopSql = stopwords.map(w => s"'$w'").mkString(", ")

  val oracle: Map[String, String] = Map(
    // t36's twin uses the plain window formulation the engine avoids —
    // same ranks (total order), different plan.
    "t36_equidepth_bins" ->
      """WITH r AS (SELECT source, n_chars,
        |     row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
        |     count(*) OVER (PARTITION BY source) AS n_src
        |   FROM documents)
        |SELECT source, (CAST(rk - 1 AS BIGINT) * 10) // n_src AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t3_token_count" ->
      s"""SELECT doc_id,
         | len($toksSql) AS n_ws_tokens,
         | len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_re_tokens,
         | length(text) AS n_chars_computed
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t2_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
         |SELECT doc_id, length(text) AS char_len, len(toks) AS n_tokens,
         | round(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 /
         |   length(text), 4) AS punct_ratio,
         | round(len(list_filter(toks, x -> x IN ($stopSql))) * 1.0 /
         |   len(toks), 4) AS stopword_ratio,
         | round(length(regexp_replace(text, '\\s', '', 'g')) * 1.0 / len(toks), 4)
         |   AS avg_token_len
         |FROM t ORDER BY doc_id""".stripMargin,

    "t1_lang_id" -> {
      val scoreSql = langMarkers.map { case (lang, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($set))) AS s_$lang"
      }.mkString(",\n   ")
      s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |           FROM documents),
         | sc AS (SELECT doc_id, lang,
         |   $scoreSql
         | FROM t)
         |SELECT doc_id, lang AS labeled_lang,
         | CASE WHEN COALESCE(greatest(s_en, s_es, s_de, s_fr), 0) = 0 THEN 'und'
         |      WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         |      WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         |      WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         |      ELSE 'fr' END AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    // t47's twin replays htmlDoc's construction AND the six-step
    // extraction algebra with LITERALLY the same regex patterns (RE2
    // accepts the inline (?s) and the explicit [ \t\r] class Spark
    // uses — the class is explicit precisely so both engines take the
    // identical branch), entity order amp-LAST mirrored in the nested
    // replace chain.
    "t47_html_extract" ->
      s"""WITH $htmlExtractCteSql
         |SELECT doc_id, n_blocks, n_boiler, CAST(length(text) AS BIGINT) AS n_chars, text
         |FROM f ORDER BY doc_id""".stripMargin,

    // t48's twin NESTS the full trained-profile replay (t39's CTE with
    // the score predicate widened to TRUE — e21's compose-the-trained-
    // profile precedent) AND the t47 extraction replay (the same
    // shared CTE), then replays quality → route → content-dedup →
    // budget relationally: the chrome-invariant content key (kept
    // blocks 3+, dropping the per-page title/h1 lines), the verdict
    // left-join route (COALESCE 'und' for verdict-less pages), the
    // md5 row_number dedup, and e21's exclusive-prefix-sum budget
    // window — so the hash gate proves the composed crawl-to-corpus
    // funnel ≡ its independently-replayed stages.
    "t48_crawl_funnel" ->
      s"""${PipelineQueries.t39LangIdCteFor("TRUE")},
         | $htmlExtractCteSql,
         | c AS (SELECT f.doc_id, d.source,
         |     coalesce(array_to_string(string_split(f.text, chr(10))[3:], chr(10)), '') AS c
         |   FROM f JOIN documents d USING (doc_id)),
         | q AS (SELECT *, CAST(len(string_split(c, ' ')) AS BIGINT) AS toks
         |   FROM c WHERE length(c) >= 300),
         | routed AS (SELECT q.doc_id, q.source, q.c, q.toks,
         |     COALESCE(v.pred_lang, 'und') AS pred_lang
         |   FROM q LEFT JOIN verdicts v USING (doc_id)),
         | canon AS (SELECT * FROM (SELECT *,
         |     row_number() OVER (PARTITION BY md5(c) ORDER BY doc_id) AS rn
         |   FROM routed) WHERE rn = 1),
         | ${
           // parse INLINE over canon (as the engine does) — a join back
           // to the all-documents chain would inner-drop a null-doc_id
           // canon row the engine keeps (null url → null reg_domain
           // partition, still capped)
           WebQueries.urlParseCteSqlFrom("canon", "doc_id", "source",
             Seq("doc_id", "toks", "pred_lang"))},
         | dom AS (SELECT doc_id, toks, pred_lang, reg_domain FROM parsed),
         | capd AS (SELECT * FROM (SELECT *, row_number() OVER (
         |     PARTITION BY reg_domain ORDER BY toks DESC, doc_id) AS rnd
         |   FROM dom) WHERE rnd <= ${WebQueries.DomainCapDocs}),
         | bud AS (SELECT pred_lang, CAST(sum(toks) * 4 // 10 AS BIGINT) AS budget,
         |     CAST(count(*) AS BIGINT) AS np
         |   FROM capd GROUP BY 1),
         | cm AS (SELECT *, CAST(COALESCE(sum(toks) OVER (PARTITION BY pred_lang
         |     ORDER BY toks DESC, doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         |   FROM capd),
         | kept AS (SELECT * FROM cm JOIN bud USING (pred_lang) WHERE cum < budget),
         | r AS (SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_routed
         |   FROM routed GROUP BY 1),
         | dd AS (SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_dedup,
         |     CAST(sum(toks) AS BIGINT) AS dedup_tokens FROM canon GROUP BY 1),
         | kp AS (SELECT pred_lang, CAST(max(budget) AS BIGINT) AS budget,
         |     CAST(count(*) AS BIGINT) AS n_kept,
         |     CAST(sum(toks) AS BIGINT) AS kept_tokens,
         |     CAST(max(np) AS BIGINT) AS np FROM kept GROUP BY 1)
         |SELECT pred_lang, n_routed, n_dedup, dedup_tokens, budget, n_kept,
         |  kept_tokens, CAST(n_dedup - np AS BIGINT) AS n_domain_capped
         |FROM r JOIN dd USING (pred_lang) JOIN kp USING (pred_lang)
         |ORDER BY pred_lang""".stripMargin,

    // The lifecycle twins recompute extraction from raw markup over the
    // served doc set (e31: the full corpus = base ∪ wave; e32/e33: the
    // corpus minus e24's deletion carve), so each gate IS a landed ≡
    // recomputed proof across append / forget / compact. `content`
    // replays t48's chrome-invariant key derivation (coalesced — the
    // repo's documented empty-list gotcha).
    "e31_extract_append" -> extractLifecycleSqlFor("TRUE"),
    "e32_extract_forget" -> extractLifecycleSqlFor(e24DeletedKeptPredSql),
    "e33_extract_compact" -> extractLifecycleSqlFor(e24DeletedKeptPredSql),

    // t53's twin: identical bigram derivation, Laplace ratios from the
    // same exact BIGINTs, and the t18 sequential-fold discipline (the
    // term list sorted by (lhs, rhs) — unique per doc — so both
    // engines sum the same doubles in the same order). t54 (landed
    // store) and t55 (store + delta refresh) share it VERBATIM: their
    // gates are landed ≡ recomputed / refreshed ≡ retrained proofs.
    "t53_lm_perplexity" -> lmPerplexityOracleSql,
    "t54_lm_landed_score" -> lmPerplexityOracleSql,
    "t55_lm_refresh" -> lmPerplexityOracleSql,
    // forget ≡ full recompute on train ∖ deleted (the e24 erasure carve)
    "t57_lm_forget" -> lmPerplexityOracleSqlFor(e24DeletedKeptPredSql),
    "t58_lm3_perplexity" -> lm3OracleSql,
    "t59_lm3_landed_score" -> lm3OracleSql,
    "t60_lm3_refresh" -> lm3OracleSql,
    "t61_lm3_forget" -> lm3OracleSqlFor(e24DeletedKeptPredSql),
    "t62_lm3kn_perplexity" -> lm3KnOracleSql,
    "t63_lm3kn_landed" -> lm3KnOracleSql,
    "t64_lm3kn_refresh" -> lm3KnOracleSql,
    "t65_lm3kn_forget" -> lm3KnOracleSqlFor(e24DeletedKeptPredSql),
    "t4_fingerprint" ->
      s"""SELECT doc_id,
         | md5(lower(NULLIF(trim(regexp_replace(text, '${Cleaning.UnicodeWsRe2}+', ' ', 'g')), '')))
         |   AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    "d1_dedup_exact" ->
      s"""SELECT md5(lower(NULLIF(trim(regexp_replace(text, '${Cleaning.UnicodeWsRe2}+', ' ', 'g')), ''))) AS fp,
         | min(doc_id) AS keep_doc_id, count(*) AS n_copies
         |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,

    "e_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        | c AS (SELECT event_id AS click_id, user_id, us AS cus FROM e
        |   WHERE event_type = 'click'),
        | p AS (SELECT event_id AS purchase_id, user_id, us AS pus FROM e
        |   WHERE event_type = 'purchase'),
        | j AS (SELECT p.purchase_id, p.user_id, c.click_id, p.pus, c.cus,
        |     row_number() OVER (PARTITION BY p.purchase_id
        |       ORDER BY c.cus DESC, c.click_id DESC) AS rn
        |   FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cus <= p.pus AND c.cus >= p.pus - 1800000000)
        |SELECT purchase_id, user_id, click_id, (pus - cus) // 1000000 AS gap_sec
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    // ts IS NOT NULL mirrors Spark's TimeWindowing rule, which injects
    // the same filter under every time window (a null timestamp has no
    // bucket); DuckDB's time_bucket would otherwise keep a NULL group
    "e_window_counts" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        | count(*) AS n, round(sum("value"), 2) AS sum_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    "t7_quality_rules" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |           FROM documents),
         | st AS (SELECT doc_id, len(toks) AS n_words,
         |     round(CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) * 1.0 /
         |       len(toks), 4) AS mean_word_len,
         |     round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS distinct_ratio,
         |     len(list_filter(toks, x -> x IN ($stopSql))) AS n_stopwords
         |   FROM t),
         | v AS (SELECT *, CASE
         |     WHEN n_words < 30 OR n_words > 90 THEN 'word_count'
         |     WHEN mean_word_len < 3.0 OR mean_word_len > 8.0 THEN 'mean_word_len'
         |     WHEN distinct_ratio < 0.4 THEN 'low_diversity'
         |     WHEN n_stopwords = 0 THEN 'no_stopwords'
         |     ELSE 'ok' END AS drop_reason FROM st)
         |SELECT doc_id, n_words, mean_word_len, distinct_ratio, n_stopwords,
         | drop_reason, drop_reason = 'ok' AS keep
         |FROM v ORDER BY doc_id""".stripMargin,

    "t8_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | bg AS (SELECT doc_id, unnest(list_transform(
        |     range(1, greatest(len(w) - 1, 1) + 1),
        |     i -> w[i] || '_' || w[i+1])) AS bg FROM w),
        | f AS (SELECT doc_id, bg, count(*) AS c FROM bg
        |   WHERE bg IS NOT NULL GROUP BY doc_id, bg),
        | a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |     count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_count
        |   FROM f GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_distinct,
        | round(top_count * 1.0 / n_bigrams, 4) AS top_share,
        | round(1.0 - n_distinct * 1.0 / n_bigrams, 4) AS dup_ratio
        |FROM a ORDER BY doc_id""".stripMargin,

    // t66's twin rebuilds the same 1-based gram windows over the raw
    // split array, the same (count, gram chars, gram) top tie-break,
    // and the same distinct-position char coverage; every doc_id
    // attach is IS NOT DISTINCT FROM (the engine's <=>), so null-id
    // rows lump into one pseudo-doc identically
    "t66_repetition_chars" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | tok AS (SELECT doc_id, x.p AS p, x.t AS t FROM (
        |     SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
        |       i -> struct_pack(p := i - 1, t := w[i]))) AS x FROM w)),
        | tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |     CAST(sum(length(t)) AS BIGINT) AS n_chars FROM tok GROUP BY doc_id),
        | g3 AS (SELECT doc_id, x.p AS p, x.g AS g FROM (
        |     SELECT doc_id, unnest(list_transform(range(0, greatest(len(w) - 2, 0)),
        |       i -> struct_pack(p := i,
        |         g := w[i+1] || '_' || w[i+2] || '_' || w[i+3]))) AS x FROM w)),
        | top3 AS (SELECT doc_id, c AS top3_count,
        |     CAST(length(g) - 2 AS BIGINT) AS top3_g_chars FROM (
        |     SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c,
        |       row_number() OVER (PARTITION BY doc_id
        |         ORDER BY count(*) DESC, length(g) DESC, g DESC) AS rn
        |     FROM g3 GROUP BY doc_id, g) WHERE rn = 1),
        | g2 AS (SELECT doc_id, x.p AS p, x.g AS g FROM (
        |     SELECT doc_id, unnest(list_transform(range(0, greatest(len(w) - 1, 0)),
        |       i -> struct_pack(p := i, g := w[i+1] || '_' || w[i+2]))) AS x FROM w)),
        | dup2 AS (SELECT doc_id, g FROM g2 GROUP BY doc_id, g HAVING count(*) > 1),
        | covpos0 AS (SELECT g2.doc_id AS doc_id, unnest([g2.p, g2.p + 1]) AS cp
        |   FROM g2 JOIN dup2 ON g2.doc_id IS NOT DISTINCT FROM dup2.doc_id
        |     AND g2.g = dup2.g),
        | covpos AS (SELECT DISTINCT doc_id, cp FROM covpos0),
        | cov AS (SELECT covpos.doc_id AS doc_id,
        |     CAST(sum(length(tok.t)) AS BIGINT) AS dup2_chars
        |   FROM covpos JOIN tok ON covpos.doc_id IS NOT DISTINCT FROM tok.doc_id
        |     AND covpos.cp = tok.p
        |   GROUP BY covpos.doc_id)
        |SELECT tot.doc_id, n_tokens, n_chars,
        |  CAST(COALESCE(top3_count, 0) AS BIGINT) AS top3_count,
        |  round(CASE WHEN n_chars > 0
        |      THEN COALESCE(top3_count * top3_g_chars, 0) * 1.0 / n_chars
        |      ELSE 0.0 END, 6) AS top3_char_frac,
        |  COALESCE(dup2_chars, 0) AS dup2_chars,
        |  round(CASE WHEN n_chars > 0
        |      THEN COALESCE(dup2_chars, 0) * 1.0 / n_chars
        |      ELSE 0.0 END, 6) AS dup2_char_frac
        |FROM tot LEFT JOIN top3 ON tot.doc_id IS NOT DISTINCT FROM top3.doc_id
        |LEFT JOIN cov ON tot.doc_id IS NOT DISTINCT FROM cov.doc_id
        |ORDER BY tot.doc_id NULLS LAST""".stripMargin,

    "e3_curation" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |     string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
         | st AS (SELECT doc_id, source, text, len(toks) AS n_words,
         |     round(CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) * 1.0 /
         |       len(toks), 4) AS mean_word_len,
         |     round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS distinct_ratio,
         |     len(list_filter(toks, x -> x IN ($stopSql))) AS n_stopwords
         |   FROM t),
         | q AS (SELECT doc_id, source, text FROM st
         |   WHERE n_words >= 30 AND n_words <= 90
         |     AND mean_word_len >= 3.0 AND mean_word_len <= 8.0
         |     AND distinct_ratio >= 0.4 AND n_stopwords > 0),
         | k AS (SELECT doc_id, source,
         |     row_number() OVER (PARTITION BY
         |       md5(lower(NULLIF(trim(regexp_replace(text, '${Cleaning.UnicodeWsRe2}+', ' ', 'g')), '')))
         |       ORDER BY doc_id) AS rn
         |   FROM q),
         | f AS (SELECT source, count(*) AS nq,
         |     count(CASE WHEN rn = 1 THEN 1 END) AS nd,
         |     count(CASE WHEN rn = 1 AND ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 20 THEN 1 END) AS ns
         |   FROM k GROUP BY source),
         | raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY source)
         |SELECT raw.source, raw.n_raw,
         | CAST(COALESCE(f.nq, 0) AS BIGINT) AS n_quality,
         | CAST(COALESCE(f.nd, 0) AS BIGINT) AS n_deduped,
         | CAST(COALESCE(f.ns, 0) AS BIGINT) AS n_sampled
         |FROM raw LEFT JOIN f ON raw.source = f.source ORDER BY raw.source""".stripMargin,

    // the json_valid guard mirrors get_json_object's null-on-malformed
    // contract — DuckDB's json_extract_string ERRORS on bad JSON, the
    // one failure mode a telemetry props column is guaranteed to have
    "e_props_parse" ->
      """WITH e AS (SELECT event_type,
        |     CASE WHEN json_valid(props)
        |          THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |     END AS k FROM events)
        |SELECT event_type, count(*) AS n,
        | CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 4) AS avg_k,
        | min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Same lexicographic fold order as the Spark aggregate — the
    // prepended 0.0 is the init accumulator, then one term per token
    // ascending, so the IEEE additions run in the identical sequence.
    "t18_token_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        | tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok
        |   WHERE t <> '' GROUP BY 1, 2),
        | agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |     CAST(count(*) AS BIGINT) AS n_distinct,
        |     list(c ORDER BY t) AS cs FROM tf GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        | round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs),
        |   (acc, c) -> acc - (c / CAST(n_tokens AS DOUBLE))
        |     * log2(c / CAST(n_tokens AS DOUBLE))), 6) AS entropy
        |FROM agg ORDER BY doc_id""".stripMargin,

    "t17_psi_drift" ->
      """WITH d AS (SELECT doc_id, n_chars // 40 AS bin, doc_id % 2 = 0 AS in_a
        |           FROM documents),
        | bins AS (SELECT bin,
        |     CAST(count(*) FILTER (in_a) AS BIGINT) AS ca,
        |     CAST(count(*) FILTER (NOT in_a) AS BIGINT) AS cb FROM d GROUP BY 1),
        | tot AS (SELECT CAST(count(*) FILTER (in_a) AS BIGINT) AS na,
        |     CAST(count(*) FILTER (NOT in_a) AS BIGINT) AS nb FROM d)
        |SELECT bin, ca, cb,
        | round(((ca + 1) / CAST(na + 1 AS DOUBLE) - (cb + 1) / CAST(nb + 1 AS DOUBLE))
        |   * ln(((ca + 1) / CAST(na + 1 AS DOUBLE)) / ((cb + 1) / CAST(nb + 1 AS DOUBLE))), 8)
        |   AS psi_term
        |FROM bins CROSS JOIN tot ORDER BY bin""".stripMargin,

    "t6_topk_ngrams" ->
      s"""WITH docs AS (SELECT doc_id, ${DedupQueries.shinglesSql} AS sh
         |              FROM documents),
         | tok AS (SELECT unnest(sh) AS ngram FROM docs)
         |SELECT ngram, count(*) AS cnt FROM tok WHERE ngram IS NOT NULL
         |GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 20""".stripMargin,

    "e_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, ts, "value", epoch_us(ts) AS us,
        |     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |   FROM events),
        | n AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |     THEN 1 ELSE 0 END AS new_sess FROM g),
        | s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
        |   FROM n)
        |SELECT user_id, sess_no, count(*) AS n_events,
        | round(sum("value"), 2) AS sum_value,
        | (max(us) - min(us)) // 1000000 AS duration_sec
        |FROM s GROUP BY user_id, sess_no ORDER BY user_id, sess_no""".stripMargin,

    // t45: the twin replays gram-hash → encoded window-min → distinct
    // decode with the identical e = h·2²² + (2²²−1−pos) arithmetic —
    // the rightmost-tie rule is IN the encoding, so one window MIN is
    // the whole selection in both engines
    // the 2²² doc-size guard mirrors the Spark side: an oversized doc
    // errors LOUDLY in both engines instead of silently corrupting the
    // position encoding (4194303 - i0 going negative)
    "t45_winnowing" ->
      """WITH docs AS (SELECT doc_id,
        |    CASE WHEN length(text) > 4194323
        |         THEN error('winnow: document exceeds the 2^22 gram-position encoding limit (doc_id=' || doc_id || ')')
        |         ELSE text END AS text, length(text) AS len FROM documents
        |    WHERE text IS NOT NULL AND length(text) >= 27),
        | gr AS (SELECT doc_id, len - 19 AS n, i AS i0,
        |     list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(regexp_extract_all(substring(text, CAST(i + 1 AS INT), 20), '.'),
        |         ch -> CAST(unicode(ch) AS BIGINT))),
        |       (a, b) -> (a * 131 + b) % 2147483647) AS h
        |   FROM docs, unnest(range(0, len - 19)) AS t(i)),
        | win AS (SELECT doc_id, i0, n,
        |     min(h * 4194304 + (4194303 - i0)) OVER (PARTITION BY doc_id ORDER BY i0
        |       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS e
        |   FROM gr),
        | sel AS (SELECT DISTINCT doc_id, e FROM win WHERE i0 <= n - 8)
        |SELECT doc_id, CAST(4194303 - e % 4194304 AS BIGINT) AS fp_pos,
        |  CAST(e // 4194304 AS BIGINT) AS fp_h
        |FROM sel ORDER BY doc_id, fp_pos, fp_h""".stripMargin,

    "t5_rolling_hash" ->
      """SELECT doc_id,
        | CASE WHEN text IS NOT NULL THEN list_reduce(list_prepend(0,
        |   list_transform(range(1, length(text) + 1), i -> CAST(ascii(text[i]) AS BIGINT))),
        |   (h, c) -> (h * 31 + c) % 1000000007) END AS doc_hash,
        | CASE WHEN length(text) >= 8 THEN
        |   list_min(list_transform(range(1, length(text) - 6),
        |     i -> list_reduce(list_prepend(0,
        |       list_transform(range(i, i + 8), j -> CAST(ascii(text[j]) AS BIGINT))),
        |       (h, c) -> (h * 31 + c) % 1000000007))) END AS min_gram_hash
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
