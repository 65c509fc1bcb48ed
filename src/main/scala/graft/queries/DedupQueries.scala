package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for the training-data pipeline (builder
  * brief): exact-threshold n-gram Jaccard via a PREFIX-FILTERED set-
  * similarity join (AllPairs/PPJoin family), MinHash+LSH banding,
  * SimHash with pigeonhole chunk blocking, and embedding-cosine pairs.
  *
  * Scale design — none of these is an all-pairs cross join:
  *  - '''d3''' prefix filtering is LOSSLESS for a Jaccard threshold t:
  *    order each doc's shingles by (global document-frequency, token) and
  *    keep the first ⌊(1−t)·|S|⌋+1 as its prefix — two sets with
  *    J ≥ t MUST share a prefix token. Candidates come from an equi-join
  *    on prefix tokens (rarest tokens first ⇒ tiny buckets), then exact
  *    Jaccard verifies. All shuffles are key-hash joins/groupBys.
  *  - '''d2''' MinHash signatures (32 hashes, 8 bands × 4) turn near-dup
  *    search into an equi-join on band keys; exact Jaccard verifies
  *    candidates, so false positives cost only the verify, and the miss
  *    probability at J≥0.9 is (1−J⁴)⁸ < 0.1%.
  *  - '''d4''' SimHash: 64-bit signature; Hamming ≤ 3 neighbours must
  *    share one of 4 exact 16-bit chunks (pigeonhole) — again an
  *    equi-join on (chunk index, chunk value).
  *  - '''d5''' cosine pairs are the declared-EXACT baseline (quadratic,
  *    like x1_ann_brute — it exists to anchor recall gates); the scale
  *    path is '''d14''', which generates the identical edge set from
  *    IVF multi-probe candidates + exact-cosine verify, and is what d13
  *    clusters.
  */
object DedupQueries {

  /** Distinct word 3-gram shingles from a PRE-SPLIT words column.
    * Mirrors the DuckDB twin exactly: concat() (NULL-propagating, like
    * SQL ||) over get() so a <3-word doc yields a single NULL shingle
    * rather than an error.
    *
    * Callers must bind `words` to a NAMED column (see [[docShingles]]):
    * inlining `split(text)` here would copy the split expression into
    * every `get` inside the lambda, re-splitting the text per element
    * (~300× per row — measured 4 s instead of ~1 s for the shingle
    * queries at sf0.1). */
  private[graft] def shinglesFromWords(words: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(words) - 2, lit(1))),
      i => concat(get(words, i - 1), lit("_"), get(words, i), lit("_"), get(words, i + 1))))

  /** Convenience form for specs/small inputs — see the note above for
    * why the query path pre-splits instead. */
  private[graft] def shingles(text: Column): Column =
    shinglesFromWords(split(text, " "))

  /** documents → (doc_id, sh, sz) with the split materialized ONCE per
    * row in its own projection (CollapseProject keeps it: the alias is
    * non-cheap and multiply referenced). */
  /** BSP min-label propagation to fixpoint over an undirected pair set
    * (`doc1`, `doc2`) → (doc_id, cluster_id, is_canonical). Shared by
    * d9 (shingle-Jaccard edges) and d13 (embedding-cosine edges).
    *
    * The label frame is tiny (nodes appearing in ≥1 dup pair), so the
    * loop runs on a handful of partitions — round latency, not data, is
    * the cost; at real scale the same loop keeps the session's shuffle
    * width and adds periodic checkpoints to cut lineage. Labels
    * converge in O(cluster diameter) rounds (2-3 for dup clusters); the
    * large-star/small-star variant of the same joins bounds rounds at
    * O(log n). Deterministic exact fixpoint → hash-gateable via a
    * DuckDB recursive CTE over the identical edge set.
    *
    * Round lineage is cut with [[Caches.checkpointed]] (eager
    * localCheckpoint → LogicalRDD), the canonical Spark shape for BSP
    * loops — see that method's note for the measured pathology a
    * cache()-per-round loop develops. Checkpoint RDDs release with the
    * dir's other memos. */
  /** Count of BSP fixpoint launches — lets DedupSpec prove d29's
    * serve path runs exactly ONE fixpoint (the affected-subgraph
    * relabel) per invocation, with the old-side labels coming from the
    * landed artifact instead of a second inline loop. */
  private[graft] val bspRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def minLabelClusters(pairs: DataFrame, dir: String): DataFrame = {
    bspRuns.incrementAndGet()
    val edges = Caches.checkpointed(dir, pairs.unionByName(
      pairs.select(col("doc2").as("doc1"), col("doc1").as("doc2"))))
    var labels = Caches.checkpointed(dir, edges.select(col("doc1").as("doc_id")).distinct()
      .withColumn("lab", col("doc_id")).repartition(4))
    var changed = 1L
    while (changed > 0) {
      val nmin = edges.join(labels, edges("doc2") === labels("doc_id"))
        .groupBy(edges("doc1").as("nid")).agg(min("lab").as("nmin"))
      // stepped feeds the self-join twice; its plan is two bounded
      // LogicalRDD scans, so recomputing beats a cache round-trip
      val stepped = labels.join(nmin, labels("doc_id") === nmin("nid"), "left")
        .select(labels("doc_id"),
          least(col("lab"), coalesce(col("nmin"), col("lab"))).as("lab"),
          (col("nmin") < col("lab")).as("moved1"))
      // path halving: follow one hop of label indirection (lab ← lab's
      // own label) so chain-shaped components converge in O(log
      // diameter) rounds instead of O(diameter) — the same shortcut
      // step large-star/small-star uses. Fixpoint unchanged: labels
      // stay monotone-decreasing toward the component minimum, and at
      // the neighbor-min fixpoint the jump is the identity, so the
      // convergence check below terminates on the identical state
      // (carrying the moved flag through the round keeps it one action,
      // no extra old-vs-new join).
      val hop = stepped.select(col("doc_id").as("ref"), col("lab").as("reflab"))
      val next = Caches.checkpointed(dir,
        stepped.join(hop, stepped("lab") === hop("ref"), "left")
          .select(stepped("doc_id"),
            least(stepped("lab"), coalesce(col("reflab"), stepped("lab"))).as("lab"),
            (stepped("moved1") ||
              coalesce(col("reflab"), stepped("lab")) < stepped("lab")).as("moved")))
      changed = next.filter(col("moved")).count()
      labels = next.drop("moved")
    }
    labels.select(col("doc_id"), col("lab").as("cluster_id"),
      (col("doc_id") === col("lab")).as("is_canonical"))
  }

  /** Query-path shingling uses the native [[graft.plans.GraftShingles]]
    * expression — one codegen'd JVM loop per row instead of the
    * interpreted HOF chain (DedupSpec pins ≡ [[shinglesFromWords]]).
    * [[withShingles]] keeps the caller's other columns (the streaming
    * twin needs event time alongside); [[docShinglesOf]] is the lean
    * (doc_id, sh, sz) projection the batch suite scans. */
  private[graft] def withShingles(df: DataFrame): DataFrame =
    df.withColumn("_w", split(col("text"), " "))
      .withColumn("sh",
        org.apache.spark.sql.graft.ColumnBridge.column(graft.plans.GraftShingles(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("_w")))))
      .withColumn("sz", size(col("sh")))
      .drop("_w")

  // r17 optimization note: a ScanFan fan-out here was measured and
  // REVERTED — the shingle cache's cheap consumers (d4's one-UDF pass,
  // the verify probes) pay ~32 extra task dispatches per stage against
  // a 5k-row cached frame, and the heavy consumers' next exchange is
  // token-keyed (freq groupBy), so nothing reuses the doc-keyed
  // shuffle: isolated A/B read d3 17.1→24.5 / d4 1.2→2.6 / d6 5.6→14.1
  // CPU-s with flat wall. Fan-out only pays where a doc-keyed
  // window/groupBy swallows the exchange (winnow, LM folds, t66).
  private[graft] def docShinglesOf(df: DataFrame): DataFrame =
    withShingles(df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("sh"), col("sz"))

  private[queries] val shinglesSql: String =
    """list_distinct(list_transform(
      |   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      |   i -> string_split(text, ' ')[i] || '_' ||
      |        string_split(text, ' ')[i+1] || '_' || string_split(text, ' ')[i+2]))""".stripMargin

  private def docShingles(s: SparkSession, dir: String): DataFrame =
    docShinglesOf(Tables.documents(s, dir))

  /** Band/signature kernels drop the single NULL shingle GraftShingles
    * emits for a <3-word document (see [[shinglesFromWords]]'s NULL
    * contract): no lexical evidence means NO band keys — a short doc
    * can never be a near-dup candidate and its dedup signal is the
    * exact-text branch (d18) or the stream gate's raw-text key — where
    * the previous unguarded kernels threw on the first real corpus
    * containing a short document (fixtures never do). */
  private[graft] def realShingles(sh: Seq[String]): Seq[String] =
    if (sh == null) Nil else sh.filter(_ != null) // null text → null sh column
  private[graft] val bandKeysUdf =
    udf((sh: Seq[String]) => {
      val real = realShingles(sh)
      if (real.isEmpty) Array.empty[Long]
      else graft.functions.Hashing.minhashBandKeys(real, 32, 8)
    })
  private[graft] val simhashUdf =
    udf((sh: Seq[String]) => graft.functions.Hashing.simhashPoly(realShingles(sh)))
  /** Native codegen dot product — see AnnQueries' note; d5 scores
    * 12.5M pairs at sf0.1 through this kernel. */
  private[graft] def dotExpr(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(graft.plans.GraftDot(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** norm² as graft_dot(v, v) — identical sequential fold, bit-exact. */
  private[graft] def norm2Expr(v: Column): Column = dotExpr(v, v)

  /** Two-level IVF coarse quantizer, shared by d14 and the ANN serving
    * family (AnnQueries x3/x4/x9/x10/x11/x12/x15).
    *
    * Level sizes: the FINE cells are the deterministic vec_id % 50 == 1
    * seed subset — K1 = N/50 cells of ~50 members each, which is what
    * keeps candidate growth linear in the corpus (measured exponents,
    * BASELINE.md). The COARSE level groups the fine cells: g ≈ √K1
    * fine cells per group, K2 = K1/g ≈ √K1 groups, selected as the
    * vec_id % (50·g) == 1 sub-subset of the fine seeds.
    *
    * Scale contract (the round-8 verdict's What's-wrong #2): the driver
    * holds ONLY the coarse level — K2 ∝ √(N/50) vectors — not the full
    * K1 = N/50 fine codebook the previous flat formulation collected
    * and closure-shipped (linear driver state, O(N/50 · D) per-row
    * assignment cost: a wall at 100×). Per-row map-side work is now
    * O(K2·D) against the coarse array; fine-cell resolution is a
    * relational EQUI-JOIN on the coarse group id against the
    * distributed fine-centroid frame (Catalyst broadcasts it while it
    * is small; at index scale it shuffles on gid — either way no
    * nested-loop node, no driver collect of the fine level).
    *
    * Probe semantics: a vector probes its top-(1+⌈24/g⌉) coarse groups
    * (24 = 3·[[MaxProbes]], the constant both the Scala code and the
    * SQL twin must replay bit-for-bit — do not change one side alone)
    * (cosine desc, gid asc — the same argmax tie-break as the fine
    * level), then ranks the fine centroids WITHIN those groups; its
    * cell list is the top-[[MaxProbes]] prefix of that ranking. At the
    * correctness-gate fixtures (N=500 → g=3, K2=4, cp=4) the coarse
    * cover is complete, so the two-level ranking degenerates to the
    * flat one; the sub-linear behavior engages as N grows. DuckDB
    * twins replay the whole two-level spec (AnnQueries.ivfArSql).
    * Invalidation: keyed by the dir path under the steady-state fixture
    * contract (regenerating files under a live JVM requires a
    * [[Caches]] release first). */
  private[graft] val MaxProbes = 8

  private val coarseGs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Fine-cells-per-coarse-group: g = max(1, ⌊√(N/50) + 0.5⌋) — the
    * same double arithmetic the oracle's GREATEST/floor/sqrt computes.
    *
    * N here is counted through [[Tables.embeddings]] (post-admission),
    * while the SQL twins' `prm` CTE counts raw `embeddings` rows: the
    * two agree only on a fully-admitted corpus, which the driver
    * fixtures guarantee (TESTDATA.md — deterministic well-formed
    * rows). On a corpus with malformed vectors the oracle comparison
    * is undefined by contract; the ENGINE side stays correct (it
    * sizes g from the vectors it will actually index). */
  private[queries] def gFor(s: SparkSession, dir: String): Long =
    coarseGs.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { coarseGs.remove(d); () })
      val n = Tables.embeddings(s, d).count()
      math.max(1L, math.floor(math.sqrt(n / 50.0) + 0.5).toLong)
    }).longValue()

  /** The driver-held coarse level: K2 ≈ √(N/50) group centroids. */
  private[queries] val coarseCents =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Array[Double], Double)]]()

  private[graft] def coarseFor(s: SparkSession, dir: String): Array[(Long, Array[Double], Double)] =
    coarseCents.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { coarseCents.remove(d); () })
      Tables.embeddings(s, d)
        .filter(col("vec_id") % lit(50L * gFor(s, d)) === 1)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .collect()
        .map { r =>
          val v = r.getSeq[Double](1).toArray
          (r.getLong(0), v, graft.functions.VectorOps.norm2(v))
        }
        .sortBy(_._1)
    })

  /** Per-vector fine-cell ranking (vec_id, v, n2, cid, arn ∈ 1..8),
    * memoized+cached per (JVM, dir) — the serving family's shared index
    * artifact. One cached frame means every consumer (assignment =
    * arn 1, nprobe-k probe list = arn ≤ k) shares a plan object and the
    * two-level pipeline materializes once per dir. */
  private val cellRankFrames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def cellRanks(s: SparkSession, dir: String): DataFrame =
    cellRankFrames.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { cellRankFrames.remove(d); () })
      val coarse = coarseFor(s, d)
      // Coarse probe width: cover ~3·MaxProbes fine cells (+1 group
      // for the boundary) so the top-MaxProbes fine ranking within the
      // cover tracks the flat global ranking closely on even the
      // adversarial uniform-random fixtures (d16's measured recall
      // floor); asymptotically cp → 2 groups as g = √(N/50) grows, so
      // per-row assignment work stays O(√N · D).
      val cp = 1 + math.ceil(3.0 * MaxProbes / gFor(s, d)).toInt
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("n2", norm2Expr(col("v")))
      // a coarse level can be empty when g > 1 thins the seed stride
      // past the corpus (ids ≡ 51 mod 100, say) — the stream hatch's
      // coarse arm: one coarse bucket, fine ranking intact
      val group1U = udf((v: Seq[Double]) =>
        if (coarse.isEmpty) -1L
        else nearestCells(v, coarse, 1).headOption.getOrElse(-1L))
      val groupsU = udf((v: Seq[Double]) =>
        if (coarse.isEmpty) { if (v == null) Seq.empty[Long] else Seq(-1L) }
        else nearestCells(v, coarse, cp))
      val fine = emb.filter(col("vec_id") % 50 === 1)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
        .withColumn("gid", group1U(col("cv")))
      val probed = emb.withColumn("gid", explode(groupsU(col("v"))))
      val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid").asc)
      Caches.trackCached(d, probed.join(fine, Seq("gid"))
        .withColumn("ccos", dotExpr(col("v"), col("cv")) / sqrt(col("n2") * col("cn2")))
        .withColumn("arn", row_number().over(w))
        .filter(col("arn") <= MaxProbes)
        .select(col("vec_id"), col("v"), col("n2"), col("cid"), col("arn")))
    })

  /** The `p` nearest centroids for a vector, ordered by
    * (cosine desc, cid asc) — the family's argmax tie-break — computed
    * as a map-side loop over a closure-shipped centroid array (now the
    * COARSE level only: √K1 rows). The join-shaped formulation of the
    * same assignment (`crossJoin(broadcast(cents))` + rank window)
    * plans a BroadcastNestedLoopJoin; this is a plain projection,
    * which is what lets PlanSpec pin the serving plans free of any
    * nested-loop or cartesian operator. */
  private[graft] def nearestCells(v: Seq[Double],
      cents: Array[(Long, Array[Double], Double)], p: Int): Seq[Long] = {
    // the optimizer infers isnotnull(UDF(...)) predicates and may
    // evaluate them ahead of the admission filter's own conjuncts, so
    // every kernel must tolerate a null vector itself
    if (v == null) return Seq.empty
    val n2 = graft.functions.VectorOps.norm2(v)
    cents.map { case (cid, cv, cn2) =>
        (graft.functions.VectorOps.dot(v, cv) / math.sqrt(n2 * cn2), cid)
      }
      .sortBy { case (cos, cid) => (-cos, cid) }
      .take(p).map(_._2).toSeq
  }

  /** d14 probe width: full [[MaxProbes]]-wide probe lists — EXHAUSTIVE
    * recall of the cos ≥ 0.45 pair set on the gate fixtures (sf0.001
    * spec, sf0.01 oracle), proven by the hash gate itself, since d14's
    * oracle IS d5's exact all-pairs SQL. (Extra probes can only ADD
    * candidates, and the exact-cosine verify keeps precisely the d5
    * set, so widening the probe list never breaks the gate — only
    * narrowing can.) Honest coverage note: the fixtures' vectors are
    * uniform random, the adversarial case for any ANN blocking (x4/x10
    * document the same), so recall at larger fixtures tracks the
    * probed-cell fraction (the d16 spec measures the floor at sf0.1);
    * the planted near-dup pairs collide in their top cells and survive.
    * On clustered production embeddings (the 100 TB case) small
    * nprobe/K reaches high recall because true neighbors share coarse
    * cells — which is the entire premise of IVF. */
  private[queries] val EdgeProbes = MaxProbes

  /** d14's verified edge set, built ONCE per (JVM, dir) — the edge set
    * is an index artifact (same steady-state contract as the PQ
    * codebook and the s15 landing write), and memoizing the cached
    * frame here rather than re-cache()-ing per invocation matters for a
    * second reason: the probe UDF closure is part of the plan, so a
    * fresh `udf(...)` per call would defeat plan-equality cache reuse
    * and every bench pass would re-run the whole candidate+verify
    * pipeline (measured: d13 at 10.5 s instead of ~2 s at sf0.1). */
  private val d14Edges =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** d14's candidate stage (probe-list equi-join against cell
    * assignments), shared by the edge builder and the scaling-growth
    * measurement tool (BASELINE.md records the candidate-count
    * exponent measured through this exact plan, next to d3's). Both
    * sides are slices of the shared [[cellRanks]] index artifact:
    * membership is the arn=1 row, probes the arn ≤ EdgeProbes prefix. */
  private[graft] def d14Candidates(s: SparkSession, dir: String): DataFrame = {
    // SEEDLESS escape hatch (the streaming ingestVerdict's, on the
    // batch EDGE path): a corpus with no vec_id % 50 == 1 fine seed
    // has an empty cell index — zero candidates, zero semantic recall
    // against d14's exact-pair-set oracle — while the stream twin
    // degenerates to one bucket. The hatch lives HERE and not in
    // [[cellRanks]]: the edge set's contract is RECALL (its oracle is
    // d5's exact all-pairs SQL, which a one-bucket cover satisfies on
    // a corpus this tiny), while the x-family serving oracles replay
    // the seeded two-level SPEC verbatim — an engine-side degenerate
    // cover there would diverge from the replay by construction.
    val emb = Tables.embeddings(s, dir)
    if (emb.filter(col("vec_id") % 50 === 1).isEmpty) {
      val ids = emb.select(col("vec_id"))
      return ids.as("a").join(ids.as("b"),
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    }
    val ranks = cellRanks(s, dir)
    val assigned = ranks.filter(col("arn") === 1).select(col("vec_id"), col("cid"))
    val probes = ranks.filter(col("arn") <= EdgeProbes).select(col("vec_id"), col("cid"))
    probes.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("id1"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("id2"))
      .distinct()
  }

  private[queries] def d14EdgesFor(s: SparkSession, dir: String): DataFrame =
    d14Edges.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { d14Edges.remove(d); () })
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("n2", norm2Expr(col("v")))
      val av = e.select(col("vec_id").as("id1"), col("v").as("v1"), col("n2").as("n21"))
      val bv = e.select(col("vec_id").as("id2"), col("v").as("v2"), col("n2").as("n22"))
      Caches.trackCached(d, d14Candidates(s, d).join(av, Seq("id1")).join(bv, Seq("id2"))
        .withColumn("cosine", dotExpr(col("v1"), col("v2")) / sqrt(col("n21") * col("n22")))
        .filter(col("cosine") >= 0.45)
        .select(col("id1"), col("id2"), round(col("cosine"), 4).as("cosine")))
    })

  /** d2's verified LSH edge set, built ONCE per (JVM, dir) — the same
    * memo discipline as [[d14EdgesFor]], and for the same two reasons:
    * the edge set is an index artifact consumed by three queries
    * (d2 itself, d9's clustering, d17's rollup), and memoizing ONE
    * cached frame means the consumers share a plan object, so the LSH
    * band + verify pipeline plans and materializes once per dir
    * instead of once per consuming query (d17 re-planned it twice —
    * directly and through d9 — before this memo existed). */
  private val d2Edges =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[queries] def d2EdgesFor(s: SparkSession, dir: String): DataFrame =
    d2Edges.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { d2Edges.remove(d); () })
      val docs = Caches.trackCached(d, docShingles(s, d))
      val banded = docs.select(col("doc_id"), posexplode(bandKeysUdf(col("sh"))))
        .toDF("doc_id", "band", "key")
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .distinct()
      Caches.trackCached(d, verifyJaccard(cand, docs, 0.8))
    })

  /** d9's converged cluster assignment, memoized like the edge sets:
    * the BSP fixpoint runs driver-side actions per round, so a second
    * consumer (d17's rollup) re-running the loop costs real wall time
    * even with every input frame cached. */
  private val d9Clusters =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** d27's split assignment: 8/1/1 by the multiplicative hash of the
    * CLUSTER label (t24's cross-engine hash idiom) — exposed so
    * DedupSpec can drive the leakage invariant on both the cluster-
    * keyed (safe) and doc-keyed (leaky) variants. The key is reduced
    * mod p BEFORE the multiply so ids above ~3.47e9 can't overflow
    * Long (a wrapped-negative hkey would send the whole overflowed id
    * range to 'train'); the residue ≤ p−1 times 2654435761 stays under
    * 2.66e18 < Long.MaxValue in both engines, and pmod keeps the
    * result non-negative over the full id space. */
  private[graft] def d27Split(labeled: DataFrame,
      keyCol: String = "cluster_id"): DataFrame =
    labeled
      .withColumn("hkey",
        pmod(pmod(col(keyCol), lit(1000000007L)) * 2654435761L, lit(1000000007L)))
      .withColumn("split",
        when(col("hkey") % 10 < 8, "train")
          .when(col("hkey") % 10 === 8, "val")
          .otherwise("test"))
      .drop("hkey")

  private def d9ClustersFor(s: SparkSession, dir: String): DataFrame =
    d9Clusters.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { d9Clusters.remove(d); () })
      val pairs = d2EdgesFor(s, d).select("doc1", "doc2")
      Caches.trackCached(d, minLabelClusters(pairs, d))
    })

  private val T = 0.5 // Jaccard threshold for d3 (planted dups are ≥0.9)

  /** PPJoin positional filter — lossless tightening of the prefix
    * candidate join. A shared prefix token at 1-based ranks (i, j) in
    * the (df, token) global order caps the overlap at
    * 1 + min(|A|−i, |B|−j) (every common token sits at rank ≥ i in A
    * and ≥ j in B), while J ≥ t needs overlap ≥ t/(1+t)·(|A|+|B|).
    * If J ≥ t the FIRST common token's row pair always passes, so the
    * distinct candidate set keeps every true pair; rows that cannot
    * reach the minimum overlap are pruned before the (expensive)
    * verify. The 1e-9 slack guards the double rounding of the exact
    * rational bound from ever rounding UP past an integer (over-pruning
    * would break losslessness; over-admitting just costs one verify). */
  private def positionalBound(szA: Column, rkA: Column, szB: Column, rkB: Column): Column =
    lit(1) + least(szA - rkA, szB - rkB) >=
      ceil(lit(T / (1.0 + T)) * (szA + szB) - lit(1e-9))

  private[graft] val intersectUdf =
    udf((a: Seq[Long], b: Seq[Long]) =>
      if (a == null || b == null) 0L
      else graft.functions.Hashing.sortedIntersectCount(a, b))

  /** Exact-Jaccard verification of candidate (doc1, doc2) pairs.
    * Shingles are interned to SORTED xxhash64 arrays once per doc, so
    * each of the (many) candidate pairs costs one primitive merge scan
    * instead of a per-pair string hash set (at sf0.1 d3 verifies ~310k
    * candidate pairs — this stage dominated its runtime before).
    * |A∩B| over 64-bit hashes equals the string intersection except
    * under an xxhash64 collision inside one pair's union (~10⁻¹⁴ per
    * pair) — the standard trade for set-similarity verify at scale. */
  /** `memoDir` (r17): when set, the interned sorted-hash arrays are
    * cached per dir — d3 and d6 verify against the identical corpus
    * interning, which otherwise re-hashes and re-sorts every shingle
    * list per invocation (the candidate generators already memoize). */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame, t: Double,
      memoDir: Option[String] = None): DataFrame = {
    val internedRaw = docs.select(col("doc_id"),
      array_sort(transform(filter(col("sh"), s => s.isNotNull),
        s => xxhash64(s))).as("shi"), col("sz"))
    val interned = memoDir.fold(internedRaw)(Caches.trackCached(_, internedRaw))
    val a = interned.select(col("doc_id").as("doc1"), col("shi").as("shi1"), col("sz").as("sz1"))
    val b = interned.select(col("doc_id").as("doc2"), col("shi").as("shi2"), col("sz").as("sz2"))
    cand.join(a, "doc1").join(b, "doc2")
      .withColumn("inter", intersectUdf(col("shi1"), col("shi2")))
      .withColumn("jaccard",
        col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= t)
      .select(col("doc1"), col("doc2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc1", "doc2")
  }

  /** A side's LSH band table: one (doc_id, band, key) row per band. */
  private def bandsOf(side: DataFrame): DataFrame =
    docShinglesOf(side)
      .select(col("doc_id"), posexplode(bandKeysUdf(col("sh"))))
      .toDF("doc_id", "band", "key")

  /** D24's landed artifact: the corpus (doc_id % 10 != 0) band table
    * written once per (JVM, source dir) as band-partitioned parquet —
    * the same landing contract as x19's IVF index. Three BIGINT-ish
    * columns; at 100 TB the artifact is ~16 rows × 16 B per corpus
    * doc, appended per ingest batch, never rebuilt. */
  private val d24Landing = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def bandLandingFor(s: SparkSession, dir: String): String = {
    // revalidate the memo against THIS session's catalog: after a
    // session stop/recreate in the same JVM without Caches.release the
    // memoized name dangles (the new in-memory catalog lacks the
    // table) where a path-based landing would still read fine
    val memo = d24Landing.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) d24Landing.remove(dir, memo)
    d24Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        dir.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_d24_bands_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_d24_${pid}_$tag")
      Caches.track(d)(() => {
        d24Landing.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      // BUCKETED by key, the high-cardinality half of the serve join's
      // (band, key) equi-key: hash distribution on key co-locates every
      // (band, key) pair, which satisfies the join's clustered
      // distribution — so classifying a batch never re-shuffles the
      // landed corpus bands, exactly like d26's gram index (same
      // murmur3 repartition → one file per bucket, see s18).
      bandsOf(Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
        .repartition(32, col("key"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "key").sortBy("key")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** E20's landed DELTA band table: wave-1 arrivals (doc_id % 20 == 0)
    * are classified against the d24 corpus index, the NOVEL ones are
    * admitted, and their bands land ONCE per (JVM, dir) as a second
    * bucketed table with d24's exact bucket spec — the index-
    * maintenance leg of ingest. The BASE index files are never
    * rewritten (lambda shape: base + small delta, folded at compaction
    * cadence — x21's story applied to the band family); DedupSpec pins
    * the base landing byte-untouched across the append. */
  private val e20Delta = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def e20DeltaLandingFor(s: SparkSession, dir: String): String = {
    val memo = e20Delta.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) e20Delta.remove(dir, memo)
    e20Delta.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_e20_delta_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e20_${pid}_$tag")
      Caches.track(d)(() => {
        e20Delta.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      val wave1 = Tables.documents(s, d).filter(col("doc_id") % 20 === 0)
      val wave1Bands = bandsOf(wave1)
      val admitted = classifyBatch(s, d, wave1.select("doc_id", "text"),
          wave1Bands,
          s.table(bandLandingFor(s, d)).select("doc_id", "band", "key"))
        .filter(col("status") === "novel").select("doc_id")
      // the delta carries one sentinel row (band = −1, a value no real
      // band index takes) per admitted doc, so an admitted doc too
      // short to shingle is STILL registered — its wave-2 exact
      // duplicates must see it in the widened corpus even though it
      // contributes no band candidates. Bands come from the frame the
      // classifier already featurized — no second shingle pass.
      wave1Bands.join(admitted, Seq("doc_id"), "left_semi")
        .unionByName(admitted
          .select(col("doc_id"), lit(-1).as("band"), lit(0L).as("key")))
        .repartition(32, col("key"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "key").sortBy("key")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** d28/d29's delta split of the verified edge set — in production
    * the delta is the current ingest batch's new near-dup edges; here
    * a deterministic 20% carve of d2's edges plays that role. */
  private[graft] def d28IsDelta: Column =
    (col("doc1") * 31 + col("doc2")) % 5 === 0

  private[graft] def d29Partition(c: Column): Column =
    pmod(c, lit(16L)).cast("int")

  /** D29's landed artifact: the CONVERGED dup-cluster labels (the d9
    * fixpoint over the pre-delta edge set) written once per (JVM, dir)
    * as parquet partitioned by `part = pmod(cluster_id, 16)` — the
    * label STORE a production incremental-CC pipeline reads instead of
    * re-running the O(graph) fixpoint per batch. Label-keyed
    * partitioning makes the merge write-back surgical: a cluster's
    * rows live in one partition, so dynamic-partition-overwrite
    * replaces exactly the partitions affected clusters touch and
    * leaves every other partition's files byte-identical (SinkSpec-
    * style pin in DedupSpec). At 100 TB `part` widens to O(thousands)
    * and the same physics holds — rewrite cost is O(affected
    * partitions), not O(label store). */
  private val d29Landing = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] val d29Schema = "doc_id BIGINT, cluster_id BIGINT, part INT"

  private[graft] def labelLandingFor(s: SparkSession, dir: String): String = {
    // revalidate against the filesystem: a released dir's landing was
    // deleted by trackPath, so a dangling memo must rebuild
    val memo = d29Landing.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) d29Landing.remove(dir, memo)
    d29Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_d29_${pid}_$tag")
      Caches.track(d)(() => { d29Landing.remove(d); () })
      Caches.trackPath(d, out)
      val edges = d2EdgesFor(s, d).select("doc1", "doc2")
      minLabelClusters(edges.filter(!d28IsDelta), d)
        .select(col("doc_id"), col("cluster_id"),
          d29Partition(col("cluster_id")).as("part"))
        .repartition(16, col("part"))
        .write.mode("overwrite").partitionBy("part")
        .parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** D18/D24's shared serve pipeline: classify the arriving batch
    * (doc_id % 10 == 0) as exact / near / novel against corpus bands
    * from EITHER source — d18 recomputes them in-plan, d24 reads the
    * landed artifact — with identical downstream semantics: exact dups
    * via a text equi-join (content-hash bucket probe at scale, takes
    * precedence), candidates via the (band, key) equi-join, the same
    * lossless exact-Jaccard verify as d2, and a deterministic argmax
    * (best rounded Jaccard, then smallest corpus id). */
  private def classifyBatchAgainst(s: SparkSession, dir: String,
      corpusBands: DataFrame): DataFrame = {
    val batch = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
    classifyBatch(s, dir, batch.select("doc_id", "text"), bandsOf(batch), corpusBands)
  }

  /** The band-axis classifier over a PRE-FEATURIZED batch: `batch` is
    * (doc_id, text), `batchBands` its (doc_id, band, key) rows — so
    * e15's composed verdict can feed both from one checkpointed
    * arrival scan instead of re-deriving the batch per axis.
    * `corpusDocs` is the exact-axis text table (defaults to the
    * standard corpus split; e20 passes corpus ∪ admitted-delta so
    * freshly admitted documents participate in every axis). */
  private def classifyBatch(s: SparkSession, dir: String, batch: DataFrame,
      batchBands: DataFrame, corpusBands: DataFrame,
      corpusDocsOpt: Option[DataFrame] = None): DataFrame = {
    val corpus = corpusDocsOpt.getOrElse(
      Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0))
    val exact = batch.as("b")
      .join(corpus.as("c"), col("b.text") === col("c.text"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(min(col("c.doc_id")).as("exact_id"))
    val sh = Caches.trackCached(dir, docShingles(s, dir))
    val cand = batchBands.as("a").join(corpusBands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    val best = verifyJaccard(cand, sh, 0.8)
      .groupBy(col("doc1").as("doc_id"))
      .agg(max(struct(col("jaccard").as("j"), (-col("doc2")).as("nk"),
        col("doc2").as("k"))).as("_b"))
      .select(col("doc_id"), col("_b.k").as("near_id"), col("_b.j").as("near_j"))
    batch.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, lit("exact"))
          .when(col("near_id").isNotNull, lit("near"))
          .otherwise(lit("novel")).as("status"),
        coalesce(col("exact_id"), col("near_id")).as("match_id"),
        when(col("exact_id").isNotNull, lit(1.0))
          .otherwise(col("near_j")).as("similarity"))
      .orderBy("doc_id")
  }

  /** e15/e34's shared arrival featurization — ONE batch scan: the
    * arrival slice is read once and featurized once — text, length,
    * shingles (band axis), gram hashes (substring axis), plus the
    * source/lang keys the e34 axes derive from — into an
    * eagerly-checkpointed frame all axes consume (the semantic axis
    * keys on the arrival ids; its vectors ride the d14 memo). Before
    * this, each axis re-derived and re-hashed the batch independently
    * (three text passes); at 100 TB/day of arrivals that's redundant
    * corpus-scale scans per ingest. Checkpoint size is
    * batch-proportional (shingles + one 8-byte hash per char
    * position). */
  private val e15Arrival =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def e15ArrivalFor(s: SparkSession, dir: String): DataFrame =
    // memoized per (session, dir) (r17; session added per the r17
    // advisor — a dir-only key would serve a LogicalRDD bound to a
    // stopped session, with unrecoverable truncated lineage, to a new
    // session that skipped Caches.release; the MatchQueries.ctxCache
    // convention): every invocation previously cut a FRESH
    // localCheckpoint — re-featurizing the arrival batch once per
    // consumer per bench pass; the memo also gives e15/e34 the same
    // LogicalRDD, so the shared verdict cache below can hit
    e15Arrival.computeIfAbsent((s, dir), { case (_, d) =>
      Caches.track(d)(() => { e15Arrival.remove((s, d)); () })
      Caches.checkpointed(d,
        withShingles(Tables.documents(s, d)
            .filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"), col("text"), col("source"), col("lang")))
          .withColumn("len", length(col("text")))
          .withColumn("grams",
            graft.plans.GraftGramHashes.column(col("text"), 60)))
    })

  /** e15's three-axis dedup verdict over the checkpointed arrival
    * frame — factored so e34 composes it with the language/perplexity/
    * domain axes without a second featurization. */
  // cached per dir (r17): e15 AND e34 consume the identical three-axis
  // verdict over the same memoized arrival — e34 previously re-ran the
  // whole band/substring/semantic probe machinery on top of e15's own
  // run (the langVerdictsAll memo precedent, applied to the composed
  // dedup verdict). e34 joins the UNORDERED cached frame; e15's query
  // adds its display sort on top.
  private def e15VerdictCached(s: SparkSession, dir: String,
      arrival: DataFrame): DataFrame =
    Caches.trackCached(dir, e15VerdictBody(s, dir, arrival))

  private def e15VerdictOf(s: SparkSession, dir: String,
      arrival: DataFrame): DataFrame =
    e15VerdictCached(s, dir, arrival).orderBy("doc_id")

  private def e15VerdictBody(s: SparkSession, dir: String,
      arrival: DataFrame): DataFrame = {
    val band = classifyBatch(s, dir, arrival.select("doc_id", "text"),
      arrival.select(col("doc_id"), posexplode(bandKeysUdf(col("sh"))))
        .toDF("doc_id", "band", "key"),
      s.table(bandLandingFor(s, dir))
        .select(col("doc_id"), col("band"), col("key")))
    val subBatch = arrival
      .filter(col("text").isNotNull && col("len") >= 60)
      .select(col("doc_id"), col("text"), col("len"))
    val bg = arrival.filter(col("text").isNotNull && col("len") >= 60)
      .select(col("doc_id").as("b_id"), posexplode(col("grams")).as(Seq("ib", "h")))
    val sub = substringAdmission(s, dir, subBatch, bg).select(col("doc_id"),
      col("n_partners").as("sub_partners"),
      col("best_match").as("sub_match"),
      col("dup_chars").as("sub_dup_chars"),
      col("coverage_pct").as("sub_coverage"),
      col("admit").as("sub_admit"))
    // semantic axis: the d14 edge memo restricted to batch↔corpus
    // pairs (embeddings' vec_id parallels documents' doc_id in this
    // schema), deterministic argmax: highest rounded cosine, then
    // smallest corpus id — the d18 tie-break convention
    val cross = d14EdgesFor(s, dir)
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(
        when(col("id1") % 10 === 0, col("id1")).otherwise(col("id2")).as("doc_id"),
        when(col("id1") % 10 === 0, col("id2")).otherwise(col("id1")).as("sem_id"),
        col("cosine"))
    val semBest = cross.groupBy("doc_id")
      .agg(max(struct(col("cosine").as("c"), (-col("sem_id")).as("n"))).as("b"))
      .select(col("doc_id"), (-col("b.n")).as("sem_match"), col("b.c").as("sem_cosine"))
    band
      .join(sub, Seq("doc_id"), "left")
      .join(semBest, Seq("doc_id"), "left")
      .select(col("doc_id"), col("status"), col("match_id"), col("similarity"),
        coalesce(col("sub_partners"), lit(0L)).as("sub_partners"),
        col("sub_match").cast("long").as("sub_match"),
        coalesce(col("sub_dup_chars"), lit(0L)).as("sub_dup_chars"),
        coalesce(col("sub_coverage"), lit(0.0)).as("sub_coverage"),
        coalesce(col("sub_admit"), lit(true)).as("sub_admit"),
        col("sem_match").cast("long").as("sem_match"),
        col("sem_cosine"),
        (col("status") === "novel" && coalesce(col("sub_admit"), lit(true)) &&
          col("sem_match").isNull).as("admit"))
  }

  /** e34's admission thresholds: perplexity gate in bits per trigram
    * (sf0.01 arrival xent3 spans 4.2–5.4, median 5.11 — both branches
    * fire) and the per-domain history budget (sf0.01 history counts
    * span 0–40 over 98 domains, the .com cluster straddling 12). */
  private[graft] val E34PplAdmitBits = 5.2
  private[graft] val E34DomainCapDocs = 12L

  /** The df-RANKED token table (one row per (doc, shingle) with its
    * corpus df-rank inside the doc) — the shared front of every
    * prefix-filter family member: d3/d6 keep the (1−t)·sz+1 rarest
    * prefix, d31 additionally posts the full ranked big side. The
    * lineage is IDENTICAL across the three, so it is cached per dir
    * (r17 optimization round — each query previously re-exploded and
    * re-ranked the 2.4M-token table per invocation). */
  private[graft] def rankedTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Caches.trackCached(dir, docShingles(s, dir))
    val tok = docs.select(col("doc_id"), col("sz"), explode(col("sh")).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("t").asc)
    Caches.trackCached(dir, tok.join(freq, "t")
      .withColumn("rk", row_number().over(w))
      .select(col("t"), col("doc_id"), col("sz"), col("rk")))
  }

  /** D3's candidate stage (prefix equi-join + lossless size band +
    * positional bound), shared by the query and the scaling-growth
    * measurement tool (BASELINE.md records the candidate-count
    * exponent measured through this exact plan). */
  private[graft] def d3Candidates(s: SparkSession, dir: String): DataFrame = {
    val pref = rankedTokens(s, dir)
      .filter(col("rk") <= floor((lit(1.0) - T) * col("sz")) + 1)
    pref.as("a").join(pref.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id") &&
          // lossless size band: J ≥ t ⇒ t·|B| ≤ |A| (for |A| ≤ |B|)
          col("a.sz") >= lit(T) * col("b.sz") && col("b.sz") >= lit(T) * col("a.sz") &&
          positionalBound(col("a.sz"), col("a.rk"), col("b.sz"), col("b.rk")))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
  }

  val queries: Map[String, QueryFn] = Map(
    // ---- D3: exact n-gram Jaccard dedup via prefix-filtered join ----
    "d3_ngram_jaccard" -> ((s, dir) =>
      verifyJaccard(d3Candidates(s, dir), Caches.trackCached(dir, docShingles(s, dir)), T,
        memoDir = Some(dir))),

    // ---- D2: MinHash + LSH banding. The signature is one primitive JVM
    // pass per doc (32 derived hashes per shingle), not an interpreted
    // nested-lambda expression. The oracle is the EXHAUSTIVE exact
    // Jaccard ≥ 0.8 pair set (DuckDB), so the gate asserts 100% LSH
    // recall on this fixture — honest, because the planted dups sit at
    // J ≥ 0.9 where the per-pair miss probability is (1−J⁴)⁸ ≈ 2·10⁻⁴;
    // a hash mismatch here would flag genuine signature drift. ----
    "d2_minhash_lsh" -> ((s, dir) => d2EdgesFor(s, dir)),

    // ---- D4: SimHash + pigeonhole chunk blocking. Features are the
    // word 3-gram SHINGLES, not unigrams: on a small shared vocabulary
    // every doc contains nearly every word, so a unigram simhash is
    // almost constant; shingle features separate planted near-dups from
    // the background. The signature uses Hashing.simhashPoly — four
    // polynomial-mod-2³¹−1 feature hashes whose arithmetic never leaves
    // signed-64-bit range, so the DuckDB oracle recomputes the IDENTICAL
    // signature and the whole pipeline is hash-gated. ----
    "d4_simhash" -> ((s, dir) => {
      // shingle-less (<3-word) docs carry no lexical evidence: their
      // signature would be the constant 0, pairing every short doc
      // with every other at hamming 0 — exclude them from signature
      // blocking entirely (same contract as the band kernels; exact
      // dedup still catches identical short docs)
      val sim = docShingles(s, dir)
        .filter(size(filter(col("sh"), sh => sh.isNotNull)) > 0)
        .select(col("doc_id"), simhashUdf(col("sh")).as("simhash"))
      val chunked = sim.select(col("doc_id"), col("simhash"),
          explode(expr(
            "transform(sequence(0, 3), c -> struct(c AS c, shiftright(simhash, c*16) & 65535 AS v))"))
            .as("ck"))
        .select(col("doc_id"), col("simhash"), col("ck.c").as("c"), col("ck.v").as("v"))
      chunked.as("a").join(chunked.as("b"),
          col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
          expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc1", "doc2")
    }),

    // ---- D6: benchmark decontamination — flag "training" docs that
    // near-duplicate a "benchmark" doc (doc_id % 20 == 0 plays the
    // held-out set). Same lossless prefix-filter machinery as d3, but
    // candidates cross the two sets instead of self-joining. ----
    "d6_decontaminate" -> ((s, dir) => {
      val docs = Caches.trackCached(dir, docShingles(s, dir))
      val pref = rankedTokens(s, dir)
        .filter(col("rk") <= floor((lit(1.0) - T) * col("sz")) + 1)
      val bench = pref.filter(col("doc_id") % 20 === 0)
      val train = pref.filter(col("doc_id") % 20 =!= 0)
      val cand = train.as("a").join(bench.as("b"),
          col("a.t") === col("b.t") &&
            col("a.sz") >= lit(T) * col("b.sz") && col("b.sz") >= lit(T) * col("a.sz") &&
            positionalBound(col("a.sz"), col("a.rk"), col("b.sz"), col("b.rk")))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .distinct()
      verifyJaccard(cand, docs, T, memoDir = Some(dir))
        .select(col("doc1").as("train_doc"), col("doc2").as("benchmark_doc"), col("jaccard"))
        .orderBy("train_doc", "benchmark_doc")
    }),

    // ---- D10: boilerplate-span coverage — the C4/Dolma curation pass
    // that measures, per document, how much of it is covered by spans
    // the whole corpus repeats (navigation chrome, license footers,
    // templated headers). Spans = contiguous token bigrams with
    // corpus-wide document frequency ≥ 10; a token is "boilerplate"
    // when any such span covers its position, and coverage merges
    // overlapping spans by counting DISTINCT covered positions, not
    // span hits. All counts BIGINT; ratio as integer percent via div.
    // Scale: one shuffle on the span key (df partial-aggregates
    // map-side), the df table joins back (broadcast here, plain hash
    // join at 100 TB), and coverage is a (doc, position) distinct — a
    // second key-partitioned agg. No windows, no driver loops. ----
    "d10_boilerplate" -> ((s, dir) => {
      // fan-out before the bigram explode: the cached gram frame
      // otherwise inherits the fixture scan's single partition and
      // every consumer re-reads it serially (r17, guide §2.5)
      val docs = graft.operators.ScanFan.byKey(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).as("n_tokens")),
        col("doc_id"))
      // cached: the bigram explosion feeds BOTH the df table and the
      // coverage join — uncached it re-parses and re-explodes the
      // corpus twice (same idiom as d6's shingle cache; released
      // through Caches)
      val grams = Caches.trackCached(dir, docs
        .select(col("doc_id"), posexplode(expr(
          "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
            " (a, b) -> concat(a, '_', b))")).as(Seq("p", "g"))))
      val df = grams.select(col("g"), col("doc_id")).distinct()
        .groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 10)
      val covered = grams.join(df, Seq("g"))
        .select(col("doc_id"), explode(array(col("p"), col("p") + 1)).as("pos"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_covered"))
      docs.select(col("doc_id"), col("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          coalesce(col("n_covered"), lit(0L)).as("n_covered"))
        // counts >= 0, so truncating div == DuckDB's flooring //
        .withColumn("covered_pct", expr("(100 * n_covered) div n_tokens"))
        .orderBy("doc_id")
    }),

    // ---- D7: deterministic stratified sampling — ~20% per source via
    // Knuth multiplicative hashing of the doc id (stable across runs
    // and engines; no rand()). The id reduces mod p BEFORE the
    // multiply (d27's advisor fix, applied to every threshold-style
    // hash in the suite): a raw doc_id·2654435761 wraps Long past
    // id ≈ 3.47e9, and a negative product % 100 is negative — always
    // `< 20`, so the overflowed id range would be sampled at 100%. ----
    "d7_stratified_sample" -> ((s, dir) => {
      val keep = pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L,
        lit(1000000007L)) % 100 < 20
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("total_docs"),
          count(when(keep, 1)).as("sampled_docs"),
          array_join(transform(sort_array(collect_list(when(keep, col("doc_id")))),
            x => x.cast("string")), ",").as("sampled_ids"))
        .orderBy("source")
    }),

    // ---- D8: per-stratum exact-k sample — each source contributes its
    // k=5 docs with the smallest multiplicative-hash key (deterministic
    // reservoir equivalent: stable across runs, engines, and
    // partitionings; no rand()). Window is partitioned by source, so
    // every stratum samples in parallel. ----
    "d8_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(col("hkey").asc_nulls_last, col("doc_id").asc_nulls_last)
      Tables.documents(s, dir)
        .withColumn("hkey", (col("doc_id") * 2654435761L) % 1000003L)
        .withColumn("pick", row_number().over(w))
        .filter(col("pick") <= 5)
        .select(col("source"), col("pick"), col("doc_id"))
        .orderBy("source", "pick")
    }),

    // ---- D35: temperature-weighted mixture sampling — the
    // multi-source data-mixing pass (GPT-3/PaLM style): source s is
    // sampled with probability ∝ n_s^α (α = 0.5), up-weighting small
    // sources so no giant source dominates the mix, against a fixed
    // budget of total/5 docs; a per-source rate > 1 clamps to 1 (a
    // tiny source can't yield more docs than it has). The doc-level
    // decision reuses d7's overflow-safe multiplicative hash at 2²⁰
    // granularity. Cross-engine doubles: sqrt is correctly rounded in
    // both engines, the normalizer folds per-source terms in SOURCE
    // order (t18's sorted-fold convention), and each rate is the same
    // multiply/divide sequence — identical terms, identical order,
    // identical bits, so the threshold comparisons agree exactly.
    // Scale: one source-keyed count, a Heaps-tiny rate table broadcast
    // back onto the corpus, one source-keyed count of the kept set —
    // no corpus shuffle beyond the two aggregates. ----
    "d35_mixture_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      mixtureSampleFrom(docs,
        docs.groupBy("source").agg(count(lit(1)).cast("long").as("n_docs")))
    }),

    // ---- E36: mixture refresh — d35's landed leg. The source-count
    // store is the smallest additive Z-set in the suite (one row per
    // source), so the t51/t55 refresh contract applies verbatim: the
    // arrival slice (the shared %9 carve) aggregates ALONE and adds
    // into the landed base; rates derive from the merged counts via
    // the IDENTICAL IEEE sequence, so serve ≡ retrain is the d35
    // oracle unchanged. ----
    "e36_mixture_refresh" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val store = s.read.schema(mixCountSchema).parquet(mixStoreFor(s, dir))
      val delta = docs.filter(PipelineQueries.bpeIsDelta)
        .groupBy("source").agg(count(lit(1)).cast("long").as("n_docs"))
      val merged = store.unionByName(delta)
        .groupBy("source").agg(sum("n_docs").cast("long").as("n_docs"))
        .filter(col("n_docs") > 0)
      mixtureSampleFrom(docs, merged)
    }),

    // ---- E37: mixture forget — the store's erasure leg (the shared
    // e24 deletion carve): the deleted docs' own per-source counts
    // merge in at NEGATIVE sign (zero-count sources drop), and the
    // sampling pass runs over the kept corpus via the null-keeping
    // predicate carve (a null-id doc never equi-matches a deletion
    // batch, so it is KEPT — e24DeletedKeptPredSql's arm). Serve ≡
    // retrain-on-remainder, the t56/t61 contract. ----
    "e37_mixture_forget" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val delPred = col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1
      val store = s.read.schema(mixCountSchema).parquet(mixStoreFor(s, dir))
      val delta = docs.filter(PipelineQueries.bpeIsDelta)
        .groupBy("source").agg(count(lit(1)).cast("long").as("n_docs"))
      val deleted = docs.filter(delPred)
        .groupBy("source").agg((-count(lit(1))).cast("long").as("n_docs"))
      val merged = store.unionByName(delta).unionByName(deleted)
        .groupBy("source").agg(sum("n_docs").cast("long").as("n_docs"))
        .filter(col("n_docs") > 0)
      mixtureSampleFrom(docs.filter(coalesce(!delPred, lit(true))), merged)
    }),

    // ---- D12: fixed-iteration PageRank — iterative distributed graph
    // compute beyond d9's reachability: node importance over the
    // order↔part bipartite graph (both directions, so no dangling
    // nodes), 5 synchronous rounds of r' = 0.15 + 0.85·Σ r/deg. All
    // arithmetic is BIGINT on a 10⁶-scaled rank with integer division
    // at each contribution — deterministic under ANY summation order,
    // which is what lets a multi-round double-free PageRank hash-gate
    // against the DuckDB twin (5 unrolled CTE rounds). Scale: each
    // round is one hash join (ranks×edges on src) + one key aggregate
    // (dst) — the standard BSP shape; degrees compute once; node ids
    // disambiguate the two partitions arithmetically (2k / 2k+1), no
    // strings shuffled. Top-20 via partial TakeOrdered. ----
    "d12_pagerank" -> ((s, dir) => {
      val edges1 = Caches.trackCached(dir, Tables.lineitem(s, dir)
        .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
        .distinct())
      val edges = edges1.unionByName(
        edges1.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // Pre-partition the cached edge frame by the join key: every BSP
      // round joins edges×ranks on src, and a cached HashPartitioning
      // on src is reused by all 5 rounds — only the (tiny) rank frame
      // shuffles per round, not the 2.4M-row edge table (the classic
      // Pregel edge-partitioning optimization; ~5.4 s → ~3 s at sf0.1).
      val edgesDeg = Caches.trackCached(dir, edges.join(deg, Seq("src")).repartition(col("src")))
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to 5) {
        val contrib = edgesDeg.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("rank div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("inflow"))
        // cache each round: the rank frame is tiny (one row per node)
        // but feeds the next round's broadcast build — uncached, round
        // k's lineage re-executes rounds 1..k-1, turning 5 rounds of
        // work into 15 (the O(R²) BSP recompute trap d9 also avoids).
        // Every round's frame must stay resident until the final action
        // (unpersisting early reopens the trap), so release is deferred
        // to the dir's Caches lifecycle.
        ranks = Caches.trackCached(dir, contrib.select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * inflow) div 100")).as("rank")))
      }
      val out = ranks
        .select(col("node"), when(col("node") % 2 === 0, "order").otherwise("part").as("node_type"),
          (col("node") / 2).cast("long").as("entity_id"), col("rank"))
        .orderBy(col("rank").desc, col("node").asc)
        .limit(20)
        .select("node_type", "entity_id", "rank")
      out
    }),

    // ---- D9: duplicate-cluster connected components — the canonical
    // post-dedup step: near-dup PAIRS (d2's verified J ≥ 0.8 edge set)
    // become clusters via min-label propagation to fixpoint, keeping
    // each cluster's smallest doc_id as canonical. The driver loop is
    // the standard BSP iteration (GraphX/Pregel's shape) — each round
    // is one key-hash join + partial-aggregated groupBy, and labels
    // converge in O(cluster diameter) rounds, which for near-dup
    // clusters is 2-3; at 100 TB the large-star/small-star variant of
    // the same joins bounds the round count at O(log n). Deterministic
    // exact fixpoint → hash-gated via a DuckDB recursive CTE over the
    // identical edge set. ----
    "d9_dup_clusters" -> ((s, dir) =>
      // edges AND the converged assignment are memoized per (JVM, dir)
      // — built once, dropped by Caches.release; see d9ClustersFor
      d9ClustersFor(s, dir).orderBy("doc_id")),

    // ---- D28: INCREMENTAL connected components — the dup graph is
    // append-mostly in production (each ingest batch contributes new
    // near-dup edges), and re-running the full BSP fixpoint nightly
    // over a 100 TB corpus's edge set is the cost this operator
    // deletes: new edges only re-cluster the components they TOUCH.
    // Mechanics: old labels (the converged fixpoint over the old edge
    // set) identify affected components via the delta's endpoints; the
    // subgraph = affected components' old edges ∪ delta re-runs the
    // same BSP min-label kernel; every other component's labels pass
    // through untouched (an anti-join, no recompute). Work is
    // O(affected subgraph + one pass over labels), not O(graph) — the
    // merge-two-components case and the absorb-isolated-node case both
    // fall out of re-clustering the touched subgraph. The oracle is
    // d9's FULL recursive-CTE recompute over all edges, so the hash
    // gate proves merge(labels_old, delta) ≡ recompute(edges_all) —
    // the IVM contract, applied to a fixpoint computation. ----
    "d28_incremental_cc" -> ((s, dir) => {
      val edges = d2EdgesFor(s, dir).select("doc1", "doc2")
      val labelsOld = minLabelClusters(edges.filter(!d28IsDelta), dir)
        .select(col("doc_id"), col("cluster_id"))
      val delta = edges.filter(d28IsDelta)
      val deltaNodes = delta.select(col("doc1").as("doc_id"))
        .unionByName(delta.select(col("doc2").as("doc_id"))).distinct()
      val affected = labelsOld.join(deltaNodes, Seq("doc_id"), "left_semi")
        .select("cluster_id").distinct()
      val members = labelsOld.join(affected, Seq("cluster_id"), "left_semi")
      // an old edge's endpoints share a component, so filtering doc1
      // against the member set keeps exactly the affected subgraph
      val subEdges = edges.filter(!d28IsDelta)
        .join(members.select(col("doc_id").as("doc1")), Seq("doc1"), "left_semi")
        .unionByName(delta)
      val relabeled = minLabelClusters(subEdges, dir)
        .select(col("doc_id"), col("cluster_id"))
      labelsOld.join(affected, Seq("cluster_id"), "left_anti")
        .select(col("doc_id"), col("cluster_id"))
        .unionByName(relabeled)
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),

    // ---- D29: LANDED label store + incremental merge WRITE-BACK —
    // the production form of d28, closing the landed-artifact contract
    // (the one leg d28 stopped short of): the converged labels live in
    // a label-partitioned parquet store ([[labelLandingFor]]), the
    // serve path reads `labels_old` FROM that store (no inline
    // old-side fixpoint — DedupSpec pins exactly ONE BSP launch per
    // invocation, the affected-subgraph relabel), re-clusters only the
    // components the delta touches, and writes the merged labels BACK
    // with dynamic-partition-overwrite as the store's next version.
    // The write frame carries the full content of every TOUCHED
    // partition (relabeled rows ∪ passthrough rows co-resident in a
    // touched partition), so untouched partitions' files stay
    // byte-identical (SinkSpec-style pin) — at 100 TB the nightly
    // label update rewrites O(affected partitions), not the store.
    // The gate then reads the STORE back, so hash equality against
    // d9's full recursive-CTE recompute proves the landed artifact
    // itself — not a transient frame — equals recompute(edges_all).
    // Idempotent: a re-run merges already-merged labels onto the same
    // fixpoint, so bench re-invocations converge (same hash). ----
    "d29_landed_labels" -> ((s, dir) => {
      val path = labelLandingFor(s, dir)
      val labelsOld = s.read.schema(d29Schema).parquet(path)
      val edges = d2EdgesFor(s, dir).select("doc1", "doc2")
      val delta = edges.filter(d28IsDelta)
      val deltaNodes = delta.select(col("doc1").as("doc_id"))
        .unionByName(delta.select(col("doc2").as("doc_id"))).distinct()
      val affected = labelsOld.join(deltaNodes, Seq("doc_id"), "left_semi")
        .select("cluster_id").distinct()
      val members = labelsOld.join(affected, Seq("cluster_id"), "left_semi")
      val subEdges = edges.filter(!d28IsDelta)
        .join(members.select(col("doc_id").as("doc1")), Seq("doc1"), "left_semi")
        .unionByName(delta)
      val relabeled = minLabelClusters(subEdges, dir)
        .select(col("doc_id"), col("cluster_id"))
        .withColumn("part", d29Partition(col("cluster_id")))
      val passthrough = labelsOld
        .join(affected, Seq("cluster_id"), "left_anti")
        .select(col("doc_id"), col("cluster_id"), col("part"))
      // touched = partitions that must change content: where affected
      // clusters' rows LIVED (rows leave) ∪ where relabeled rows LAND
      val touched = members.select(col("part")).distinct()
        .unionByName(relabeled.select(col("part"))).distinct()
      // full content of each touched partition; checkpoint cuts the
      // lineage back to the store so the overwrite isn't a self-read
      val writeBack = Caches.checkpointed(dir,
        passthrough.unionByName(relabeled)
          .join(touched, Seq("part"), "left_semi"))
      // VACATED partitions: dynamic overwrite only replaces partitions
      // PRESENT in the written data, so a touched partition whose rows
      // all migrated to other labels (a cluster merge can empty its
      // old partition) would keep its stale files and the store would
      // serve each migrated doc twice. Compute the vacated set BEFORE
      // the overwrite (touched's lineage reads the pre-write store;
      // evaluating it afterwards would list deleted files), then drop
      // those directories after the write — the drop-emptied-partition
      // step every Hive-style merge runs. Both collects are bounded by
      // the partition count (16 here; O(affected partitions) in
      // production), never rows.
      val touchedVals = touched.collect().map(_.getInt(0))
      val liveVals = writeBack.select("part").distinct()
        .collect().map(_.getInt(0)).toSet
      writeBack
        .repartition(16, col("part"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("part").parquet(path)
      // deletes go through the session's Hadoop FileSystem, not
      // java.io.File: the store lives on whatever scheme `path`
      // resolves to (HDFS/S3 in production), where a local-File delete
      // silently no-ops and the stale partition serves migrated docs
      // twice — the exact bug this cleanup exists to prevent
      val hconf = s.sparkContext.hadoopConfiguration
      touchedVals.filterNot(liveVals).foreach { p =>
        val pp = new org.apache.hadoop.fs.Path(path, s"part=$p")
        val fs = pp.getFileSystem(hconf)
        if (fs.exists(pp)) { fs.delete(pp, true); () }
      }
      s.read.schema(d29Schema).parquet(path)
        .select(col("doc_id"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // ---- D32: right-to-be-forgotten on the CLUSTER LABELS — the
    // delete leg of the incremental-CC pair (d28 merges new edges in;
    // this takes documents OUT), and the one forget case no artifact
    // so far exercised: deletion can SPLIT a component. Removing a cut
    // vertex disconnects its cluster, so no label-local rewrite works —
    // the honest incremental shape is d28's inverted: clusters holding
    // a deleted doc are carved out (semi-joins), their surviving
    // subgraph (edges with BOTH endpoints alive) re-converges in ONE
    // bounded BSP, untouched clusters' labels pass through an
    // anti-join, and docs isolated by the deletion leave the label set
    // (the store only ever holds docs with a surviving edge). The
    // oracle recomputes components over the survivor-restricted
    // reachability from scratch, so the gate proves carve + relabel ≡
    // full recompute(survivors). Work is O(affected components +
    // delete batch), never O(graph). ----
    "d32_label_forget" -> ((s, dir) => {
      val labels = d9ClustersFor(s, dir).select("doc_id", "cluster_id")
      val deleted = e24Deleted(Tables.documents(s, dir))
      val edges = d2EdgesFor(s, dir).select("doc1", "doc2")
      val affected = labels.join(broadcast(deleted), Seq("doc_id"), "left_semi")
        .select("cluster_id").distinct()
      val members = labels.join(affected, Seq("cluster_id"), "left_semi")
      val subEdges = edges
        .join(members.select(col("doc_id").as("doc1")), Seq("doc1"), "left_semi")
        .join(broadcast(deleted.select(col("doc_id").as("doc1"))), Seq("doc1"), "left_anti")
        .join(broadcast(deleted.select(col("doc_id").as("doc2"))), Seq("doc2"), "left_anti")
      val relabeled = minLabelClusters(subEdges, dir)
        .select(col("doc_id"), col("cluster_id"))
      labels.join(affected, Seq("cluster_id"), "left_anti")
        .select(col("doc_id"), col("cluster_id"))
        .unionByName(relabeled)
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),

    // ---- D27: leakage-safe train/val/test split — the contamination
    // guard t24's plain stratified split cannot give: if two near-
    // duplicate documents land on opposite sides of the train/test
    // line, the benchmark leaks (Lee et al.'s core argument for dedup
    // before splitting). The split decision here is a pure hash of the
    // CLUSTER label (d9's connected-component assignment, memoized),
    // so every member of a dup cluster lands in the same split by
    // construction — singletons (docs outside the dup graph) are their
    // own cluster. Scale: the label frame is the already-converged BSP
    // fixpoint (growth exponent 0.76, BASELINE.md); on top of it the
    // whole operator is ONE doc_id equi-join plus a map-side hash —
    // nothing here grows faster than the corpus. The gate aggregates
    // per-split doc/cluster/char totals; the DuckDB twin replays the
    // reachability + the same label-hash arithmetic, so a split that
    // hashed per-DOC instead of per-cluster mismatches (different
    // totals), and DedupSpec asserts the no-cluster-spans-splits
    // invariant directly plus that the naive per-doc split DOES leak
    // on the planted dup fixture. ----
    "d27_leakage_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val labeled = docs
        .join(d9ClustersFor(s, dir).select("doc_id", "cluster_id"),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      d27Split(labeled)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("cluster_id").as("n_clusters"),
          sum("n_chars").as("total_chars"))
        .orderBy("split")
    }),

    // ---- D13: semantic duplicate clusters — the embedding-space
    // composition of d5 and d9: cosine-similar PAIRS (d5's exact edge
    // set) become transitive clusters via the same BSP min-label
    // fixpoint, which is how "semantically same article, different
    // wording" groups are collapsed before sampling. One canonical
    // member per cluster (smallest vec_id). The CLUSTERING is d9's
    // scale-safe BSP shape; the edge GENERATION is d14's IVF-candidate
    // + exact-verify path (hash-gated equal to the exact pair set ON
    // THE GATE FIXTURES — at larger fixtures recall follows d14's
    // nprobe/K trade-off, see EdgeProbes), so neither half carries a
    // cartesian product any more. DuckDB twin
    // rebuilds the identical edge set (exact all-pairs — legitimate in
    // the oracle, which is allowed to be brute-force) and runs the
    // recursive-CTE reachability. ----
    "d13_semantic_clusters" -> ((s, dir) => {
      // the pair set is d14's memoized cached frame — built once per
      // (JVM, dir), dropped by Caches.release
      val pairs = d14EdgesFor(s, dir)
        .select(col("id1").as("doc1"), col("id2").as("doc2"))
      minLabelClusters(pairs, dir)
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("is_canonical"))
        .orderBy("vec_id")
    }),

    // ---- D14: scale-safe semantic edge generation — the IVF-candidate
    // replacement for d5's all-pairs scan, and d13's edge source. Every
    // vector gets its home fine cell and an EdgeProbes-wide probe list
    // from the shared two-level cellRanks index (coarse level map-side
    // over the √K1-sized driver array, fine level a distributed
    // equi-join — see the quantizer docstring); candidate pairs are an
    // EQUI-JOIN of probe lists against cell assignments (symmetric: a
    // pair is found if either endpoint probes the other's cell), then
    // exact cosine
    // verifies with the same sequential-fold kernel as d5. Candidates
    // are a superset of the true pair set at sufficient nprobe, and the
    // verify admits no false positives, so the output EQUALS d5's exact
    // pair set — the oracle is literally d5's all-pairs SQL, making the
    // hash gate a 100%-recall proof ON THE GATE FIXTURES (sf0.001 and
    // sf0.01, where EdgeProbes covers every planted pair's cells; at
    // sf0.1 recall follows the probed-cell fraction — the EdgeProbes
    // docstring quantifies it). Scale: N·nprobe probe rows
    // equi-join N assignment rows on the cell key → expected
    // N²·nprobe/K candidate pairs for K cells (vs N² for d5); every
    // shuffle is key-hashed, no CartesianProduct/BroadcastNestedLoopJoin
    // anywhere (PlanSpec-pinned). ----
    "d14_semantic_edges_ivf" -> ((s, dir) =>
      d14EdgesFor(s, dir).orderBy("id1", "id2")),

    // ---- D19: quality-aware canonical selection — the curation step
    // AFTER clustering: per near-dup cluster (d9's memoized converged
    // labels; singletons are their own cluster), keep the highest-
    // quality member — longest text, ties to the smaller doc_id — not
    // the arbitrary min-id representative. One left join onto the
    // cached cluster frame, one per-cluster max-struct argmax (map-side
    // partial agg), one key-hashed join back; no windows over the
    // corpus, so the plan is three bounded shuffles at any scale. ----
    "d19_canonical_keep" -> ((s, dir) => {
      val clusters = d9ClustersFor(s, dir).select(col("doc_id"), col("cluster_id"))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val withCl = docs.join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val best = withCl.groupBy("cluster_id")
        .agg(count(lit(1)).cast("long").as("cluster_size"),
          max(struct(col("n_chars").as("nc"), (-col("doc_id")).as("nid"))).as("b"))
        .select(col("cluster_id"), col("cluster_size"), (-col("b.nid")).as("keep_id"))
      withCl.join(best, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (col("doc_id") === col("keep_id")).as("keep"))
        .orderBy("doc_id")
    }),

    // ---- D21: content-defined chunking — the storage/delta-dedup
    // modality the shingle family can't express: Rabin-style cuts
    // where the rolling 8-gram hash ≡ 0 mod 64, so chunk boundaries
    // depend only on local content and SURVIVE insertions (a one-char
    // edit re-chunks one chunk, not every fixed-size block after it).
    // Emits per-chunk (length, md5) rows — the primitive a dedup store
    // keys on; cross-doc repeated chunks then fall out of a groupBy on
    // the 16-byte digest. One O(L) map-side pass per doc (the
    // rollingHash8 arithmetic), explode ∝ corpus, no shuffle until the
    // consumer aggregates. ----
    "d21_cdc_chunks" -> ((s, dir) =>
      cdcChunkRows(s, dir)
        .select("doc_id", "chunk_no", "c_len", "c_md5")
        .orderBy("doc_id", "chunk_no")),

    // ---- D31: asymmetric CONTAINMENT join — the near-SUPERSET case
    // symmetric Jaccard structurally misses: a short document quoted
    // whole inside a much longer one has C(A→B) = |A∩B|/|A| ≈ 1 while
    // J = |A∩B|/|A∪B| is tiny (the size union swamps it), so d2/d3
    // never pair them. The ppjoin-class plan: the SMALL side keeps
    // only its (1−t)·|A|+1 rarest shingles (lossless — an overlap
    // ≥ ⌈t·|A|⌉ forces a shared token into that prefix), the big side
    // posts ALL its tokens (the honest cost of overlap joins — at
    // 100 TB the production variant df-caps the postings like x17,
    // trading tail recall for boundedness), and the positional bound
    // 1 + min(|A|−rkA, |B|−rkB) ≥ t·|A| prunes row pairs that cannot
    // reach the overlap before the exact verify. Orientation: small
    // ⊆ big (ties by id), exact |A∩B|/|A| ≥ 0.9 verified on interned
    // sorted hash arrays. DedupSpec proves the pruning lossless
    // against the exhaustive all-pairs recompute and that the planted
    // quote evades d3 at its own threshold. ----
    "d31_containment" -> ((s, dir) => {
      val ct = 0.9
      val docs = Caches.trackCached(dir, docShingles(s, dir))
      val ranked = rankedTokens(s, dir)
      // prefix length = sz − ⌈ct·sz⌉ + 1, via the same epsilon-guarded
      // ceil as the positional bound: floor((1−ct)·sz) in doubles is one
      // token SHORT whenever ct·sz is an integer (1.0−0.9 has no exact
      // binary form), silently breaking the lossless guarantee on
      // sz-multiple-of-10 docs; ⌈ct·sz⌉ never crosses an integer edge.
      val prefA = ranked.filter(
        col("rk") <= col("sz") - ceil(lit(ct) * col("sz") - lit(1e-9)) + 1)
      val cand = prefA.as("a").join(ranked.as("b"),
          col("a.t") === col("b.t") &&
            (col("a.sz") < col("b.sz") ||
              (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))) &&
            (lit(1) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) >=
              ceil(lit(ct) * col("a.sz") - lit(1e-9))))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .distinct()
      // same interning lineage as verifyJaccard's — the per-dir cache
      // is shared with d3/d6's entry (r17)
      val interned = Caches.trackCached(dir, docs.select(col("doc_id"),
        array_sort(transform(filter(col("sh"), x => x.isNotNull),
          x => xxhash64(x))).as("shi"), col("sz")))
      cand
        .join(interned.select(col("doc_id").as("doc1"),
          col("shi").as("shi1"), col("sz").as("sz1")), "doc1")
        .join(interned.select(col("doc_id").as("doc2"),
          col("shi").as("shi2")), "doc2")
        .withColumn("inter", intersectUdf(col("shi1"), col("shi2")))
        .filter(col("inter") * lit(1.0) / col("sz1") >= ct)
        .select(col("doc1"), col("doc2"),
          round(col("inter") / col("sz1"), 4).as("containment"))
        .orderBy("doc1", "doc2")
    }),

    // ---- D33: winnowed MATCH pipeline — t45's consumer, the MOSS
    // overlap detector run on the SELECTED fingerprints instead of
    // d23's full df-capped gram table: the index holds an expected
    // 2/(W+1) ≈ 22% of corpus positions yet keeps the guarantee (any
    // shared substring ≥ K+W−1 = 27 chars shares a selected
    // fingerprint, so the pair cannot be missed — only its exact span
    // extent is coarser than d23's). Propose-cheap/verify-exact like
    // d23: fingerprint equi-join on the 8-byte hash with the same
    // df ≤ 64 hot-hash guard (mirrored in the oracle), then byte
    // verification of the 20-gram at both positions through the
    // offset-independent slicer — a hash collision proposes and then
    // dies in verify. At 100 TB this is the index you land when d26's
    // full gram index is too large: 4.5× fewer rows for the same
    // ≥ 27-char detection floor. ----
    "d33_winnow_pairs" -> ((s, dir) => {
      val fps = Caches.checkpointed(dir,
        TextQueries.winnowedFingerprints(Tables.documents(s, dir))
          .select(col("doc_id"), col("fp_pos").cast("int").as("fp_pos"), col("fp_h")))
      val keep = fps.groupBy("fp_h").agg(count(lit(1)).as("c"))
        .filter(col("c") <= 64L).select("fp_h")
      val idx = fps.join(keep, Seq("fp_h"), "left_semi")
      val cand = idx.as("a").join(idx.as("b"),
          col("a.fp_h") === col("b.fp_h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("a.fp_pos").as("p1"),
          col("b.doc_id").as("d2"), col("b.fp_pos").as("p2"))
      val docs = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 27)
      cand
        .join(slicedGrams(cand, docs, "d1", "p1", 20), Seq("d1", "p1"))
        .join(slicedGrams(cand, docs, "d2", "p2", 20), Seq("d2", "p2"))
        .filter(col("g_p1") === col("g_p2"))
        .groupBy(col("d1").as("doc1"), col("d2").as("doc2"))
        .agg(count(lit(1)).cast("long").as("n_shared"),
          min("p1").cast("long").as("first_pos1"))
        .orderBy("doc1", "doc2")
    }),

    // ---- D34: winnow-index ADMISSION — the landed-artifact leg of
    // the winnow family (d24 = bands, d26 = grams, this = the 22%-size
    // fingerprint tier): the corpus fingerprint index lands ONCE
    // bucketed by the 8-byte hash ([[d34LandingFor]] — build-time
    // df ≤ 64 cap, d26's contract), each arriving batch winnows in one
    // O(L) pass per doc, equi-joins the LANDED index bucket-locally,
    // byte-verifies the 20-grams through the offset-independent slicer
    // (corpus text read only for docs holding candidates), and rolls
    // up per arrival: matched bit, distinct verified partners, best
    // partner by verified-pair count (ties to the smallest corpus id).
    // The probe side caps per (doc, hash) ≤ 64 so a degenerate
    // periodic arrival cannot explode the join and the verdict is
    // batch-composition-invariant (d26's discipline). Serve cost is
    // batch-proportional; the oracle recomputes build + serve from
    // scratch, so the gate IS the landed ≡ recomputed proof. ----
    "d34_winnow_admission" -> ((s, dir) => {
      val batch = d34BatchOf(s, dir, col("doc_id") % 10 === 0)
      winnowAdmission(s, dir, batch, d34ProbeOf(dir, batch),
        Seq(s.table(d34LandingFor(s, dir))))
    }),

    // ---- E27: admit-then-APPEND for the WINNOW index — e22's
    // maintenance leg on the fingerprint tier, completing the family's
    // lifecycle (build d34 / serve / append / forget e28 / compact
    // e29). The df-cap makes the same sharp algebra as the gram case:
    // admitting documents can push a fingerprint hash's corpus df past
    // the 64 cap, and an exact append must then EXCISE the hash from
    // serving even though its rows sit in immutable base files. df
    // only grows under append, so the three cases resolve from index
    // files alone ([[e27DeltaFor]]): base-hot hashes (the landed hot
    // sidecar) stay hot — delta rows carrying them drop; hashes whose
    // combined df stays ≤ 64 land normally; hashes the delta pushes
    // past the cap land nowhere AND tombstone the base at serve time
    // (broadcast — bounded by the delta's hash vocabulary). Wave 1
    // (doc_id % 20 == 0) admits against the landed base; wave 2
    // (doc_id % 20 == 10) serves against (base ∖ tombstones) ∪ delta.
    // The oracle nests the full winnow replay twice — wave-1 admission
    // inside the widened-corpus wave-2 recompute — so the hash gate
    // proves the capped lambda index ≡ the from-scratch index over
    // corpus ∪ admitted. ----
    "e27_winnow_append" -> ((s, dir) => {
      val (deltaTbl, tombPath) = e27DeltaFor(s, dir)
      val base = s.table(d34LandingFor(s, dir))
      val tomb = s.read.schema("fp_h BIGINT").parquet(tombPath)
      val batch = d34BatchOf(s, dir, col("doc_id") % 20 === 10)
      winnowAdmission(s, dir, batch, d34ProbeOf(dir, batch),
        Seq(base.join(broadcast(tomb), Seq("fp_h"), "left_anti"),
          s.table(deltaTbl)))
    }),

    // ---- E28: right-to-be-forgotten on the WINNOW index — e25's
    // cap-then-delete algebra on the fingerprint tier: the deletion
    // batch (e24's corpus carve) tombstones documents out of the
    // landed d34 index at serve time via a broadcast anti-join — base
    // files never rewritten, landed bucketing preserved (zero added
    // shuffle). The honest subtlety is e25's: the df ≤ 64 cap is a
    // BUILD-TIME property — deleting documents lowers a hash's df, but
    // a hash the build dropped as hot cannot be resurrected from index
    // files that never held its positions; re-admission happens at
    // compaction cadence. The oracle's capPred (cap over the FULL
    // corpus, delete after) pins exactly that algebra, and proves a
    // forgotten document neither matches nor is matched. ----
    "e28_winnow_forget" -> ((s, dir) => {
      val deleted = e24Deleted(Tables.documents(s, dir))
      val batch = d34BatchOf(s, dir, col("doc_id") % 10 === 0)
      winnowAdmission(s, dir, batch, d34ProbeOf(dir, batch),
        Seq(s.table(d34LandingFor(s, dir))
          .join(broadcast(deleted), Seq("doc_id"), "left_anti")))
    }),

    // ---- E29: WINNOW-index compaction — the cadence step that closes
    // the fingerprint family's lifecycle, mirroring e23/e26: (base ∖
    // tombstones) ∪ delta fold into ONE rebuilt bucketed table,
    // reclaiming the tombstone anti-join and the second probe side
    // e27's lambda serve pays per batch. Pure index-file work — no
    // document is re-winnowed. The gate serves wave 2 from the
    // compacted table ALONE against the same widened-corpus recompute
    // oracle as e27, so hash equality proves compaction lost and
    // invented nothing. ----
    "e29_winnow_compact" -> ((s, dir) => {
      val batch = d34BatchOf(s, dir, col("doc_id") % 20 === 10)
      winnowAdmission(s, dir, batch, d34ProbeOf(dir, batch),
        Seq(s.table(e29CompactFor(s, dir))))
    }),

    // ---- D30: chunk-store dedup accounting — d21's consumer, the
    // rollup a content-addressed store (restic/borg/LLM-corpus delta
    // storage) reports per source: chunks referenced vs chunks STORED
    // (distinct digests), raw vs post-dedup bytes, and the dedup ratio
    // in basis points. One digest-keyed aggregate over the map-side
    // chunk explode — the 100 TB shape is a single shuffle on the
    // 16-byte digest, and the per-source summary is O(sources). ----
    "d30_chunk_dedup" -> ((s, dir) => {
      val uniq = cdcChunkRows(s, dir)
        .join(Tables.documents(s, dir).select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source", "c_md5", "c_len").agg(count(lit(1)).as("n"))
      uniq.groupBy("source").agg(
          sum("n").cast("long").as("n_chunks"),
          sum(col("n") * col("c_len")).cast("long").as("raw_bytes"),
          count(lit(1)).cast("long").as("n_unique"),
          sum("c_len").cast("long").as("unique_bytes"))
        .withColumn("dedup_bp",
          when(col("raw_bytes") > 0, expr("10000 * unique_bytes div raw_bytes")))
        .orderBy("source")
    }),

    // ---- D20: cross-source contamination matrix — which SOURCES leak
    // into each other: d2's verified near-dup edges labeled with each
    // endpoint's source, rolled up per unordered source pair. The
    // provenance audit a curator runs before trusting per-source
    // stats (a scraped mirror shows up here as a heavy off-diagonal
    // cell). Pure composition: the edge set is the memoized cached
    // frame, the labels are two broadcast-sized joins on doc_id, the
    // rollup keys are O(sources²) — nothing new shuffles at scale. ----
    "d20_source_overlap" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      d2EdgesFor(s, dir)
        .join(src.select(col("doc_id").as("doc1"), col("source").as("sa")), Seq("doc1"))
        .join(src.select(col("doc_id").as("doc2"), col("source").as("sb")), Seq("doc2"))
        .groupBy(least(col("sa"), col("sb")).as("source1"),
          greatest(col("sa"), col("sb")).as("source2"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          min(col("jaccard")).as("min_j"), max(col("jaccard")).as("max_j"))
        .orderBy("source1", "source2")
    }),

    // ---- D17: dedup-yield summary — the one-row health metric a
    // curation dashboard reports per corpus snapshot: how many docs,
    // how many byte-exact duplicate groups (d1's keyspace), how many
    // verified near-dup pairs and transitive clusters (d2/d9's
    // machinery), and the final yield — docs surviving
    // keep-one-per-cluster dedup. Pure composition of gated stages;
    // every count is one aggregate over a frame the suite already
    // hash-gates, so the rollup is cheap and exactly reproducible. ----
    "d17_dedup_yield" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val nDocs = docs.agg(count(lit(1)).as("n")).select(col("n"))
      // grouped by the text VALUE for cross-engine exactness (DuckDB
      // has no xxhash64); the at-scale form groups by a 128-bit
      // content hash so only 16-byte keys shuffle — d1 gates that path
      val exactGroups = docs.groupBy(col("text"))
        .agg(count(lit(1)).as("k"))
      val clusters = d9ClustersFor(s, dir)
      nDocs.crossJoin(broadcast(
          exactGroups.agg(count(lit(1)).as("n_exact_distinct"),
            sum(expr("k - 1")).as("n_exact_dropped"))))
        .crossJoin(broadcast(d2EdgesFor(s, dir)
          .agg(count(lit(1)).as("n_neardup_pairs"))))
        .crossJoin(broadcast(clusters
          .agg(countDistinct(col("cluster_id")).as("n_clusters"),
            count(when(!col("is_canonical"), 1)).as("n_cluster_dropped"))))
        .select(col("n").as("n_docs"), col("n_exact_distinct"),
          col("n_exact_dropped"), col("n_neardup_pairs"),
          col("n_clusters"), col("n_cluster_dropped"),
          (col("n") - col("n_cluster_dropped")).as("n_kept"))
    }),

    // ---- D18: incremental ingest dedup — the operation a production
    // corpus actually runs daily: classify a NEW batch (doc_id % 10
    // == 0 plays the arriving 10%) against the EXISTING corpus as
    // exact-dup / near-dup / novel, without ever re-pairing the corpus
    // against itself. The at-scale shape is the point: the corpus's
    // band table is a persistent index (built once, appended per
    // batch), so the daily cost is shingling the BATCH and one
    // band-key equi-join of batch-bands against corpus-bands —
    // O(batch) new work against 100 TB, not O(corpus²) — followed by
    // the same lossless exact-Jaccard verify as d2. Exact dups ride a
    // separate text equi-join (a content-hash bucket probe at scale)
    // and take precedence; within-batch duplicates are deliberately
    // out of scope (d1/d2 own intra-corpus dedup). Deterministic
    // argmax (best Jaccard, then smallest corpus id) → hash-gated
    // against the exhaustive cross-split pair set. ----
    "d18_incremental_dedup" -> ((s, dir) =>
      classifyBatchAgainst(s, dir,
        bandsOf(Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0)))),

    // ---- E30: chrome-robust CRAWL classification — t47's extraction
    // composed with d18's exact/near/novel classifier, BOTH sides
    // extracted to the chrome-invariant CONTENT key (kept blocks 3+,
    // served from the LANDED extraction — the WET artifact t48 also
    // reads; pre-r15 this query re-ran the markup algebra in-plan):
    // two crawls of the same article whose PAGE BYTES differ (ids in
    // the title/h1/nav, truncated tails, different chrome) classify
    // as exact duplicates on content, where byte-level dedup sees
    // nothing. Scale shapes are d18's (the landing scan is a mapper;
    // exact = one content equi-join — content-hash bucket probe at
    // scale; near candidates via the LSH band equi-join; exact-
    // Jaccard verify on candidates only). The twin nests the shared
    // extraction replay inside the parameterized classify recompute
    // (nested-WITH subqueries), so the gate proves the landed-served
    // extract→classify ≡ its independently-recomputed stages. ----
    "e30_crawl_classify" -> ((s, dir) => {
      val ext = TextQueries.extractionLandingFor(s, dir)
        .select(col("doc_id"), col("content").as("text"))
      val batch = ext.filter(col("doc_id") % 10 === 0)
      val corpus = ext.filter(col("doc_id") % 10 =!= 0)
      val exact = batch.as("b")
        .join(corpus.as("c"), col("b.text") === col("c.text"))
        .groupBy(col("b.doc_id").as("doc_id"))
        .agg(min(col("c.doc_id")).as("exact_id"))
      val cand = bandsOf(batch).as("a").join(bandsOf(corpus).as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key"))
        .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .distinct()
      val best = verifyJaccard(cand, docShinglesOf(ext), 0.8)
        .groupBy(col("doc1").as("doc_id"))
        .agg(max(struct(col("jaccard").as("j"), (-col("doc2")).as("nk"),
          col("doc2").as("k"))).as("_b"))
        .select(col("doc_id"), col("_b.k").as("near_id"), col("_b.j").as("near_j"))
      batch.select("doc_id")
        .join(exact, Seq("doc_id"), "left")
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_id").isNotNull, lit("exact"))
            .when(col("near_id").isNotNull, lit("near"))
            .otherwise(lit("novel")).as("status"),
          coalesce(col("exact_id"), col("near_id")).as("match_id"),
          when(col("exact_id").isNotNull, lit(1.0))
            .otherwise(col("near_j")).as("similarity"))
        .orderBy("doc_id")
    }),

    // ---- D24: the band index LANDED — x19's build-once/serve-many
    // contract for the dedup side. d18's "persistent index" is a
    // per-JVM memo; a production corpus lands it: the corpus band
    // table is written ONCE as band-partitioned parquet (3 small
    // BIGINT columns — the artifact a daily ingest job mounts), and
    // classifying a batch is then shingling the BATCH plus one
    // (band, key) equi-join against the LANDED files — zero corpus
    // re-shingling, zero corpus scan on the near-dup path (only the
    // exact-dup content probe touches corpus text). The oracle is the
    // same exhaustive recomputation that gates d18, so the hash gate
    // IS the landed ≡ recomputed proof. ----
    "d24_persisted_band_index" -> ((s, dir) =>
      classifyBatchAgainst(s, dir,
        // catalog table: empty corpus lands an empty bucketed table
        // whose schema lives in the metastore — no inference hazard
        s.table(bandLandingFor(s, dir))
          .select(col("doc_id"), col("band"), col("key")))),

    // ---- D16: semantic decontamination — the embedding-space twin of
    // d6's n-gram benchmark decontamination: flag training documents
    // whose EMBEDDING is cosine-near a held-out benchmark document
    // (doc_id % 20 == 0 plays the benchmark split, same as d6), the
    // pass that catches paraphrased contamination n-gram overlap
    // misses. Pure composition: d14's gated IVF-candidate edge set
    // (recall-proven 100% vs the exact pair oracle on the gate
    // fixtures; at larger fixtures recall follows d14's nprobe/K
    // trade-off, and because MISSED contamination is the costly
    // direction DedupSpec additionally pins a cross-split recall floor
    // at sf0.1) restricted to cross-split pairs — no new scan, no new
    // kernel, and the oracle is the exact all-pairs SQL with the same
    // split predicate. ----
    "d16_semantic_decontaminate" -> ((s, dir) => {
      val e = d14EdgesFor(s, dir)
      val cross = e.filter((col("id1") % 20 === 0) =!= (col("id2") % 20 === 0))
      cross.select(
          when(col("id1") % 20 === 0, col("id2")).otherwise(col("id1")).as("train_vec"),
          when(col("id1") % 20 === 0, col("id1")).otherwise(col("id2")).as("benchmark_vec"),
          col("cosine"))
        .orderBy("train_vec", "benchmark_vec")
    }),

    // ---- D5: embedding-cosine near-dup pairs — the declared-EXACT
    // all-pairs baseline (x1_ann_brute's role for the dedup suite): it
    // anchors d14's 100%-recall hash gate and the DedupSpec recall
    // assertions. The at-scale path is d14. The dot product is a
    // primitive JVM loop with strictly sequential fold order, matching
    // DuckDB's list_reduce bit-for-bit → hash-gated oracle. ----
    "d5_embedding_dup" -> ((s, dir) => {
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("n2", norm2Expr(col("v")))
      val a = e.select(col("vec_id").as("id1"), col("v").as("v1"), col("n2").as("n21"))
      val b = e.select(col("vec_id").as("id2"), col("v").as("v2"), col("n2").as("n22"))
      // spread the streamed side over all cores; broadcast the other
      a.repartition(width).join(broadcast(b), col("id1") < col("id2"))
        .withColumn("cosine", dotExpr(col("v1"), col("v2")) / sqrt(col("n21") * col("n22")))
        .filter(col("cosine") >= 0.45)
        .select(col("id1"), col("id2"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id1", "id2")
    }),

    // ---- D22: triangle counting over the verified near-dup graph —
    // the structural audit of a dedup edge set: a clean pairwise-dup
    // cluster is a near-clique (high closure), while a low-closure hub
    // is the classic signature of a too-permissive similarity join
    // (one template document matching everything). Degree-ORIENTED
    // wedge generation is the at-scale shape: each edge points from
    // its lower-(degree, id) endpoint, so wedge fan-out is bounded by
    // out-degree ≤ √(2m) per vertex REGARDLESS of how skewed the raw
    // degree distribution is (the hub's million edges become a million
    // wedges at its neighbors, not 10¹² at the hub), and the closing
    // probe is a plain equi-join against the canonical edge list. Each
    // triangle is found exactly once (at its minimum-(degree, id)
    // apex); per-vertex counts come from exploding the three corners.
    // Edges are the memoized d2 LSH frame — no new scan. ----
    "d22_triangles" -> ((s, dir) =>
      triangleCounts(d2EdgesFor(s, dir).select(col("doc1"), col("doc2")))),

    // ---- D23: cross-document repeated-substring dedup — the
    // Lee-et-al-class operator (Deduplicating Training Data Makes
    // Language Models Better): find long character spans shared by
    // PAIRS of documents, the spans a suffix-array dedup would excise.
    // Suffix arrays don't distribute; the Spark-native shape is
    // propose-cheap/verify-exact (d3's discipline): (1) hash EVERY
    // K=60-gram in one O(L) rolling pass per doc (native codegen
    // GraftGramHashes — the gram pass is the dominant scan at 100 TB,
    // so it runs as one tight JVM loop, 8 B/position out); (2) drop
    // corpus-hot hashes (> DfCap occurrences) BEFORE the pair join —
    // the d10-domain boilerplate guard that bounds every hash bucket,
    // keeping join output linear in corpus size (never binds on the
    // fixtures: max gram multiplicity is 4 at both sfs); (3) equi-join
    // equal hashes (doc_a < doc_b), an 8-byte-key shuffle — gram TEXT
    // never travels; (4) verify bytes by re-joining the two docs by id
    // and comparing the actual substrings (kills hash collisions);
    // (5) merge verified positions into maximal spans: consecutive
    // matches at the same (doc_a, doc_b, ia−ib) offset ARE contiguous
    // (two matching windows at distance < K overlap, forcing every
    // window between them to match), so islands-by-(ia − row_number)
    // finds exactly the maximal runs; (6) union the runs' doc_a
    // intervals per pair (runs from different offsets can overlap) via
    // a running-max window — shared_chars is the union length, never
    // double-counted. Output per pair: span count, union coverage, the
    // longest single span, and coverage_pct of the lower-id doc. Every
    // step is a window or equi-join on bounded keys — no cartesian, no
    // driver state (DedupSpec pins the plan). ----
    "d23_shared_substrings" -> ((s, dir) => {
      val runs = d23RunsFor(s, dir)
      val w = Window.partitionBy("doc_a", "doc_b").orderBy("sa", "ea")
      val isl = runs
        .withColumn("prevMax", max(col("ea")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ni", when(col("prevMax").isNull ||
          col("sa") > col("prevMax") + 1, 1L).otherwise(0L))
        .withColumn("island", sum(col("ni")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      isl.groupBy("doc_a", "doc_b", "island")
        .agg(max("la").as("la"), max("span_len").as("msl"),
          (max(col("ea")) - min(col("sa")) + lit(1)).as("ulen"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_spans"),
          sum("ulen").cast("long").as("shared_chars"),
          max("msl").cast("long").as("max_span_len"),
          round(sum(col("ulen")) * lit(1.0) / max(col("la")), 4).as("coverage_pct"))
        .orderBy("doc_a", "doc_b")
    }),

    // ---- D25: span EXCISION — d23's consumer, completing the
    // Lee-et-al dedup: rewrite each affected document with its shared
    // spans REMOVED, keeping the earliest (lowest-id) occurrence
    // canonical. Per doc: collect every span it owes to ANY lower-id
    // partner (doc_b side of the runs, shifted into doc_b coordinates
    // by delta), union the overlapping intervals (running-max islands,
    // the d23 merge re-keyed per doc), then splice the KEPT segments —
    // the gap before each interval plus the tail — back together in
    // order. The splice substrings are per-SEGMENT (one per cut + 1),
    // not per-position, so the per-doc cost is O(n_cuts · len) worst
    // case and O(len) in practice (cuts are rare); the reassembly is a
    // sort_array over the collected (offset, piece) structs — no
    // driver state, no cartesian. Output is the audit row a curator
    // diffs: spans cut, chars removed, clean length, and the md5 of
    // the spliced text (the gate compares the md5, so the oracle
    // proves the BYTES, not just the bookkeeping). ----
    "d25_excise_spans" -> ((s, dir) => {
      val runs = d23RunsFor(s, dir)
      val bint = runs.select(col("doc_b").as("doc_id"),
        (col("sa") - col("delta")).as("s"), (col("ea") - col("delta")).as("e"))
      val w = Window.partitionBy("doc_id").orderBy("s", "e")
      val merged = bint
        .withColumn("prevMax", max(col("e")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ni", when(col("prevMax").isNull ||
          col("s") > col("prevMax") + 1, 1L).otherwise(0L))
        .withColumn("island", sum("ni").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(min("s").as("ms"), max("e").as("me"))
      val docs = d23DocsFor(s, dir)
      val w2 = Window.partitionBy("doc_id").orderBy("ms")
      val pre = merged
        .withColumn("seg_start", coalesce(lag(col("me"), 1).over(w2) + 1, lit(0)))
        .select(col("doc_id"), col("seg_start"),
          (col("ms") - col("seg_start")).as("seg_len"))
      val tail0 = merged.groupBy("doc_id")
        .agg((max("me") + 1).as("seg_start"))
        .join(docs.select(col("doc_id"), col("len")), Seq("doc_id"))
        .select(col("doc_id"), col("seg_start"),
          (col("len") - col("seg_start")).as("seg_len"))
      val pieces = pre.unionByName(tail0).filter(col("seg_len") > 0)
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("seg_start"),
          expr("substring(text, CAST(seg_start + 1 AS INT), CAST(seg_len AS INT))")
            .as("piece"))
      val clean = pieces.groupBy("doc_id")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(seg_start, piece))), x -> x.piece)"),
          "").as("clean_text"))
      merged.groupBy("doc_id")
        .agg(count(lit(1)).as("n_cuts"),
          sum(col("me") - col("ms") + 1).as("removed_chars"))
        .join(docs.select(col("doc_id"), col("len").as("orig_len")), Seq("doc_id"))
        .join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"), col("orig_len").cast("long").as("orig_len"),
          col("n_cuts").cast("long").as("n_cuts"),
          col("removed_chars").cast("long").as("removed_chars"),
          coalesce(length(col("clean_text")), lit(0)).cast("long").as("clean_len"),
          md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // ---- D26: incremental shared-substring ADMISSION — the d23
    // machinery as a production ingest gate, completing the landed-
    // artifact story (x19 = ANN, d24 = band dedup, d26 = substring
    // dedup): the corpus gram index LANDS once (d26LandingFor) and
    // each arriving batch (doc_id % 10 == 0, d18's split) is assessed
    // against the LANDED files — batch grams roll in one O(L) pass,
    // equi-join the index on the 8-byte hash (both sides df-capped 64,
    // so every join bucket is bounded and a degenerate constant-char
    // arrival can't explode the probe), byte-verify through the
    // offset-independent one-pass slicer (corpus text is read ONLY for
    // docs holding candidates), merge runs, union intervals. Per
    // arrival: how much of it already exists in the corpus (interval
    // union across ALL partners), its strongest single partner, and
    // the admit verdict (duplicated coverage < 50%, integer-exact).
    // Zero corpus re-hashing, zero corpus text scan on the novel
    // path — the serve cost is proportional to the BATCH. ----
    "d26_substring_admission" -> ((s, dir) => substringAdmissionFor(s, dir)),

    // ---- E15: the ONE-PASS ingest admission verdict — what a
    // production ingest pipeline actually runs per arrival batch: one
    // row per arriving document carrying all three duplication axes
    // and the final admit bit, composed entirely from the LANDED /
    // memoized corpus indexes (d24's bucketed band table for
    // exact+near, d26's bucketed gram index for substring coverage,
    // d14's memoized IVF-verified edge set for semantic), so serving
    // the composed verdict re-hashes NOTHING corpus-side — the three
    // standalone gates each scan the batch once on their own axis and
    // the verdicts join on doc_id (three batch-sized join keys, no
    // corpus shuffle). Admit = novel on the band axis AND substring
    // coverage under 50% AND no semantic partner at cosine ≥ 0.45.
    // The oracle nests the three standalone twins verbatim, so the
    // hash gate proves composed ≡ independently-computed per axis. ----
    "e15_ingest_verdict" -> ((s, dir) =>
      e15VerdictOf(s, dir, e15ArrivalFor(s, dir))),

    // ---- E34: the FULL admission verdict — e15's three dedup axes
    // COMPOSED with the three landed quality/policy axes a production
    // ingest gate also decides on (the r16 verdict's #2): language
    // (t39's landed trained profile via the memoized offline-train/
    // online-apply verdict frame), trigram perplexity (t58's model
    // served from the LANDED t59 c3 store — the composed gate doubles
    // as a landed ≡ recomputed proof), and domain policy (w3's landed
    // blocklist + a per-domain budget check against the landed
    // history store). One verdict row per arrival, all six axes, one
    // final admit bit.
    //
    // Axis semantics, chosen to stay STATELESS per arrival given the
    // landed state (so the streaming twin is stream-static joins + the
    // one watermark-bounded fold — no per-domain rank state):
    //  - lang_ok: the arrival routed to SOME language (e21's
    //    quarantine convention — null text / < 3 chars is unroutable);
    //  - ppl_ok: trigram cross-entropy vs the landed store at most
    //    [[E34PplAdmitBits]]; a doc too short to score passes (no
    //    evidence is not rejection — sub_admit's convention);
    //  - domain: 'blocked' from the landed blocklist wins; 'over_cap'
    //    when the domain's landed HISTORY already holds ≥
    //    [[E34DomainCapDocs]] docs (within-batch over-admission is
    //    batch-bounded and reconciled at the next history refresh —
    //    the same additive-store cadence as w5);
    //  - admit = dedup_admit ∧ lang_ok ∧ ppl_ok ∧ domain_ok.
    //
    // Scale: the three new axes add ZERO arrival text scans — language
    // joins the memoized verdict frame, perplexity re-reads the
    // CHECKPOINTED featurization, domain derives from (doc_id, source)
    // — and the static sides are landed artifacts (profile ≤ 200
    // rows/lang broadcast; c3 tables CapGated vocabulary joins; the
    // blocklist curated-small broadcast; the history store
    // domain-cardinality through CapGate). The oracle nests the SIX
    // standalone twins verbatim, so the hash gate proves composed ≡
    // independently-computed per axis. ----
    "e34_full_ingest_verdict" -> ((s, dir) => {
      val arrival = e15ArrivalFor(s, dir)
      val base = e15VerdictCached(s, dir, arrival)
      val lang = PipelineQueries.langVerdictsAll(s, dir)
        .select(col("doc_id"), col("pred_lang"),
          col("margin").as("lang_margin"))
      val ppl = TextQueries.lm3LandedScoreOf(s, dir,
          arrival.select("doc_id", "text"))
        .select(col("doc_id"), col("xent3_bits"))
      val hist = graft.operators.CapGate.gate(
        s.read.schema(WebQueries.domainStatSchema)
          .parquet(WebQueries.e34DomainHistFor(s, dir))
          .select(col("reg_domain"), col("n_docs").as("hist_docs"))).frame
      val dom = graft.functions.Url.withParsed(
          arrival.select(col("doc_id"), col("source"))
            .withColumn("url",
              graft.functions.Url.urlOf(col("doc_id"), col("source"))))
        .select(col("doc_id"), col("reg_domain"))
        .join(broadcast(WebQueries.blockedFrame(s, dir)), Seq("reg_domain"), "left")
        .join(hist, Seq("reg_domain"), "left")
        .select(col("doc_id"), col("reg_domain"),
          coalesce(col("hist_docs"), lit(0L)).as("hist_docs"),
          when(col("is_blocked"), "blocked")
            .when(coalesce(col("hist_docs"), lit(0L)) >= lit(E34DomainCapDocs),
              "over_cap")
            .otherwise("ok").as("domain_verdict"))
      val langOk = col("pred_lang").isNotNull
      val pplOk = coalesce(col("xent3_bits") <= lit(E34PplAdmitBits), lit(true))
      val domOk = col("domain_verdict") === "ok"
      base.withColumnRenamed("admit", "dedup_admit")
        .join(lang, Seq("doc_id"), "left")
        .join(ppl, Seq("doc_id"), "left")
        .join(dom, Seq("doc_id"))
        .select(col("doc_id"), col("status"), col("match_id"), col("similarity"),
          col("sub_partners"), col("sub_match"), col("sub_dup_chars"),
          col("sub_coverage"), col("sub_admit"), col("sem_match"),
          col("sem_cosine"), col("dedup_admit"),
          col("pred_lang"), col("lang_margin"), langOk.as("lang_ok"),
          col("xent3_bits"), pplOk.as("ppl_ok"),
          col("reg_domain"), col("hist_docs"), col("domain_verdict"),
          domOk.as("domain_ok"),
          (col("dedup_admit") && langOk && pplOk && domOk).as("admit"))
        .orderBy("doc_id")
    }),

    // ---- E21: the end-to-end CURATION FUNNEL — the whole pre-training
    // data pipeline as ONE query, each stage an already-gated operator:
    // ROUTE every document by predicted language (t39's trained profile
    // applied to the full corpus — offline-train/online-apply);
    // DEDUP by keeping each d9 cluster's canonical doc (docs outside
    // the dup graph are their own canonical); BUDGET per predicted
    // language — keep the highest-quality survivors (n_chars, t37's
    // proxy) until 40% of that language's surviving token mass is
    // spent, via the grouped distributed prefix sum. Output is the
    // funnel report per language: routed → deduped → kept counts and
    // token masses. The twin nests the full-corpus lang-ID replay, the
    // d9 recursive-CTE reachability, and the sequential budget window,
    // so the hash gate proves the composed funnel ≡ its independently-
    // computed stages. Unroutable docs (null / < 3 chars) quarantine
    // before the funnel on both sides. Scale: routing is the broadcast
    // profile join; dedup is one equi-join against the memoized label
    // frame; the budget is t37's sharded prefix sum — nothing beyond
    // the gated stages' own shapes. ----
    "e21_curation_funnel" -> ((s, dir) => {
      val routed = PipelineQueries.langVerdictsAll(s, dir)
        .select(col("doc_id"), col("pred_lang"))
      val docs = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 3)
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      val canon = d9ClustersFor(s, dir).select("doc_id", "is_canonical")
      val surv = routed.join(docs, Seq("doc_id"))
        .join(canon, Seq("doc_id"), "left")
        .filter(coalesce(col("is_canonical"), lit(true)))
        .select("doc_id", "pred_lang", "toks", "n_chars")
      val ordered = graft.operators.GlobalOrder.withRunningTotalWithin(
        surv, "cum", Seq("pred_lang"), col("toks"),
        col("n_chars").desc, col("doc_id"))
      // budgets from the same frame post-prefix-sum (t37's
      // ReuseExchange discipline — one pass over the survivors)
      val budgets = ordered.groupBy("pred_lang")
        .agg(expr("CAST(sum(toks) * 4 div 10 AS BIGINT)").as("budget"))
      val kept = ordered.join(broadcast(budgets), Seq("pred_lang"))
        .filter(col("cum") < col("budget"))
      routed.groupBy("pred_lang").agg(count(lit(1)).as("n_routed"))
        .join(surv.groupBy("pred_lang")
          .agg(count(lit(1)).as("n_dedup"), sum("toks").as("dedup_tokens")),
          Seq("pred_lang"))
        .join(kept.groupBy("pred_lang")
          .agg(max("budget").as("budget"), count(lit(1)).as("n_kept"),
            sum("toks").as("kept_tokens"), min("n_chars").as("min_quality")),
          Seq("pred_lang"))
        .orderBy("pred_lang")
    }),

    // ---- E20: admit-then-APPEND — the index-maintenance leg the
    // verdict operators stop short of: once an arrival is admitted,
    // the landed dedup index must learn it, or the next wave's exact/
    // near duplicates of fresh content sail through. Wave 1
    // (doc_id % 20 == 0) classifies against the landed d24 corpus
    // index; its NOVEL docs land their bands as a bucketed DELTA table
    // ([[e20DeltaLandingFor]] — base index files untouched, the x24
    // lambda shape applied to the band family); wave 2
    // (doc_id % 20 == 10) then classifies against corpus ∪ admitted —
    // BOTH axes: its band candidates come from the base ∪ delta scan,
    // its exact axis from the widened text table. The oracle replays
    // wave-1 classify → admit → wave-2 classify relationally (the
    // parameterized [[classifyRecomputeSql]] nested twice), so the
    // gate proves serve-over-landed-delta ≡ recompute-over-updated-
    // corpus. Scale: the delta is batch-sized (broadcastable in the
    // probe join); compaction folds it into the base on x21's cadence. ----
    "e20_admit_and_append" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val wave2 = docs.filter(col("doc_id") % 20 === 10)
      val admittedBands = s.table(e20DeltaLandingFor(s, dir))
        .select("doc_id", "band", "key")
      val combinedBands = s.table(bandLandingFor(s, dir))
        .select("doc_id", "band", "key")
        .unionByName(admittedBands)
      val corpus2 = docs.filter(col("doc_id") % 10 =!= 0)
        .select("doc_id", "text")
        .unionByName(docs.join(
          admittedBands.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
          .select("doc_id", "text"))
      classifyBatch(s, dir, wave2.select("doc_id", "text"), bandsOf(wave2),
        combinedBands, Some(corpus2))
    }),

    // ---- E22: admit-then-append for the SUBSTRING index — e20's
    // maintenance leg on the gram family, where the df-cap forces real
    // append algebra (see [[e22DeltaFor]]): wave-1 arrivals classify
    // against the landed d26 base, the admitted docs' grams land as a
    // bucketed DELTA table plus a newly-hot TOMBSTONE set, and wave 2
    // classifies against (base ∖ tombstones) ∪ delta — base files
    // byte-untouched, each side probed separately so the base join
    // stays bucket-local. The oracle nests the full substring replay
    // twice (wave-1 admission inside the widened-corpus wave-2
    // replay), so the hash gate proves the capped lambda index ≡ the
    // from-scratch index over corpus ∪ admitted. ----
    "e22_gram_append" -> ((s, dir) => {
      val (deltaTbl, tombPath) = e22DeltaFor(s, dir)
      val base = s.table(d26LandingFor(s, dir))
      val tomb = s.read.schema("h BIGINT").parquet(tombPath)
      val batch = d23DocsFor(s, dir).filter(col("doc_id") % 20 === 10)
      val bg = gramProbeOf(batch)
      substringAdmission(s, dir, batch, bg,
        Seq(base.join(broadcast(tomb), Seq("h"), "left_anti"),
          s.table(deltaTbl)))
    }),

    // ---- E23: gram-index COMPACTION — the cadence step that closes
    // the substring family's lifecycle (build d26 / serve / append e22
    // / compact, x21's story for this index): (base ∖ tombstones) ∪
    // delta folds into ONE rebuilt bucketed table, reclaiming the
    // tombstone anti-join and the second probe side that e22's lambda
    // serve pays per batch. Pure index-file work — the corpus text is
    // never re-read. The gate serves wave 2 from the compacted table
    // ALONE against the same widened-corpus recompute oracle as e22,
    // so hash equality proves compaction lost and invented nothing. ----
    "e23_gram_compact" -> ((s, dir) => {
      val compacted = s.table(e23CompactFor(s, dir))
      val batch = d23DocsFor(s, dir).filter(col("doc_id") % 20 === 10)
      val bg = gramProbeOf(batch)
      substringAdmission(s, dir, batch, bg, Seq(compacted))
    }),

    // ---- E24: right-to-be-forgotten on the BAND index — the delete
    // leg the dedup family owed (x20/x23 prove it for ANN): a
    // deletion batch (a 1/7 corpus carve here — far larger than the
    // request-sized batches production sees, to stress the algebra)
    // tombstones documents OUT of the landed d24 index at serve time
    // via broadcast anti-joins on both axes — the base index files
    // are never rewritten, the broadcast anti preserves the landed
    // partitioning (zero added shuffle), and compaction folds the
    // deletes on x21's cadence. The oracle recomputes classification
    // against corpus ∖ deleted from scratch, so the gate proves a
    // forgotten document neither matches nor is matched. ----
    "e24_band_forget" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val deleted = e24Deleted(docs)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val corpusBands = s.table(bandLandingFor(s, dir))
        .select("doc_id", "band", "key")
        .join(broadcast(deleted), Seq("doc_id"), "left_anti")
      val corpus2 = docs.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(deleted), Seq("doc_id"), "left_anti")
        .select("doc_id", "text")
      classifyBatch(s, dir, batch.select("doc_id", "text"), bandsOf(batch),
        corpusBands, Some(corpus2))
    }),

    // ---- E25: right-to-be-forgotten on the GRAM index. One honest
    // subtlety the band case doesn't have: the df-cap is a BUILD-TIME
    // property — deleting documents lowers a gram's df, but a gram the
    // build dropped as hot cannot be resurrected from index files that
    // never held its positions. The serve contract (and the oracle)
    // is therefore cap-then-delete: candidates come from build-capped
    // grams of surviving documents; cap re-admission happens at
    // compaction cadence, when the corpus text is re-indexed anyway.
    // The parameterized oracle's capPred pins exactly that algebra. ----
    "e25_gram_forget" -> ((s, dir) => {
      val deleted = e24Deleted(Tables.documents(s, dir))
      val batch = d23DocsFor(s, dir).filter(col("doc_id") % 10 === 0)
      val bg = gramProbeOf(batch)
      substringAdmission(s, dir, batch, bg,
        Seq(s.table(d26LandingFor(s, dir))
          .join(broadcast(deleted), Seq("doc_id"), "left_anti")))
    }),

    // ---- E26: BAND-index compaction — the cadence step that closes
    // the band family's lifecycle (build d24 / serve / append e20 /
    // forget e24 / compact, mirroring e23 on the gram side): base ∪
    // delta fold into ONE rebuilt bucketed table, reclaiming the
    // two-table union e20's lambda serve pays per batch. Pure
    // index-file work — no document is re-shingled. Serving reads
    // ONLY the compacted table + raw text: the candidate axis scans
    // it bucket-locally, and even the exact axis's membership derives
    // from it (admitted wave-1 docs are the index's only batch-split
    // ids, present via e20's shingle-less sentinels; corpus docs by
    // the split predicate). The oracle is e20's widened-corpus
    // recompute verbatim, so hash equality proves compaction lost and
    // invented nothing. ----
    "e26_band_compact" -> ((s, dir) => {
      val compacted = s.table(e26CompactFor(s, dir))
        .select("doc_id", "band", "key")
      val docs = Tables.documents(s, dir)
      val wave2 = docs.filter(col("doc_id") % 20 === 10)
      val corpus2 = docs.filter(col("doc_id") % 10 =!= 0)
        .select("doc_id", "text")
        .unionByName(docs.join(
          compacted.filter(col("doc_id") % 20 === 0).select("doc_id").distinct(),
          Seq("doc_id"), "left_semi")
          .select("doc_id", "text"))
      classifyBatch(s, dir, wave2.select("doc_id", "text"), bandsOf(wave2),
        compacted, Some(corpus2))
    })
  )

  /** D21/D30's shared chunk frame: null text chunks to nothing
    * (posexplode then emits no rows), matching the NULL-in/NULL-out
    * shape the rest of the suite uses. The digest comes out of the
    * SAME single pass as the cut points ([[graft.functions.Hashing
    * .cdcChunks]]): slicing chunks back out of the stored column with
    * substring() re-scans UTF-8 from byte 0 per chunk — O(L²/chunk)
    * on densely-cutting degenerate documents. */
  private def cdcChunkRows(s: SparkSession, dir: String): DataFrame = {
    val chunksU = udf((t: String) =>
      if (t == null) Seq.empty[(Long, String)] else graft.functions.Hashing.cdcChunks(t))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(chunksU(col("text"))).as(Seq("chunk_no", "ch")))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        col("ch._1").as("c_len"), col("ch._2").as("c_md5"))
  }

  /** The batch side's (b_id, ib, h) gram-hash frame — one O(L) codegen
    * pass per doc, shared by every substring-family serve. */
  private def gramProbeOf(batch: DataFrame): DataFrame =
    batch.select(col("doc_id").as("b_id"),
      posexplode(graft.plans.GraftGramHashes.column(col("text"), 60))
        .as(Seq("ib", "h")))

  /** e24/e25's deletion batch: a deterministic carve of the corpus
    * split (batch docs are never deletion targets). Shared with the
    * extraction lifecycle (e32/e33) so every forget leg answers the
    * same erasure request; the kept-set SQL twin is TextQueries'
    * e24DeletedKeptPredSql. */
  private[queries] def e24Deleted(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id")

  /** D35's landed source-count store: (source, n_docs) over the
    * pre-delta corpus (the shared %9 arrival carve) — one row per
    * source, the smallest additive Z-set in the suite. */
  private[graft] val mixCountSchema = "source STRING, n_docs BIGINT"

  private val mixStore =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def mixStoreFor(s: SparkSession, dir: String): String = {
    val memo = mixStore.get(dir)
    if (memo != null && !new java.io.File(memo).exists()) mixStore.remove(dir, memo)
    mixStore.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_d35_${ProcessHandle.current().pid()}_$tag")
      Caches.track(d)(() => { mixStore.remove(d); () })
      Caches.trackPath(d, out)
      Tables.documents(s, d).filter(!PipelineQueries.bpeIsDelta)
        .groupBy("source").agg(count(lit(1)).cast("long").as("n_docs"))
        .write.mode("overwrite").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })
  }

  /** D35/e36/e37's twin: the full mixture recompute from raw
    * documents, carved by `keptPred` (TRUE for d35/e36 — e36's gate is
    * thereby the landed ≡ retrain proof; the e24 kept predicate for
    * e37). The corpus appears twice (counts and the sampled set), so
    * the predicate applies to BOTH. */
  private def mixtureOracleSqlFor(keptPred: String): String =
    s"""WITH kept AS (SELECT doc_id, source FROM documents WHERE $keptPred),
       | counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |   FROM kept GROUP BY source),
       | norm AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |       list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source NULLS LAST)),
       |       (acc, v) -> acc + v) AS wsum,
       |     CAST(sum(n_docs) AS BIGINT) AS n_total FROM counts),
       | rates AS (SELECT c.source, c.n_docs,
       |     sqrt(CAST(c.n_docs AS DOUBLE)) / n.wsum AS p,
       |     least(1.0, ((n.n_total // 5) * (sqrt(CAST(c.n_docs AS DOUBLE)) / n.wsum))
       |       / c.n_docs) AS rate
       |   FROM counts c CROSS JOIN norm n),
       | j AS (SELECT d.doc_id, r.source, r.n_docs, r.p, r.rate,
       |     (((d.doc_id % 1000000007) + 1000000007) % 1000000007 * 2654435761)
       |       % 1000000007 % 1048576 AS u
       |   FROM kept d JOIN rates r ON d.source IS NOT DISTINCT FROM r.source)
       |SELECT source, n_docs, round(p, 6) AS mix_weight,
       |  round(rate, 6) AS sample_rate,
       |  CAST(count(CASE WHEN u < rate * 1048576.0 THEN 1 END) AS BIGINT) AS n_sampled
       |FROM j GROUP BY source, n_docs, p, rate ORDER BY source""".stripMargin

  /** D35's sampler, parameterized on the source-count table so the
    * landed legs (e36 refresh, e37 forget) derive rates from merged
    * stores through the IDENTICAL IEEE sequence as the retrain:
    * correctly-rounded sqrt per source, the normalizer folded in
    * SOURCE order (t18's sorted-fold convention), one shared
    * multiply/divide sequence per rate. The doc-level decision is
    * d7's overflow-safe multiplicative hash at 2²⁰ granularity; the
    * rate table is Heaps-tiny and attaches null-safely (a null-source
    * doc belongs to the null-source stratum, not to no stratum). */
  /** The rate table alone — (src, n_docs, p, rate) — from a count
    * table; shared by [[mixtureSampleFrom]] and the streaming
    * admission twin (which serves it broadcast over arrivals). */
  private[graft] def mixtureRatesFrom(counts: DataFrame): DataFrame = {
    val norm = counts.agg(
      expr("""aggregate(
          array_sort(collect_list(struct(source AS s, sqrt(CAST(n_docs AS DOUBLE)) AS v)),
            (l, r) -> CASE WHEN l.s IS NULL AND r.s IS NULL THEN 0
                           WHEN l.s IS NULL THEN 1 WHEN r.s IS NULL THEN -1
                           WHEN l.s < r.s THEN -1 WHEN l.s > r.s THEN 1
                           ELSE 0 END),
          CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v)""").as("wsum"),
      sum("n_docs").cast("long").as("n_total"))
    counts.crossJoin(broadcast(norm))
      .select(col("source").as("src"), col("n_docs"),
        (sqrt(col("n_docs").cast("double")) / col("wsum")).as("p"),
        least(lit(1.0),
          (expr("n_total div 5") * (sqrt(col("n_docs").cast("double")) / col("wsum")))
            / col("n_docs")).as("rate"))
  }

  /** The landed store's serving rates — what the streaming admission
    * twin broadcasts (the store's view: pre-delta counts; an e36
    * refresh lands a new store and the next micro-batch re-plans). */
  private[graft] def mixtureRatesFor(s: SparkSession, dir: String): DataFrame =
    mixtureRatesFrom(s.read.schema(mixCountSchema).parquet(mixStoreFor(s, dir)))

  /** D35's doc-level sampling decision, shared with the stream twin:
    * d7's overflow-safe multiplicative hash at 2²⁰ granularity. */
  private[graft] val mixtureHash: org.apache.spark.sql.Column =
    pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L,
      lit(1000000007L)) % 1048576L

  private def mixtureSampleFrom(docs: DataFrame, counts: DataFrame): DataFrame = {
    val rates = mixtureRatesFrom(counts)
    val u = mixtureHash
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(rates), col("source") <=> col("src"))
      .withColumn("kept", u < col("rate") * 1048576.0)
      .groupBy("src", "n_docs", "p", "rate")
      .agg(count(when(col("kept"), 1)).cast("long").as("n_sampled"))
      .select(col("src").as("source"), col("n_docs"),
        round(col("p"), 6).as("mix_weight"),
        round(col("rate"), 6).as("sample_rate"), col("n_sampled"))
      .orderBy(col("source").asc_nulls_last)
  }

  /** E23's compacted landing: one bucketed table holding exactly the
    * lambda index's served content — (base ∖ tombstones) ∪ delta —
    * with d26's bucket spec, built from index files only. */
  private val e23Compacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def e23CompactFor(s: SparkSession, dir: String): String = {
    val memo = e23Compacted.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) e23Compacted.remove(dir, memo)
    e23Compacted.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_e23_idx_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e23_${pid}_$tag")
      Caches.track(d)(() => {
        e23Compacted.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      val (deltaTbl, tombPath) = e22DeltaFor(s, d)
      val tomb = s.read.schema("h BIGINT").parquet(tombPath)
      s.table(d26LandingFor(s, d))
        .join(broadcast(tomb), Seq("h"), "left_anti")
        .unionByName(s.table(deltaTbl))
        .repartition(32, col("h"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "h").sortBy("h")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** The winnow family's batch/corpus admission floor (t45's contract:
    * text ≥ K+W−1 = 27 chars), filtered by the wave predicate. */
  private def d34BatchOf(s: SparkSession, dir: String,
      wave: org.apache.spark.sql.Column): DataFrame =
    Tables.documents(s, dir).filter(wave &&
      col("text").isNotNull && length(col("text")) >= 27)

  /** One winnow featurization pass per batch — checkpointed because
    * the lifecycle legs feed it to both classify and (in e27's build)
    * the delta landing. Columns (b_id, p1, fp_h). */
  private def d34ProbeOf(dir: String, batch: DataFrame): DataFrame =
    Caches.checkpointed(dir,
      TextQueries.winnowedFingerprints(batch)
        .select(col("doc_id").as("b_id"), col("fp_pos").cast("int").as("p1"),
          col("fp_h")))

  /** d34's serve pipeline, factored so the lifecycle legs (e27 append,
    * e28 forget, e29 compact) reuse the identical probe-cap / verify /
    * rollup against any set of index sides: per-(doc, hash) probe cap
    * ≤ 64 (batch-composition invariance, d26's discipline), fingerprint
    * equi-join per side (sides hold disjoint doc sets, so the union
    * never duplicates a candidate), byte verification of the 20-grams
    * at both positions through the offset-independent slicer, and the
    * per-arrival argmax rollup (best partner by verified-pair count,
    * ties to the smallest corpus id). */
  private def winnowAdmission(s: SparkSession, dir: String, batch: DataFrame,
      bfp: DataFrame, sides: Seq[DataFrame]): DataFrame = {
    val bcap = bfp.groupBy("b_id", "fp_h").agg(count(lit(1)).as("c"))
      .filter(col("c") <= 64L).select("b_id", "fp_h")
    val probe = bfp.join(bcap, Seq("b_id", "fp_h"), "left_semi")
    val cand = sides.map(side =>
        probe.join(
          side.select(col("fp_h"), col("doc_id").as("c_id"), col("fp_pos").as("p2")),
          Seq("fp_h"))
          .select(col("b_id"), col("p1"), col("c_id"), col("p2")))
      .reduce(_.unionByName(_))
    val corpusDocs = Tables.documents(s, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 27)
    val ver = cand
      .join(slicedGrams(cand, corpusDocs, "b_id", "p1", 20), Seq("b_id", "p1"))
      .join(slicedGrams(cand, corpusDocs, "c_id", "p2", 20), Seq("c_id", "p2"))
      .filter(col("g_p1") === col("g_p2"))
    val perPartner = ver.groupBy("b_id", "c_id").agg(count(lit(1)).as("np"))
    val verdict = perPartner.groupBy(col("b_id").as("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_partners"),
        max(struct(col("np").as("n"), (-col("c_id")).as("nk"),
          col("c_id").as("k"))).as("_b"))
      .select(col("doc_id"), col("n_partners"),
        col("_b.k").as("best_id"), col("_b.n").cast("long").as("best_shared"))
    batch.select("doc_id")
      .join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"), col("best_id").isNotNull.as("matched"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"),
        col("best_id"), col("best_shared"))
      .orderBy("doc_id")
  }

  /** D34's landed winnow index: the corpus split's (doc_id, fp_pos,
    * fp_h) winnowed fingerprints — build-time df ≤ 64 hot-hash cap,
    * d26's contract — bucketed by the serve join's hash key so
    * admission never re-shuffles the corpus side. ~22% of the gram
    * index's rows for the same ≥ 27-char detection floor. Lands a HOT
    * sidecar alongside (d26's discipline): capped hashes vanish from
    * index rows, but e27's append must know they were hot — df only
    * grows, so delta rows carrying a base-hot hash drop without
    * consulting corpus text. */
  private val d34Landing =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val d34HotPath =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def d34LandingFor(s: SparkSession, dir: String): String = {
    val memo = d34Landing.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) d34Landing.remove(dir, memo)
    d34Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_d34_idx_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_d34_${pid}_$tag")
      Caches.track(d)(() => {
        d34Landing.remove(d)
        d34HotPath.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      val fps = Caches.checkpointed(d,
        TextQueries.winnowedFingerprints(
          Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
          .select(col("doc_id"), col("fp_pos").cast("int").as("fp_pos"), col("fp_h")))
      // checkpoint: the hot set feeds the anti-join AND the landed
      // sidecar (e27's append reads it back)
      val hot = Caches.checkpointed(d, fps.groupBy("fp_h")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 64L).select("fp_h"))
      val hotOut = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_d34_hot_${pid}_$tag")
      Caches.trackPath(d, hotOut)
      hot.write.mode("overwrite").parquet(hotOut.getAbsolutePath)
      d34HotPath.put(d, hotOut.getAbsolutePath)
      d34BuildJoin(fps, hot)
        .repartition(32, col("fp_h"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "fp_h").sortBy("fp_h")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** The d34 index-build anti-join, UN-HINTED like its siblings (d26's
    * gram-index build and d23's run extraction): the hot set is every
    * fingerprint hash with df > 64 over the corpus —
    * O(corpus_positions / 64), Zipf-tailed and data-dependent, so on a
    * boilerplate-heavy 100 TB crawl it plausibly reaches 10⁸–10⁹ rows.
    * A forced `broadcast(hot)` would die at the 8 GB broadcast hard
    * limit; left un-hinted the planner degrades the anti-join to a
    * shuffle join that scales with the data. Exposed so PlanSpec can
    * pin the hint's absence in the analyzed plan. */
  private[graft] def d34BuildJoin(fps: DataFrame, hot: DataFrame): DataFrame =
    fps.join(hot, Seq("fp_h"), "left_anti")
      .select("doc_id", "fp_pos", "fp_h")

  /** E27's landed DELTA winnow index + newly-hot tombstones — e22's
    * append algebra transplanted to the fingerprint tier. Wave-1
    * arrivals (doc_id % 20 == 0) classify against the landed d34 base;
    * the NOVEL (unmatched) docs' fingerprints land as a bucketed delta
    * under the cap-then-tombstone resolution: (1) base-hot hashes (the
    * landed sidecar) stay hot — delta rows carrying them drop; (2)
    * hashes whose combined df (base index row count + delta count,
    * both index-only aggregations) stays ≤ 64 land normally; (3)
    * hashes the delta pushes past the cap land nowhere AND emit a
    * tombstone that anti-joins the base at serve time. Wave-1
    * fingerprint rows come from the frame the classifier already
    * featurized — no second winnow pass over the arrivals. */
  private val e27Delta =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def e27DeltaFor(s: SparkSession, dir: String): (String, String) = {
    val memo = e27Delta.get(dir)
    if (memo != null && !s.catalog.tableExists(memo._1)) e27Delta.remove(dir, memo)
    e27Delta.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_e27_delta_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e27_${pid}_$tag")
      val tombOut = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_e27_tomb_${pid}_$tag")
      Caches.track(d)(() => {
        e27Delta.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      Caches.trackPath(d, tombOut)
      val base = s.table(d34LandingFor(s, d))
      val baseHot = s.read.schema("fp_h BIGINT").parquet(d34HotPath.get(d))
      val wave1 = d34BatchOf(s, d, col("doc_id") % 20 === 0)
      val bfp1 = d34ProbeOf(d, wave1)
      val admitted = winnowAdmission(s, d, wave1, bfp1, Seq(base))
        .filter(!col("matched")).select(col("doc_id").as("b_id"))
      val deltaFps = Caches.checkpointed(d,
        bfp1.join(admitted, Seq("b_id"), "left_semi")
          .select(col("b_id").as("doc_id"), col("p1").as("fp_pos"), col("fp_h")))
      val dfDelta = deltaFps.groupBy("fp_h").agg(count(lit(1)).as("cd"))
      val dfBase = base.groupBy("fp_h").agg(count(lit(1)).as("cb"))
      val combined = dfDelta.join(dfBase, Seq("fp_h"), "left")
        .select(col("fp_h"), (coalesce(col("cb"), lit(0L)) + col("cd")).as("ct"),
          col("cb"))
      val tombstones = combined.filter(col("ct") > 64L && col("cb").isNotNull)
        .select("fp_h")
      tombstones.write.mode("overwrite").parquet(tombOut.getAbsolutePath)
      deltaFps
        .join(combined.filter(col("ct") > 64L).select("fp_h"), Seq("fp_h"), "left_anti")
        .join(baseHot, Seq("fp_h"), "left_anti")
        .select("doc_id", "fp_pos", "fp_h")
        .repartition(32, col("fp_h"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "fp_h").sortBy("fp_h")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      (tbl, tombOut.getAbsolutePath)
    })
  }

  /** E29's compacted landing: one bucketed table holding exactly the
    * winnow lambda's served content — (d34 base ∖ e27 tombstones) ∪
    * e27 delta — with d34's bucket spec, built from index files only. */
  private val e29Compacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def e29CompactFor(s: SparkSession, dir: String): String = {
    val memo = e29Compacted.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) e29Compacted.remove(dir, memo)
    e29Compacted.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_e29_idx_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e29_${pid}_$tag")
      Caches.track(d)(() => {
        e29Compacted.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      val (deltaTbl, tombPath) = e27DeltaFor(s, d)
      val tomb = s.read.schema("fp_h BIGINT").parquet(tombPath)
      s.table(d34LandingFor(s, d))
        .join(broadcast(tomb), Seq("fp_h"), "left_anti")
        .unionByName(s.table(deltaTbl))
        .repartition(32, col("fp_h"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "fp_h").sortBy("fp_h")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** E26's compacted landing: one bucketed table holding exactly the
    * band lambda's served content — d24 base ∪ e20 delta (sentinels
    * included: they record index membership for shingle-less admits
    * and can never match a real probe band) — with d24's bucket spec,
    * built from index files only. */
  private val e26Compacted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def e26CompactFor(s: SparkSession, dir: String): String = {
    val memo = e26Compacted.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) e26Compacted.remove(dir, memo)
    e26Compacted.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_e26_idx_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e26_${pid}_$tag")
      Caches.track(d)(() => {
        e26Compacted.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      s.table(bandLandingFor(s, d)).select("doc_id", "band", "key")
        .unionByName(s.table(e20DeltaLandingFor(s, d)).select("doc_id", "band", "key"))
        .repartition(32, col("key"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "key").sortBy("key")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** The d26 serve pipeline, factored so e15's composed ingest verdict
    * reuses the identical substring axis (same landed index, same
    * per-document caps, same interval math) without a second code
    * path. One row per batch doc in the substring family (text ≥ 60
    * chars); shorter arrivals have trivially zero coverage and are
    * handled by the composer's defaults. */
  private[queries] def substringAdmissionFor(s: SparkSession, dir: String): DataFrame = {
    val batch = d23DocsFor(s, dir).filter(col("doc_id") % 10 === 0)
    substringAdmission(s, dir, batch, gramProbeOf(batch))
  }

  /** The substring-axis admission over a PRE-FEATURIZED batch:
    * `batch` is (doc_id, text, len) restricted to the gram family
    * (non-null, len ≥ 60), `bg` its exploded (b_id, ib, h) gram
    * hashes — e15 feeds both from one checkpointed arrival scan.
    * Corpus text still comes from [[d23DocsFor]], read only for docs
    * holding candidates (the c-side slicedGrams gather). */
  private def substringAdmission(s: SparkSession, dir: String,
      batch: DataFrame, bg: DataFrame): DataFrame =
    substringAdmission(s, dir, batch, bg,
      Seq(s.table(d26LandingFor(s, dir))))

  /** The same admission over an EXPLICIT index — `idxSides` is one or
    * more (doc_id, i0, h) gram frames probed independently and unioned
    * at the candidate level, so a bucketed base table keeps its
    * bucket-local join even when a lambda-shaped delta side rides
    * along (e22: base ∪ delta; a union BEFORE the join would discard
    * the base table's bucketing and re-shuffle the whole corpus
    * index per batch). */
  private def substringAdmission(s: SparkSession, dir: String,
      batch: DataFrame, bg: DataFrame, idxSides: Seq[DataFrame]): DataFrame = {
      val K = 60
      val docs = d23DocsFor(s, dir)
      // the probe-side guard is PER DOCUMENT (not per batch): an
      // arrival's verdict must not depend on what else happened to
      // arrive with it, and a degenerate constant-character doc is
      // hot within itself — this also keeps the verdict identical
      // when the same doc arrives through the streaming twin's
      // micro-batches (EventStream.admitArrivalsBySubstring)
      val bhot = bg.groupBy("b_id", "h").agg(count(lit(1)).as("c"))
        .filter(col("c") > 64L).select("b_id", "h")
      // cand feeds THREE consumers (the verify join and both
      // slicedGrams gathers) and ver feeds two (the per-pair and
      // per-doc interval unions): without materialization Spark
      // re-evaluates the whole batch-hash + index-join subtree per
      // consumer (4 index scans visible in the executed plan, ~4x the
      // serve cost). Both frames are small — batch-proportional — so
      // one eager checkpoint each trades a tiny spill for running the
      // propose and verify stages exactly ONCE per admission batch;
      // Caches.checkpointed registers the backing RDDs so the blocks
      // unpersist deterministically at Caches.release instead of
      // accumulating until GC in a long session iterating many dirs.
      val probe = bg.join(bhot, Seq("b_id", "h"), "left_anti")
      val cand = Caches.checkpointed(dir, idxSides.map(ix =>
          probe.join(ix.select(col("h"), col("doc_id").as("c_id"),
            col("i0").as("ic")), Seq("h"))
            .select(col("b_id"), col("ib"), col("c_id"), col("ic")))
        .reduce(_ unionByName _))
      val ver = Caches.checkpointed(dir, cand
        .join(slicedGrams(cand, batch, "b_id", "ib", K), Seq("b_id", "ib"))
        .join(slicedGrams(cand, docs, "c_id", "ic", K), Seq("c_id", "ic"))
        .filter(col("g_ib") === col("g_ic"))
        .select("b_id", "c_id", "ib", "ic"))
      val spans = ver.withColumn("delta", col("ib") - col("ic"))
        .withColumn("grp", col("ib") - row_number().over(
          Window.partitionBy("b_id", "c_id", "delta").orderBy("ib")))
        .groupBy("b_id", "c_id", "delta", "grp")
        .agg(min("ib").as("sb"), (max(col("ib")) + lit(K - 1)).as("eb"))
      def unioned(part: Seq[String]): DataFrame = {
        val w = Window.partitionBy(part.map(col): _*).orderBy("sb", "eb")
        spans
          .withColumn("prevMax", max(col("eb")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("ni", when(col("prevMax").isNull ||
            col("sb") > col("prevMax") + 1, 1L).otherwise(0L))
          .withColumn("island", sum("ni").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy((part :+ "island").map(col): _*)
          .agg(min("sb").as("ms"), max("eb").as("me"))
          .groupBy(part.map(col): _*)
          .agg(sum(col("me") - col("ms") + 1).as("u_chars"))
      }
      val pair = unioned(Seq("b_id", "c_id"))
      val dup = unioned(Seq("b_id")).withColumnRenamed("u_chars", "dup_chars")
      val best = pair.groupBy("b_id")
        .agg(count(lit(1)).as("n_partners"),
          max(struct(col("u_chars").as("sc"), (-col("c_id")).as("nc"))).as("b"))
        .select(col("b_id"), col("n_partners"),
          (-col("b.nc")).as("best_match"), col("b.sc").as("best_shared"))
      batch.select(col("doc_id"), col("len"))
        .join(best.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
        .join(dup.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_partners"), lit(0L)).cast("long").as("n_partners"),
          col("best_match").cast("long").as("best_match"),
          coalesce(col("best_shared"), lit(0L)).cast("long").as("best_shared"),
          coalesce(col("dup_chars"), lit(0L)).cast("long").as("dup_chars"),
          round(coalesce(col("dup_chars"), lit(0L)) * lit(1.0) / col("len"), 4)
            .as("coverage_pct"),
          (coalesce(col("dup_chars"), lit(0L)) * lit(2L) < col("len")).as("admit"))
        .orderBy("doc_id")
  }

  /** D26's landed artifact: the CORPUS (doc_id % 10 != 0) gram index —
    * every 60-gram's rolling hash with its (doc, position), df-capped
    * exactly like d23's in-corpus guard — written once per (JVM,
    * source dir) as a table BUCKETED by h (32 buckets, bucket-sorted).
    * Bucketing on the probe key is the serve-side contract: every
    * admission batch equi-joins this index on h, and the bucketed scan
    * provides the hash distribution, so the corpus side crosses the
    * wire ZERO times per batch — only the batch's own grams shuffle.
    * 16-ish bytes per corpus position; at 100 TB the index appends per
    * ingest batch (new buckets merge by bucket id) and the corpus TEXT
    * is never re-scanned to serve an admission check. */
  private val d26Landing =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Path of the landed base hot-set sidecar, keyed by source dir —
    * populated by [[d26LandingFor]]'s build, consumed by d31. */
  private val d26HotPath =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def d26LandingFor(s: SparkSession, dir: String): String = {
    // same catalog revalidation as d24: a memoized table name from a
    // stopped-and-recreated session must not be served dangling
    val memo = d26Landing.get(dir)
    if (memo != null && !s.catalog.tableExists(memo)) d26Landing.remove(dir, memo)
    d26Landing.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        dir.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_d26_idx_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_d26_${pid}_$tag")
      Caches.track(d)(() => {
        d26Landing.remove(d)
        d26HotPath.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      val grams = d23DocsFor(s, d).filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          posexplode(graft.plans.GraftGramHashes.column(col("text"), 60))
            .as(Seq("i0", "h")))
      // checkpoint: the hot set feeds the anti-join AND the landed
      // sidecar below — without it each consumer re-aggregates (and
      // re-scans the corpus text)
      val hot = Caches.checkpointed(d, grams.groupBy("h")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 64L).select("h"))
      // land the hot set alongside the index: df-capped grams vanish
      // from the index rows, but an APPEND (d31) still needs to know
      // they were hot — df only grows as the corpus grows, so a
      // base-hot gram stays hot in any widened corpus and delta rows
      // carrying it must be dropped without consulting the base text.
      // Production keeps the full per-gram df table; the hot list is
      // the part the capped index cannot reconstruct from its own rows.
      val hotOut = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_d26_hot_${pid}_$tag")
      Caches.trackPath(d, hotOut)
      hot.write.mode("overwrite").parquet(hotOut.getAbsolutePath)
      d26HotPath.put(d, hotOut.getAbsolutePath)
      // BUCKETED by the join key: every admission batch equi-joins this
      // index on h, so landing it hash-bucketed means the serve join
      // never re-shuffles the corpus side — only the (much smaller)
      // batch grams move. repartition-then-bucketBy shares murmur3 with
      // the bucket-file assignment → one file per bucket (see s18).
      grams.join(hot, Seq("h"), "left_anti")
        .repartition(32, col("h"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "h").sortBy("h")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      tbl
    })
  }

  /** E22's landed DELTA gram index + newly-hot tombstones — e20's
    * admit-then-append applied to the substring family, where the
    * df-cap makes the append algebra sharper than the band case:
    * admitting documents can push a gram's corpus df PAST the 64 cap,
    * and an exact append must then EXCISE the gram from serving even
    * though its rows sit in immutable base files. df only grows under
    * append, so the three cases resolve without re-reading corpus
    * text: (1) base-hot grams (the landed hot sidecar) stay hot —
    * delta rows carrying them are dropped; (2) grams whose combined
    * df (base index row count + delta count, both index-only
    * aggregations) stays ≤ 64 land normally; (3) grams the delta
    * pushes past the cap land nowhere AND emit a tombstone that
    * anti-joins the base at serve time (broadcast — the tombstone set
    * is bounded by the delta's gram vocabulary). Compaction folds
    * delta + tombstones into a rebuilt base on x21's cadence. Wave-1
    * gram rows come from the frame the classifier already featurized
    * — no second text pass over the arrivals. */
  private val e22Delta =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def e22DeltaFor(s: SparkSession, dir: String): (String, String) = {
    val memo = e22Delta.get(dir)
    if (memo != null && !s.catalog.tableExists(memo._1)) e22Delta.remove(dir, memo)
    e22Delta.computeIfAbsent(dir, d => {
      val tag = java.util.UUID.nameUUIDFromBytes(
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
      val pid = ProcessHandle.current().pid()
      val tbl = s"graft_e22_delta_${pid}_$tag"
      val out = new java.io.File(sys.props("java.io.tmpdir"), s"graft_e22_${pid}_$tag")
      val tombOut = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_e22_tomb_${pid}_$tag")
      Caches.track(d)(() => {
        e22Delta.remove(d)
        Caches.dropTables(tbl)
      })
      Caches.trackPath(d, out)
      Caches.trackPath(d, tombOut)
      val base = s.table(d26LandingFor(s, d))
      val baseHot = s.read.schema("h BIGINT")
        .parquet(d26HotPath.get(d))
      val wave1 = d23DocsFor(s, d).filter(col("doc_id") % 20 === 0)
      // one featurization pass, three consumers (classify, land, df)
      val bg1 = Caches.checkpointed(d, wave1
        .select(col("doc_id").as("b_id"),
          posexplode(graft.plans.GraftGramHashes.column(col("text"), 60))
            .as(Seq("ib", "h"))))
      val admitted = substringAdmission(s, d, wave1, bg1)
        .filter(col("admit")).select(col("doc_id").as("b_id"))
      val deltaGrams = Caches.checkpointed(d,
        bg1.join(admitted, Seq("b_id"), "left_semi")
          .select(col("b_id").as("doc_id"), col("ib").as("i0"), col("h")))
      val dfDelta = deltaGrams.groupBy("h").agg(count(lit(1)).as("cd"))
      val dfBase = base.groupBy("h").agg(count(lit(1)).as("cb"))
      val combined = dfDelta.join(dfBase, Seq("h"), "left")
        .select(col("h"), (coalesce(col("cb"), lit(0L)) + col("cd")).as("ct"),
          col("cb"))
      val tombstones = combined.filter(col("ct") > 64L && col("cb").isNotNull)
        .select("h")
      tombstones.write.mode("overwrite").parquet(tombOut.getAbsolutePath)
      deltaGrams
        .join(combined.filter(col("ct") > 64L).select("h"), Seq("h"), "left_anti")
        .join(baseHot, Seq("h"), "left_anti")
        .select("doc_id", "i0", "h")
        .repartition(32, col("h"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(32, "h").sortBy("h")
        .option("path", out.getAbsolutePath)
        .saveAsTable(tbl)
      (tbl, tombOut.getAbsolutePath)
    })
  }

  /** Documents admitted to the d23/d25 shared-span family: non-null
    * text of at least gram length. */
  private def d23DocsFor(s: SparkSession, dir: String): DataFrame =
    // fan-out: the 60-gram rolling-hash pass over every corpus char
    // otherwise runs in the fixture's single scan task (r17, guide §2.5)
    graft.operators.ScanFan.byKey(
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 60)
        .select(col("doc_id"), col("text"), length(col("text")).as("len")),
      col("doc_id"))

  /** Byte verification WITHOUT per-candidate substring-at-offset:
    * UTF-8 offsets aren't random-access, so `substring(t, i+1, K)`
    * re-scans the document from byte 0 per candidate — verify cost
    * would grow with DOCUMENT LENGTH (O(C·len) across candidates), a
    * real cliff on megabyte documents even though C itself is linear.
    * Instead each doc's candidate positions gather into one list and a
    * single pass over the (char-indexed, O(1)-offset) Java string
    * slices every needed gram at O(K) each; the gram text then
    * equi-joins back to the candidates by (doc, pos). Positions are
    * UTF-16-unit indexed end to end, matching the rolling hash pass
    * (BMP text — all fixtures and practically all corpora — makes unit
    * and codepoint indexing coincide). Output: (side, pos, g_pos). */
  private def slicedGrams(cand: DataFrame, docs: DataFrame,
      side: String, pos: String, k: Int): DataFrame = {
    val sliceU = udf((t: String, ps: Seq[Int]) =>
      ps.map(p => (p, t.substring(p, math.min(p + k, t.length)))))
    cand.select(col(side), col(pos)).distinct()
      .groupBy(side).agg(collect_list(pos).as("ps"))
      .join(docs.select(col("doc_id").as(side), col("text")), Seq(side))
      .select(col(side), explode(sliceU(col("text"), col("ps"))).as("pg"))
      .select(col(side), col("pg._1").as(pos), col("pg._2").as(s"g_$pos"))
  }

  /** d23's verified shared-span RUNS — match positions merged into
    * maximal same-offset runs, BEFORE any rollup — memoized per
    * fixture dir like the edge sets: the gram pass + pair join is the
    * expensive stage and both consumers (d23's pair report, d25's
    * excision) replay it otherwise. Columns: doc_a < doc_b,
    * delta = ia − ib, la (doc_a length), sa/ea (run interval in doc_a
    * coordinates, 0-based inclusive), span_len. */
  private val d23Runs =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def d23RunsFor(s: SparkSession, dir: String): DataFrame =
    d23Runs.computeIfAbsent(dir, d => {
      Caches.track(d)(() => { d23Runs.remove(d); () })
      val K = 60
      val DfCap = 64L
      val docs = d23DocsFor(s, d)
      val grams = docs.select(col("doc_id"),
        posexplode(graft.plans.GraftGramHashes.column(col("text"), K)).as(Seq("i0", "h")))
      val hot = grams.groupBy("h").agg(count(lit(1)).as("c"))
        .filter(col("c") > DfCap).select("h")
      val g = grams.join(hot, Seq("h"), "left_anti")
      val cand = g.select(col("h"), col("doc_id").as("doc_a"), col("i0").as("ia"))
        .join(g.select(col("h"), col("doc_id").as("doc_b"), col("i0").as("ib")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
      val ver = cand
        .join(slicedGrams(cand, docs, "doc_a", "ia", K), Seq("doc_a", "ia"))
        .join(slicedGrams(cand, docs, "doc_b", "ib", K), Seq("doc_b", "ib"))
        .filter(col("g_ia") === col("g_ib"))
        .join(docs.select(col("doc_id").as("doc_a"), col("len").as("la")), Seq("doc_a"))
        .select(col("doc_a"), col("doc_b"), col("ia"), col("ib"), col("la"))
      Caches.trackCached(d, ver.withColumn("delta", col("ia") - col("ib"))
        .withColumn("grp", col("ia") - row_number().over(
          Window.partitionBy("doc_a", "doc_b", "delta").orderBy("ia")))
        .groupBy("doc_a", "doc_b", "delta", "grp")
        .agg(max("la").as("la"), min("ia").as("sa"),
          (max(col("ia")) + lit(K - 1)).as("ea"),
          (max(col("ia")) - min(col("ia")) + lit(K)).as("span_len")))
    })

  /** Undirected degree per endpoint of a canonical (doc1 < doc2) edge
    * list. */
  private def edgeDegrees(edges: DataFrame): DataFrame =
    edges.select(col("doc1").as("v"))
      .union(edges.select(col("doc2").as("v")))
      .groupBy("v").agg(count(lit(1)).cast("long").as("deg"))

  /** d22's degree-oriented wedge stage, factored so DedupSpec can
    * demonstrate the skew bound directly: each edge points from its
    * lower-(degree, id) endpoint, so a degree-d hub CONTRIBUTES no
    * wedges itself — its d edges become at most one out-edge per
    * neighbor — where naive mid-vertex wedge generation would build
    * C(d, 2) pairs at the hub. Output (u, vv, ww) with vv < ww. */
  private[graft] def orientedWedges(edges: DataFrame): DataFrame = {
    val deg = edgeDegrees(edges)
    val oriented = edges
      .join(deg.select(col("v").as("doc1"), col("deg").as("deg1")), Seq("doc1"))
      .join(deg.select(col("v").as("doc2"), col("deg").as("deg2")), Seq("doc2"))
      .select(when(col("deg1") < col("deg2") ||
          (col("deg1") === col("deg2") && col("doc1") < col("doc2")),
          struct(col("doc1").as("src"), col("doc2").as("dst")))
        .otherwise(struct(col("doc2").as("src"), col("doc1").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // dst pairs of a shared src, ordered by id — {vv, ww} appears once
    oriented.as("a").join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("u"), col("a.dst").as("vv"), col("b.dst").as("ww"))
  }

  /** Per-vertex triangle counts + closure over a canonical edge list
    * (d22's full body; each triangle is found exactly once, at its
    * minimum-(degree, id) apex). */
  private[graft] def triangleCounts(edges: DataFrame): DataFrame = {
    val tri = orientedWedges(edges).join(edges,
      col("vv") === col("doc1") && col("ww") === col("doc2"))
    val perVertex = tri
      .select(explode(array(col("u"), col("vv"), col("ww"))).as("v"))
      .groupBy("v").agg(count(lit(1)).cast("long").as("n_tri"))
    edgeDegrees(edges).join(perVertex, Seq("v"), "left")
      .select(col("v").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("closure_bp", when(col("deg") > 1,
        expr("n_tri * 20000 div (deg * (deg - 1))")).otherwise(lit(0L)))
      .orderBy("doc_id")
  }

  /** The exhaustive batch-vs-corpus classification twin shared by
    * d18 (in-plan corpus bands) and d24 (landed corpus bands). */
  /** The batch-classifier replay, parameterized over the two sides
    * (each a full `SELECT doc_id, text FROM …`): d18/d24 instantiate
    * the standard 90/10 split; e20 nests one instantiation inside the
    * other's corpus (admit wave 1, then classify wave 2 against
    * corpus ∪ admitted) — the trainedServeSql convention applied to
    * the band family. */
  private def classifyRecomputeSql(batchSel: String, corpusSel: String): String =
    s"""WITH batch AS ($batchSel),
       | corpus AS ($corpusSel),
       | ex AS (SELECT b.doc_id, min(c.doc_id) AS exact_id
       |   FROM batch b JOIN corpus c ON b.text = c.text GROUP BY b.doc_id),
       | bsized AS (SELECT doc_id, sh, len(sh) AS sz FROM
       |   (SELECT doc_id, $shinglesSql AS sh FROM batch)),
       | csized AS (SELECT doc_id, sh, len(sh) AS sz FROM
       |   (SELECT doc_id, $shinglesSql AS sh FROM corpus)),
       | cand AS (SELECT b.doc_id AS doc1, c.doc_id AS doc2,
       |     b.sh AS sh1, b.sz AS sz1, c.sh AS sh2, c.sz AS sz2
       |   FROM bsized b JOIN csized c
       |     ON b.sz >= 0.8 * c.sz AND c.sz >= 0.8 * b.sz),
       | verified AS (SELECT doc1, doc2,
       |     len(list_intersect(sh1, sh2)) * 1.0 /
       |       (sz1 + sz2 - len(list_intersect(sh1, sh2))) AS j
       |   FROM cand),
       | nearr AS (SELECT doc1, doc2, round(j, 4) AS j4,
       |     row_number() OVER (PARTITION BY doc1
       |                        ORDER BY round(j, 4) DESC, doc2 ASC) AS rn
       |   FROM verified WHERE j >= 0.8)
       |SELECT b.doc_id,
       |  CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
       |       WHEN n.doc2 IS NOT NULL THEN 'near' ELSE 'novel' END AS status,
       |  COALESCE(e.exact_id, n.doc2) AS match_id,
       |  CASE WHEN e.exact_id IS NOT NULL THEN CAST(1.0 AS DOUBLE)
       |       ELSE n.j4 END AS similarity
       |FROM batch b
       |LEFT JOIN ex e ON e.doc_id = b.doc_id
       |LEFT JOIN (SELECT * FROM nearr WHERE rn = 1) n ON n.doc1 = b.doc_id
       |ORDER BY b.doc_id""".stripMargin

  private lazy val d18RecomputeSql: String = classifyRecomputeSql(
    "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0",
    "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0")

  /** Shared winnow-replay prelude: full-corpus fingerprint selection —
    * t45's encoding verbatim (docs → rolling 20-gram hashes → encoded
    * window-min → distinct decode). Ends WITHOUT a trailing comma so
    * callers append their index CTEs. */
  private def winnowSelSql: String =
    """docs AS (SELECT doc_id, text, length(text) AS len FROM documents
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
      | sel AS (SELECT DISTINCT doc_id, 4194303 - e % 4194304 AS p, e // 4194304 AS h
      |   FROM win WHERE i0 <= n - 8),""".stripMargin

  /** Parameterized winnow serve tail: probe `batchPred` docs (per-
    * (doc, h) cap ≤ 64) against the caller-built `idx` CTE, byte
    * verify, per-arrival argmax rollup. */
  private def winnowServeSql(batchPred: String): String =
    s""" bfp AS (SELECT * FROM sel WHERE $batchPred),
       | bk AS (SELECT doc_id, h FROM bfp GROUP BY doc_id, h HAVING count(*) <= 64),
       | probe AS (SELECT bfp.* FROM bfp JOIN bk USING (doc_id, h)),
       | cand AS (SELECT b.doc_id AS b_id, b.p AS p1, c.doc_id AS c_id, c.p AS p2
       |   FROM probe b JOIN idx c ON b.h = c.h),
       | ver AS (SELECT cd.* FROM cand cd
       |   JOIN docs x ON x.doc_id = cd.b_id JOIN docs y ON y.doc_id = cd.c_id
       |   WHERE substring(x.text, CAST(cd.p1 + 1 AS INT), 20)
       |       = substring(y.text, CAST(cd.p2 + 1 AS INT), 20)),
       | pp AS (SELECT b_id, c_id, CAST(count(*) AS BIGINT) AS np
       |   FROM ver GROUP BY b_id, c_id),
       | rk AS (SELECT *, row_number() OVER (PARTITION BY b_id
       |       ORDER BY np DESC, c_id ASC) AS r,
       |     count(*) OVER (PARTITION BY b_id) AS n_all FROM pp),
       | vd AS (SELECT b_id, CAST(n_all AS BIGINT) AS n_partners, c_id AS best_id,
       |     np AS best_shared FROM rk WHERE r = 1)
       |SELECT d.doc_id, vd.best_id IS NOT NULL AS matched,
       |  COALESCE(vd.n_partners, 0) AS n_partners, vd.best_id, vd.best_shared
       |FROM docs d LEFT JOIN vd ON vd.b_id = d.doc_id
       |WHERE d.$batchPred ORDER BY d.doc_id""".stripMargin

  /** Full winnow recompute: prelude + caller's index CTEs (must define
    * `idx`) + serve over `batchPred`. */
  private def winnowRecomputeSql(idxCtes: String, batchPred: String): String =
    s"WITH $winnowSelSql\n$idxCtes\n${winnowServeSql(batchPred)}"

  /** e27/e29's shared twin: wave-1 admission replayed in full against
    * the from-scratch base index, the admitted (unverified) docs
    * widening the corpus, the combined-df cap re-derived from scratch,
    * wave 2 served against the result. */
  private def winnowAppendRecomputeSql: String = winnowRecomputeSql(
    """ cfp0 AS (SELECT * FROM sel WHERE doc_id % 10 <> 0),
      | keep0 AS (SELECT h FROM cfp0 GROUP BY h HAVING count(*) <= 64),
      | idx0 AS (SELECT cfp0.* FROM cfp0 JOIN keep0 USING (h)),
      | bfp1 AS (SELECT * FROM sel WHERE doc_id % 20 = 0),
      | bk1 AS (SELECT doc_id, h FROM bfp1 GROUP BY doc_id, h HAVING count(*) <= 64),
      | probe1 AS (SELECT bfp1.* FROM bfp1 JOIN bk1 USING (doc_id, h)),
      | cand1 AS (SELECT b.doc_id AS b_id, b.p AS p1, c.doc_id AS c_id, c.p AS p2
      |   FROM probe1 b JOIN idx0 c ON b.h = c.h),
      | ver1 AS (SELECT cd.* FROM cand1 cd
      |   JOIN docs x ON x.doc_id = cd.b_id JOIN docs y ON y.doc_id = cd.c_id
      |   WHERE substring(x.text, CAST(cd.p1 + 1 AS INT), 20)
      |       = substring(y.text, CAST(cd.p2 + 1 AS INT), 20)),
      | adm AS (SELECT d.doc_id FROM docs d WHERE d.doc_id % 20 = 0
      |   AND d.doc_id NOT IN (SELECT b_id FROM ver1)),
      | cfp AS (SELECT * FROM sel WHERE doc_id % 10 <> 0
      |   UNION ALL SELECT sel.* FROM sel JOIN adm USING (doc_id)),
      | keep AS (SELECT h FROM cfp GROUP BY h HAVING count(*) <= 64),
      | idx AS (SELECT cfp.* FROM cfp JOIN keep USING (h)),""".stripMargin,
    "doc_id % 20 = 10")

  val oracle: Map[String, String] = Map(
    // Twin of the 5-round integer PageRank: one CTE pair per round,
    // identical integer-division points.
    "d12_pagerank" -> {
      def round(prev: String, next: String) =
        s"""$next AS (SELECT e.dst AS node,
           |     CAST(150000 + (85 * sum(r.rank // e.deg)) // 100 AS BIGINT) AS rank
           |   FROM ed e JOIN $prev r ON r.node = e.src GROUP BY e.dst)""".stripMargin
      s"""WITH e1 AS (SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
         |   FROM lineitem),
         | e AS (SELECT src, dst FROM e1 UNION ALL SELECT dst AS src, src AS dst FROM e1),
         | deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         | ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
         | r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
         | ${round("r0", "r1")},
         | ${round("r1", "r2")},
         | ${round("r2", "r3")},
         | ${round("r3", "r4")},
         | ${round("r4", "r5")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'order' ELSE 'part' END AS node_type,
         | node // 2 AS entity_id, rank
         |FROM r5 ORDER BY rank DESC, node ASC LIMIT 20""".stripMargin
    },

    "d10_boilerplate" ->
      """WITH dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | sized AS (SELECT doc_id, len(w) AS n_tokens FROM dd),
        | ge AS (SELECT doc_id, pg.p AS p, pg.g AS g FROM
        |   (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |      i -> {'p': i - 1, 'g': w[i] || '_' || w[i + 1]})) AS pg FROM dd)),
        | df AS (SELECT g FROM (SELECT DISTINCT g, doc_id FROM ge)
        |   GROUP BY g HAVING count(*) >= 10),
        | cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered FROM
        |   (SELECT DISTINCT doc_id, pos FROM
        |     (SELECT ge.doc_id, unnest([ge.p, ge.p + 1]) AS pos
        |      FROM ge JOIN df USING (g)))
        |   GROUP BY doc_id)
        |SELECT s.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(COALESCE(n_covered, 0) AS BIGINT) AS n_covered,
        | (100 * CAST(COALESCE(n_covered, 0) AS BIGINT)) // CAST(n_tokens AS BIGINT)
        |   AS covered_pct
        |FROM sized s LEFT JOIN cov USING (doc_id) ORDER BY s.doc_id""".stripMargin,

    "d3_ngram_jaccard" ->
      s"""WITH docs AS (SELECT doc_id, $shinglesSql AS sh
         |              FROM documents),
         | sized AS (SELECT doc_id, sh, len(sh) AS sz FROM docs),
         | tok AS (SELECT doc_id, sz, unnest(sh) AS t FROM sized),
         | freq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
         | ranked AS (SELECT tok.t, tok.doc_id, tok.sz,
         |     row_number() OVER (PARTITION BY tok.doc_id ORDER BY f.df ASC, tok.t ASC) AS rk
         |   FROM tok JOIN freq f ON tok.t = f.t),
         | pref AS (SELECT t, doc_id, sz FROM ranked
         |   WHERE rk <= floor((1.0 - $T) * sz) + 1),
         | cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         |   FROM pref a JOIN pref b ON a.t = b.t AND a.doc_id < b.doc_id
         |    AND a.sz >= $T * b.sz AND b.sz >= $T * a.sz),
         | verified AS (SELECT c.doc1, c.doc2,
         |     len(list_intersect(x.sh, y.sh)) * 1.0 /
         |       (x.sz + y.sz - len(list_intersect(x.sh, y.sh))) AS j
         |   FROM cand c JOIN sized x ON c.doc1 = x.doc_id
         |               JOIN sized y ON c.doc2 = y.doc_id)
         |SELECT doc1, doc2, round(j, 4) AS jaccard FROM verified
         |WHERE j >= $T ORDER BY doc1, doc2""".stripMargin,

    // d33: the twin replays t45's selection (same encoding), the
    // df ≤ 64 fingerprint guard, the hash equi-join, and the byte
    // verification at both positions
    "d33_winnow_pairs" ->
      """WITH docs AS (SELECT doc_id, text, length(text) AS len FROM documents
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
        | sel AS (SELECT DISTINCT doc_id, 4194303 - e % 4194304 AS p, e // 4194304 AS h
        |   FROM win WHERE i0 <= n - 8),
        | keep AS (SELECT h FROM sel GROUP BY h HAVING count(*) <= 64),
        | idx AS (SELECT sel.* FROM sel JOIN keep USING (h)),
        | cand AS (SELECT a.doc_id AS d1, a.p AS p1, b.doc_id AS d2, b.p AS p2
        |   FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id),
        | ver AS (SELECT c.* FROM cand c
        |   JOIN docs x ON x.doc_id = c.d1 JOIN docs y ON y.doc_id = c.d2
        |   WHERE substring(x.text, CAST(c.p1 + 1 AS INT), 20)
        |       = substring(y.text, CAST(c.p2 + 1 AS INT), 20))
        |SELECT d1 AS doc1, d2 AS doc2, CAST(count(*) AS BIGINT) AS n_shared,
        |  CAST(min(p1) AS BIGINT) AS first_pos1
        |FROM ver GROUP BY d1, d2 ORDER BY doc1, doc2""".stripMargin,

    // d34: build + serve recomputed from scratch — corpus selection
    // with the build-time cap, batch selection with the per-(doc, h)
    // probe cap, byte verify, and the per-arrival argmax rollup
    // (the parameterized [[winnowRecomputeSql]], shared with the e27/
    // e28/e29 lifecycle twins)
    "d34_winnow_admission" -> winnowRecomputeSql(
      """ cfp AS (SELECT * FROM sel WHERE doc_id % 10 <> 0),
        | keep AS (SELECT h FROM cfp GROUP BY h HAVING count(*) <= 64),
        | idx AS (SELECT cfp.* FROM cfp JOIN keep USING (h)),""".stripMargin,
      "doc_id % 10 = 0"),

    // e27/e29: the widened-corpus recompute — wave-1 admission replayed
    // IN FULL (its own probe cap + byte verify) to derive the admitted
    // set, then the index rebuilt from scratch over corpus ∪ admitted
    // with the combined df cap, then wave 2 served against it. e27's
    // lambda (base ∖ tombstones ∪ delta) and e29's compacted table must
    // both hash-equal this — the proof the append algebra and the
    // compaction each lost and invented nothing.
    "e27_winnow_append" -> winnowAppendRecomputeSql,
    "e29_winnow_compact" -> winnowAppendRecomputeSql,

    // e28: cap-then-delete — the df ≤ 64 cap computed over the FULL
    // corpus (the build-time property), deleted docs excised AFTER, so
    // the twin pins exactly the algebra a capped index can serve from
    // its own files (a hash the build dropped as hot is not
    // resurrected by deletes that lower its df).
    "e28_winnow_forget" -> winnowRecomputeSql(
      """ cfp AS (SELECT * FROM sel WHERE doc_id % 10 <> 0),
        | keep AS (SELECT h FROM cfp GROUP BY h HAVING count(*) <= 64),
        | idx AS (SELECT cfp.* FROM cfp JOIN keep USING (h)
        |   WHERE cfp.doc_id % 7 <> 1),""".stripMargin,
      "doc_id % 10 = 0"),

    // d31: the twin replays small-side prefix + positional bound +
    // exact containment verify (DedupSpec separately proves the
    // pruning ≡ the exhaustive all-pairs recompute)
    "d31_containment" ->
      s"""WITH docs AS (SELECT doc_id, $shinglesSql AS sh
         |              FROM documents),
         | sized AS (SELECT doc_id, sh, len(sh) AS sz FROM docs),
         | tok AS (SELECT doc_id, sz, unnest(sh) AS t FROM sized),
         | freq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
         | ranked AS (SELECT tok.t, tok.doc_id, tok.sz,
         |     row_number() OVER (PARTITION BY tok.doc_id ORDER BY f.df ASC, tok.t ASC) AS rk
         |   FROM tok JOIN freq f ON tok.t = f.t),
         | pref AS (SELECT t, doc_id, sz, rk FROM ranked
         |   WHERE rk <= sz - ceil(0.9 * sz - 1e-9) + 1),
         | cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         |   FROM pref a JOIN ranked b ON a.t = b.t
         |    AND (a.sz < b.sz OR (a.sz = b.sz AND a.doc_id < b.doc_id))
         |    AND 1 + least(a.sz - a.rk, b.sz - b.rk) >= ceil(0.9 * a.sz - 1e-9)),
         | verified AS (SELECT c.doc1, c.doc2,
         |     len(list_intersect(x.sh, y.sh)) * 1.0 / x.sz AS cont
         |   FROM cand c JOIN sized x ON c.doc1 = x.doc_id
         |               JOIN sized y ON c.doc2 = y.doc_id)
         |SELECT doc1, doc2, round(cont, 4) AS containment FROM verified
         |WHERE cont >= 0.9 ORDER BY doc1, doc2""".stripMargin,

    "d6_decontaminate" ->
      s"""WITH docs AS (SELECT doc_id, $shinglesSql AS sh
         |              FROM documents),
         | sized AS (SELECT doc_id, sh, len(sh) AS sz FROM docs),
         | tok AS (SELECT doc_id, sz, unnest(sh) AS t FROM sized),
         | freq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
         | ranked AS (SELECT tok.t, tok.doc_id, tok.sz,
         |     row_number() OVER (PARTITION BY tok.doc_id ORDER BY f.df ASC, tok.t ASC) AS rk
         |   FROM tok JOIN freq f ON tok.t = f.t),
         | pref AS (SELECT t, doc_id, sz FROM ranked
         |   WHERE rk <= floor((1.0 - $T) * sz) + 1),
         | cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         |   FROM pref a JOIN pref b ON a.t = b.t
         |    AND a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
         |    AND a.sz >= $T * b.sz AND b.sz >= $T * a.sz),
         | verified AS (SELECT c.doc1, c.doc2,
         |     len(list_intersect(x.sh, y.sh)) * 1.0 /
         |       (x.sz + y.sz - len(list_intersect(x.sh, y.sh))) AS j
         |   FROM cand c JOIN sized x ON c.doc1 = x.doc_id
         |               JOIN sized y ON c.doc2 = y.doc_id)
         |SELECT doc1 AS train_doc, doc2 AS benchmark_doc, round(j, 4) AS jaccard
         |FROM verified WHERE j >= $T ORDER BY train_doc, benchmark_doc""".stripMargin,

    // pmod form (((x % p) + p) % p): the engine's pmod() is always
    // non-negative while DuckDB's % is sign-of-dividend — a negative
    // doc_id would otherwise sample at 100% here (negative < 20)
    "d7_stratified_sample" ->
      """SELECT source, count(*) AS total_docs,
        | count(CASE WHEN (((doc_id % 1000000007) + 1000000007) % 1000000007 * 2654435761) % 1000000007 % 100 < 20 THEN 1 END) AS sampled_docs,
        | COALESCE(string_agg(
        |     CASE WHEN (((doc_id % 1000000007) + 1000000007) % 1000000007 * 2654435761) % 1000000007 % 100 < 20
        |          THEN CAST(doc_id AS VARCHAR) END, ','
        |     ORDER BY doc_id), '') AS sampled_ids
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // the twin replays the α = 0.5 weights with the identical IEEE
    // sequence: correctly-rounded sqrt, source-ordered fold for the
    // normalizer, one multiply + two divides per rate. e36's gate is
    // the landed ≡ retrain proof (same full recompute); e37's carves
    // the corpus with the null-keeping kept predicate.
    "d35_mixture_sample" -> mixtureOracleSqlFor("TRUE"),
    "e36_mixture_refresh" -> mixtureOracleSqlFor("TRUE"),
    "e37_mixture_forget" ->
      mixtureOracleSqlFor(TextQueries.e24DeletedKeptPredSql),

    "d8_group_sample" ->
      """WITH h AS (SELECT source, doc_id,
        |    (doc_id * 2654435761) % 1000003 AS hkey FROM documents),
        | r AS (SELECT *, row_number() OVER
        |    (PARTITION BY source ORDER BY hkey, doc_id) AS pick FROM h)
        |SELECT source, pick, doc_id FROM r WHERE pick <= 5
        |ORDER BY source, pick""".stripMargin,

    // d4: the polynomial simhash recomputed chunk-by-chunk in SQL — the
    // fold (a·m + c) mod 2³¹−1 never leaves signed-64-bit range, so both
    // engines compute the IDENTICAL signature; candidates come from the
    // same 16-bit pigeonhole equi-join and hamming sums bit_count over
    // the 4 chunk XORs (chunks partition the 64 bits).
    "d4_simhash" -> {
      def fold(m: Int) =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(regexp_extract_all(s, '.'), ch -> CAST(unicode(ch) AS BIGINT))), " +
          s"(a, b) -> (a * $m + b) % 2147483647)"
      s"""WITH docs AS (SELECT doc_id, $shinglesSql AS sh
         |              FROM documents
         |              WHERE text IS NOT NULL
         |                AND len(string_split(text, ' ')) >= 3),
         | feats AS (SELECT doc_id, list_transform(sh, s ->
         |     [${fold(131)}, ${fold(137)}, ${fold(139)}, ${fold(149)}]) AS hs
         |   FROM docs),
         | sig AS (SELECT doc_id, list_transform(range(0, 4), c ->
         |     CAST(list_sum(list_transform(range(0, 16), i ->
         |       CASE WHEN list_sum(list_transform(hs, h ->
         |           CASE WHEN (h[CAST(c + 1 AS INT)] >> CAST(i AS INT)) & 1 = 1
         |                THEN 1 ELSE -1 END)) > 0
         |       THEN (1 << CAST(i AS INT)) ELSE 0 END)) AS BIGINT)) AS chunks
         |   FROM feats),
         | ck AS (SELECT doc_id, chunks, unnest([0, 1, 2, 3]) AS c FROM sig),
         | ckv AS (SELECT doc_id, chunks, c, chunks[c + 1] AS v FROM ck),
         | cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         |   FROM ckv a JOIN ckv b ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id),
         | ham AS (SELECT c.doc1, c.doc2,
         |     CAST(bit_count(xor(x.chunks[1], y.chunks[1])) +
         |          bit_count(xor(x.chunks[2], y.chunks[2])) +
         |          bit_count(xor(x.chunks[3], y.chunks[3])) +
         |          bit_count(xor(x.chunks[4], y.chunks[4])) AS BIGINT) AS hamming
         |   FROM cand c JOIN sig x ON c.doc1 = x.doc_id
         |               JOIN sig y ON c.doc2 = y.doc_id)
         |SELECT doc1, doc2, hamming FROM ham WHERE hamming <= 3
         |ORDER BY doc1, doc2""".stripMargin
    },

    // Exhaustive exact-Jaccard twin of the LSH pipeline (see the d2 query
    // comment: the gate asserts full recall at the fixture's similarity
    // level). The size band is lossless for t=0.8, so the oracle stays
    // exact while skipping most of the quadratic pair space.
    "d2_minhash_lsh" -> d2ExhaustiveSql,

    // Triangles enumerated u < v < w directly over the exhaustive
    // exact-Jaccard edge set — orientation-free, so it cross-checks the
    // Spark side's degree-oriented wedge construction, not just its
    // arithmetic.
    "d22_triangles" ->
      s"""WITH docs AS (SELECT doc_id, $shinglesSql AS sh
         |              FROM documents),
         | sized AS (SELECT doc_id, sh, len(sh) AS sz FROM docs),
         | cand AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |     a.sh AS sh1, a.sz AS sz1, b.sh AS sh2, b.sz AS sz2
         |   FROM sized a JOIN sized b ON a.doc_id < b.doc_id
         |    AND a.sz >= 0.8 * b.sz AND b.sz >= 0.8 * a.sz),
         | pairs AS (SELECT doc1, doc2 FROM cand
         |   WHERE len(list_intersect(sh1, sh2)) * 1.0 /
         |     (sz1 + sz2 - len(list_intersect(sh1, sh2))) >= 0.8),
         | tri AS (SELECT e1.doc1 AS u, e1.doc2 AS v, e2.doc2 AS w
         |   FROM pairs e1 JOIN pairs e2 ON e2.doc1 = e1.doc2
         |   JOIN pairs e3 ON e3.doc1 = e1.doc1 AND e3.doc2 = e2.doc2),
         | verts AS (SELECT doc1 AS v FROM pairs
         |   UNION ALL SELECT doc2 FROM pairs),
         | deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
         |   FROM verts GROUP BY 1),
         | tv AS (SELECT u AS v FROM tri UNION ALL SELECT v FROM tri
         |   UNION ALL SELECT w FROM tri),
         | tc AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri
         |   FROM tv GROUP BY 1)
         |SELECT d.v AS doc_id, d.deg, COALESCE(tc.n_tri, 0) AS n_tri,
         |  CASE WHEN d.deg > 1 THEN
         |    COALESCE(tc.n_tri, 0) * 20000 // (d.deg * (d.deg - 1))
         |  ELSE 0 END AS closure_bp
         |FROM deg d LEFT JOIN tc ON tc.v = d.v ORDER BY doc_id""".stripMargin,

    // Connected components as a recursive CTE: reach(node, lab)
    // enumerates every label reachable from each node over the SAME
    // exhaustive exact-Jaccard ≥ 0.8 edge set d2's oracle uses; the
    // cluster id is the minimum reachable label — exactly the Spark
    // loop's fixpoint.
    "d9_dup_clusters" -> d9ClustersSql,

    // d28's twin is d9's FULL recompute over the complete edge set —
    // the oracle never sees the old/delta split, so hash equality is
    // the incremental-maintenance proof.
    "d28_incremental_cc" -> d9ClustersSql,

    // d29: the landed store after merge write-back must equal the
    // same full recompute — the strongest landed ≡ recomputed form.
    "d29_landed_labels" -> d9ClustersSql,

    // d32: full component recompute over the SURVIVING documents —
    // carve + one-shot relabel must equal it, splits included
    "d32_label_forget" -> s"""${d9ReachCteFor(
        "doc_id % 10 = 0 OR doc_id % 7 <> 1")}
         |SELECT node AS doc_id, min(lab) AS cluster_id,
         | node = min(lab) AS is_canonical
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    // d27's twin replays the d9 reachability, coalesces singletons to
    // their own label, and applies the same label-hash split — a
    // per-DOC split would produce different totals and hash-mismatch.
    "d27_leakage_split" -> s"""$d9ReachCte,
         | cl AS (SELECT node AS doc_id, min(lab) AS cluster_id
         |   FROM reach GROUP BY node),
         | lab AS (SELECT d.doc_id, d.n_chars,
         |     COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
         |   FROM documents d LEFT JOIN cl USING (doc_id)),
         | sp AS (SELECT *, CASE
         |     WHEN ((cluster_id % 1000000007 + 1000000007) % 1000000007
         |           * 2654435761) % 1000000007 % 10 < 8 THEN 'train'
         |     WHEN ((cluster_id % 1000000007 + 1000000007) % 1000000007
         |           * 2654435761) % 1000000007 % 10 = 8 THEN 'val'
         |     ELSE 'test' END AS split FROM lab)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same sequential double fold as the Spark UDF (0.0 + x₀ + x₁ + …
    // equals DuckDB's first-element-seeded list_reduce exactly).
    // d5's exact cosine edge set + d9's recursive reachability.
    "d13_semantic_clusters" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        | n AS (SELECT vec_id, v,
        |     list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e),
        | pairs AS (SELECT a.vec_id AS doc1, b.vec_id AS doc2
        |   FROM n a JOIN n b ON a.vec_id < b.vec_id
        |   WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
        |       (x, y) -> x + y) / sqrt(a.n2 * b.n2) >= 0.45),
        | edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
        |   UNION SELECT doc2, doc1 FROM pairs),
        | reach(node, lab) AS (
        |   SELECT DISTINCT a, a FROM edges
        |   UNION
        |   SELECT e2.a, r.lab FROM edges e2 JOIN reach r ON r.node = e2.b)
        |SELECT node AS vec_id, min(lab) AS cluster_id,
        | node = min(lab) AS is_canonical
        |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin,

    // Exhaustive cross-split twin of the incremental LSH path: every
    // (batch × corpus) pair within the lossless size band, verified at
    // exact Jaccard, ranked by (rounded j DESC, corpus id ASC) like the
    // Spark argmax struct. Exact dups rank via the same text equi-join.
    "d18_incremental_dedup" -> d18RecomputeSql,

    // e30: d18's classify replay with both sides' text swapped for the
    // chrome-invariant extracted content — the extraction CTE nests
    // INSIDE each side's selector as a WITH-subquery, so the composed
    // gate reuses t47's shared replay verbatim.
    "e30_crawl_classify" -> {
      def extractedSel(pred: String) =
        s"WITH ${TextQueries.htmlExtractCteSql} SELECT doc_id, " +
          "coalesce(array_to_string(string_split(text, chr(10))[3:], chr(10)), '') AS text " +
          s"FROM f WHERE $pred"
      classifyRecomputeSql(
        extractedSel("doc_id % 10 = 0"), extractedSel("doc_id % 10 <> 0"))
    },

    // e21: full-corpus lang-ID replay (score predicate TRUE) + the d9
    // reachability + the sequential budget window, nested — the funnel
    // twin recomputes every stage independently.
    "e21_curation_funnel" -> {
      s"""${PipelineQueries.t39LangIdCteFor("TRUE")},
         | docs2 AS (SELECT doc_id, n_chars,
         |     CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |   FROM documents WHERE text IS NOT NULL AND length(text) >= 3),
         | surv AS (SELECT v.doc_id, v.pred_lang, d.toks, d.n_chars
         |   FROM verdicts v JOIN docs2 d USING (doc_id)
         |   LEFT JOIN ($d9ClustersSql) c USING (doc_id)
         |   WHERE COALESCE(c.is_canonical, TRUE)),
         | b AS (SELECT pred_lang, CAST(sum(toks) * 4 // 10 AS BIGINT) AS budget
         |   FROM surv GROUP BY 1),
         | cm AS (SELECT *, CAST(COALESCE(sum(toks) OVER (PARTITION BY pred_lang
         |     ORDER BY n_chars DESC, doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         |   FROM surv),
         | kept AS (SELECT * FROM cm JOIN b USING (pred_lang) WHERE cum < budget),
         | r AS (SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_routed
         |   FROM verdicts GROUP BY 1),
         | sv AS (SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_dedup,
         |     CAST(sum(toks) AS BIGINT) AS dedup_tokens FROM surv GROUP BY 1),
         | kp AS (SELECT pred_lang, CAST(max(budget) AS BIGINT) AS budget,
         |     CAST(count(*) AS BIGINT) AS n_kept,
         |     CAST(sum(toks) AS BIGINT) AS kept_tokens,
         |     CAST(min(n_chars) AS BIGINT) AS min_quality FROM kept GROUP BY 1)
         |SELECT pred_lang, n_routed, n_dedup, dedup_tokens, budget, n_kept,
         |  kept_tokens, min_quality
         |FROM r JOIN sv USING (pred_lang) JOIN kp USING (pred_lang)
         |ORDER BY pred_lang""".stripMargin
    },

    // e20: wave-1 classify nested INSIDE wave-2's corpus — the twin
    // replays admit-then-append relationally, so the gate proves the
    // landed-delta serve ≡ recompute over the updated corpus.
    "e20_admit_and_append" -> classifyRecomputeSql(
      "SELECT doc_id, text FROM documents WHERE doc_id % 20 = 10",
      s"""SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
         | UNION ALL SELECT d.doc_id, d.text FROM documents d
         | WHERE d.doc_id IN (SELECT doc_id FROM (${classifyRecomputeSql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0",
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0")})
         |   WHERE status = 'novel')""".stripMargin),

    // e26: serving wave 2 from the compacted single band table must
    // equal the same widened-corpus recompute e20 is held to
    "e26_band_compact" -> classifyRecomputeSql(
      "SELECT doc_id, text FROM documents WHERE doc_id % 20 = 10",
      s"""SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
         | UNION ALL SELECT d.doc_id, d.text FROM documents d
         | WHERE d.doc_id IN (SELECT doc_id FROM (${classifyRecomputeSql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0",
            "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0")})
         |   WHERE status = 'novel')""".stripMargin),

    // e22: the capped lambda gram index must serve wave 2 exactly as
    // the from-scratch index over corpus ∪ admitted-wave-1 — the
    // widened corpus predicate nests the full wave-1 substring replay
    "e22_gram_append" -> d26OracleSqlFor(
      "doc_id % 20 = 10",
      s"""doc_id % 10 <> 0 OR doc_id IN (SELECT doc_id FROM (${
        d26OracleSqlFor("doc_id % 20 = 0", "doc_id % 10 <> 0")}) WHERE admit)"""),

    // e23: serving from the compacted single table must equal the
    // same widened-corpus recompute e22 is held to
    "e23_gram_compact" -> d26OracleSqlFor(
      "doc_id % 20 = 10",
      s"""doc_id % 10 <> 0 OR doc_id IN (SELECT doc_id FROM (${
        d26OracleSqlFor("doc_id % 20 = 0", "doc_id % 10 <> 0")}) WHERE admit)"""),

    // e24: the forgotten carve must vanish from both classify axes —
    // the recompute simply never sees the deleted documents
    "e24_band_forget" -> classifyRecomputeSql(
      "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0",
      "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0 AND doc_id % 7 != 1"),

    // e25: cap-then-delete — the df-cap is computed over the FULL
    // build corpus (capPred), candidates come only from survivors
    "e25_gram_forget" -> d26OracleSqlFor(
      "doc_id % 10 = 0",
      "doc_id % 10 <> 0 AND doc_id % 7 <> 1",
      "doc_id % 10 <> 0"),

    // d24 serves from the LANDED band index; its oracle is the same
    // exhaustive recomputation — the hash gate is the proof that
    // classifying against the on-disk artifact equals recomputing the
    // corpus bands in-plan.
    "d24_persisted_band_index" -> d18RecomputeSql,

    // d21's twin re-derives every cut from the per-window fold (the t5
    // oracle's formulation — algebraically identical to the engine's
    // rolling update mod p) and rebuilds the spans with list
    // arithmetic; md5 over the same codepoint-substring gates content.
    "d21_cdc_chunks" ->
      s"SELECT * FROM ($d21ChunksSql) ORDER BY doc_id, chunk_no",

    // d30's twin nests d21's chunk replay, labels each chunk with its
    // doc's source, and replays the digest-keyed dedup accounting
    "d30_chunk_dedup" ->
      s"""WITH lab AS (SELECT d.source, c.c_len, c.c_md5
         |   FROM ($d21ChunksSql) c JOIN documents d USING (doc_id)),
         | uniq AS (SELECT source, c_md5, c_len, CAST(count(*) AS BIGINT) AS n
         |   FROM lab GROUP BY 1, 2, 3)
         |SELECT source, CAST(sum(n) AS BIGINT) AS n_chunks,
         |  CAST(sum(n * c_len) AS BIGINT) AS raw_bytes,
         |  CAST(count(*) AS BIGINT) AS n_unique,
         |  CAST(sum(c_len) AS BIGINT) AS unique_bytes,
         |  CASE WHEN sum(n * c_len) > 0
         |    THEN 10000 * CAST(sum(c_len) AS BIGINT) // CAST(sum(n * c_len) AS BIGINT)
         |  END AS dedup_bp
         |FROM uniq GROUP BY source ORDER BY source""".stripMargin,

    // d20's twin labels the exhaustive exact-Jaccard pair set (d2's
    // oracle) with each endpoint's source and replays the unordered-
    // pair rollup; min/max of the already-rounded jaccard keep the
    // hash exact.
    "d20_source_overlap" ->
      s"""WITH src AS (SELECT doc_id, source FROM documents),
         | lab AS (SELECT least(sa.source, sb.source) AS source1,
         |     greatest(sa.source, sb.source) AS source2, e.jaccard
         |   FROM ($d2ExhaustiveSql) e
         |   JOIN src sa ON sa.doc_id = e.doc1
         |   JOIN src sb ON sb.doc_id = e.doc2)
         |SELECT source1, source2, CAST(count(*) AS BIGINT) AS n_pairs,
         |  min(jaccard) AS min_j, max(jaccard) AS max_j
         |FROM lab GROUP BY 1, 2 ORDER BY source1, source2""".stripMargin,

    // d19's twin nests d9's recursive-CTE clustering (the same
    // composition idiom as d17's rollup) and replays the quality
    // argmax as a (n_chars DESC, doc_id ASC) window.
    "d19_canonical_keep" ->
      s"""WITH allc AS (SELECT d.doc_id,
         |    COALESCE(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
         |  FROM documents d LEFT JOIN ($d9ClustersSql) c USING (doc_id)),
         | r AS (SELECT cluster_id, doc_id,
         |    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
         |    row_number() OVER (PARTITION BY cluster_id
         |                       ORDER BY n_chars DESC, doc_id ASC) AS rn
         |  FROM allc),
         | best AS (SELECT cluster_id, cluster_size, doc_id AS keep_id
         |   FROM r WHERE rn = 1)
         |SELECT a.doc_id, a.cluster_id, b.cluster_size,
         |  a.doc_id = b.keep_id AS keep
         |FROM allc a JOIN best b USING (cluster_id)
         |ORDER BY a.doc_id""".stripMargin,

    "d5_embedding_dup" -> exactPairsSql,

    // d14's twin IS the exact all-pairs query: hash equality proves the
    // IVF-candidate path recovers 100% of the cos ≥ 0.45 pair set on
    // the fixture (the oracle side may be brute force — it is the
    // definition of correct, not the production plan).
    "d14_semantic_edges_ivf" -> exactPairsSql,

    // One-row rollup whose subqueries ARE the d2/d9 twins (CTE chains
    // nested as derived tables) plus plain text-group counts.
    "d17_dedup_yield" ->
      s"""SELECT
         | (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         | (SELECT CAST(count(*) AS BIGINT)
         |    FROM (SELECT text FROM documents GROUP BY text)) AS n_exact_distinct,
         | (SELECT CAST(sum(k - 1) AS BIGINT)
         |    FROM (SELECT count(*) AS k FROM documents GROUP BY text)) AS n_exact_dropped,
         | (SELECT CAST(count(*) AS BIGINT)
         |    FROM ($d2ExhaustiveSql)) AS n_neardup_pairs,
         | (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT)
         |    FROM ($d9ClustersSql)) AS n_clusters,
         | (SELECT CAST(count(*) FILTER (NOT is_canonical) AS BIGINT)
         |    FROM ($d9ClustersSql)) AS n_cluster_dropped,
         | (SELECT CAST(count(*) AS BIGINT) FROM documents) -
         |   (SELECT CAST(count(*) FILTER (NOT is_canonical) AS BIGINT)
         |      FROM ($d9ClustersSql)) AS n_kept""".stripMargin,

    // exact cross-split cosine pairs, train side first
    "d16_semantic_decontaminate" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        | n AS (SELECT vec_id, v,
        |     list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e),
        | pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |     list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
        |       (x, y) -> x + y) / sqrt(a.n2 * b.n2) AS cosine
        |   FROM n a JOIN n b ON a.vec_id < b.vec_id),
        | edges AS (SELECT id1, id2, round(cosine, 4) AS cosine FROM pairs
        |   WHERE cosine >= 0.45 AND (id1 % 20 = 0) <> (id2 % 20 = 0))
        |SELECT CASE WHEN id1 % 20 = 0 THEN id2 ELSE id1 END AS train_vec,
        | CASE WHEN id1 % 20 = 0 THEN id1 ELSE id2 END AS benchmark_vec, cosine
        |FROM edges ORDER BY train_vec, benchmark_vec""".stripMargin,

    // d23: the full propose/verify/merge/union pipeline replayed
    // relationally — per-position k-gram hashes as the same
    // (h·131 + c) mod 2³¹−1 fold over the gram's units (list_reduce
    // per position; the engine's rolling pass computes identical
    // values in O(L)), the same DfCap=64 hot-hash guard, byte
    // verification, islands-by-(ia − row_number) run merging, and
    // running-max interval union.
    "d23_shared_substrings" ->
      """WITH docs AS (SELECT doc_id, text, length(text) AS len FROM documents
        |    WHERE text IS NOT NULL AND length(text) >= 60),
        | grams AS (SELECT doc_id, i AS i0,
        |     list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(regexp_extract_all(substring(text, CAST(i + 1 AS INT), 60), '.'),
        |         ch -> CAST(unicode(ch) AS BIGINT))),
        |       (a, b) -> (a * 131 + b) % 2147483647) AS h
        |   FROM docs, unnest(range(0, len - 59)) AS t(i)),
        | keep AS (SELECT h FROM grams GROUP BY h HAVING count(*) <= 64),
        | g AS (SELECT grams.* FROM grams JOIN keep USING (h)),
        | cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i0 AS ia, b.i0 AS ib
        |   FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
        | ver AS (SELECT c.doc_a, c.doc_b, c.ia, c.ib, da.len AS la
        |   FROM cand c JOIN docs da ON da.doc_id = c.doc_a
        |     JOIN docs db ON db.doc_id = c.doc_b
        |   WHERE substring(da.text, CAST(c.ia + 1 AS INT), 60)
        |       = substring(db.text, CAST(c.ib + 1 AS INT), 60)),
        | runs1 AS (SELECT doc_a, doc_b, la, ia, ia - ib AS delta,
        |     ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib
        |       ORDER BY ia) AS grp
        |   FROM ver),
        | spans AS (SELECT doc_a, doc_b, max(la) AS la, min(ia) AS sa,
        |     max(ia) + 59 AS ea, max(ia) - min(ia) + 60 AS span_len
        |   FROM runs1 GROUP BY doc_a, doc_b, delta, grp),
        | isl AS (SELECT *, CASE WHEN sa > COALESCE(max(ea) OVER (PARTITION BY doc_a, doc_b
        |       ORDER BY sa, ea ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
        |     THEN 1 ELSE 0 END AS ni FROM spans),
        | isl2 AS (SELECT *, sum(ni) OVER (PARTITION BY doc_a, doc_b ORDER BY sa, ea
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM isl),
        | uni AS (SELECT doc_a, doc_b, island, max(la) AS la, max(span_len) AS msl,
        |     max(ea) - min(sa) + 1 AS ulen FROM isl2 GROUP BY doc_a, doc_b, island)
        |SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(ulen) AS BIGINT) AS shared_chars,
        |  CAST(max(msl) AS BIGINT) AS max_span_len,
        |  round(CAST(sum(ulen) AS DOUBLE) / max(la), 4) AS coverage_pct
        |FROM uni GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,

    // d25: the same propose/verify/merge front as d23's twin, then the
    // excision replayed relationally — runs shifted into doc_b
    // coordinates, per-doc interval union, and the spliced text
    // reassembled with an ordered string_agg so the md5 gates the
    // actual bytes.
    "d25_excise_spans" ->
      """WITH docs AS (SELECT doc_id, text, length(text) AS len FROM documents
        |    WHERE text IS NOT NULL AND length(text) >= 60),
        | grams AS (SELECT doc_id, i AS i0,
        |     list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(regexp_extract_all(substring(text, CAST(i + 1 AS INT), 60), '.'),
        |         ch -> CAST(unicode(ch) AS BIGINT))),
        |       (a, b) -> (a * 131 + b) % 2147483647) AS h
        |   FROM docs, unnest(range(0, len - 59)) AS t(i)),
        | keep AS (SELECT h FROM grams GROUP BY h HAVING count(*) <= 64),
        | g AS (SELECT grams.* FROM grams JOIN keep USING (h)),
        | cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i0 AS ia, b.i0 AS ib
        |   FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
        | ver AS (SELECT c.doc_a, c.doc_b, c.ia, c.ib
        |   FROM cand c JOIN docs da ON da.doc_id = c.doc_a
        |     JOIN docs db ON db.doc_id = c.doc_b
        |   WHERE substring(da.text, CAST(c.ia + 1 AS INT), 60)
        |       = substring(db.text, CAST(c.ib + 1 AS INT), 60)),
        | runs1 AS (SELECT doc_a, doc_b, ia, ia - ib AS delta,
        |     ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib
        |       ORDER BY ia) AS grp
        |   FROM ver),
        | bint AS (SELECT doc_b AS doc_id, min(ia) - delta AS s,
        |     max(ia) + 59 - delta AS e
        |   FROM runs1 GROUP BY doc_b, delta, grp),
        | bisl AS (SELECT *, CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id
        |       ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
        |     THEN 1 ELSE 0 END AS ni FROM bint),
        | bisl2 AS (SELECT *, sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM bisl),
        | merged AS (SELECT doc_id, island, min(s) AS ms, max(e) AS me
        |   FROM bisl2 GROUP BY doc_id, island),
        | pre AS (SELECT doc_id,
        |     COALESCE(lag(me) OVER (PARTITION BY doc_id ORDER BY ms) + 1, 0) AS seg_start,
        |     ms - COALESCE(lag(me) OVER (PARTITION BY doc_id ORDER BY ms) + 1, 0) AS seg_len
        |   FROM merged),
        | tl AS (SELECT m.doc_id, max(me) + 1 AS seg_start, d.len - max(me) - 1 AS seg_len
        |   FROM merged m JOIN docs d ON d.doc_id = m.doc_id GROUP BY m.doc_id, d.len),
        | segs AS (SELECT * FROM pre WHERE seg_len > 0
        |   UNION ALL SELECT * FROM tl WHERE seg_len > 0),
        | clean AS (SELECT s.doc_id,
        |     string_agg(substring(d.text, CAST(s.seg_start + 1 AS INT),
        |       CAST(s.seg_len AS INT)), '' ORDER BY s.seg_start) AS ct
        |   FROM segs s JOIN docs d ON d.doc_id = s.doc_id GROUP BY s.doc_id),
        | stats AS (SELECT doc_id, count(*) AS n_cuts, sum(me - ms + 1) AS removed
        |   FROM merged GROUP BY doc_id)
        |SELECT st.doc_id, CAST(d.len AS BIGINT) AS orig_len,
        |  CAST(st.n_cuts AS BIGINT) AS n_cuts,
        |  CAST(st.removed AS BIGINT) AS removed_chars,
        |  CAST(COALESCE(length(c.ct), 0) AS BIGINT) AS clean_len,
        |  md5(COALESCE(c.ct, '')) AS clean_md5
        |FROM stats st JOIN docs d ON d.doc_id = st.doc_id
        |LEFT JOIN clean c ON c.doc_id = st.doc_id
        |ORDER BY st.doc_id""".stripMargin,

    // d26: the landed-index serve replayed from scratch — corpus gram
    // index (df-capped within the corpus), batch grams (df-capped
    // within the batch), hash join, byte verify, runs, per-pair and
    // per-doc interval unions, deterministic best-partner, admit
    // verdict. The gate passing IS the landed ≡ recomputed proof,
    // exactly like d24/x19.
    "d26_substring_admission" -> d26OracleSql,

    "e15_ingest_verdict" -> e15OracleSql,

    "e34_full_ingest_verdict" -> e34OracleSql
  )

  /** d26's DuckDB twin, factored to a val so e15's composed oracle can
    * nest it verbatim — the composed gate then PROVES the one-pass
    * verdict equals running the three standalone gates and joining. */
  private lazy val d26OracleSql: String =
    d26OracleSqlFor("doc_id % 10 = 0", "doc_id % 10 <> 0")

  /** The substring replay parameterized over the batch and corpus
    * membership predicates (both over bare `doc_id`) — d26 is the
    * standard carve; e22 nests the wave-1 replay inside its widened
    * corpus predicate, the classifyRecomputeSql convention. `capPred`
    * (defaults to the corpus predicate) is the population the df-cap
    * is computed over: e25's cap-then-delete serve caps on the FULL
    * build corpus while serving only surviving documents.
    *
    * The island stages union over DISTINCT intervals (pspan/dspan):
    * the multiset form computed `ni` in one window pass and the
    * prefix-sum `island` in another, and with TIED (sb, eb) rows
    * DuckDB may order the two passes differently (run-to-run
    * nondeterministic overcount on a tie-heavy corpus); the engine's
    * single WindowExec computes both over one sorted partition, so
    * only the twin needed the tie-free form — a union is unchanged
    * by deduplication. */
  private def d26OracleSqlFor(batchPred: String, corpusPred: String,
      capPred: String = null): String = {
     val cap = Option(capPred).getOrElse(corpusPred)
     s"""WITH docs AS (SELECT doc_id, text, length(text) AS len FROM documents
        |    WHERE text IS NOT NULL AND length(text) >= 60),
        | gr AS (SELECT doc_id, i AS i0,
        |     list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(regexp_extract_all(substring(text, CAST(i + 1 AS INT), 60), '.'),
        |         ch -> CAST(unicode(ch) AS BIGINT))),
        |       (a, b) -> (a * 131 + b) % 2147483647) AS h
        |   FROM docs, unnest(range(0, len - 59)) AS t(i)),
        | cgc AS (SELECT * FROM gr WHERE $cap),
        | ck AS (SELECT h FROM cgc GROUP BY h HAVING count(*) <= 64),
        | cg AS (SELECT * FROM gr WHERE $corpusPred),
        | cidx AS (SELECT cg.* FROM cg JOIN ck USING (h)),
        | bgr AS (SELECT * FROM gr WHERE $batchPred),
        | bk AS (SELECT doc_id, h FROM bgr GROUP BY doc_id, h HAVING count(*) <= 64),
        | bg AS (SELECT bgr.* FROM bgr JOIN bk USING (doc_id, h)),
        | cand AS (SELECT b.doc_id AS b_id, b.i0 AS ib, c.doc_id AS c_id, c.i0 AS ic
        |   FROM bg b JOIN cidx c ON b.h = c.h),
        | ver AS (SELECT cd.b_id, cd.c_id, cd.ib, cd.ic
        |   FROM cand cd JOIN docs db ON db.doc_id = cd.b_id
        |     JOIN docs dc ON dc.doc_id = cd.c_id
        |   WHERE substring(db.text, CAST(cd.ib + 1 AS INT), 60)
        |       = substring(dc.text, CAST(cd.ic + 1 AS INT), 60)),
        | runs1 AS (SELECT b_id, c_id, ib, ib - ic AS delta,
        |     ib - row_number() OVER (PARTITION BY b_id, c_id, ib - ic
        |       ORDER BY ib) AS grp
        |   FROM ver),
        | spans AS (SELECT b_id, c_id, min(ib) AS sb, max(ib) + 59 AS eb
        |   FROM runs1 GROUP BY b_id, c_id, delta, grp),
        | pspan AS (SELECT DISTINCT b_id, c_id, sb, eb FROM spans),
        | dspan AS (SELECT DISTINCT b_id, sb, eb FROM spans),
        | pisl AS (SELECT *, CASE WHEN sb > COALESCE(max(eb) OVER (PARTITION BY b_id, c_id
        |       ORDER BY sb, eb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
        |     THEN 1 ELSE 0 END AS ni FROM pspan),
        | pisl2 AS (SELECT *, sum(ni) OVER (PARTITION BY b_id, c_id ORDER BY sb, eb
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM pisl),
        | pairu AS (SELECT b_id, c_id, sum(me - ms + 1) AS shared FROM
        |   (SELECT b_id, c_id, island, min(sb) AS ms, max(eb) AS me
        |    FROM pisl2 GROUP BY b_id, c_id, island) GROUP BY b_id, c_id),
        | disl AS (SELECT *, CASE WHEN sb > COALESCE(max(eb) OVER (PARTITION BY b_id
        |       ORDER BY sb, eb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
        |     THEN 1 ELSE 0 END AS ni FROM dspan),
        | disl2 AS (SELECT *, sum(ni) OVER (PARTITION BY b_id ORDER BY sb, eb
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM disl),
        | dup AS (SELECT b_id, sum(me - ms + 1) AS dup_chars FROM
        |   (SELECT b_id, island, min(sb) AS ms, max(eb) AS me
        |    FROM disl2 GROUP BY b_id, island) GROUP BY b_id),
        | bestw AS (SELECT b_id, c_id, shared,
        |     count(*) OVER (PARTITION BY b_id) AS n_partners,
        |     row_number() OVER (PARTITION BY b_id ORDER BY shared DESC, c_id) AS rn
        |   FROM pairu),
        | best AS (SELECT b_id, n_partners, c_id AS best_match, shared AS best_shared
        |   FROM bestw WHERE rn = 1)
        |SELECT d.doc_id, CAST(COALESCE(b.n_partners, 0) AS BIGINT) AS n_partners,
        |  CAST(b.best_match AS BIGINT) AS best_match,
        |  CAST(COALESCE(b.best_shared, 0) AS BIGINT) AS best_shared,
        |  CAST(COALESCE(u.dup_chars, 0) AS BIGINT) AS dup_chars,
        |  round(CAST(COALESCE(u.dup_chars, 0) AS DOUBLE) / d.len, 4) AS coverage_pct,
        |  COALESCE(u.dup_chars, 0) * 2 < d.len AS admit
        |FROM docs d LEFT JOIN best b ON b.b_id = d.doc_id
        |LEFT JOIN dup u ON u.b_id = d.doc_id
        |WHERE $batchPred
        |ORDER BY d.doc_id""".stripMargin
  }

  /** e15's twin NESTS the three standalone oracles (d18's exhaustive
    * band recompute, d26's substring replay, the exact all-pairs
    * cosine set) as subqueries and left-joins them per arrival — so
    * hash equality proves the composed one-pass Spark pipeline equals
    * running each published gate independently. */
  private lazy val e15OracleSql: String =
    s"""WITH band AS (SELECT * FROM ($d18RecomputeSql)),
       | sub AS (SELECT * FROM ($d26OracleSql)),
       | semp AS (SELECT * FROM ($exactPairsSql)),
       | semc AS (SELECT CASE WHEN id1 % 10 = 0 THEN id1 ELSE id2 END AS doc_id,
       |     CASE WHEN id1 % 10 = 0 THEN id2 ELSE id1 END AS sem_id, cosine
       |   FROM semp WHERE (id1 % 10 = 0) <> (id2 % 10 = 0)),
       | semb AS (SELECT doc_id, sem_id, cosine,
       |     row_number() OVER (PARTITION BY doc_id
       |                        ORDER BY cosine DESC, sem_id) AS rn
       |   FROM semc)
       |SELECT b.doc_id, b.status, b.match_id, b.similarity,
       |  CAST(COALESCE(s.n_partners, 0) AS BIGINT) AS sub_partners,
       |  CAST(s.best_match AS BIGINT) AS sub_match,
       |  CAST(COALESCE(s.dup_chars, 0) AS BIGINT) AS sub_dup_chars,
       |  COALESCE(s.coverage_pct, CAST(0.0 AS DOUBLE)) AS sub_coverage,
       |  COALESCE(s.admit, TRUE) AS sub_admit,
       |  CAST(m.sem_id AS BIGINT) AS sem_match,
       |  m.cosine AS sem_cosine,
       |  (b.status = 'novel' AND COALESCE(s.admit, TRUE)
       |    AND m.sem_id IS NULL) AS admit
       |FROM band b
       |LEFT JOIN sub s ON s.doc_id = b.doc_id
       |LEFT JOIN (SELECT * FROM semb WHERE rn = 1) m ON m.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin

  /** e34's twin NESTS all six standalone oracles: e15's composed
    * three-axis twin (itself nesting d18/d26/the exact cosine set),
    * t39's lang-ID replay scored on the arrival carve, t58's
    * interpolated-trigram recompute scored on the arrival carve
    * (the engine serves the LANDED t59 store, so this leg is also a
    * landed ≡ recomputed proof), and the URL-parse chain feeding both
    * the blocklist CASE and the per-domain history count. Hash
    * equality proves the composed one-pass verdict equals running
    * each published gate independently and joining on doc_id. */
  private lazy val e34OracleSql: String = {
    val langSql = PipelineQueries.t39LangIdCteFor("doc_id % 10 = 0") +
      "\nSELECT doc_id, pred_lang, margin FROM verdicts"
    val pplSql = TextQueries.lm3OracleSqlFor("TRUE", "doc_id % 10 = 0")
    val domParse = WebQueries.urlParseCteSqlFrom(
      "documents", "doc_id", "source", Seq("doc_id"))
    val blocked = WebQueries.BlockedDomains
      .map(d => s"'$d'").mkString("(", ", ", ")")
    s"""WITH base AS (SELECT * FROM ($e15OracleSql)),
       | lang AS (SELECT * FROM ($langSql)),
       | ppl AS (SELECT doc_id, xent3_bits FROM ($pplSql)),
       | dom0 AS (SELECT * FROM (WITH $domParse
       |   SELECT doc_id, reg_domain FROM parsed)),
       | hist AS (SELECT reg_domain, CAST(count(*) AS BIGINT) AS hist_docs
       |   FROM dom0 WHERE doc_id % 10 <> 0 GROUP BY 1),
       | dom AS (SELECT a.doc_id, a.reg_domain,
       |     COALESCE(h.hist_docs, 0) AS hist_docs,
       |     CASE WHEN a.reg_domain IN $blocked THEN 'blocked'
       |          WHEN COALESCE(h.hist_docs, 0) >= $E34DomainCapDocs
       |            THEN 'over_cap'
       |          ELSE 'ok' END AS domain_verdict
       |   FROM (SELECT doc_id, reg_domain FROM dom0 WHERE doc_id % 10 = 0) a
       |   LEFT JOIN hist h USING (reg_domain))
       |SELECT b.doc_id, b.status, b.match_id, b.similarity, b.sub_partners,
       |  b.sub_match, b.sub_dup_chars, b.sub_coverage, b.sub_admit,
       |  b.sem_match, b.sem_cosine, b.admit AS dedup_admit,
       |  l.pred_lang, CAST(l.margin AS BIGINT) AS lang_margin,
       |  l.pred_lang IS NOT NULL AS lang_ok,
       |  p.xent3_bits,
       |  COALESCE(p.xent3_bits <= CAST($E34PplAdmitBits AS DOUBLE), TRUE) AS ppl_ok,
       |  d.reg_domain, d.hist_docs, d.domain_verdict,
       |  d.domain_verdict = 'ok' AS domain_ok,
       |  (b.admit AND l.pred_lang IS NOT NULL
       |    AND COALESCE(p.xent3_bits <= CAST($E34PplAdmitBits AS DOUBLE), TRUE)
       |    AND d.domain_verdict = 'ok') AS admit
       |FROM base b
       |LEFT JOIN lang l ON l.doc_id = b.doc_id
       |LEFT JOIN ppl p ON p.doc_id = b.doc_id
       |JOIN dom d ON d.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** d21's chunk replay (doc_id, chunk_no, c_len, c_md5) — shared by
    * the d21 gate and d30's dedup-accounting rollup. */
  private lazy val d21ChunksSql: String =
    """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents
      |    WHERE text IS NOT NULL),
      | cuts AS (SELECT doc_id, text, n,
      |    list_filter(range(8, greatest(n, 8)),
      |      e -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(e - 7, e + 1),
      |               j -> CAST(ascii(text[CAST(j AS INT)]) AS BIGINT))),
      |           (h, c) -> (h * 31 + c) % 1000000007) % 64 = 0) AS ce
      |  FROM t),
      | b AS (SELECT doc_id, text,
      |    list_concat(list_concat([CAST(0 AS BIGINT)], ce),
      |                [CAST(n AS BIGINT)]) AS bs FROM cuts),
      | ch AS (SELECT doc_id, text, bs,
      |    unnest(range(0, len(bs) - 1)) AS k FROM b)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
      |  bs[CAST(k + 2 AS INT)] - bs[CAST(k + 1 AS INT)] AS c_len,
      |  md5(substring(text, CAST(bs[CAST(k + 1 AS INT)] + 1 AS INT),
      |      CAST(bs[CAST(k + 2 AS INT)] - bs[CAST(k + 1 AS INT)] AS INT))) AS c_md5
      |FROM ch""".stripMargin

  /** Exhaustive exact-Jaccard ≥ 0.8 twin of the LSH pipeline (see the
    * d2 query comment: the gate asserts full recall at the fixture's
    * similarity level; the size band is lossless for t=0.8) — shared by
    * d2's gate and d17's rollup. */
  private[queries] lazy val d2ExhaustiveSql: String =
    s"""WITH docs AS (SELECT doc_id, $shinglesSql AS sh
       |              FROM documents),
       | sized AS (SELECT doc_id, sh, len(sh) AS sz FROM docs),
       | cand AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       |     a.sh AS sh1, a.sz AS sz1, b.sh AS sh2, b.sz AS sz2
       |   FROM sized a JOIN sized b ON a.doc_id < b.doc_id
       |    AND a.sz >= 0.8 * b.sz AND b.sz >= 0.8 * a.sz),
       | verified AS (SELECT doc1, doc2,
       |     len(list_intersect(sh1, sh2)) * 1.0 /
       |       (sz1 + sz2 - len(list_intersect(sh1, sh2))) AS j
       |   FROM cand)
       |SELECT doc1, doc2, round(j, 4) AS jaccard FROM verified
       |WHERE j >= 0.8 ORDER BY doc1, doc2""".stripMargin

  /** Connected components as a recursive CTE over the same exhaustive
    * edge set — the min reachable label is exactly the Spark loop's
    * fixpoint. Shared by d9's gate and d17's rollup. */
  /** d9's dup-graph reachability as a reusable WITH prefix (ends at the
    * `reach` recursive CTE, no trailing comma) — shared by the d9 twin
    * and d27's cluster-consistent split twin. */
  private lazy val d9ReachCte: String = d9ReachCteFor("TRUE")

  /** The d9 reachability CTE restricted to documents matching
    * `survivor` — d32's forget oracle recomputes components over the
    * surviving subgraph from scratch (deleting a cut vertex must
    * split its component, which no label-local rewrite can express). */
  private def d9ReachCteFor(survivor: String): String =
    s"""WITH RECURSIVE docs AS (SELECT doc_id, $shinglesSql AS sh
         |              FROM documents WHERE $survivor),
         | sized AS (SELECT doc_id, sh, len(sh) AS sz FROM docs),
         | cand AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |     a.sh AS sh1, a.sz AS sz1, b.sh AS sh2, b.sz AS sz2
         |   FROM sized a JOIN sized b ON a.doc_id < b.doc_id
         |    AND a.sz >= 0.8 * b.sz AND b.sz >= 0.8 * a.sz),
         | pairs AS (SELECT doc1, doc2 FROM cand
         |   WHERE len(list_intersect(sh1, sh2)) * 1.0 /
         |     (sz1 + sz2 - len(list_intersect(sh1, sh2))) >= 0.8),
         | edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
         |   UNION SELECT doc2, doc1 FROM pairs),
         | reach(node, lab) AS (
         |   SELECT DISTINCT a, a FROM edges
         |   UNION
         |   SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b)""".stripMargin

  private lazy val d9ClustersSql: String = s"""$d9ReachCte
         |SELECT node AS doc_id, min(lab) AS cluster_id,
         | node = min(lab) AS is_canonical
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** The exact cosine ≥ 0.45 pair set over all embedding pairs — shared
    * twin of d5 (which computes it the same way) and d14 (which must
    * equal it from IVF candidates alone). */
  private lazy val exactPairsSql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      | n AS (SELECT vec_id, v,
      |     list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e),
      | pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
      |     list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
      |       (x, y) -> x + y) / sqrt(a.n2 * b.n2) AS cosine
      |   FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT id1, id2, round(cosine, 4) AS cosine FROM pairs
      |WHERE cosine >= 0.45 ORDER BY id1, id2""".stripMargin
}
