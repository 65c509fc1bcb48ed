package graft.queries

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (builder brief): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane (sign-LSH) bucketed variant as the scale path.
  *
  * Scale notes: brute force broadcasts the QUERY side (small by
  * definition) and repartitions the corpus to the session's shuffle
  * width, so scoring spreads across all cores and the corpus shuffles
  * only that once. The LSH variant hashes the corpus once into sign
  * buckets (equi-join key), turning search into a bucket join — at
  * 100 TB you'd add multi-probe (flip low-margin bits) or IVF coarse
  * quantization; the plumbing is identical. Scoring kernels are
  * primitive JVM loops ([[graft.functions.VectorOps]]) whose strictly
  * sequential fold matches DuckDB's list_reduce bit-for-bit, which is
  * what lets x1 carry an exact hash-compared oracle.
  */
object AnnQueries {

  private val dotUdf = udf(VectorOps.dot _)
  private val norm2Udf = udf(VectorOps.norm2 _)

  /** 8 deterministic hyperplanes over 64 dims (256 buckets — sized so a
    * few-thousand-vector corpus still collides; more planes +
    * multi-probe at larger corpus sizes). */
  private val lshPlanes = VectorOps.planes(8, 64)
  private val bucketUdf = udf((v: Seq[Double]) => VectorOps.signBucket(v, lshPlanes))

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", norm2Udf(col("v")))

  private def topK(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    joined
      .withColumn("cosine", dotUdf(col("qv"), col("nv")) / sqrt(col("qn2") * col("nn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cosine"), 4).as("cosine"))
      .orderBy("qid", "rank")
  }

  val queries: Map[String, QueryFn] = Map(
    // ---- X1: brute-force cosine top-5 per query vector ----
    "x1_ann_brute" -> ((s, dir) => {
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = vecs(s, dir)
      val queriesDf = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
      val corpus = e.select(col("vec_id").as("nid"), col("v").as("nv"), col("n2").as("nn2"))
        .repartition(width)
      topK(broadcast(queriesDf).join(corpus, col("qid") =!= col("nid")), 5)
    }),

    // ---- X3: IVF coarse quantization — every vector is assigned to its
    // nearest centroid (a deterministic subset of the corpus), and a
    // query probes only its own centroid's cell. Pure joins + argmax
    // windows, so the whole index build AND search is hash-gated against
    // DuckDB. nprobe=1 here; more probes = relax the cell equi-join. ----
    "x3_ann_ivf" -> ((s, dir) => {
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = vecs(s, dir)
      val cents = e.filter(col("vec_id") % 50 === 1)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
      // nearest centroid per vector (argmax cosine, smallest cid on ties)
      val aw = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid").asc)
      val assigned = e.repartition(width).crossJoin(broadcast(cents))
        .withColumn("ccos", dotUdf(col("v"), col("cv")) / sqrt(col("n2") * col("cn2")))
        .withColumn("arn", row_number().over(aw)).filter(col("arn") === 1)
        .select(col("vec_id"), col("v"), col("n2"), col("cid"))
      val queriesDf = assigned.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"), col("cid"))
      val corpus = assigned.select(col("vec_id").as("nid"), col("v").as("nv"),
        col("n2").as("nn2"), col("cid"))
      topK(broadcast(queriesDf).join(corpus,
        Seq("cid")).filter(col("qid") =!= col("nid")), 5)
    }),

    // ---- X2: sign-LSH bucketed top-5 (engine-internal planes →
    // rows-only; DedupSpec checks bucket containment + exact cosines) ----
    "x2_ann_lsh" -> ((s, dir) => {
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = vecs(s, dir).withColumn("sig", bucketUdf(col("v")))
      val queriesDf = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"),
          col("sig").as("qsig"))
      val corpus = e.select(col("vec_id").as("nid"), col("v").as("nv"),
        col("n2").as("nn2"), col("sig").as("nsig")).repartition(width)
      topK(broadcast(queriesDf).join(corpus,
        col("qsig") === col("nsig") && col("qid") =!= col("nid")), 5)
    })
  )

  val oracle: Map[String, String] = Map(
    "x1_ann_brute" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        | n AS (SELECT vec_id, v,
        |     list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e),
        | q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM n WHERE vec_id % 50 = 0),
        | pairs AS (SELECT q.qid, c.vec_id AS nid,
        |     list_reduce(list_transform(list_zip(q.qv, c.v),
        |       p -> p[1] * p[2]), (a, b) -> a + b) / sqrt(q.qn2 * c.n2) AS cosine
        |   FROM q JOIN n c ON q.qid <> c.vec_id),
        | ranked AS (SELECT *, row_number() OVER
        |     (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank FROM pairs)
        |SELECT qid, rank, nid, round(cosine, 4) AS cosine FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "x3_ann_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        | n AS (SELECT vec_id, v,
        |     list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2 FROM e),
        | cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n WHERE vec_id % 50 = 1),
        | ac AS (SELECT n.vec_id, n.v, n.n2, c.cid,
        |     list_reduce(list_transform(list_zip(n.v, c.cv), p -> p[1] * p[2]),
        |       (a, b) -> a + b) / sqrt(n.n2 * c.cn2) AS ccos
        |   FROM n CROSS JOIN cent c),
        | ar AS (SELECT *, row_number() OVER
        |     (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS arn FROM ac),
        | assigned AS (SELECT vec_id, v, n2, cid FROM ar WHERE arn = 1),
        | q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, cid FROM assigned
        |   WHERE vec_id % 50 = 0),
        | pairs AS (SELECT q.qid, c.vec_id AS nid,
        |     list_reduce(list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2]),
        |       (a, b) -> a + b) / sqrt(q.qn2 * c.n2) AS cosine
        |   FROM q JOIN assigned c ON q.cid = c.cid AND q.qid <> c.vec_id),
        | ranked AS (SELECT *, row_number() OVER
        |     (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank FROM pairs)
        |SELECT qid, rank, nid, round(cosine, 4) AS cosine FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  )
}
