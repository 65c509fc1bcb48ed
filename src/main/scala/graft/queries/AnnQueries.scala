package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (builder brief): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane (sign-LSH) bucketed variant as the scale path.
  *
  * Scale notes: brute force broadcasts the QUERY side (small by
  * definition) so the corpus never shuffles and top-k is a per-query
  * window over corpus partitions. The LSH variant hashes the corpus once
  * into 16-bit sign buckets (equi-join key), turning search into a
  * bucket join — at 100 TB you'd add multi-probe (flip low-margin bits)
  * or IVF coarse quantization; the plumbing is identical.
  */
object AnnQueries {

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", aggregate(col("v"), lit(0.0), (a, x) => a + x * x))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of the index pair mapped to [-1, 1]. */
  private def planeComponent = // SQL fragment used inside transform()
    "(CAST(xxhash64(CAST(p AS STRING), CAST(i AS STRING)) % 1000003 AS DOUBLE) / 1000003.0)"

  /** 8-bit sign-LSH signature of vector column v (8 planes ⇒ 256
    * buckets — sized so a few-thousand-vector corpus still collides;
    * more planes + multi-probe at larger corpus sizes). */
  private def signature: org.apache.spark.sql.Column = expr(
    s"""aggregate(sequence(0, 7), 0L, (acc, p) -> (acc << 1) |
       |  (CASE WHEN aggregate(sequence(0, 63), 0.0D,
       |     (s2, i) -> s2 + v[i] * $planeComponent) > 0.0D
       |   THEN 1L ELSE 0L END))""".stripMargin)

  private def cosine(v1: String, v2: String, n21: String, n22: String) =
    aggregate(zip_with(col(v1), col(v2), (x, y) => x * y), lit(0.0), (a, x) => a + x) /
      sqrt(col(n21) * col(n22))

  val queries: Map[String, QueryFn] = Map(
    // ---- X1: brute-force cosine top-5 per query vector ----
    "x1_ann_brute" -> ((s, dir) => {
      val e = vecs(s, dir)
      val queriesDf = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
      val corpus = e.select(col("vec_id").as("nid"), col("v").as("nv"), col("n2").as("nn2"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
      broadcast(queriesDf).join(corpus, col("qid") =!= col("nid"))
        .withColumn("cosine", cosine("qv", "nv", "qn2", "nn2"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("nid"), round(col("cosine"), 4).as("cosine"))
        .orderBy("qid", "rank")
    }),

    // ---- X2: sign-LSH bucketed top-5 (xxhash64 planes → rows-only;
    // AnnSpec checks bucket containment + exact cosines) ----
    "x2_ann_lsh" -> ((s, dir) => {
      val e = vecs(s, dir).withColumn("sig", signature)
      val queriesDf = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"),
          col("sig").as("qsig"))
      val corpus = e.select(col("vec_id").as("nid"), col("v").as("nv"),
        col("n2").as("nn2"), col("sig").as("nsig"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
      broadcast(queriesDf).join(corpus,
          col("qsig") === col("nsig") && col("qid") =!= col("nid"))
        .withColumn("cosine", cosine("qv", "nv", "qn2", "nn2"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("nid"), round(col("cosine"), 4).as("cosine"))
        .orderBy("qid", "rank")
    })
  )

  val oracle: Map[String, String] = Map(
    // Engine-specific float summation order is identical (sequential
    // fold) but double rounding parity is pinned by AnnSpec rather than
    // the hash gate; rows-only here would lose the x1 check entirely, so
    // x1 DOES carry an oracle — cosine computed with the same sequential
    // arithmetic over doubles.
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
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  )
}
