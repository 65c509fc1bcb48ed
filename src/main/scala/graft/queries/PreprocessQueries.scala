package graft.queries

import graft.Tables
import graft.preprocess.Preprocess
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E1 — the composed supplier preprocessing pipelines, end to end over a
  * constructed "raw supplier frame": dirty article strings (apostrophe +
  * 000 prefix), nullable/zero prices, and localized stock-status columns
  * derived deterministically from lineitem keys — mirrored exactly in
  * the DuckDB oracle so the whole P8→P9/P10→F2/F3→P11 chain is
  * hash-checked. */
object PreprocessQueries {

  // Raw vitya frame: every 13th row a null price, every 17th a
  // below-threshold price; four stock statuses cycling on the order key.
  // (l_partkey rides along so the gated query can defer the article
  // string construction past its presentation sort.)
  private val vityaBalance =
    elt((col("l_orderkey") % 4 + 1).cast("int"),
      lit("Имеются в нал."), lit("Распродажа"), lit("Ожидается"), lit("нет в наличии"))

  private def rawVitya(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      concat(lit("'000"), col("l_partkey").cast("string")).as("article_vitya"),
      when(col("l_orderkey") % 13 === 0, lit(null).cast("double"))
        .when(col("l_orderkey") % 17 === 0, lit(0.005))
        .otherwise(col("l_extendedprice")).as("price_usd"),
      vityaBalance.as("balance"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"))

  private val rawVityaSql =
    """SELECT '''000' || CAST(l_partkey AS VARCHAR) AS article_vitya,
      |  CASE WHEN l_orderkey % 13 = 0 THEN NULL
      |       WHEN l_orderkey % 17 = 0 THEN 0.005
      |       ELSE l_extendedprice END AS price_usd,
      |  list_extract(['Имеются в нал.', 'Распродажа', 'Ожидается', 'нет в наличии'],
      |               CAST(l_orderkey % 4 + 1 AS INT)) AS balance,
      |  l_orderkey, l_linenumber
      |FROM lineitem""".stripMargin

  // Raw dimi frame: two balance columns; either can be "Ожидается".
  private def rawDimi(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      concat(lit("D-"), col("l_partkey").cast("string")).as("article_dimi"),
      when(col("l_orderkey") % 13 === 0, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")).as("price_usd"),
      when(col("l_orderkey") % 5 === 0, lit("Ожидается")).otherwise(lit("в наличии"))
        .as("balance"),
      when(col("l_linenumber") % 3 === 0, lit("Ожидается")).otherwise(lit("ок"))
        .as("balance1"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"))

  private val rawDimiSql =
    """SELECT 'D-' || CAST(l_partkey AS VARCHAR) AS article_dimi,
      |  CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_extendedprice END AS price_usd,
      |  CASE WHEN l_orderkey % 5 = 0 THEN 'Ожидается' ELSE 'в наличии' END AS balance,
      |  CASE WHEN l_linenumber % 3 = 0 THEN 'Ожидается' ELSE 'ок' END AS balance1,
      |  l_orderkey, l_linenumber
      |FROM lineitem""".stripMargin

  // The gated twins compose the same P8→P9/P10→F2/F3→P11 stages as
  // Preprocess() (whose dispatch path is separately gated by
  // e1_ref_pipeline), but project EVERY derived column AFTER the
  // presentation sort: a range exchange SAMPLES its child to pick
  // bounds, so anything projected below it executes twice over every
  // row and ships through the exchange — the sort's child carries only
  // the filter predicates and the four base columns the deferred
  // projection needs ("ship narrow, project late", the plan you'd want
  // at 100 TB). Cut e1_vitya 2.9 s → ~0.5 s at sf0.1.
  private def deferredSort(raw: DataFrame, keep: DataFrame => DataFrame): DataFrame =
    keep(raw)
      .select("l_orderkey", "l_linenumber", "l_partkey", "price_usd")
      .orderBy("l_orderkey", "l_linenumber")

  val queries: Map[String, QueryFn] = Map(
    "e1_preprocess_vitya" -> ((s, dir) =>
      deferredSort(rawVitya(s, dir),
        r => Preprocess.vityaStockFilter(Preprocess.priceFilter(r)))
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.Cleaning.cleanArticleVitya(
            concat(lit("'000"), col("l_partkey").cast("string"))).as("article_vitya"),
          col("price_usd"), vityaBalance.as("balance"),
          lit("Витя").as("supplier_name"))),

    "e1_preprocess_dimi" -> ((s, dir) =>
      deferredSort(rawDimi(s, dir),
        r => Preprocess.dimiStockFilter(Preprocess.priceFilter(r)))
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.Cleaning.cleanArticleDimi(
            concat(lit("D-"), col("l_partkey").cast("string"))).as("article_dimi"),
          col("price_usd"), lit("Дима").as("supplier_name")))
  )

  val oracle: Map[String, String] = Map(
    // F2 twin: strip apostrophes + one leading 000 + delete non-digits →
    // BIGINT (the raw values are always "'000<digits>", so no 0-fallback
    // branch fires here).
    "e1_preprocess_vitya" ->
      s"""WITH raw AS ($rawVityaSql)
         |SELECT l_orderkey, l_linenumber,
         | COALESCE(TRY_CAST(regexp_replace(regexp_replace(regexp_replace(
         |     trim(article_vitya), '''', '', 'g'), '^000', ''), '[^0-9]', '', 'g')
         |   AS BIGINT), 0) AS article_vitya,
         | price_usd, balance, 'Витя' AS supplier_name
         |FROM raw
         |WHERE price_usd IS NOT NULL AND price_usd > 0.01
         |  AND balance IN ('Имеются в нал.', 'Распродажа')
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "e1_preprocess_dimi" ->
      s"""WITH raw AS ($rawDimiSql)
         |SELECT l_orderkey, l_linenumber,
         | regexp_replace(regexp_replace(trim(article_dimi), '''', '', 'g'), '^000', '')
         |   AS article_dimi,
         | price_usd, 'Дима' AS supplier_name
         |FROM raw
         |WHERE price_usd IS NOT NULL AND price_usd > 0.01
         |  AND balance IS DISTINCT FROM 'Ожидается'
         |  AND balance1 IS DISTINCT FROM 'Ожидается'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
