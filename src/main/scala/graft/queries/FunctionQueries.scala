package graft.queries

import graft.Tables
import graft.functions.Cleaning
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY.md §2.3) exercised over fixture
  * columns. Where an operator needs inputs the fixtures don't naturally
  * contain (apostrophed articles, bracket codes, mAh specs), the dirty
  * input is CONSTRUCTED deterministically from fixture columns inside the
  * query — and constructed identically in the DuckDB oracle — so the
  * cleaning/extraction logic is genuinely exercised and still
  * hash-checkable.
  */
object FunctionQueries {

  // Dirty article strings built from part keys: one third gets the
  // apostrophe+000 prefix, one third embedded letters, one third a
  // letter prefix (exercises all three branches of F2).
  private def rawArticle = {
    val pk = col("p_partkey").cast("string")
    when(col("p_partkey") % 3 === 0, concat(lit("'000"), pk))
      .when(col("p_partkey") % 3 === 1, concat(pk, lit("-A"), col("p_size").cast("string")))
      .otherwise(concat(lit("XY"), pk))
  }
  private val rawArticleSql =
    """CASE WHEN p_partkey % 3 = 0 THEN '''000' || CAST(p_partkey AS VARCHAR)
      |     WHEN p_partkey % 3 = 1 THEN CAST(p_partkey AS VARCHAR) || '-A' || CAST(p_size AS VARCHAR)
      |     ELSE 'XY' || CAST(p_partkey AS VARCHAR) END""".stripMargin

  // Product names with embedded bracket codes / capacities / brands, built
  // from part columns (exercises F6/F7/F8 priorities).
  private def madeName = {
    val pk = col("p_partkey")
    when(pk % 4 === 0,
      concat(lit("Powerbank GREENOE Portable Power bank "), (pk % 90 + 10).cast("string"),
        lit("000mah 100w (C"), (pk % 60 + 10).cast("string"), lit(")")))
      .when(pk % 4 === 1,
        concat(lit("Cable AC-M"), (pk % 50).cast("string"), lit("-SC black (x)")))
      .when(pk % 4 === 2,
        concat(lit("XIAOMI charger "), (pk % 20 + 5).cast("string"), lit(" mah")))
      .otherwise(col("p_name"))
  }
  private val madeNameSql =
    """CASE WHEN p_partkey % 4 = 0 THEN 'Powerbank GREENOE Portable Power bank ' ||
      |       CAST(p_partkey % 90 + 10 AS VARCHAR) || '000mah 100w (C' ||
      |       CAST(p_partkey % 60 + 10 AS VARCHAR) || ')'
      |     WHEN p_partkey % 4 = 1 THEN 'Cable AC-M' || CAST(p_partkey % 50 AS VARCHAR) || '-SC black (x)'
      |     WHEN p_partkey % 4 = 2 THEN 'XIAOMI charger ' || CAST(p_partkey % 20 + 5 AS VARCHAR) || ' mah'
      |     ELSE p_name END""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    // ---- F1: whitespace cleanup ----
    "f1_clean_ws" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Cleaning.cleanInvisibleChars(col("text")).as("text_clean"))
        .orderBy("doc_id")),

    // ---- F2: vitya article cleaning (always-int semantics) ----
    "f2_clean_article_int" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), rawArticle.as("raw_article"),
          Cleaning.cleanArticleVitya(rawArticle).as("clean_article"))
        .orderBy("p_partkey")),

    // ---- F3: dimi article cleaning (stays string) ----
    "f3_clean_article_str" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), Cleaning.cleanArticleDimi(rawArticle).as("clean_article"))
        .orderBy("p_partkey")),

    // ---- F4: color normalization ----
    "f4_color_norm" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), Cleaning.safeColor(col("c_mktsegment")).as("color_norm"))
        .orderBy("c_custkey")),

    // ---- F6: bracket-code extraction ----
    "f6_bracket_code" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), madeName.as("made_name"),
          Cleaning.bracketCode(madeName).as("bracket_code"))
        .orderBy("p_partkey")),

    // ---- F7: battery-capacity extraction ----
    "f7_capacity" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), Cleaning.batteryCapacity(madeName).as("capacity"))
        .orderBy("p_partkey")),

    // ---- F8: unified code (bracket > brand > name-code≥4), fully
    // expression-based via Cleaning.nameCode → hash-checkable ----
    "f8_unified_code" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          Cleaning.unifiedCodeExpr(madeName).as("unified_code"))
        .orderBy("p_partkey")),

    // ---- F5: name-code extraction (priority regex cascade) as a pure
    // Column expression; the ProductCode UDF stays as the Unicode-\b
    // parity variant (ScalaTest-checked against this one) ----
    "f5_name_code" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), Cleaning.nameCode(madeName).as("name_code"))
        .orderBy("p_partkey")),

    // ---- F12: per-supplier base price, null/≤0 → 0.0 (the shifted
    // retail price goes negative for low keys, exercising the guard) ----
    "f12_base_price" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          round(Cleaning.basePriceOrZero(col("p_retailprice") - 950), 4)
            .as("base_price_or_zero"))
        .orderBy("p_partkey"))
  )

  val oracle: Map[String, String] = Map(
    // RE2's \s is ASCII-only; Cleaning.UnicodeWsRe2 spells out the Java
    // (?U)\s / Python str.split() Unicode-whitespace set.
    "f1_clean_ws" ->
      s"""SELECT doc_id,
         | NULLIF(trim(regexp_replace(text, '${Cleaning.UnicodeWsRe2}+', ' ', 'g')), '')
         |   AS text_clean
         |FROM documents ORDER BY doc_id""".stripMargin,

    "f2_clean_article_int" ->
      s"""WITH t AS (SELECT p_partkey, $rawArticleSql AS raw_article FROM part)
         |SELECT p_partkey, raw_article,
         | COALESCE(TRY_CAST(regexp_replace(regexp_replace(regexp_replace(
         |   trim(raw_article), '''', '', 'g'), '^000', ''), '[^0-9]', '', 'g')
         |   AS BIGINT), 0) AS clean_article
         |FROM t ORDER BY p_partkey""".stripMargin,

    "f3_clean_article_str" ->
      s"""WITH t AS (SELECT p_partkey, $rawArticleSql AS raw_article FROM part)
         |SELECT p_partkey,
         | regexp_replace(regexp_replace(trim(raw_article), '''', '', 'g'), '^000', '')
         |   AS clean_article
         |FROM t ORDER BY p_partkey""".stripMargin,

    "f4_color_norm" ->
      """SELECT c_custkey, lower(trim(COALESCE(c_mktsegment, ''))) AS color_norm
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f6_bracket_code" ->
      s"""WITH t AS (SELECT p_partkey, $madeNameSql AS made_name FROM part),
         | x AS (SELECT p_partkey, made_name,
         |   upper(trim(regexp_extract(made_name, '\\(([^)]+)\\)', 1))) AS code
         | FROM t)
         |SELECT p_partkey, made_name,
         | CASE WHEN regexp_matches(code, '^[A-Za-zА-Яа-я0-9\\-]+$$')
         |       AND length(code) >= 4 THEN code END AS bracket_code
         |FROM x ORDER BY p_partkey""".stripMargin,

    "f7_capacity" ->
      s"""WITH t AS (SELECT p_partkey, lower($madeNameSql) AS n FROM part),
         | x AS (SELECT p_partkey,
         |   regexp_extract(n, '(\\d+)\\s*mah', 1) AS c1,
         |   regexp_extract(n, '(\\d+)\\s*мач', 1) AS c2,
         |   regexp_extract(n, '(\\d+)\\s*мч', 1) AS c3
         | FROM t)
         |SELECT p_partkey, COALESCE(
         |  CASE WHEN c1 <> '' AND TRY_CAST(c1 AS BIGINT) BETWEEN 5 AND 999999 THEN c1 END,
         |  CASE WHEN c2 <> '' AND TRY_CAST(c2 AS BIGINT) BETWEEN 5 AND 999999 THEN c2 END,
         |  CASE WHEN c3 <> '' AND TRY_CAST(c3 AS BIGINT) BETWEEN 5 AND 999999 THEN c3 END)
         |  AS capacity
         |FROM x ORDER BY p_partkey""".stripMargin,

    "f5_name_code" ->
      s"""WITH t AS (SELECT p_partkey, $madeNameSql AS made_name FROM part)
         |SELECT p_partkey, ${Cleaning.nameCodeSql("made_name")} AS name_code
         |FROM t ORDER BY p_partkey""".stripMargin,

    "f8_unified_code" ->
      s"""WITH t AS (SELECT p_partkey, $madeNameSql AS made_name FROM part)
         |SELECT p_partkey, ${Cleaning.unifiedCodeSql("made_name")} AS unified_code
         |FROM t ORDER BY p_partkey""".stripMargin,

    "f12_base_price" ->
      """SELECT p_partkey,
        | round(COALESCE(CASE WHEN p_retailprice - 950 > 0
        |                     THEN p_retailprice - 950 END, 0.0), 4)
        |   AS base_price_or_zero
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
