package graft.queries

import graft.Tables
import graft.sources.{Canonicalize, ConfigLoader, SupplierConfig}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The reference's config-driven load pipeline (SURVEY.md §2.1 S1–S3,
  * §2.2 P1–P7) exposed as driver-gated queries: a messy raw frame —
  * localized/padded headers, a junk column, unparsable numerics — is
  * constructed from `part`, then canonicalized through
  * [[graft.sources.Canonicalize]] with a reference-shaped
  * [[graft.sources.SupplierConfig]]. The DuckDB oracle states the
  * expected FINAL canonical result directly, so the whole
  * drop→rename→cast→validate path is hash-checked.
  */
object SourceQueries {

  /** Reference-shaped config for the messy fixture below (mapping keys
    * deliberately differ in case/padding from the raw headers). */
  val testConfig: SupplierConfig = SupplierConfig(
    name = "test",
    columnMapping = Map(
      "артикул" -> "article",
      "НАИМЕНОВАНИЕ" -> "name",
      "цена usd" -> "price_usd",
      "unnamed: 5" -> "type_note"),
    ignoreColumns = Seq("служебная"),
    dataTypes = Map(
      "article" -> "int",
      "price_usd" -> "float",
      "name" -> "string",
      "type_note" -> "string"),
    requiredColumns = Seq("article", "name", "price_usd"),
    priceMin = 0.0,
    priceMax = 1000.0,
    skipEmptyRows = true)

  /** Messy raw frame: headers as an Excel read would surface them —
    * padded, mixed-case, localized, positional (`Unnamed: 5`) — plus one
    * ignorable junk column and a numeric column with unparsable cells. */
  private def rawFrame(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.part(s, dir).select(
      col("p_partkey").cast("string").as(" Артикул "),
      col("p_name").as("Наименование"),
      when(col("p_partkey") % 11 === 0, lit("N/A"))
        .otherwise(col("p_retailprice").cast("string")).as("Цена USD"),
      col("p_brand").as("Служебная колонка"),
      col("p_type").as("Unnamed: 5"))

  private val rawPriceSql =
    """CASE WHEN p_partkey % 11 = 0 THEN 'N/A'
      |     ELSE CAST(p_retailprice AS VARCHAR) END""".stripMargin

  /** The REAL front-door shape: `fixtures/vitya_config.json` is
    * byte-identical to the reference's shipped config
    * (/root/reference/excel_loader/configs/vitya_config.json — SourceSpec
    * cmp-asserts this), and `fixtures/raw_vitya.csv` reproduces the
    * workbook exactly as pandas surfaces it (loader.py:442): a banner
    * service header with embedded newlines (dropped by substring ignore),
    * `Unnamed: N` positional headers, one named column (курс), all-empty
    * rows, unparsable numerics, leading-zero articles. */
  val refConfigPath = "/root/repo/fixtures/vitya_config.json"
  val refCsvPath = "/root/repo/fixtures/raw_vitya.csv"

  lazy val refConfig: SupplierConfig = ConfigLoader.fromJson(
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(refConfigPath)), java.nio.charset.StandardCharsets.UTF_8))

  private def refCanonical(s: org.apache.spark.sql.SparkSession) =
    Canonicalize(
      s.read.option("header", "true").option("multiLine", "true").csv(refCsvPath),
      refConfig)

  /** Second shipped supplier config, also byte-identical
    * (/root/reference/excel_loader/configs/dimi_config.json): a 15-column
    * workbook whose article header cell is a SINGLE SPACE (mapped via the
    * trimmed-key match), string-typed articles (the F3 cleaning path),
    * a "Курс" named header among the Unnamed positions (ignored by
    * substring), and category-only section rows that survive
    * skip_empty_rows. */
  val dimiConfigPath = "/root/repo/fixtures/dimi_config.json"
  val dimiCsvPath = "/root/repo/fixtures/raw_dimi.csv"

  lazy val dimiConfig: SupplierConfig = ConfigLoader.fromJson(
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dimiConfigPath)), java.nio.charset.StandardCharsets.UTF_8))

  private def dimiCanonical(s: org.apache.spark.sql.SparkSession) =
    Canonicalize(
      s.read.option("header", "true").option("multiLine", "true").csv(dimiCsvPath),
      dimiConfig)

  val queries: Map[String, QueryFn] = Map(
    // ---- S1+P1–P7: canonicalization of a messy schema-less read ----
    "s1_canonicalize" -> ((s, dir) =>
      Canonicalize(rawFrame(s, dir), testConfig).orderBy("article")),

    // ---- S1/S3 with the VERBATIM reference config over the real raw
    // workbook shape (see refConfigPath doc above) ----
    "s3_ref_config_csv" -> ((s, _) => refCanonical(s).orderBy("name")),

    // ---- S1 through the REAL front door: the same workbook content as
    // an actual .xlsx, decoded by sources.Xlsx (JDK-only ZIP+StAX) and
    // canonicalized with the verbatim reference config. The oracle reads
    // the content-identical CSV — the gate fails if the xlsx codec and
    // the CSV text ever disagree on a single cell. ----
    "s1_xlsx_read" -> ((s, _) =>
      Canonicalize(
        graft.sources.Xlsx.read(s, "/root/repo/fixtures/raw_vitya.xlsx"),
        refConfig).orderBy("name")),

    // ---- S3 with the verbatim DIMI config: space-keyed article mapping,
    // passthrough column, string articles, section rows ----
    "s3_ref_dimi_csv" -> ((s, _) => dimiCanonical(s).orderBy("name", "category")),

    // ---- E1 dimi flow over the verbatim config: role columns (P15) +
    // F3 article cleaning + price filter (P8) + supplier tag (P11) ----
    "e1_ref_dimi" -> ((s, _) => {
      val (artCol, priceCol) = ConfigLoader.roleColumns("dimi")
      dimiCanonical(s)
        .withColumn("article_clean",
          graft.functions.Cleaning.cleanArticleDimi(col(artCol)))
        .filter(col(priceCol).isNotNull && col(priceCol) > 0.01 &&
          col("article_clean").isNotNull)
        .withColumn("supplier", lit("dimi"))
        .select(col("article_clean"), col("name"), col(priceCol), col("supplier"))
        .orderBy("article_clean")
    }),

    // ---- E1 over the reference-config read: config-driven column roles
    // (P15) + price filter (P8) + supplier tag (P11) ----
    "e1_ref_pipeline" -> ((s, _) => {
      val (artCol, priceCol) = ConfigLoader.roleColumns("vitya")
      refCanonical(s)
        .filter(col(priceCol).isNotNull && col(priceCol) > 0.01 &&
          col(artCol).isNotNull)
        .withColumn("supplier", lit("vitya"))
        .select(col(artCol), col("name"), col(priceCol), col("supplier"))
        .orderBy(artCol)
    }),

    // ---- P6: price-range validation metrics (warn-only, non-dropping) ----
    "p6_price_validation" -> ((s, dir) =>
      Canonicalize.priceRangeViolations(
        Canonicalize(rawFrame(s, dir), testConfig), testConfig)),

    // ---- S13: JSONL ingestion — the training-pipeline front door for
    // text corpora (newline-delimited JSON with nested objects and
    // arrays). Schema is EXPLICIT: schema-on-read inference costs a
    // full extra pass over the data, which at 100 TB is the difference
    // between one scan and two. Nested fields project straight out of
    // the struct; the DuckDB twin reads the same file via read_json. ----
    "s13_jsonl_read" -> ((s, _) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user", StructType(Seq(
          StructField("id", LongType), StructField("segment", StringType)))),
        StructField("tags", ArrayType(StringType)),
        StructField("value", DoubleType)))
      s.read.schema(schema).json("/root/repo/fixtures/events_sample.jsonl")
        .select(col("event_id"), col("user.id").as("user_id"),
          col("user.segment").as("segment"), size(col("tags")).as("n_tags"),
          array_join(col("tags"), ",").as("tags_joined"), col("value"))
        .orderBy("event_id")
    }),

    // ---- S2: directory scan, pick-largest, load (loader.py:489-551) ----
    "s2_pick_largest" -> ((s, dir) => {
      val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new Path(dir))
        .filter(_.getPath.getName.endsWith(".parquet"))
      val largest = files.maxBy(f => fs.getContentSummary(f.getPath).getLength).getPath
      Tables.load(s, dir, largest.getName.stripSuffix(".parquet"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("picked", lit(largest.getName))
        .select("picked", "n_rows")
    })
  )

  val oracle: Map[String, String] = Map(
    "s1_canonicalize" ->
      s"""SELECT CAST(p_partkey AS BIGINT) AS article, p_name AS name,
         | TRY_CAST($rawPriceSql AS DOUBLE) AS price_usd,
         | p_type AS type_note
         |FROM part ORDER BY article""".stripMargin,

    "p6_price_validation" ->
      s"""WITH t AS (SELECT TRY_CAST($rawPriceSql AS DOUBLE) AS price_usd FROM part)
         |SELECT count(CASE WHEN price_usd < 0.0 THEN 1 END) AS price_usd_below_min,
         | count(CASE WHEN price_usd > 1000.0 THEN 1 END) AS price_usd_above_max
         |FROM t""".stripMargin,

    // lineitem is the largest table at every scale factor (TPC-H shape).
    "s2_pick_largest" ->
      "SELECT 'lineitem.parquet' AS picked, count(*) AS n_rows FROM lineitem",

    "s13_jsonl_read" ->
      """SELECT event_id, "user".id AS user_id, "user".segment AS segment,
        | len(tags) AS n_tags, array_to_string(tags, ',') AS tags_joined, "value"
        |FROM read_json('/root/repo/fixtures/events_sample.jsonl')
        |ORDER BY event_id""".stripMargin,

    // The xlsx fixture carries identical content to the CSV (generated
    // by graft.tools.MakeXlsxFixture) — the oracle for the xlsx read IS
    // the CSV read, so codec drift on any cell fails the hash gate.
    "s1_xlsx_read" ->
      """WITH raw AS (SELECT * FROM
        |   read_csv('/root/repo/fixtures/raw_vitya.csv', header=true, all_varchar=true)),
        | canon AS (SELECT "Unnamed: 1" AS name, "Unnamed: 2" AS color,
        |     TRY_CAST("Unnamed: 3" AS DOUBLE) AS price_usd,
        |     TRY_CAST("Unnamed: 4" AS DOUBLE) AS price_rub,
        |     TRY_CAST("курс" AS BIGINT) AS article_vitya,
        |     "Unnamed: 6" AS balance,
        |     "Unnamed: 7" AS comment
        |   FROM raw)
        |SELECT * FROM canon
        |WHERE NOT (name IS NULL AND color IS NULL AND price_usd IS NULL
        |  AND price_rub IS NULL AND article_vitya IS NULL
        |  AND balance IS NULL AND comment IS NULL)
        |ORDER BY name""".stripMargin,

    // Positional `names=` because DuckDB auto-renames the single-space
    // header to C1; Spark preserves it and the trimmed-key mapping
    // resolves it — the oracle addresses the same columns by position.
    "s3_ref_dimi_csv" ->
      s"""WITH raw AS (SELECT * FROM read_csv('/root/repo/fixtures/raw_dimi.csv',
         |   header=true, all_varchar=true,
         |   names=['u0','art','u2','u3','u4','u5','u6','u7','u8','u9','u10','u11','kurs','u13','u14'])),
         | canon AS (SELECT u0 AS category, art AS article_dimi, u2 AS article_dimi2,
         |     u3 AS name, u4 AS color, TRY_CAST(u5 AS BIGINT) AS col_in_box,
         |     u7 AS balance, u8 AS balance1,
         |     TRY_CAST(u9 AS DOUBLE) AS price_usd, TRY_CAST(u10 AS DOUBLE) AS price_rub,
         |     u14 AS comment
         |   FROM raw)
         |SELECT * FROM canon
         |WHERE NOT (category IS NULL AND article_dimi IS NULL AND article_dimi2 IS NULL
         |  AND name IS NULL AND color IS NULL AND col_in_box IS NULL
         |  AND balance IS NULL AND balance1 IS NULL AND price_usd IS NULL
         |  AND price_rub IS NULL AND comment IS NULL)
         |ORDER BY name, category""".stripMargin,

    "e1_ref_dimi" ->
      s"""WITH raw AS (SELECT * FROM read_csv('/root/repo/fixtures/raw_dimi.csv',
         |   header=true, all_varchar=true,
         |   names=['u0','art','u2','u3','u4','u5','u6','u7','u8','u9','u10','u11','kurs','u13','u14'])),
         | canon AS (SELECT art AS article_dimi, u3 AS name,
         |     TRY_CAST(u9 AS DOUBLE) AS price_usd FROM raw),
         | cleaned AS (SELECT *,
         |     CASE WHEN article_dimi IS NULL OR trim(article_dimi) = ''
         |            OR lower(trim(article_dimi)) = 'nan' THEN NULL
         |       ELSE NULLIF(regexp_replace(regexp_replace(trim(article_dimi),
         |              '''', '', 'g'), '^000', ''), '') END AS article_clean
         |   FROM canon)
         |SELECT article_clean, name, price_usd, 'dimi' AS supplier FROM cleaned
         |WHERE price_usd IS NOT NULL AND price_usd > 0.01 AND article_clean IS NOT NULL
         |ORDER BY article_clean""".stripMargin,

    // all_varchar mirrors Spark's non-inferring CSV read, so TRY_CAST
    // sees the same raw text in both engines.
    "s3_ref_config_csv" ->
      """WITH raw AS (SELECT * FROM
        |   read_csv('/root/repo/fixtures/raw_vitya.csv', header=true, all_varchar=true)),
        | canon AS (SELECT "Unnamed: 1" AS name, "Unnamed: 2" AS color,
        |     TRY_CAST("Unnamed: 3" AS DOUBLE) AS price_usd,
        |     TRY_CAST("Unnamed: 4" AS DOUBLE) AS price_rub,
        |     TRY_CAST("курс" AS BIGINT) AS article_vitya,
        |     "Unnamed: 6" AS balance,
        |     "Unnamed: 7" AS comment
        |   FROM raw)
        |SELECT * FROM canon
        |WHERE NOT (name IS NULL AND color IS NULL AND price_usd IS NULL
        |  AND price_rub IS NULL AND article_vitya IS NULL
        |  AND balance IS NULL AND comment IS NULL)
        |ORDER BY name""".stripMargin,

    "e1_ref_pipeline" ->
      """WITH raw AS (SELECT * FROM
        |   read_csv('/root/repo/fixtures/raw_vitya.csv', header=true, all_varchar=true)),
        | canon AS (SELECT "Unnamed: 1" AS name,
        |     TRY_CAST("Unnamed: 3" AS DOUBLE) AS price_usd,
        |     TRY_CAST("курс" AS BIGINT) AS article_vitya
        |   FROM raw)
        |SELECT article_vitya, name, price_usd, 'vitya' AS supplier
        |FROM canon
        |WHERE price_usd IS NOT NULL AND price_usd > 0.01
        |  AND article_vitya IS NOT NULL
        |ORDER BY article_vitya""".stripMargin
  )
}
