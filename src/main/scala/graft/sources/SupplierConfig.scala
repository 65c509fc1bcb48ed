package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.util.Locale
import scala.jdk.CollectionConverters._

/** Mirror of the reference's per-supplier JSON config
  * (/root/reference/excel_loader/configs/&#42;_config.json, parsed at
  * loader.py:35-92): declarative header mapping, substring column drops,
  * coerce-to-null casts and validation bounds. Pure JVM — configs are
  * plan-build-time metadata, not data.
  *
  * @param columnMapping raw header → canonical name, matched
  *                      case-insensitively after trim (loader.py:174-180)
  * @param ignoreColumns dropped by case-insensitive SUBSTRING match
  *                      (loader.py:204-218)
  * @param dataTypes     canonical column → int | float | string
  *                      (loader.py:265-284; coerce-on-error → null)
  * @param requiredColumns hard-fail if missing post-mapping (loader.py:299-319)
  * @param priceMin/Max  warn-only range check over every column whose
  *                      name contains "price" (loader.py:321-343)
  * @param skipEmptyRows drop all-null rows (loader.py:464-465)
  */
case class SupplierConfig(
    name: String,
    columnMapping: Map[String, String],
    ignoreColumns: Seq[String],
    dataTypes: Map[String, String],
    requiredColumns: Seq[String],
    priceMin: Double,
    priceMax: Double,
    skipEmptyRows: Boolean) {

  /** Canonical→raw inverse of the mapping (write-time, main.py:1800-1819). */
  lazy val reverseMapping: Map[String, String] = columnMapping.map(_.swap)

  def normalizedMapping: Map[String, String] =
    columnMapping.map { case (k, v) => k.trim.toLowerCase(Locale.ROOT) -> v }
}

object ConfigLoader {
  private val mapper = new ObjectMapper()

  /** Parse a reference-shaped config JSON (S3). Missing sections fall back
    * to permissive defaults exactly like the reference's fallback config
    * (loader.py:83-92). */
  def fromJson(json: String): SupplierConfig = {
    val root = mapper.readTree(json)
    def obj(path: String): Option[JsonNode] = Option(root.get(path))
    def strMap(n: Option[JsonNode]): Map[String, String] =
      n.map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty)
    def strSeq(n: Option[JsonNode]): Seq[String] =
      n.map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val validation = obj("validation")
    SupplierConfig(
      name = obj("name").map(_.asText()).getOrElse("unnamed"),
      columnMapping = strMap(obj("column_mapping")),
      ignoreColumns = strSeq(obj("ignore_columns")),
      dataTypes = strMap(obj("data_types")),
      requiredColumns = strSeq(validation.flatMap(v => Option(v.get("required_columns")))),
      priceMin = validation.flatMap(v => Option(v.get("price_min"))).map(_.asDouble()).getOrElse(0.0),
      priceMax = validation.flatMap(v => Option(v.get("price_max"))).map(_.asDouble()).getOrElse(Double.MaxValue),
      skipEmptyRows = {
        // Reference defaults this to TRUE when absent (loader.py:464
        // `.get("skip_empty_rows", True)`); only an explicit false keeps
        // all-null rows.
        val n = root.at("/settings/skip_empty_rows")
        if (n.isMissingNode) true else n.asBoolean(true)
      })
  }

  /** Config auto-selection from a data file name (F10, main.py:1565-1589). */
  def detectByFilename(fileName: String): String = {
    val up = fileName.toUpperCase(Locale.ROOT)
    if (up.contains("JHT")) "vitya"
    else if (up.contains("DIMI") || up.contains("DIMA")) "dimi"
    else if (up.contains("BASE") || up.contains("БАЗА")) "base"
    else "auto"
  }

  /** P15 — supplier-side (article, price) column roles per active config
    * (main.py:1752-1768). */
  def roleColumns(configName: String): (String, String) = configName match {
    case "vitya" => ("article_vitya", "price_usd")
    case "dimi" => ("article_dimi", "price_usd")
    case _ => ("article", "price")
  }

  /** P15 — the BASE table's per-supplier price column
    * (main.py:1770-1786). */
  def basePriceColumn(configName: String): String = configName match {
    case "vitya" => "price_vitya_usd"
    case "dimi" => "price_dimi_usd"
    case _ => "price"
  }

  /** P16 — product-name column resolution: `name` if present, else the
    * config-specific fallback, else none (main.py:1976-2035). */
  def nameColumn(columns: Seq[String], configName: String): Option[String] = {
    val fallback = configName match {
      case "vitya" => Seq("name", "product_name", "наименование")
      case "dimi" => Seq("name", "product_name", "наименование")
      case _ => Seq("name", "наименование")
    }
    fallback.find(f => columns.exists(_.equalsIgnoreCase(f)))
      .flatMap(f => columns.find(_.equalsIgnoreCase(f)))
  }
}
