package graft.preprocess

import graft.functions.Cleaning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supplier preprocessing pipelines (SURVEY.md §3 E1 step 2): the
  * reference's per-supplier dispatch — vitya: price filter → stock
  * keep-list → int article cleaning; dimi: price filter → pending-drop →
  * string article cleaning; both tag the supplier name.
  * Ref: main.py:1375-1563.
  *
  * All stages are Column-level filters/projections — they collapse into
  * the scan (pushdown + codegen), so preprocessing adds no shuffle at
  * any scale.
  */
object Preprocess {

  /** MIN_PRICE_THRESHOLD (main.py:52). */
  val MinPrice = 0.01
  /** Vitya keep-list (main.py:46). */
  val VityaKeep: Seq[String] = Seq("Имеются в нал.", "Распродажа")
  /** Dimi drop value (main.py:49). */
  val DimiPending = "Ожидается"

  /** P8 — price filter: not-null AND > threshold. Ref: main.py:1320-1373. */
  def priceFilter(df: DataFrame, priceCol: String = "price_usd"): DataFrame =
    df.filter(col(priceCol).isNotNull && col(priceCol) > MinPrice)

  /** P9 — Vitya stock keep-list filter. Ref: main.py:1388-1415. */
  def vityaStockFilter(df: DataFrame): DataFrame =
    df.filter(col("balance").isin(VityaKeep: _*))

  /** P10 — Dimi pending-drop: drop rows where balance OR balance1 equals
    * "Ожидается"; pandas `!=` keeps nulls, hence the null-safe compare.
    * Ref: main.py:1461-1502. */
  def dimiStockFilter(df: DataFrame): DataFrame =
    df.filter(!(col("balance") <=> lit(DimiPending)) &&
      !(col("balance1") <=> lit(DimiPending)))

  /** Full Vitya pipeline: P8 → P9 → F2 (always-int article) → P11 tag.
    * Ref: main.py:1375-1447. */
  def vitya(df: DataFrame): DataFrame =
    vityaStockFilter(priceFilter(df))
      .withColumn("article_vitya", Cleaning.cleanArticleVitya(col("article_vitya")))
      .withColumn("supplier_name", lit("Витя"))

  /** Full Dimi pipeline: P8 → P10 → F3 (string article) → P11 tag.
    * Ref: main.py:1449-1552. */
  def dimi(df: DataFrame): DataFrame =
    dimiStockFilter(priceFilter(df))
      .withColumn("article_dimi", Cleaning.cleanArticleDimi(col("article_dimi")))
      .withColumn("supplier_name", lit("Дима"))

  /** Config-name dispatch (main.py:1554-1563); unknown config = identity. */
  def apply(df: DataFrame, configName: String): DataFrame = configName match {
    case "vitya" => vitya(df)
    case "dimi" => dimi(df)
    case _ => df
  }
}
