package graft.sources

import java.util.Locale
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference loader's canonicalization pipeline (S1 tail + P1–P7,
  * loader.py:439-487) as a declarative stage over any schema-less read:
  * drop ignored columns (substring match) → rename to canonical names
  * (case-insensitive, trimmed) → coerce-to-null casts → drop all-null
  * rows → assert required columns.
  *
  * Everything is projection/filter-level — Catalyst folds the whole stage
  * into the scan (column pruning reaches the source; the casts and the
  * all-null filter are codegen'd), so canonicalization is free at any
  * scale.
  */
object Canonicalize {

  /** P2 — ignored column names (case-insensitive substring). */
  def ignoredColumns(df: DataFrame, cfg: SupplierConfig): Seq[String] = {
    val igs = cfg.ignoreColumns.map(_.toLowerCase(Locale.ROOT))
    df.columns.toSeq.filter(c => igs.exists(c.toLowerCase(Locale.ROOT).contains))
  }

  /** P1–P7 pipeline. Throws IllegalArgumentException on missing required
    * columns (P5 hard-fail, loader.py:299-319). */
  def apply(df: DataFrame, cfg: SupplierConfig): DataFrame = {
    // P2: drop ignored
    val kept = df.drop(ignoredColumns(df, cfg): _*)
    // P1: rename via case-insensitive trimmed header match
    val mapping = cfg.normalizedMapping
    val renamed = kept.select(kept.columns.map { c =>
      mapping.get(c.trim.toLowerCase(Locale.ROOT)) match {
        case Some(canon) => kept.col(s"`$c`").as(canon)
        case None => kept.col(s"`$c`")
      }
    }.toIndexedSeq: _*)
    // P4: declared casts, coerce-on-error → null (pandas to_numeric
    // errors="coerce" ≙ try_cast)
    val casted = cfg.dataTypes.foldLeft(renamed) { case (d, (c, t)) =>
      if (!d.columns.contains(c)) d
      else t match {
        case "int" => d.withColumn(c, expr(s"try_cast(`$c` AS BIGINT)"))
        case "float" => d.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)"))
        case "string" => d.withColumn(c, col(s"`$c`").cast("string"))
        case other => throw new IllegalArgumentException(s"unknown data_type '$other' for $c")
      }
    }
    // P7: drop all-null rows
    val nonEmpty = if (cfg.skipEmptyRows) casted.na.drop("all") else casted
    // P5: required-column hard fail
    val missing = cfg.requiredColumns.filterNot(nonEmpty.columns.contains)
    require(missing.isEmpty,
      s"required columns missing after mapping: ${missing.mkString(", ")}")
    nonEmpty
  }

  /** P6 — price-range validation metrics: per *price* column, how many
    * values fall outside [priceMin, priceMax]. Warn-only in the
    * reference (rows are NOT dropped, loader.py:321-343); here a metrics
    * dataset. */
  def priceRangeViolations(df: DataFrame, cfg: SupplierConfig): DataFrame = {
    val priceCols = df.columns.filter(_.toLowerCase(Locale.ROOT).contains("price"))
    val aggs = priceCols.flatMap { c =>
      Seq(
        count(when(col(c) < cfg.priceMin, 1)).as(s"${c}_below_min"),
        count(when(col(c) > cfg.priceMax, 1)).as(s"${c}_above_max"))
    }
    require(aggs.nonEmpty, "no price columns to validate")
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }
}
