package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessors for the driver-generated fixture tables (TESTDATA.md).
  *
  * All reads are plain parquet scans — Catalyst pushes filters and prunes
  * columns into the scan, so callers should select/filter on the returned
  * DataFrame rather than pre-materializing.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed table reads;
  * nothing here assumes a single file. Row identity, where an operator
  * needs it (SURVEY.md §1.1 — the reference addresses rows by pandas
  * index), is derived from natural keys (`rowId` below), NOT from
  * `monotonically_increasing_id`/`zipWithIndex`, so it is stable under
  * any partitioning and requires no global sort.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects; read nanos as long and convert to a µs
    * timestamp with integer division (ns-since-epoch exceeds double's
    * 2^53 mantissa, so `div`, not `/`).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, which every
    * entry point (Verify/Bench/tests) sets at session construction — a
    * session-wide reader conf, deliberately NOT mutated here so a table
    * accessor has no hidden global side effects.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session construction to read events")
    load(spark, dir, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Deterministic, shuffle-free row id for a lineitem row: the reference's
    * pandas-index identity (/root/reference/main.py:2137) re-expressed as a
    * pure function of the natural key — order-stable at any scale, no
    * window over an unpartitioned frame needed.
    */
  def lineitemRowId: org.apache.spark.sql.Column =
    col("l_orderkey") * 8 + col("l_linenumber")
}
