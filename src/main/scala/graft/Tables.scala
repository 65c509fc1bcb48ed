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
  /** events.parquet's `ts` encoding has drifted across fixture
    * generations — TIMESTAMP(NANOS) (reads as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), then timestamp[us]
    * (reads as TIMESTAMP_NTZ under default NTZ inference) — and a real
    * deployment sees all of pandas/pyarrow/Hive writers, so the
    * accessor dispatches on the LOADED schema instead of assuming one
    * physical type:
    *
    *  - `LongType`: nanos-as-long (or a plain BIGINT epoch-nanos
    *    column) → `timestamp_micros(ts div 1000)`. Integer `div`, not
    *    `/`: ns-since-epoch exceeds double's 2^53 mantissa.
    *  - `TimestampNTZType`: re-read with an explicit schema forcing
    *    `TimestampType`, which loads the raw micros as the instant —
    *    deliberately NOT `cast(ntz as timestamp)`, which would shift
    *    by the session time zone and silently skew every event-time
    *    window on a non-UTC session.
    *  - `TimestampType`: already the engine's event-time type.
    *
    * Entry points still set `nanosAsLong=true` so the nanos branch can
    * load at all (schema inference of TIMESTAMP(NANOS) throws without
    * it); the conf is inert for micros fixtures.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val inferred = load(spark, dir, "events")
    inferred.schema("ts").dataType match {
      case LongType =>
        inferred.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => inferred
      case TimestampNTZType =>
        val forced = StructType(inferred.schema.map {
          case f if f.name == "ts" => f.copy(dataType = TimestampType)
          case f => f
        })
        spark.read.schema(forced).parquet(s"$dir/events.parquet")
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported parquet type $other (expected long nanos or timestamp)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** The embeddings table's engine contract is 64-dim (the PQ slicing,
    * LSH planes, and every oracle CTE assume it), and cosine is
    * undefined for the zero vector — so admission happens HERE, the
    * one choke point every vector query reads through, exactly as a
    * serving index validates vectors at build time. Malformed rows
    * (NULL, wrong dimension, all-zero) are dropped instead of NPE-ing
    * a kernel or ANSI-zero-dividing a cosine 20 operators downstream;
    * the fixtures contain only well-formed rows, so every hash gate is
    * unchanged and the filter is a no-op scan predicate there.
    *
    * A vector with NULL *elements* is as malformed as a NULL column:
    * `exists(_ =!= 0.0f)` alone would admit it (any non-null nonzero
    * element satisfies the exists), and the kernels then unbox the null
    * slot — NPE in the Scala UDF paths, silent garbage in
    * ArrayData.getDouble codegen paths. Hence the forall(isNotNull). */
  val EmbeddingDim = 64
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === EmbeddingDim &&
        forall(col("embedding"), x => x.isNotNull) &&
        exists(col("embedding"), x => x =!= 0.0f))

  /** Deterministic, shuffle-free row id for a lineitem row: the reference's
    * pandas-index identity (/root/reference/main.py:2137) re-expressed as a
    * pure function of the natural key — order-stable at any scale, no
    * window over an unpartitioned frame needed.
    */
  def lineitemRowId: org.apache.spark.sql.Column =
    col("l_orderkey") * 8 + col("l_linenumber")
}
