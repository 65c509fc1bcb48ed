package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-side conventions the r17 hostile-fixture sweep
  * established (scripts/edge_fixture.py; the DuckDB side of the same
  * contract is exercised by the sweep itself — see the verify skill):
  *
  *   - rank/prefix-sum sort keys are NULLS LAST (DuckDB's window
  *     default, so the twins stay plain SQL);
  *   - grouped operators KEEP a null group (the null-source stratum
  *     of a real crawl must not silently vanish from a split/cutoff);
  *   - doc_id-derived byte-count fields in the planted multimodal
  *     containers are pmod'd, so a negative id still builds a
  *     well-formed container both engines parse identically.
  */
class EdgeParitySpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edgeparity").toString
    val fox = "the quick brown fox jumps over the lazy dog " * 3
    val n = (fox.length + 1).toLong
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(-220L, fox + "a", "en", "src1", n),
      Row(-10L, null, "fr", "src1", 0L),
      // n_chars deliberately TIES doc 0's so the null-id row's rank is
      // decided by the doc_id tiebreaker — the nulls-last contract
      Row(null, null, "en", "src0", n),
      Row(0L, fox + "b", "es", "src0", n),
      Row(10L, fox + "c", "de", null, n),
      Row(20L, fox + "d", "fr", null, n),
      Row(30L, fox + "e", "zh", "src2", n))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("GlobalOrder withins keep the null group and rank nulls last") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ranked = graft.operators.GlobalOrder.withPositionWithin(
      docs, "pos", Seq("source"),
      col("n_chars").asc_nulls_last, col("doc_id").asc_nulls_last)
    // no row lost: the null-source stratum survives the offset attach
    assert(ranked.count() === docs.count())
    val nullGrp = ranked.filter(col("source").isNull)
      .select("doc_id", "pos").collect()
      .map(r => (Option(r.get(0)), r.getLong(1))).toMap
    assert(nullGrp === Map(Option(10L) -> 1L, Option(20L) -> 2L),
      "the null-source stratum ranks internally like any other group")
    // nulls-last: the null-id doc takes the LAST rank of its group
    val src0 = ranked.filter(col("source") === "src0")
      .orderBy("pos").select("doc_id").collect().map(r => Option(r.get(0)))
    assert(src0.last.isEmpty, s"null id must rank last: ${src0.toSeq}")

    val summed = graft.operators.GlobalOrder.withRunningTotalWithin(
      docs, "cum", Seq("source"), col("n_chars"),
      col("doc_id").asc_nulls_last)
    assert(summed.count() === docs.count(),
      "running-total attach keeps the null group too")
  }

  test("grouped split/cutoff queries keep the null-source stratum end-to-end") {
    val t24 = graft.queries.PipelineQueries.queries(
      "t24_stratified_split")(spark, dir)
    assert(t24.filter(col("source").isNull).count() > 0,
      "t24 emits rows for the null-source stratum")
    val t26 = graft.queries.PipelineQueries.queries(
      "t26_quality_cutoff")(spark, dir)
    assert(t26.filter(col("source").isNull).count() === 1,
      "t26 emits the null-source cutoff row")
    graft.queries.Caches.release(spark, dir)
  }

  test("negative doc_id still plants a well-formed JPEG/EXIF container") {
    val m7 = graft.queries.MultimodalQueries.queries(
      "m7_jpeg_meta")(spark, dir)
      .filter(col("doc_id") === -220L).collect()
    assert(m7.length === 1 && m7(0).getAs[Boolean]("is_jpeg"),
      "pmod'd COM length keeps the marker walk on track for id < 0")
    val m10 = graft.queries.MultimodalQueries.queries(
      "m10_exif_meta")(spark, dir)
      .filter(col("doc_id") === -220L).collect()
    assert(m10.length === 1 && m10(0).getAs[Boolean]("has_exif"),
      "pmod'd pad keeps the EXIF walk on track for id < 0")
    graft.queries.Caches.release(spark, dir)
  }
}
