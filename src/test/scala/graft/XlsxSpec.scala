package graft

import graft.sources.Xlsx
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JDK-only xlsx codec: roundtrip fidelity, pandas header semantics,
  * multi-sheet report writing, and the committed fixture's equivalence
  * to its CSV twin. */
class XlsxSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sfDir}

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("xlsx").resolve(name).toString

  test("column ref encoding roundtrips") {
    Seq(0, 1, 25, 26, 27, 51, 52, 701, 702).foreach { i =>
      assert(Xlsx.colIndex(Xlsx.colRef(i) + "7") === i, s"idx $i ref ${Xlsx.colRef(i)}")
    }
    assert(Xlsx.colRef(0) === "A" && Xlsx.colRef(26) === "AA" && Xlsx.colRef(701) === "ZZ")
  }

  test("write → read roundtrip preserves strings, numbers, nulls, Unicode") {
    import spark.implicits._
    val df = Seq(
      ("Power bank Xiaomi", Some(12.5), Some(44001L), "хит & <спец> \"кавычки\""),
      ("Кабель\nдве строки", None, None, "хвостовой пробел  "),
      (null, Some(0.0), Some(-7L), null))
      .toDF("name", "price", "article", "note")
    val path = tmp("rt.xlsx")
    Xlsx.write(Seq(("data", df)), path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq === Seq("name", "price", "article", "note"))
    val got = back.orderBy("name").collect().map(_.toSeq)
    val want = df
      .select(df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*)
      .orderBy("name").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("empty header cells surface as pandas-style Unnamed: N") {
    import spark.implicits._
    val df = Seq(("a", "b", "c")).toDF("", "real", " ")
    val path = tmp("unnamed.xlsx")
    Xlsx.write(Seq(("s", df)), path)
    assert(Xlsx.read(spark, path).columns.toSeq === Seq("Unnamed: 0", "real", "Unnamed: 2"))
  }

  test("multi-sheet report workbook: one sheet per dataset, read back by index") {
    val report = SparkEntry.queries("s5_report_summary")(spark, sfDir)
    val matches = SparkEntry.queries("j1_article_match")(spark, sfDir).limit(50)
    val path = tmp("report.xlsx")
    Xlsx.write(Seq(("Сводка", report), ("Совпадения", matches)), path)
    val s1 = Xlsx.read(spark, path, sheet = 1)
    assert(s1.columns.toSeq === report.columns.toSeq)
    assert(s1.count() === report.count())
    val s2 = Xlsx.read(spark, path, sheet = 2)
    assert(s2.columns.toSeq === matches.columns.toSeq)
    assert(s2.count() === 50)
  }

  test("committed xlsx fixture decodes to exactly the CSV fixture's content") {
    val viaXlsx = SparkEntry.queries("s1_xlsx_read")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val viaCsv = SparkEntry.queries("s3_ref_config_csv")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(viaXlsx === viaCsv)
    assert(viaXlsx.nonEmpty)
  }

  test("writer refuses data that cannot fit an xlsx sheet") {
    val big = spark.range(1048576).toDF("id")
    val e = intercept[IllegalArgumentException](
      Xlsx.write(Seq(("too-big", big)), tmp("big.xlsx")))
    assert(e.getMessage.contains("parquet"))
  }
}
