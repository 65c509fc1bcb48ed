package graft

import graft.functions.Cleaning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit behavior of the F1–F8 cleaning expressions against the
  * reference semantics (/root/reference/main.py:1262-1750). */
class CleaningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("v")
    df.select(c.as("r")).collect()(0).get(0)
  }

  test("F1 collapses whitespace, empty→null") {
    assert(one(Cleaning.cleanInvisibleChars(col("v")), "  a \t b\n c ") == "a b c")
    assert(one(Cleaning.cleanInvisibleChars(col("v")), "   ") == null)
    assert(one(Cleaning.cleanInvisibleChars(col("v")), null) == null)
  }

  test("F2 vitya article: apostrophes + 000 prefix + always-int") {
    val c = Cleaning.cleanArticleVitya(col("v"))
    assert(one(c, "'000123") == 123L)
    assert(one(c, "00045") == 45L)     // only ONE leading 000 stripped
    assert(one(c, "12-34ab56") == 123456L) // digit runs concatenated
    assert(one(c, "abc") == 0L)        // no digits → 0
    assert(one(c, null) == null)
    assert(one(c, " ") == null)
  }

  test("F3 dimi article stays string") {
    val c = Cleaning.cleanArticleDimi(col("v"))
    assert(one(c, "'000A12") == "A12")
    assert(one(c, "X'9") == "X9")
    assert(one(c, null) == null)
  }

  test("F4 color normalization") {
    assert(one(Cleaning.safeColor(col("v")), "  ReD ") == "red")
    assert(one(Cleaning.safeColor(col("v")), null) == "")
  }

  test("F6 bracket code: ≥4 chars, charset-validated, first group") {
    val c = Cleaning.bracketCode(col("v"))
    assert(one(c, "Powerbank (P27QDA-RGP) fast") == "P27QDA-RGP")
    assert(one(c, "item (x)") == null)             // too short
    assert(one(c, "item (a b c d)") == null)       // space → invalid charset
    assert(one(c, "(abcd) (efgh)") == "ABCD")      // first wins
    assert(one(c, "no brackets") == null)
  }

  test("F7 capacity: range-guarded, returns string") {
    val c = Cleaning.batteryCapacity(col("v"))
    assert(one(c, "Power bank 60000mah 100w") == "60000")
    assert(one(c, "bank 20000MAH") == "20000")
    assert(one(c, "батарея 5000 мач") == "5000")
    assert(one(c, "tiny 3mah") == null)            // below 5
    assert(one(c, "big 1000000mah") == null)       // above 999999
    assert(one(c, "no capacity") == null)
  }

  test("F13 min positive price") {
    val df = Seq((10.0, -1.0, 3.0), (-5.0, -1.0, 0.0)).toDF("a", "b", "c")
    val r = df.select(Cleaning.minPositivePrice(col("a"), col("b"), col("c")).as("m"))
      .collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(3.0, 0.0))
  }
}
