package graft

import graft.functions.ProductCode
import org.scalatest.funsuite.AnyFunSuite

/** F5 behavior spec — cases derived from the reference's documented
  * examples and pattern priorities (/root/reference/main.py:1591-1638). */
class ProductCodeSpec extends AnyFunSuite {
  test("dash codes take priority") {
    assert(ProductCode.findInName("Cable AC-M25-SC black") == "AC-M25-SC")
    assert(ProductCode.findInName("Адаптер P27QDA-RGP fast") == "P27QDA-RGP")
  }
  test("letter-digit codes") {
    assert(ProductCode.findInName("xiaomi MJKDDYJ02HT cable") == "MJKDDYJ02HT")
    assert(ProductCode.findInName("model XM123") == "XM123")
  }
  test("spec strings excluded") {
    // 60000MAH matches letters? no — it's digits+letters; excluded as \d+mah
    assert(ProductCode.findInName("Power bank 60000mah") != "60000MAH")
    assert(ProductCode.findInName("charger 100w GREENOE") == "GREENOE")
  }
  test("stop words excluded, brand wins") {
    assert(ProductCode.findInName("PORTABLE POWER BANK GREENOE") == "GREENOE")
  }
  test("bare 4-8 letter words match as brand codes") {
    assert(ProductCode.findInName("item 123456 plain") == "ITEM")
  }
  test("short letter+digit codes") {
    assert(ProductCode.findInName("Powerbank (C60)") == "C60")
  }
  test("null and no-match") {
    assert(ProductCode.findInName(null) == null)
    assert(ProductCode.findInName("просто текст без кода") == null)
  }

  // ---- ScalaCheck properties -------------------------------------------

  import graft.functions.Cleaning
  import org.scalacheck.{Gen, Prop}

  /** Product-name-ish strings: Latin/Cyrillic words, digits, dashes,
    * brackets, spec-string fragments. */
  private val nameGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('а', 'я', 'С', 'Д', 'ё'),
    3 -> Gen.oneOf(' ', '-', '(', ')', '.'),
    1 -> Gen.oneOf('m', 'a', 'h', 'w'))).map(_.mkString)

  test("property: F5 is total and every hit is a sound, non-excluded pattern match") {
    PropCheck.check(Prop.forAll(nameGen) { name =>
      val r = ProductCode.findInName(name)
      r == null || {
        val up = name.toUpperCase(java.util.Locale.ROOT)
        up.contains(r) &&
          Cleaning.nameCodeCores.exists(c => r.matches(c)) &&
          !r.toLowerCase(java.util.Locale.ROOT).matches("^\\d+(mah|wh|w|ma)$") &&
          !r.matches("^\\d{5,}$") &&
          !Cleaning.nameCodeStops.contains(r)
      }
    })
  }

  test("property: a planted dash code is recovered from Cyrillic filler") {
    val seg = for {
      n <- Gen.choose(1, 4)
      cs <- Gen.listOfN(n, Gen.frequency(3 -> Gen.alphaUpperChar, 2 -> Gen.numChar))
    } yield cs.mkString
    val code = for {
      k <- Gen.choose(2, 4)
      segs <- Gen.listOfN(k, seg)
    } yield segs.mkString("-")
    PropCheck.check(Prop.forAll(code.suchThat(c => !Cleaning.nameCodeStops.contains(c))) { c =>
      // dash codes are the top-priority pattern and the Cyrillic filler
      // words can't match any earlier pattern, so the plant must win
      ProductCode.findInName(s"зарядное $c устройство") == c
    })
  }
}
