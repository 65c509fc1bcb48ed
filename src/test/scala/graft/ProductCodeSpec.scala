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

  test("property: F5 ≡ CPython re on generated names (differential, Unicode \\b)") {
    // The reference's extractor is Python re; ProductCode claims exact
    // parity via java.util.regex + UNICODE_CHARACTER_CLASS. This
    // differential drives RANDOM names through both engines — the
    // fixed examples can't cover the Unicode word-boundary edge space.
    val py =
      """import sys, re
        |name = sys.stdin.read()
        |pats = [r'\b[A-Z0-9]+(?:-[A-Z0-9]+)+\b', r'\b[A-Z]{2,}[0-9]{2,}[A-Z]*\b',
        |        r'\b[0-9]{3,}[A-Z]{1,3}\b', r'\b[A-Z][0-9]{4,}[A-Z][0-9]+\b',
        |        r'\b[A-Z]{4,8}\b', r'\b[A-Z][0-9]{1,3}\b', r'\b[А-Я][0-9]{1,3}\b']
        |spec = re.compile(r'\d+(mah|wh|w|ma)')
        |longd = re.compile(r'\d{5,}')
        |stops = {'USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'}
        |up = name.upper()
        |out = ''
        |for p in pats:
        |    hit = next((m.group() for m in re.finditer(p, up)
        |                if not spec.fullmatch(m.group().lower())
        |                and not longd.fullmatch(m.group())
        |                and m.group() not in stops), None)
        |    if hit is not None:
        |        out = hit
        |        break
        |sys.stdout.write(out)
        |""".stripMargin
    PropCheck.check(Prop.forAll(nameGen) { name =>
      val p = new ProcessBuilder("python3", "-c", py).start()
      p.getOutputStream.write(name.getBytes("UTF-8"))
      p.getOutputStream.close()
      val expected = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      val got = Option(ProductCode.findInName(name)).getOrElse("")
      got == expected
    }, minSuccessful = 30)
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
