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
}
