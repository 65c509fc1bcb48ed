package graft

import graft.functions.Similarity
import org.scalatest.funsuite.AnyFunSuite
import java.util.Base64
import scala.io.Source

/** F9 parity: our Ratcliff–Obershelp must numerically match CPython
  * difflib (including autojunk for |b| ≥ 200) — the reference's 0.33
  * threshold is calibrated against it (SURVEY.md §7.4 risk 2). Golden
  * file generated from difflib itself.
  */
class SimilaritySpec extends AnyFunSuite {

  test("matches difflib golden ratios exactly") {
    val in = getClass.getResourceAsStream("/difflib_golden.tsv")
    val lines = Source.fromInputStream(in, "UTF-8").getLines().toList
    assert(lines.nonEmpty)
    var checked = 0
    lines.foreach { line =>
      val Array(ea, eb, r) = line.split("\t")
      val a = new String(Base64.getDecoder.decode(ea), "UTF-8")
      val b = new String(Base64.getDecoder.decode(eb), "UTF-8")
      val expected = r.toDouble
      val got = Similarity.ratio(a.toLowerCase, b.toLowerCase)
      assert(math.abs(got - expected) < 1e-12, s"a='$a' b='$b' got=$got want=$expected")
      checked += 1
    }
    assert(checked == lines.size)
  }

  test("reference wrapper: null/empty → 0.0") {
    assert(Similarity.referenceRatio(null, "x") == 0.0)
    assert(Similarity.referenceRatio("x", "") == 0.0)
    assert(Similarity.referenceRatio("ABC", "abc") == 1.0)
  }
}
