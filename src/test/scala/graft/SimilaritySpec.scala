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

  // ---- ScalaCheck properties -------------------------------------------

  import org.scalacheck.{Gen, Prop}

  test("property: difflib's documented bound chain ratio ≤ quick_ratio ≤ real_quick_ratio") {
    val strGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', 'я', ' ')).map(_.mkString)
    PropCheck.check(Prop.forAll(strGen, strGen) { (a, b) =>
      val r = Similarity.ratio(a, b)
      val q = Similarity.quickRatio(a, b)
      val rq = Similarity.realQuickRatio(a, b)
      r >= 0.0 && r <= q && q <= rq && rq <= 1.0 &&
        Similarity.ratio(a, a) == 1.0
    })
  }

  test("property: CPython difflib parity on generated strings across the 200-char autojunk boundary") {
    // The golden tsv pins fixed cases; this differential property drives
    // RANDOM b-lengths straddling |b| = 200 where the popular-element
    // heuristic (count > |b|/100 + 1) switches on — a small alphabet
    // makes every char popular there, the heuristic's deep end.
    val alpha = Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f')
    val aGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, alpha)).map(_.mkString)
    val bGen = Gen.choose(195, 205).flatMap(n => Gen.listOfN(n, alpha)).map(_.mkString)
    val script =
      "import sys, difflib; a, b = sys.stdin.read().split('\\n')[:2]; " +
        "print(repr(difflib.SequenceMatcher(None, a, b).ratio()))"
    PropCheck.check(Prop.forAll(aGen, bGen) { (a, b) =>
      val p = new ProcessBuilder("python3", "-c", script).start()
      p.getOutputStream.write(s"$a\n$b".getBytes("UTF-8"))
      p.getOutputStream.close()
      val out = Source.fromInputStream(p.getInputStream, "UTF-8").mkString.trim
      p.waitFor()
      val expected = out.toDouble
      Similarity.ratio(a, b) == expected
    }, minSuccessful = 20)
  }
}
