package graft.functions

import scala.collection.mutable

/** F9 — Ratcliff–Obershelp "gestalt" similarity with CPython-difflib
  * semantics, including the `autojunk` popular-element heuristic (elements
  * occurring in more than 1% of `b` are junked when |b| ≥ 200). The
  * reference's matching cascade thresholds (TRSH = 0.33,
  * /root/reference/main.py:60) are calibrated against difflib's ratio, so
  * numeric parity matters (SURVEY.md §7.4 risk 2).
  *
  * Algorithm is public (Ratcliff & Obershelp 1988; CPython difflib docs);
  * this is a from-scratch JVM implementation over char sequences.
  */
object Similarity extends Serializable {

  /** Per-thread 1-entry memo for [[ratio]]: in the fused best-match
    * plan the exact ratio of each surviving pair is computed twice on
    * the same thread back-to-back — once deciding the join filter, once
    * projecting the score into the argmax struct. Value-equality keys
    * (the two sites hold different string instances); the O(|a|+|b|)
    * equals is noise next to the O(|a|·|b|) match search it skips. */
  private final class Memo { var a: String = _; var b: String = _; var r: Double = 0.0 }
  private val tlMemo = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }

  /** difflib.SequenceMatcher(None, a, b).ratio() */
  def ratio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val memo = tlMemo.get()
    if (a == memo.a && b == memo.b) return memo.r
    val r = ratioUncached(a, b)
    memo.a = a; memo.b = b; memo.r = r
    r
  }

  private def ratioUncached(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la + lb == 0) return 1.0

    // b2j: char -> ascending positions in b, minus "popular" chars
    // (autojunk) when b is long.
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < lb) {
      b2j.getOrElseUpdate(b.charAt(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    // autojunk: popular elements (>1% of b, |b| ≥ 200) are removed from
    // b2j so they can't SEED matches — but they are NOT bjunk (isjunk is
    // None here), so match extension still walks through them.
    if (lb >= 200) {
      val ntest = lb / 100 + 1
      val popular = b2j.iterator.collect { case (c, idxs) if idxs.length > ntest => c }.toSet
      popular.foreach(b2j.remove)
    }

    // With isjunk=None the bjunk set is empty; kept as a function to
    // mirror difflib's extension structure.
    def isbjunk(c: Char): Boolean = false

    // Longest matching block in a[alo,ahi) x b[blo,bhi), difflib tie-break
    // (earliest in a, then earliest in b) and junk-extension behavior.
    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a.charAt(i)) match {
          case Some(idxs) =>
            var k = 0
            var break = false
            while (k < idxs.length && !break) {
              val jj = idxs(k)
              if (jj >= blo) {
                if (jj >= bhi) break = true
                else {
                  val len = j2len.getOrElse(jj - 1, 0) + 1
                  newj2len(jj) = len
                  if (len > bestsize) { besti = i - len + 1; bestj = jj - len + 1; bestsize = len }
                }
              }
              k += 1
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // Extend over non-junk, then over junk, exactly as difflib does.
      while (besti > alo && bestj > blo && !isbjunk(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) { besti -= 1; bestj -= 1; bestsize += 1 }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        !isbjunk(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) bestsize += 1
      while (besti > alo && bestj > blo && isbjunk(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) { besti -= 1; bestj -= 1; bestsize += 1 }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        isbjunk(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) bestsize += 1
      (besti, bestj, bestsize)
    }

    // Sum of matching-block sizes (iterative divide & conquer).
    var matches = 0
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, la, 0, lb))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i2, j2, k2) = findLongestMatch(alo, ahi, blo, bhi)
      if (k2 > 0) {
        matches += k2
        if (alo < i2 && blo < j2) queue.push((alo, i2, blo, j2))
        if (i2 + k2 < ahi && j2 + k2 < bhi) queue.push((i2 + k2, ahi, j2 + k2, bhi))
      }
    }
    2.0 * matches / (la + lb)
  }

  /** difflib.real_quick_ratio — O(1) upper bound on [[ratio]]. */
  def realQuickRatio(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la + lb == 0) 1.0 else 2.0 * math.min(la, lb) / (la + lb)
  }

  /** difflib.quick_ratio — char-multiset upper bound on [[ratio]]:
    * 2·Σ_c min(count_a(c), count_b(c)) / (|a|+|b|). O(|a|+|b|). */
  def quickRatio(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la + lb == 0) return 1.0
    val counts = mutable.HashMap.empty[Char, Int]
    var i = 0
    while (i < lb) { val c = b.charAt(i); counts(c) = counts.getOrElse(c, 0) + 1; i += 1 }
    var matches = 0
    i = 0
    while (i < la) {
      val c = a.charAt(i)
      val n = counts.getOrElse(c, 0)
      if (n > 0) { matches += 1; counts(c) = n - 1 }
      i += 1
    }
    2.0 * matches / (la + lb)
  }

  /** Reference wrapper semantics: null/empty inputs → 0.0, compare
    * lowercased. Locale.ROOT so a Turkish-locale JVM doesn't turn 'I'
    * into dotless ı and shift the calibrated 0.33-threshold parity with
    * Python's locale-independent str.lower(). Ref: main.py:1274-1283. */
  def referenceRatio(a: String, b: String): Double =
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0.0
    else ratio(a.toLowerCase(java.util.Locale.ROOT), b.toLowerCase(java.util.Locale.ROOT))

  /** [[referenceRatio]] with difflib's own cheap-upper-bound cascade:
    * when real_quick_ratio or quick_ratio already falls below `minRatio`
    * the (quadratic) full ratio is skipped and the BOUND is returned —
    * an over-estimate that is still `< minRatio`, so thresholded
    * consumers (sim ≥ t filters, argmax-above-t) see identical results
    * at a fraction of the cost. This is the hot-path scoring function
    * of the fuzzy join. */
  def referenceRatioAtLeast(a: String, b: String, minRatio: Double): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0.0
    lowercasedRatioAtLeast(
      a.toLowerCase(java.util.Locale.ROOT), b.toLowerCase(java.util.Locale.ROOT), minRatio)
  }

  /** Pre-lowercased hot path: callers lowercase ONCE per row in the plan
    * (a Column `lower()`), not once per pair in the UDF. Per-thread
    * memoization of the b-side index: under a broadcast nested-loop join
    * the streamed (base) row is fixed while the broadcast candidates
    * iterate, so consecutive calls share `b` and reuse its char→positions
    * index and char counts instead of rebuilding them per pair. */
  def lowercasedRatioAtLeast(al: String, bl: String, minRatio: Double): Double = {
    if (al == null || bl == null || al.isEmpty || bl.isEmpty) return 0.0
    val rq = realQuickRatio(al, bl)
    if (rq < minRatio) return rq
    val p = preparedFor(bl)
    val q = quickRatioPrepared(al, p)
    if (q < minRatio) return q
    ratio(al, bl)
  }

  /** Immutable per-b index: ASCII char counts (for quick_ratio). */
  private final class PreparedB(val b: String) {
    val counts = new Array[Int](128)
    var nonAscii: java.util.HashMap[Character, Integer] = _
    locally {
      var i = 0
      while (i < b.length) {
        val c = b.charAt(i)
        if (c < 128) counts(c) += 1
        else {
          if (nonAscii == null) nonAscii = new java.util.HashMap[Character, Integer]()
          nonAscii.merge(c, 1, (x, y) => x + y)
        }
        i += 1
      }
    }
  }

  private val tlPrepared = new ThreadLocal[PreparedB]

  private def preparedFor(b: String): PreparedB = {
    val cached = tlPrepared.get()
    if (cached != null && (cached.b eq b) || (cached != null && cached.b == b)) cached
    else { val p = new PreparedB(b); tlPrepared.set(p); p }
  }

  /** quick_ratio against a prepared b — primitive-array counting, no
    * per-pair HashMap allocation for ASCII inputs. */
  private def quickRatioPrepared(a: String, p: PreparedB): Double = {
    val la = a.length; val lb = p.b.length
    if (la + lb == 0) return 1.0
    val avail = java.util.Arrays.copyOf(p.counts, 128)
    var nonAsciiAvail: java.util.HashMap[Character, Integer] = null
    var matches = 0
    var i = 0
    while (i < la) {
      val c = a.charAt(i)
      if (c < 128) {
        if (avail(c) > 0) { matches += 1; avail(c) -= 1 }
      } else if (p.nonAscii != null) {
        if (nonAsciiAvail == null)
          nonAsciiAvail = new java.util.HashMap[Character, Integer](p.nonAscii)
        val n = nonAsciiAvail.getOrDefault(c, 0)
        if (n > 0) { matches += 1; nonAsciiAvail.put(c, n - 1) }
      }
      i += 1
    }
    2.0 * matches / (la + lb)
  }
}
