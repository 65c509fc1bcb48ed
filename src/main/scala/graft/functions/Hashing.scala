package graft.functions

/** Deterministic 64-bit hashing for the dedup/ANN operators, implemented
  * as plain JVM loops so the hot paths (minhash signatures, simhash bit
  * counting, LSH projections) run at primitive speed instead of
  * interpreted higher-order-function expressions.
  *
  * splitmix64 is the public-domain mixer from Steele et al. (JDK
  * SplittableRandom); string hashing is a polynomial fold finished with
  * the same mixer. These signatures are engine-internal (the gated
  * queries that use them are rows-only), so the only requirements are
  * determinism and dispersion.
  */
object Hashing extends Serializable {

  final def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  final def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    splitmix64(h)
  }

  /** MinHash band keys: one base hash per shingle, k derived hashes via
    * seed mixing (h_i = mix(h0 + i·φ)), min per derivation, then bands of
    * `rows` minhashes folded to one key each. */
  final def minhashBandKeys(shingles: Seq[String], numHashes: Int, bands: Int): Array[Long] = {
    val rows = numHashes / bands
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = shingles.iterator
    while (it.hasNext) {
      val h0 = hashString(it.next())
      var i = 0
      while (i < numHashes) {
        val hi = splitmix64(h0 + i * 0x9e3779b97f4a7c15L)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0x2545f4914f6cdd1dL ^ b
      var r = 0
      while (r < rows) { k = splitmix64(k ^ mins(b * rows + r)); r += 1 }
      keys(b) = k
      b += 1
    }
    keys
  }

  /** 64-bit SimHash over string features: per bit, sum of ±1 across
    * feature hashes; sign → bit. */
  final def simhash(features: Seq[String]): Long = {
    val counts = new Array[Int](64)
    val it = features.iterator
    while (it.hasNext) {
      val h = hashString(it.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 63
    while (b >= 0) { out = (out << 1) | (if (counts(b) > 0) 1L else 0L); b -= 1 }
    out
  }

  /** Oracle-expressible feature hashing: four independent polynomial
    * hashes of the UTF-16 code units, each mod the Mersenne prime 2³¹−1.
    * Every intermediate stays below 2³⁹, so the SAME arithmetic is exact
    * in a signed 64-bit integer in any SQL engine — no wrapping-overflow
    * semantics needed (the reason [[hashString]]/[[splitmix64]] cannot
    * carry a DuckDB oracle). 16 bits are drawn from each hash → 64
    * well-dispersed signature bits. */
  private val PolyM = 2147483647L // 2^31 - 1
  private val PolyMuls = Array(131L, 137L, 139L, 149L)

  final def polyHashes(s: String): Array[Long] = {
    val hs = new Array[Long](4)
    var k = 0
    while (k < 4) {
      val m = PolyMuls(k)
      var h = 0L
      var i = 0
      while (i < s.length) { h = (h * m + s.charAt(i)) % PolyM; i += 1 }
      hs(k) = h
      k += 1
    }
    hs
  }

  /** Merge-intersection count over two SORTED long arrays — the
    * primitive verify kernel for set-similarity joins: O(m+n), no
    * per-pair hash-set allocation (ArrayIntersect on string arrays
    * re-hashes every element for every candidate pair). */
  final def sortedIntersectCount(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0
    var j = 0
    var n = 0
    val la = a.length
    val lb = b.length
    while (i < la && j < lb) {
      val x = a(i)
      val y = b(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** [[simhash]] over [[polyHashes]] bits: global bit b is the majority
    * vote of hash (b >> 4)'s bit (b & 15), so the signature's 16-bit
    * blocking chunk c is built purely from hash c — the layout the
    * DuckDB twin reproduces chunk by chunk. */
  /** Distinct word n-gram shingles of a single-space split — the JVM
    * twin of the batch shingle expression for stream-side use (<n
    * words yields the empty set; the batch Column form's NULL-shingle
    * edge contributes nothing to a simhash either way). */
  final def wordShingles(text: String, n: Int): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < n) Seq.empty
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString("_")).distinct
  }

  final def simhashPoly(features: Seq[String]): Long = {
    val counts = new Array[Int](64)
    val it = features.iterator
    while (it.hasNext) {
      val hs = polyHashes(it.next())
      var b = 0
      while (b < 64) {
        if (((hs(b >> 4) >>> (b & 15)) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 63
    while (b >= 0) { out = (out << 1) | (if (counts(b) > 0) 1L else 0L); b -= 1 }
    out
  }

  /** T5's rolling-hash pair in one O(L) pass: the whole-document
    * polynomial hash and the minimum 8-gram window hash (winnowing-style
    * selection), both `(h·31 + c) mod 1000000007` folds over the text's
    * code points — EXACTLY the values of the SQL formulation
    * `aggregate(codes, 0, (h,c) -> (h*31+c) % 1000000007)` per window,
    * which is what the DuckDB oracle computes, just without the 10M+
    * interpreted-lambda struct allocations (3 s → ~0.1 s at sf0.1).
    * The window rolls: the leaving char is subtracted as c·31⁷ mod p
    * (512613922 = 31^7 mod 1000000007), re-centered positive before the
    * multiply so no intermediate exceeds 2^51. Code-point iteration
    * matches `split(text,'') → ascii` (Spark's ascii is codePointAt on
    * the first char). Returns (docHash, minGramHash, hasGram): fewer
    * than 8 code points → hasGram false (SQL CASE guard → null). */
  /** Content-defined chunk spans (Rabin-style CDC, the storage-dedup
    * boundary rule): cut AFTER code point e (8 ≤ e ≤ n−1) whenever the
    * [[rollingHash8]] 8-gram hash ending at e is ≡ 0 mod 64 — so
    * boundaries depend only on LOCAL content and survive insertions,
    * which is the whole point vs fixed-size blocks. Returns 1-based
    * (start, length) spans in code points (the unit Spark's and
    * DuckDB's `substring` both count), covering the text exactly; an
    * empty string yields one empty span. Same modular arithmetic and
    * code-point iteration as rollingHash8, so the DuckDB oracle's
    * per-window fold reproduces every cut. */
  final def cdcSpans(s: String): Seq[(Int, Int)] = {
    val P = 1000000007L
    val Pow7 = 512613922L
    var h8 = 0L
    val ring = new Array[Long](8)
    var n = 0
    var i = 0
    val total = s.codePointCount(0, s.length)
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val c = cp.toLong
      if (n < 8) h8 = (h8 * 31 + c) % P
      else h8 = (((h8 - ring(n % 8) * Pow7 % P + P) % P) * 31 + c) % P
      ring(n % 8) = c
      n += 1
      if (n >= 8 && n < total && h8 % 64 == 0) cuts += n
    }
    val bs = 0 +: cuts.toSeq :+ total
    bs.sliding(2).map { case Seq(a, b) => (a + 1, b - a) }.toSeq
  }

  /** [[cdcSpans]] plus the per-chunk digest, in ONE O(L) pass:
    * (len_codepoints, md5_hex) per chunk. The digest must come from
    * this pass — slicing chunks out of the stored column afterwards
    * (`md5(substring(text, off, len))`) re-scans the string from byte
    * 0 per chunk because UTF-8 offsets aren't random-access, which is
    * O(L²/chunk) on a document that cuts densely (a degenerate
    * constant-character document can cut at EVERY position — the
    * mojibake-sweep shape). Java strings are char-indexed arrays, so
    * the same slices here are O(chunk). Char offsets are tracked
    * alongside codepoint counts so astral-plane text slices exactly
    * where the codepoint-indexed SQL `substring` would. */
  final def cdcChunks(s: String): Seq[(Long, String)] = {
    val P = 1000000007L
    val Pow7 = 512613922L
    var h8 = 0L
    val ring = new Array[Long](8)
    var n = 0
    var i = 0
    val total = s.codePointCount(0, s.length)
    val cutsCp = scala.collection.mutable.ArrayBuffer[Int]()
    val cutsCh = scala.collection.mutable.ArrayBuffer[Int]()
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val c = cp.toLong
      if (n < 8) h8 = (h8 * 31 + c) % P
      else h8 = (((h8 - ring(n % 8) * Pow7 % P + P) % P) * 31 + c) % P
      ring(n % 8) = c
      n += 1
      if (n >= 8 && n < total && h8 % 64 == 0) { cutsCp += n; cutsCh += i }
    }
    val bsCp = 0 +: cutsCp.toSeq :+ total
    val bsCh = 0 +: cutsCh.toSeq :+ s.length
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until bsCp.length - 1).map { j =>
      md.reset()
      val digest = md.digest(s.substring(bsCh(j), bsCh(j + 1))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new StringBuilder(32)
      digest.foreach(b => hex.append(f"${b & 0xff}%02x"))
      ((bsCp(j + 1) - bsCp(j)).toLong, hex.toString)
    }
  }

  final def rollingHash8(s: String): (Long, Long, Boolean) = {
    val P = 1000000007L
    val Pow7 = 512613922L
    var doc = 0L
    var h8 = 0L
    var mn = Long.MaxValue
    val ring = new Array[Long](8)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val c = cp.toLong
      doc = (doc * 31 + c) % P
      if (n < 8) h8 = (h8 * 31 + c) % P
      else h8 = (((h8 - ring(n % 8) * Pow7 % P + P) % P) * 31 + c) % P
      ring(n % 8) = c
      n += 1
      if (n >= 8 && h8 < mn) mn = h8
    }
    (doc, mn, n >= 8)
  }

  /** Every k-gram's polynomial hash in ONE O(L) rolling pass:
    * h(i) = fold over the k UTF-16 units starting at i of
    * (h·131 + c) mod (2³¹−1), init 0 — the oracle-expressible fold
    * (every intermediate < 2⁴⁷, exact in signed 64-bit in any SQL
    * engine; DuckDB replays it per position as a list_reduce). The
    * rolling step subtracts the leading unit's 131^(k−1) term, keeping
    * the whole array O(L) instead of the per-position O(L·k) refold.
    * Returns one hash per 0-based start position; empty below k units.
    * Powers d23's cross-document repeated-substring detection (the
    * Lee-et-al-class operator: hash every k-gram, equi-join equal
    * hashes, verify bytes, merge runs into maximal shared spans). */
  final def gramHashes(s: String, k: Int): Array[Long] = {
    val P = 2147483647L
    val B = 131L
    val L = s.length
    if (L < k || k <= 0) return Array.empty
    var bk = 1L
    var j = 1
    while (j < k) { bk = bk * B % P; j += 1 } // B^(k−1) mod P
    val out = new Array[Long](L - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + s.charAt(i)) % P; i += 1 }
    out(0) = h
    i = 1
    while (i <= L - k) {
      val drop = s.charAt(i - 1) * bk % P
      h = ((h - drop + P) % P * B + s.charAt(i + k - 1)) % P
      out(i) = h
      i += 1
    }
    out
  }

  /** t45's winnow selection over [[gramHashes]] in ONE O(L) pass
    * (r17 optimization round): the distinct minima of
    * e(i) = h(i)·2²² + (2²²−1−i) over every full window of `w`
    * consecutive gram positions — the exact set the explode +
    * doc-window + distinct formulation selects, produced by a
    * monotonic deque instead of shuffling one row per corpus position
    * into a per-doc sort. Each e value's min-reign over the sliding
    * window is contiguous (a later, smaller e permanently evicts
    * earlier ones; e values are distinct by the position term), so
    * emit-on-change yields exactly the distinct set. Returns encoded
    * e values in scan order; empty below w full windows. The caller
    * owns the 2²²-position encoding guard, as before. */
  final def winnowedEncoded(s: String, k: Int, w: Int): Array[Long] = {
    val ENC = 1L << 22
    val hs = gramHashes(s, k)
    val n = hs.length
    if (n < w) return Array.empty[Long]
    val e = new Array[Long](n)
    var i = 0
    while (i < n) { e(i) = hs(i) * ENC + (ENC - 1 - i); i += 1 }
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val out = new Array[Long](n - w + 1) // ≤ one emit per full window
    var m = 0
    var last = -1L
    i = 0
    while (i < n) {
      while (tail > head && e(dq(tail - 1)) >= e(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (i >= w - 1) {
        while (dq(head) < i - w + 1) head += 1
        val mn = e(dq(head))
        if (mn != last) { out(m) = mn; m = m + 1; last = mn }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }
}

/** Primitive-loop vector kernels shared by the embedding operators. The
  * fold order is strictly sequential (index 0 → n−1), matching DuckDB's
  * list_reduce over list_zip so double results are bit-identical and the
  * x1/d5 oracles can hash-compare. */
object VectorOps extends Serializable {
  final def dot(x: Seq[Double], y: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  final def norm2(x: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    s
  }

  /** Deterministic pseudo-random hyperplanes in [-1,1]^dim. */
  final def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      (Hashing.splitmix64(p.toLong * 131071L + i) % 1000003L).toDouble / 1000003.0
    }

  /** Oracle-expressible hyperplanes: small-integer weights
    * w(p,i) = ((i·(p+3) + p) mod 7) − 3 ∈ {−3…3}. Integers are exact in
    * doubles and the projection is a strictly sequential fold, so a SQL
    * engine evaluating the same formula reproduces every projection — and
    * therefore every sign bucket — bit-for-bit. Dispersion is adequate
    * for bucketing (each plane cycles a different residue pattern over
    * the dimensions); use [[planes]] when cross-engine parity is not
    * needed. */
  final def intPlanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      (((i * (p + 3) + p) % 7) - 3).toDouble
    }

  /** Sign-LSH bucket: one bit per plane (sign of the projection). */
  final def signBucket(v: Seq[Double], ps: Array[Array[Double]]): Long = {
    var out = 0L
    var p = 0
    while (p < ps.length) {
      val plane = ps(p)
      var s = 0.0
      var i = 0
      val n = math.min(v.length, plane.length)
      while (i < n) { s += v(i) * plane(i); i += 1 }
      out = (out << 1) | (if (s > 0.0) 1L else 0L)
      p += 1
    }
    out
  }
}
