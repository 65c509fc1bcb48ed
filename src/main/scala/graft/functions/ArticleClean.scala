package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels for the F2/F3 article-cleaning expressions
  * ([[graft.plans.GraftCleanArticleInt]]/[[GraftCleanArticleStr]]).
  *
  * Semantics contract — EXACTLY the Column chain they replace (and the
  * DuckDB oracle twins, CleaningSpec pins the branches):
  *   1. trim ASCII spaces both ends (Spark `trim` — 0x20 only, NOT
  *      Java's `String.trim` which also strips control chars);
  *   2. empty or case-insensitive "nan" → null (pandas astype(str)
  *      artifact the reference checks, main.py:1293);
  *   3. delete every apostrophe;
  *   4. strip ONE leading "000";
  *   5. vitya: concatenate remaining digit runs → long; no digits or
  *      more than 18 of them → 0 (long-overflow guard, documented
  *      deviation from Python's bigint);
  *      dimi: the cleaned string itself; empty after cleaning → null.
  */
object ArticleClean {

  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Apostrophes deleted, then one leading "000" dropped; returns null
    * for the empty/"nan" guard inputs. */
  private def strippedOrNull(u: UTF8String): String = {
    val s = trimSpaces(u.toString)
    if (s.isEmpty || s.equalsIgnoreCase("nan")) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch != '\'') sb.append(ch)
      i += 1
    }
    if (sb.length >= 3 && sb.charAt(0) == '0' && sb.charAt(1) == '0' && sb.charAt(2) == '0')
      sb.delete(0, 3)
    sb.toString
  }

  /** F2 kernel: null for empty/"nan", else the digit-concatenation as a
    * boxed Long (0 when no digits or >18 of them). */
  def vitya(u: UTF8String): java.lang.Long = {
    val t = strippedOrNull(u)
    if (t == null) return null
    var nd = 0
    var v = 0L
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      if (ch >= '0' && ch <= '9') {
        nd += 1
        if (nd <= 18) v = v * 10 + (ch - '0')
      }
      i += 1
    }
    java.lang.Long.valueOf(if (nd == 0 || nd > 18) 0L else v)
  }

  /** F3 kernel: null for empty/"nan"/empty-after-cleaning, else the
    * cleaned string. */
  def dimi(u: UTF8String): UTF8String = {
    val t = strippedOrNull(u)
    if (t == null || t.isEmpty) null else UTF8String.fromString(t)
  }
}
