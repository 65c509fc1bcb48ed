package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/numeric functions of the reference, re-expressed as
  * codegen-friendly Spark Column expressions (SURVEY.md §2.3 F1–F8,
  * F11–F13). Everything here composes `org.apache.spark.sql.functions`
  * built-ins or the engine's own native Catalyst expressions (F2/F3 —
  * see graft.plans.GraftCleanArticle) — no UDFs — so whole-stage
  * codegen covers the hot path and filters built from these still push
  * down.
  *
  * Reference behavior (studied, not copied): /root/reference/main.py
  * 1262-1750.
  */
object Cleaning {

  /** F1 — trim + collapse whitespace runs to a single space; empty→null.
    * Ref: main.py:1262-1272 (`" ".join(s.split())`). Python's str.split()
    * splits on UNICODE whitespace (NBSP, thin spaces, …), so the pattern
    * uses (?U) — Java's UNICODE_CHARACTER_CLASS — not ASCII \s. Runs are
    * collapsed to a single ASCII space first, so the outer trim (ASCII
    * space only) then strips the ends exactly like ' '.join(s.split()). */
  def cleanInvisibleChars(c: Column): Column = {
    val collapsed = trim(regexp_replace(c, "(?U)\\s+", " "))
    when(c.isNull || collapsed === "", lit(null)).otherwise(collapsed)
  }

  /** DuckDB/RE2 equivalent of the (?U)\s class above — RE2's \s is
    * ASCII-only, so spell out Java's IsWhite_Space set: \t-\r, NEL (0x85),
    * and the \p{Z} separators (covers 0x20, NBSP, 0x1680, 0x2000-0x200A,
    * 0x2028, 0x2029, 0x202F, 0x205F, 0x3000). Kept next to the Spark
    * implementation so the two can't drift apart. */
  val UnicodeWsRe2: String = """[\t\n\x0b\f\r\x{85}\p{Z}]"""

  /** F2 — Vitya article cleaning: strip apostrophes, strip one leading
    * "000", then ALWAYS an integer: all-digits→int; else concatenation of
    * every digit run→int; no digits at all→0. Null/blank/"nan" in → null
    * out (the reference checks cleaned.lower()=='nan', a pandas
    * astype(str) artifact). Accepted deviation: digit runs longer than 18
    * chars return 0 (long overflow guard) where Python's arbitrary-
    * precision int returns the full value — out of range for any real
    * article. Ref: main.py:1285-1318. */
  def cleanArticleVitya(c: Column): Column = {
    // Native single-pass expression (graft.plans.GraftCleanArticleInt):
    // a Column-chain CASE re-evaluates the shared trim/strip subtrees
    // per branch — up to six passes per row on the E1 hot path. The
    // kernel (functions.ArticleClean) carries the exact semantics
    // contract; CleaningSpec pins the branches.
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.GraftCleanArticleInt(ColumnBridge.expression(c.cast("string"))))
  }

  /** ANSI-safe digits→long: empty / non-digit / >18-digit strings → null
    * (the rlike guard keeps CaseWhen short-circuiting under ANSI mode). */
  private def digitsToLong(c: Column): Column =
    when(c.rlike("^[0-9]{1,18}$"), c.cast("long"))

  /** F3 — Dimi article cleaning: strip apostrophes + one leading "000",
    * result stays a string. Null/blank/"nan" in → null; empty AFTER
    * cleaning (e.g. "'000") → null too (`return cleaned if cleaned else
    * None`). Ref: main.py:1508-1526. */
  def cleanArticleDimi(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.GraftCleanArticleStr(ColumnBridge.expression(c.cast("string"))))
  }

  /** F4 — color normalization: null → "", else lower(trim).
    * Ref: main.py:2037-2055. */
  def safeColor(c: Column): Column =
    lower(trim(coalesce(c.cast("string"), lit(""))))

  /** F6 — first "(...)" group, trimmed + uppercased; valid iff it matches
    * ^[A-Za-zА-Яа-я0-9-]+$ and is at least 4 chars. Ref: main.py:1640-1666. */
  def bracketCode(name: Column): Column = {
    val code = upper(trim(regexp_extract(name, "\\(([^)]+)\\)", 1)))
    when(code.rlike("^[A-Za-zА-Яа-я0-9\\-]+$") && length(code) >= 4, code)
  }

  /** F7 — battery capacity: first `(\d+)\s*mah` (then мач, then мч) in the
    * lowercased name, kept iff 5 ≤ v ≤ 999999; returned as string (the
    * reference keeps the matched text). Ref: main.py:1668-1710. */
  def batteryCapacity(name: Column): Column = {
    def cap(l: Column, suffix: String): Column = {
      val v = regexp_extract(l, "(\\d+)\\s*" + suffix, 1)
      when(digitsToLong(v).between(5L, 999999L), v)
    }
    val l = lower(name)
    coalesce(cap(l, "mah"), cap(l, "мач"), cap(l, "мч"))
  }

  /** DuckDB twin of [[bracketCode]] over a SQL name expression. */
  def bracketCodeSql(n: String): String =
    s"""(CASE WHEN regexp_matches(upper(trim(regexp_extract($n, '\\(([^)]+)\\)', 1))),
       |           '^[A-Za-zА-Яа-я0-9\\-]+$$')
       |       AND length(upper(trim(regexp_extract($n, '\\(([^)]+)\\)', 1)))) >= 4
       |  THEN upper(trim(regexp_extract($n, '\\(([^)]+)\\)', 1))) END)""".stripMargin

  /** DuckDB twin of [[batteryCapacity]] over a SQL name expression. */
  def batteryCapacitySql(n: String): String = {
    def cap(suffix: String) =
      s"""(CASE WHEN TRY_CAST(regexp_extract(lower($n), '(\\d+)\\s*$suffix', 1) AS BIGINT)
         |           BETWEEN 5 AND 999999
         |      THEN regexp_extract(lower($n), '(\\d+)\\s*$suffix', 1) END)""".stripMargin
    s"COALESCE(${cap("mah")}, ${cap("мач")}, ${cap("мч")})"
  }

  // ---- F5 as a pure Column expression (no UDF) ---------------------------
  // Seven priority patterns over the uppercased name; per pattern, the
  // FIRST match that survives the exclusion list wins (the reference
  // iterates matches of a pattern before falling to the next —
  // main.py:1591-1638). regexp_extract_all + filter + get expresses that
  // without a UDF, so the DuckDB oracle can mirror it exactly
  // (list_filter + list_extract).
  //
  // Boundary handling: Python's \b is Unicode-aware; Java's default \b
  // and RE2's \b are ASCII-only, which silently kills the Cyrillic
  // pattern (no "boundary" ever borders a Cyrillic letter) and invents
  // boundaries where Latin codes touch Cyrillic words. RE2 has no
  // lookarounds to emulate \b, so the expression/oracle pair uses
  // explicit delimiter groups around a capturing core — identical
  // scanning in both engines, Unicode-correct on Cyrillic. Known
  // deviation from Python's zero-width \b: a delimiter char is consumed
  // by the preceding match, so of two SAME-pattern matches separated by
  // exactly one delimiter the second is not listed; the first-acceptable
  // -match-wins rule makes the WINNER agree with Python unless the first
  // match was excluded AND swallowed its successor's only delimiter —
  // MatchSpec pins the behavior on Cyrillic and stop-word-adjacent
  // inputs. [[ProductCode.findInName]] keeps exact zero-width-\b Python
  // parity (java.util.regex + UNICODE_CHARACTER_CLASS).
  private[graft] val nameCodeCores: Seq[String] = Seq(
    "[A-Z0-9]+(?:-[A-Z0-9]+)+", // dash codes: AC-M25-SC, P27QDA-RGP
    "[A-Z]{2,}[0-9]{2,}[A-Z]*", // letters-digits(-letters): XM123
    "[0-9]{3,}[A-Z]{1,3}",      // digits-letters: 123XM
    "[A-Z][0-9]{4,}[A-Z][0-9]+", // M2319E1 style
    "[A-Z]{4,8}",               // bare 4-8 letter brands
    "[A-Z][0-9]{1,3}",          // C60, C20, D30
    "[А-Я][0-9]{1,3}")          // Cyrillic С20, Д30

  /** Zero-width-\b forms for [[ProductCode]] (Python parity under
    * UNICODE_CHARACTER_CLASS). */
  private[graft] val nameCodePatterns: Seq[String] =
    nameCodeCores.map(c => "\\b" + c + "\\b")

  /** Word characters for the RE2-safe boundary emulation (Latin +
    * Cyrillic incl. Ё + digits + underscore). */
  private val wordClass = "A-Za-zА-Яа-яЁё0-9_"

  /** Delimiter-group forms shared by the Spark expression and the DuckDB
    * oracle; the code itself is capture group 1. */
  private[graft] val nameCodeBoundedPatterns: Seq[String] =
    nameCodeCores.map(c =>
      "(?:^|[^" + wordClass + "])(" + c + ")(?:[^" + wordClass + "]|$)")

  private val specRe = "^\\d+(mah|wh|w|ma)$"
  private val longDigitsRe = "^\\d{5,}$"
  private[graft] val nameCodeStops = Seq("USB-C", "POWER", "PORTABLE", "CHARGER", "BANK")

  /** F5 — product-code-in-name extraction as a Column expression.
    * Ref: main.py:1591-1638. */
  def nameCode(name: Column): Column = {
    val up = upper(name)
    def keep(x: Column): Column =
      !(lower(x).rlike(specRe) || x.rlike(longDigitsRe) || x.isin(nameCodeStops: _*))
    val firsts = nameCodeBoundedPatterns.map { p =>
      get(filter(regexp_extract_all(up, lit(p), lit(1)), keep _), lit(0))
    }
    coalesce(firsts: _*)
  }

  /** DuckDB twin of [[nameCode]]. */
  def nameCodeSql(n: String): String = {
    val keep = (x: String) =>
      s"NOT (regexp_matches(lower($x), '$specRe') OR regexp_matches($x, '$longDigitsRe')" +
        s" OR $x IN (${nameCodeStops.map(w => s"'$w'").mkString(", ")}))"
    val firsts = nameCodeBoundedPatterns.map { p =>
      s"list_extract(list_filter(regexp_extract_all(upper($n), '$p', 1), x -> ${keep("x")}), 1)"
    }
    s"COALESCE(${firsts.mkString(",\n    ")})"
  }

  /** Known brand list of F8. Ref: main.py:1727-1737. */
  val Brands: Seq[String] =
    Seq("GREENOE", "XIAOMI", "SAMSUNG", "APPLE", "HUAWEI", "OPPO", "VIVO", "ONEPLUS")

  /** Brand containment (first brand in list order wins), used by F8. */
  def brandIn(name: Column): Column = {
    val upperName = upper(name)
    Brands.foldRight(lit(null).cast("string"): Column) { (b, acc) =>
      when(upperName.contains(b), lit(b)).otherwise(acc)
    }
  }

  /** F8 — unified code: bracket code, else known brand, else name code of
    * length ≥ 4 (name-code extraction via [[ProductCode]] UDF).
    * Ref: main.py:1712-1750. */
  def unifiedCode(name: Column, nameCode: Column): Column =
    coalesce(bracketCode(name), brandIn(name), when(length(nameCode) >= 4, nameCode))

  /** F8 fully expression-based (uses [[nameCode]] instead of the UDF). */
  def unifiedCodeExpr(name: Column): Column =
    unifiedCode(name, nameCode(name))

  /** DuckDB twin of [[unifiedCodeExpr]] over a SQL name expression. NOTE:
    * callers should bind `n` to a CTE column, not a giant inline
    * expression — the twin repeats it many times. */
  def unifiedCodeSql(n: String): String = {
    val brandCase = "CASE " + Brands.map(b =>
      s"WHEN contains(upper($n), '$b') THEN '$b'").mkString(" ") + " END"
    val nc = nameCodeSql(n)
    s"""COALESCE(${bracketCodeSql(n)},
       | $brandCase,
       | (CASE WHEN length($nc) >= 4 THEN $nc END))""".stripMargin
  }

  /** F11 — price change percent, guarded by base>0. Ref: main.py:2198-2203. */
  def priceChangePct(supplierPrice: Column, basePrice: Column): Column =
    when(basePrice > 0, (supplierPrice - basePrice) / basePrice * 100).otherwise(lit(0.0))

  /** F12 — per-supplier base price: null/≤0 → 0.0. Ref: main.py:2057-2075. */
  def basePriceOrZero(c: Column): Column =
    coalesce(when(c > 0, c), lit(0.0))

  /** F13 — min positive price across supplier price columns; all
    * null/≤0 → 0.0. Ref: main.py:2077-2095. */
  def minPositivePrice(cols: Column*): Column =
    coalesce(least(cols.map(c => when(c > 0, c)): _*), lit(0.0))
}
