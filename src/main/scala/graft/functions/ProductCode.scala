package graft.functions

import java.util.regex.Pattern

/** F5 — product-code extraction from a product name: 7 regex patterns in
  * priority order with an exclusion list (spec strings like "60000mah",
  * long digit runs, stop-words). Pure JVM function; exposed to Spark as
  * a deterministic UDF in [[GraftFunctions]].
  *
  * Behavior studied from /root/reference/main.py:1591-1638 (re-implemented
  * for the JVM, not translated line by line).
  */
object ProductCode extends Serializable {

  // Priority-ordered patterns over the UPPERCASED name (shared with the
  // expression-based Cleaning.nameCode). UNICODE_CHARACTER_CLASS makes \b
  // Unicode-aware like Python's re (without it Java's ASCII \b can never
  // match the Cyrillic С20-style pattern).
  private val patterns: Array[Pattern] =
    Cleaning.nameCodePatterns.map(p => Pattern.compile(p, Pattern.UNICODE_CHARACTER_CLASS)).toArray

  private val specPattern = Pattern.compile("^\\d+mah$|^\\d+w$|^\\d+wh$|^\\d+ma$")
  private val longDigits = Pattern.compile("^\\d{5,}$")
  private val stopWords = Set("USB-C", "POWER", "PORTABLE", "CHARGER", "BANK")

  /** First acceptable match of the first pattern that yields any match.
    * Case mapping uses Locale.ROOT — locale-independent like Python's
    * str.upper()/lower() (a Turkish-default JVM would otherwise map
    * I↔ı and break pattern/stop-word matching). */
  def findInName(name: String): String = {
    if (name == null) return null
    val upper = name.toUpperCase(java.util.Locale.ROOT)
    var pi = 0
    while (pi < patterns.length) {
      val m = patterns(pi).matcher(upper)
      while (m.find()) {
        val cand = m.group()
        val ok = !specPattern.matcher(cand.toLowerCase(java.util.Locale.ROOT)).matches() &&
          !longDigits.matcher(cand).matches() &&
          !stopWords.contains(cand)
        if (ok) return cand
      }
      pi += 1
    }
    null
  }
}
