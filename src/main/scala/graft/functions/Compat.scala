package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-only scalar functions without an exact Spark twin
  * (SURVEY.md §4.3(5)), provided as thin column helpers:
  *
  *  - `similarTo`: SQL `SIMILAR TO` (FunctionCatalog.scala:191 `similar`) —
  *    SQL-standard regex dialect translated to Java regex for `rlike`,
  *    anchored full-match as the standard requires.
  *  - `temporalOverlaps`: `(s1, e1) OVERLAPS (s2, e2)`
  *    (FunctionCatalog.scala:246) — half-open interval intersection.
  *  - `element`: sole-element extraction from a single-element array
  *    (FunctionCatalog.scala:258 `element()`): the value if size==1, null
  *    if empty, error semantics relaxed to null for >1 (documented delta).
  *  - `randInteger(n)`: uniform int in [0, n) (FunctionCatalog.scala:236).
  *  - `cot`, `bin`, `log(base, x)`: Spark built-ins — re-exported here so
  *    the catalog surface is complete in one place.
  */
object Compat {

  /** Translate a SQL-standard SIMILAR TO pattern to a Java regex:
    * `%` → `.*`, `_` → `.`, with `\` as escape; regex metacharacters that
    * SQL treats literally are quoted. Character classes `[...]` and
    * alternation/quantifiers, which SIMILAR TO shares with regex, pass
    * through. */
  private[functions] def similarToRegex(pattern: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      c match {
        case '\\' =>
          // i+1 >= length: a dangling trailing backslash is itself a
          // literal '\' — quote it so it cannot escape the appended
          // '$' anchor (review r16)
          val lit =
            if (i + 1 < pattern.length) { i += 1; pattern.charAt(i) }
            else '\\'
          sb.append(java.util.regex.Pattern.quote(lit.toString))
        case '%' if !inClass => sb.append(".*")
        case '_' if !inClass => sb.append('.')
        // shared metacharacters pass through (SQL-standard SIMILAR TO
        // supports these with regex meaning)
        case '[' => inClass = true; sb.append(c)
        case ']' => inClass = false; sb.append(c)
        case '(' | ')' | '|' | '*' | '+' | '?' | '{' | '}' | '-' =>
          sb.append(c)
        // '^' negates inside a character class (shared with regex) but
        // is an ORDINARY character elsewhere in SIMILAR TO — while in
        // regex it would anchor; same for '$' and '.', which SQL
        // treats literally (review r16: the original pass-through list
        // carried '^' unconditionally, so "a^b" could never match)
        case '^' if inClass => sb.append(c)
        case '.' | '$' | '^' => sb.append('\\').append(c)
        case other => sb.append(other)
      }
      i += 1
    }
    "^" + sb.toString + "$"
  }

  def similarTo(col: Column, pattern: String): Column =
    col.rlike(similarToRegex(pattern))

  def temporalOverlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 < e2 && s2 < e1

  def element(arr: Column): Column =
    when(size(arr) === 1, arr.getItem(0)).otherwise(lit(null))

  def randInteger(n: Int, seed: Long = 42L): Column =
    (rand(seed) * n).cast("int")

  def cotangent(c: Column): Column = cot(c)
  def binary(c: Column): Column = bin(c)
  def logBase(base: Double, c: Column): Column = log(base, c)
}
