package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable Catalyst `Column` builders for the faithful DSL semantics.
  *
  * Everything here compiles to built-in (whole-stage-codegen'd)
  * expressions — no UDFs — so filters stay pushdown-able and the hot
  * path stays inside codegen at any scale.
  *
  * Semantics derived from the reference engine
  * (`/root/reference/main.gs`, `/root/reference/docs/expression-language.md`).
  */
object GraftFunctions {

  /** JS `parseFloat` prefix grammar: optional sign, then Infinity or a
    * decimal literal with optional exponent; parses the longest valid
    * prefix after leading-whitespace trim (reference `main.gs:255-258`).
    * `"50%"` → 50.0, `"1,5"` → 1.0, `"1e"` → 1.0, `"abc"` → null (≙ NaN:
    * any comparison on null is null → row dropped by filter, matching
    * JS "NaN comparisons are false").
    */
  private val FloatPrefixRe =
    "^[+-]?(Infinity|(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?)"

  def parseFloatPrefix(c: Column): Column = {
    val prefix = regexp_extract(ltrim(c), FloatPrefixRe, 0)
    // The extract is either "" (no numeric prefix → null ≙ NaN) or a
    // valid double literal, so the cast never trips ANSI mode.
    when(prefix === "", lit(null).cast("double"))
      .otherwise(prefix.cast("double"))
  }

  /** JS `Number()` full-string grammar (what `isNaN(s)` tests after
    * implicit coercion): empty/whitespace-only → 0 (numeric!), optional
    * sign + (Infinity | hex | decimal w/ exponent), surrounding
    * whitespace allowed. Reference `main.gs:90-95`.
    */
  private val JsNumberRe =
    "^[\\s]*([+-]?(Infinity|0[xX][0-9a-fA-F]+|(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?))?[\\s]*$"

  /** JS `String.prototype.replace("%", "")` removes only the FIRST
    * occurrence (reference `main.gs:92`).
    */
  def stripFirstPercent(c: Column): Column =
    regexp_replace(c, "^([^%]*)%", "$1")

  /** True iff the value is numeric after stripping one '%', per JS
    * `!isNaN(v.replace("%",""))`. Note `isNaN("")` is false → empty
    * cells count as numeric (verified reference corner).
    */
  def isJsNumeric(c: Column): Column =
    stripFirstPercent(c).rlike(JsNumberRe)

  /** Formula-splice quoting heuristic (reference `main.gs:90-95`):
    * numeric-looking values (after %-strip) splice bare; everything
    * else is wrapped in double quotes as a spreadsheet string literal.
    */
  def quoteIfNonNumeric(c: Column): Column =
    when(isJsNumeric(c), c).otherwise(concat(lit("\""), c, lit("\"")))

  /** 1-based column index → bijective base-26 A1 letters
    * (reference `main.gs:291-299`): 1→A, 26→Z, 27→AA, 703→AAA.
    * Pure driver-side helper — output column positions are static.
    */
  def columnLetter(col: Int): String = {
    require(col > 0, s"column index must be positive, got $col")
    var c = col
    val sb = new StringBuilder
    while (c > 0) {
      val t = (c - 1) % 26
      sb.insert(0, ('A' + t).toChar)
      c = (c - t) / 26
    }
    sb.toString
  }

  /** Display-string view of any typed DataFrame: every column cast to
    * string, nulls → "" (a spreadsheet cell is never null, it is an
    * empty string — reference reads `getDisplayValues`, `main.gs:52`).
    * Duplicate column names: last one wins (reference `main.gs:59`).
    */
  def displayString(df: DataFrame): DataFrame = {
    val names = df.columns
    // Positional aliases so duplicate names stay addressable.
    val tmp = df.toDF(names.indices.map(i => s"__c$i"): _*)
    val lastIdx = names.zipWithIndex.groupBy(_._1)
      .map { case (n, occ) => n -> occ.last._2 }
    val keep = names.zipWithIndex.filter { case (n, i) => lastIdx(n) == i }
    tmp.select(keep.map { case (n, i) =>
      coalesce(col(s"__c$i").cast("string"), lit("")).as(n)
    }.toSeq: _*)
  }
}
