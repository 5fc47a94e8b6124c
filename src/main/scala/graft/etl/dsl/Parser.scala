package graft.etl.dsl

import scala.util.matching.Regex
import Ast._

/** Rule parser + validator: Map-sheet rows → `RuleSet`.
  *
  * Faithful to `/root/reference/main.gs:186-249` (classification),
  * `172-184` (delimiter validation), `204-219` (column existence),
  * `266-271` (operator-syntax validation — the reference checks per
  * row at eval time; rules are static so we hoist it to parse time,
  * same abort-the-run effect). Everything is validated BEFORE any
  * Spark job launches — analysis-phase fail-fast.
  */
object Parser {

  private val SrcToken  = new Regex("src\\[([^\\]]+)\\]")
  private val SelfToken = new Regex("self\\[([^\\]]+)\\]")
  private val BadOp     = new Regex("[=><!]{3,}|[><]{2,}")

  private val JoinInstr =
    new Regex("^\\s*src\\[([^\\]]+)\\]\\s*==\\s*other\\[([^\\]]+)\\]\\s*$")

  /** @param rules   (col A, col B) pairs, Map-sheet order, header row
    *                already removed
    * @param sourceHeaders source column names for existence validation
    * @param sheets  header lists of the joinable sheets, by sheet name
    *                — `_join:` rules validate against these; non-join
    *                rules validate against source + every joined
    *                sheet's headers (joins are hoisted, like filters)
    * @param plugins names a `_plugin:` rule may reference (the
    *                engine's registry keys)
    */
  def parse(rules: Seq[(String, String)], sourceHeaders: Seq[String],
      sheets: Map[String, Seq[String]] = Map.empty,
      plugins: Set[String] = Set.empty): RuleSet = {
    val kept = rules
      .map { case (a, b) => (Option(a).getOrElse("").trim, Option(b).getOrElse("").trim) }
      .filter { case (a, _) => a.nonEmpty && !a.startsWith("//") }

    // Pass 1 — `_join:` rules. Join KEYS resolve sequentially (join i
    // sees the source plus sheets joined by rules 1..i-1), and each
    // join extends the header space every OTHER rule kind validates
    // against below.
    val joins = Vector.newBuilder[JoinRule]
    var curHeaders = sourceHeaders.toSet
    kept.foreach { case (header, rawInstruction) =>
      if (header.startsWith("_join:")) {
        val sheet = header.stripPrefix("_join:").trim
        if (sheet.isEmpty)
          throw DslError(s"""Join rule "$header" names no sheet.""")
        validateDelimiters(rawInstruction, header)
        val m = JoinInstr.findFirstMatchIn(rawInstruction).getOrElse(
          throw DslError(s"""Join rule "$header" must have the form """ +
            "src[Col] == other[Col]."))
        val (srcCol, otherCol) = (m.group(1), m.group(2))
        val otherHeaders = sheets.getOrElse(sheet, throw DslError(
          s"""Sheet "$sheet" does not exist (rule: "$header")."""))
        if (!curHeaders.contains(srcCol))
          throw DslError(s"""Column "$srcCol" does not exist in """ +
            s"""source (rule: "$header").""")
        if (!otherHeaders.contains(otherCol))
          throw DslError(s"""Column "$otherCol" does not exist in """ +
            s"""sheet "$sheet" (rule: "$header").""")
        joins += JoinRule(header, sheet, srcCol, otherCol)
        curHeaders ++= otherHeaders
      }
    }
    val headers = curHeaders

    val filters = Vector.newBuilder[FilterRule]
    val outputs = Vector.newBuilder[OutputCol]
    val types = Vector.newBuilder[TypeRule]
    val plugRules = Vector.newBuilder[PluginRule]

    kept.foreach { case (header, rawInstruction) =>
      if (header.startsWith("_plugin:")) {
        // plugin args are OPAQUE text passed verbatim to the plugin —
        // bracket balance / src[] existence rules don't apply to them
        // (a custom plugin may legitimately take `[a,b]`-shaped args)
        val name = header.stripPrefix("_plugin:").trim
        if (name.isEmpty)
          throw DslError(s"""Plugin rule "$header" names no plugin.""")
        if (!plugins.contains(name))
          throw DslError(s"""Plugin "$name" is not registered """ +
            s"""(rule: "$header"; registered: """ +
            s"${plugins.toSeq.sorted.mkString(", ")}).")
        plugRules += PluginRule(header, name, rawInstruction)
      } else if (!header.startsWith("_join:")) {
        validateDelimiters(rawInstruction, header)
        validateColumns(rawInstruction, header, headers)

        if (header.startsWith("_filter:")) {
          if (rawInstruction.startsWith("eval2:")) {
            val expr = rawInstruction.replaceFirst("eval2:", "").trim
            filters += ExprFilter(header, parseBoolExpr(expr, header))
          } else if (rawInstruction.startsWith("eval:")) {
            val expr = rawInstruction.replaceFirst("eval:", "").trim
            filters += EvalFilter(header, parsePredicate(expr, header))
          } else filters += NoopFilter(header)
        } else if (header.startsWith("_type:")) {
          val colName = header.stripPrefix("_type:").trim
          if (colName.isEmpty)
            throw DslError(s"""Type rule "$header" names no column.""")
          if (!headers.contains(colName))
            throw DslError(s"""Column "$colName" does not exist in """ +
              s"""source (rule: "$header").""")
          val tpe = CellType.byName.getOrElse(
            rawInstruction.trim.toLowerCase, throw DslError(
              s"""Unknown type "$rawInstruction" in rule "$header" """ +
                s"(valid: ${CellType.all.map(_.name).mkString(", ")})."))
          types += TypeRule(header, colName, tpe)
        } else if (rawInstruction.startsWith("constant:")) {
          outputs += ConstantCol(header,
            splitParts(rawInstruction.replaceFirst("constant:", "").trim))
        } else if (rawInstruction.startsWith("formula:")) {
          outputs += FormulaCol(header,
            splitParts(rawInstruction.replaceFirst("formula:", "").trim))
        } else {
          outputs += DirectCol(header, splitParts(rawInstruction))
        }
      }
    }

    val rs = RuleSet(filters.result(), outputs.result(),
      joins.result(), types.result(), plugRules.result())
    if (rs.outputs.isEmpty)
      throw DslError("No valid output columns found in mapping rules.")
    rs
  }

  /** Linear bracket-balance scan (`main.gs:172-184`): depth goes
    * negative or ends nonzero → contextual error.
    */
  def validateDelimiters(text: String, ruleHeader: String): Unit = {
    var depth = 0
    text.foreach { ch =>
      if (ch == '[') depth += 1
      else if (ch == ']') depth -= 1
      if (depth < 0)
        throw DslError(s"""Unbalanced "]" in rule "$ruleHeader".""")
    }
    if (depth != 0)
      throw DslError(s"""Unbalanced "[" in rule "$ruleHeader".""")
  }

  /** Every `src[Col]` token must name a source column (`main.gs:204-219`). */
  private def validateColumns(text: String, ruleHeader: String,
      headers: Set[String]): Unit =
    SrcToken.findAllMatchIn(text).foreach { m =>
      val c = m.group(1)
      if (!headers.contains(c))
        throw DslError(
          s"""Column "$c" does not exist in source (rule: "$ruleHeader").""")
    }

  /** Filter expression → Predicate. Split on `||` (only connector),
    * per condition: malformed-operator check, first-match operator
    * detection in priority order, split-on-operator with !=2 parts or
    * no operator → AlwaysFalse (`main.gs:251-289`).
    */
  def parsePredicate(expr: String, ruleHeader: String): Predicate = {
    val disjuncts = splitLiteral(expr, "||").map { raw =>
      val cond = raw.trim
      BadOp.findFirstIn(cond).foreach { bad =>
        throw DslError(s"""Invalid operator "$bad" in "$ruleHeader".""")
      }
      CmpOp.all.find(op => cond.contains(op.symbol)) match {
        case None => AlwaysFalse
        case Some(op) =>
          val parts = splitLiteral(cond, op.symbol)
            .map(p => stripQuotes(p.trim))
          if (parts.length != 2) AlwaysFalse
          else Comparison(op, splitSrcOnly(parts(0)), splitSrcOnly(parts(1)))
      }
    }
    Predicate(disjuncts.toVector)
  }

  /** EXTENDED filter expression (`eval2:`) → [[BoolExpr]] — the
    * opt-in "Advanced expression parser" (see [[Ast.BoolExpr]] for
    * the semantics contract). Recursive descent over a linear token
    * scan; `[...]` spans are opaque (structural characters inside
    * src/self brackets stay literal), `!=` is a comparison operator,
    * not a negation. ALL validation is hoisted here, before any Spark
    * job: unbalanced parentheses, dangling connectors, op-less or
    * mis-arity conditions, and malformed operators are parse errors.
    */
  def parseBoolExpr(expr: String, ruleHeader: String): BoolExpr = {
    sealed trait Tok
    case object TOr extends Tok
    case object TAnd extends Tok
    case object TNot extends Tok
    case object TOpen extends Tok
    case object TClose extends Tok
    final case class TText(s: String) extends Tok

    def err(msg: String): Nothing =
      throw DslError(s"""$msg in rule "$ruleHeader".""")

    val toks = Vector.newBuilder[Tok]
    val buf = new StringBuilder
    def flush(): Unit =
      if (buf.toString.trim.nonEmpty) { toks += TText(buf.toString); buf.clear() }
      else buf.clear()
    var i = 0
    var depth = 0
    while (i < expr.length) {
      val c = expr.charAt(i)
      val next = if (i + 1 < expr.length) expr.charAt(i + 1) else '\u0000'
      if (c == '[') { depth += 1; buf += c; i += 1 }
      else if (c == ']') { depth -= 1; buf += c; i += 1 }
      else if (depth > 0) { buf += c; i += 1 }
      else if (c == '|' && next == '|') { flush(); toks += TOr; i += 2 }
      else if (c == '&' && next == '&') { flush(); toks += TAnd; i += 2 }
      else if (c == '(') { flush(); toks += TOpen; i += 1 }
      else if (c == ')') { flush(); toks += TClose; i += 1 }
      else if (c == '!' && next != '=') { flush(); toks += TNot; i += 1 }
      else { buf += c; i += 1 }
    }
    flush()
    val ts = toks.result()

    var pos = 0
    def peek: Option[Tok] = if (pos < ts.length) Some(ts(pos)) else None

    def parseLeaf(raw: String): BoolExpr = {
      val cond = raw.trim
      BadOp.findFirstIn(cond).foreach { bad =>
        err(s"""Invalid operator "$bad"""")
      }
      CmpOp.all.find(op => cond.contains(op.symbol)) match {
        case None =>
          err(s"""Condition "$cond" has no comparison operator""")
        case Some(op) =>
          val parts = splitLiteral(cond, op.symbol)
            .map(p => stripQuotes(p.trim))
          if (parts.length != 2)
            err(s"""Condition "$cond" must have exactly one """ +
              s""""${op.symbol}"""")
          LeafExpr(
            Comparison(op, splitSrcOnly(parts(0)), splitSrcOnly(parts(1))))
      }
    }
    def parseFactor(): BoolExpr = peek match {
      case Some(TNot) => pos += 1; NotExpr(parseFactor())
      case Some(TOpen) =>
        pos += 1
        val e = parseOr()
        peek match {
          case Some(TClose) => pos += 1; e
          case _            => err("""Missing ")"""")
        }
      case Some(TText(s)) => pos += 1; parseLeaf(s)
      case Some(TClose)   => err("""Unexpected ")"""")
      case _              => err("Expected a condition")
    }
    def parseAnd(): BoolExpr = {
      var e = parseFactor()
      while (peek.contains(TAnd)) { pos += 1; e = AndExpr(e, parseFactor()) }
      e
    }
    def parseOr(): BoolExpr = {
      var e = parseAnd()
      while (peek.contains(TOr)) { pos += 1; e = OrExpr(e, parseAnd()) }
      e
    }
    val out = parseOr()
    if (pos != ts.length) err("Unexpected trailing input")
    out
  }

  /** JS `String.split(sep)` on a literal separator (keeps empties). */
  private def splitLiteral(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var i = s.indexOf(sep, from)
    while (i >= 0) {
      out += s.substring(from, i)
      from = i + sep.length
      i = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.result()
  }

  /** `/^"|"$/g` — strips a leading and a trailing quote independently
    * (`main.gs:284`).
    */
  private def stripQuotes(s: String): String = {
    val a = if (s.startsWith("\"")) s.substring(1) else s
    if (a.endsWith("\"")) a.substring(0, a.length - 1) else a
  }

  /** Template → parts. Filter operands only splice `src[]`
    * (`main.gs:74-77`); `self[...]` text stays literal there.
    */
  private def splitSrcOnly(template: String): Vector[Part] =
    tokenize(template, withSelf = false)

  /** Output-column instructions splice both `src[]` and `self[]`
    * (`main.gs:86-104`).
    */
  def splitParts(template: String): Vector[Part] =
    tokenize(template, withSelf = true)

  private def tokenize(template: String, withSelf: Boolean): Vector[Part] = {
    val token = if (withSelf) new Regex("(src|self)\\[([^\\]]+)\\]")
                else new Regex("(src)\\[([^\\]]+)\\]")
    val parts = Vector.newBuilder[Part]
    var last = 0
    token.findAllMatchIn(template).foreach { m =>
      if (m.start > last) parts += LitPart(template.substring(last, m.start))
      parts += (if (m.group(1) == "src") SrcPart(m.group(2))
                else SelfPart(m.group(2)))
      last = m.end
    }
    if (last < template.length) parts += LitPart(template.substring(last))
    val r = parts.result()
    if (r.isEmpty) Vector(LitPart("")) else r
  }
}
