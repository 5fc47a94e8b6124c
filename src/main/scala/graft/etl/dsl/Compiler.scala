package graft.etl.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import Ast._
import graft.functions.GraftFunctions._

/** RuleSet → Catalyst `Column`s.
  *
  * The reference evaluates rules by per-row string substitution
  * (`/root/reference/main.gs:67-119`) — O(rows × rules × headers)
  * string ops. Here substitution happens ONCE, at compile time, in the
  * expression tree; Catalyst then gets a fully declarative plan
  * (predicate pushdown, column pruning, constant folding, whole-stage
  * codegen all apply). No UDFs anywhere.
  *
  * Declared divergences from the reference (SURVEY.md §7.5): cell-value
  * text injection into predicates and DIRECT re-resolution of values
  * that happen to equal header names are NOT reproduced — `src[X]`
  * compiles to `col(X)` directly.
  */
object Compiler {

  final case class Compiled(
      filter: Column,
      /** Projections; apply AFTER `filter`. */
      projections: Vector[Column],
      /** True if projections reference `rowNum` (self[] addressing). */
      usesRowNum: Boolean)

  /** @param rowNum 1-based POST-FILTER row position (the reference's
    *               `finalData.length + 1`); A1 addresses add 1 more for
    *               the header row (`main.gs:69`). Only evaluated when
    *               the rule set uses `self[]`.
    */
  def compile(rules: RuleSet, sourceHeaders: Seq[String],
      rowNum: => Column): Compiled = {
    val headers = sourceHeaders.toSet
    val filter = rules.filters.collect {
        case EvalFilter(_, p) => compilePredicate(p)
        case ExprFilter(_, e) => compileBoolExpr(e)
      }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

    val usesSelf = rules.usesSelf
    lazy val a1Row = (rowNum + lit(1)).cast("string")

    // Left-to-right visibility: each column records its A1 column
    // letter under its header AFTER compiling (so self[] sees only
    // earlier columns; duplicate headers — latest earlier wins;
    // unresolved self[X] stays literal text). main.gs:100-116.
    var refs = Map.empty[String, String]
    val projections = rules.outputs.zipWithIndex.map { case (oc, idx) =>
      val c = compileOutput(oc, headers, refs, a1Row).as(oc.header)
      refs += oc.header -> columnLetter(idx + 1)
      c
    }
    Compiled(filter, projections, usesSelf)
  }

  private def compilePredicate(p: Predicate): Column =
    p.disjuncts.map {
      case AlwaysFalse       => lit(false)
      case c: Comparison     => compileComparison(c)
    }.reduceOption(_ || _).getOrElse(lit(false))

  private def compileComparison(c: Comparison): Column = {
    // The reference trims each operand AFTER substitution
    // (`safeEval` splits, then trims the spliced text), so cell
    // values compare whitespace-trimmed. parseFloat is trim-
    // insensitive; ==/!= are not — trim both uniformly.
    val (l, r) = (trim(operand(c.lhs)), trim(operand(c.rhs)))
    c.op match {
      case CmpOp.Eq => l === r
      case CmpOp.Ne => l =!= r
      // parseFloat both sides; null (≙ NaN) propagates and the
      // filter drops it — matching JS NaN-comparisons-are-false.
      case CmpOp.Ge => parseFloatPrefix(l) >= parseFloatPrefix(r)
      case CmpOp.Le => parseFloatPrefix(l) <= parseFloatPrefix(r)
      case CmpOp.Gt => parseFloatPrefix(l) > parseFloatPrefix(r)
      case CmpOp.Lt => parseFloatPrefix(l) < parseFloatPrefix(r)
    }
  }

  /** Extended-mode tree → Column. Leaves are forced two-valued
    * (coalesce to false) so `!` over an unevaluable comparison is
    * TRUE, like a JS `!(NaN > 5)` — SQL three-valued null under NOT
    * would silently drop the row instead (see [[Ast.BoolExpr]]).
    */
  private def compileBoolExpr(e: BoolExpr): Column = e match {
    case OrExpr(l, r)  => compileBoolExpr(l) || compileBoolExpr(r)
    case AndExpr(l, r) => compileBoolExpr(l) && compileBoolExpr(r)
    case NotExpr(x)    => !compileBoolExpr(x)
    case LeafExpr(c)   => coalesce(compileComparison(c), lit(false))
  }

  /** Filter operand template → string Column. Source columns arrive
    * from the display-string frame (never null there, but coalesce
    * defensively so callers can pass typed frames too).
    */
  private def operand(parts: Vector[Part]): Column =
    concatParts(parts.map {
      case LitPart(t)  => lit(t)
      case SrcPart(c)  => srcValue(c)
      case SelfPart(c) => lit(s"self[$c]") // not spliced in filters
    })

  private def srcValue(name: String): Column =
    coalesce(col(s"`$name`").cast("string"), lit(""))

  private def concatParts(cols: Seq[Column]): Column =
    if (cols.isEmpty) lit("") else if (cols.size == 1) cols.head
    else concat(cols: _*)

  private def compileOutput(oc: OutputCol, headers: Set[String],
      refs: Map[String, String], a1Row: => Column): Column = oc match {
    case DirectCol(_, parts) =>
      parts match {
        // `Name -> src[Name]`: substituted value, header re-lookup
        // usually misses → the value itself (main.gs:109-111).
        case Vector(SrcPart(c)) => srcValue(c)
        // bare header name: resolves to that source column.
        case Vector(LitPart(t)) if headers.contains(t) => srcValue(t)
        // anything else: spliced text passes through as a literal.
        case _ => spliceOutput(parts, refs, a1Row, quote = false)
      }
    case ConstantCol(_, parts) => spliceOutput(parts, refs, a1Row, quote = false)
    case FormulaCol(_, parts)  => spliceOutput(parts, refs, a1Row, quote = true)
  }

  private def spliceOutput(parts: Vector[Part], refs: Map[String, String],
      a1Row: => Column, quote: Boolean): Column =
    concatParts(parts.map {
      case LitPart(t) => lit(t)
      case SrcPart(c) =>
        if (quote) quoteIfNonNumeric(srcValue(c)) else srcValue(c)
      case SelfPart(c) =>
        refs.get(c) match {
          case Some(letter) => concat(lit(letter), a1Row)
          case None         => lit(s"self[$c]") // unresolved: literal
        }
    })
}
