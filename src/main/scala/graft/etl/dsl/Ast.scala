package graft.etl.dsl

/** Compiled rule ADTs for the mapping DSL.
  *
  * Grammar and semantics per the reference
  * (`/root/reference/docs/expression-language.md:64-167`,
  * `/root/reference/main.gs:186-289`). The reference re-substitutes and
  * re-parses rule text per ROW; we parse once into these ADTs and
  * compile once into Catalyst `Column`s — the per-row work is then
  * whole-stage-codegen'd by Spark.
  */
object Ast {

  /** A fragment of an instruction template. `src[Col]` / `self[Col]`
    * tokens become refs; everything else stays literal text.
    */
  sealed trait Part
  final case class LitPart(text: String) extends Part
  final case class SrcPart(column: String) extends Part
  final case class SelfPart(column: String) extends Part

  /** Comparison operators, in the reference's detection priority order
    * (`main.gs:273-280` — first `includes()` match wins).
    */
  sealed abstract class CmpOp(val symbol: String)
  object CmpOp {
    case object Eq extends CmpOp("==")
    case object Ne extends CmpOp("!=")
    case object Ge extends CmpOp(">=")
    case object Le extends CmpOp("<=")
    case object Gt extends CmpOp(">")
    case object Lt extends CmpOp("<")
    /** Priority order used by `find` in the reference. */
    val all: Vector[CmpOp] = Vector(Eq, Ne, Ge, Le, Gt, Lt)
  }

  /** One `||`-disjunct of a filter expression. */
  sealed trait Condition
  /** Op-less or mis-arity condition (`a==b==c`): evaluates to `false`
    * without error (`main.gs:282,286`).
    */
  case object AlwaysFalse extends Condition
  /** `lhs op rhs`; operands are templates whose `src[]` refs resolve to
    * row values. `==`/`!=` compare as strings; `>= <= > <` compare JS
    * `parseFloat` prefixes (`main.gs:251-258`).
    */
  final case class Comparison(op: CmpOp, lhs: Vector[Part], rhs: Vector[Part])
      extends Condition

  /** OR-chain over conditions — `||` is the only connector
    * (`main.gs:261-263`).
    */
  final case class Predicate(disjuncts: Vector[Condition])

  /** EXTENDED-mode (`eval2:`) boolean expression tree — the
    * reference's "Advanced expression parser" roadmap idea
    * (`/root/reference/README.md:121`; its grammar doc explicitly
    * leaves AND / NOT / parentheses undefined,
    * `docs/expression-language.md:169-183`, so these semantics are
    * this engine's, OPT-IN per rule). Precedence `!` > `&&` > `||`,
    * parentheses group. Leaves are the same comparisons as faithful
    * mode with two differences: (1) validation is STRICT at parse
    * time — an op-less or mis-arity condition is an error, not a
    * silent AlwaysFalse; (2) a comparison that cannot evaluate
    * numerically (parseFloat NaN) is two-valued FALSE, so `!` over it
    * is TRUE (JS boolean semantics), never SQL null. `( ) !` and the
    * connectors are RESERVED characters in extended mode (outside
    * `src[]`/`self[]` brackets) — literal text needing them stays on
    * faithful `eval:`.
    */
  sealed trait BoolExpr
  final case class OrExpr(l: BoolExpr, r: BoolExpr) extends BoolExpr
  final case class AndExpr(l: BoolExpr, r: BoolExpr) extends BoolExpr
  final case class NotExpr(e: BoolExpr) extends BoolExpr
  final case class LeafExpr(cond: Comparison) extends BoolExpr

  sealed trait FilterRule { def name: String }
  /** `_filter:` rule with `eval:` instruction. */
  final case class EvalFilter(name: String, predicate: Predicate)
      extends FilterRule
  /** `_filter:` rule with `eval2:` instruction ([[BoolExpr]]). */
  final case class ExprFilter(name: String, expr: BoolExpr)
      extends FilterRule
  /** `_filter:` rule WITHOUT `eval:` — silently passes every row
    * (`main.gs:72`).
    */
  final case class NoopFilter(name: String) extends FilterRule

  sealed trait OutputCol { def header: String; def parts: Vector[Part] }
  /** No prefix: post-substitution instruction is looked up in the
    * source headers — a header name maps to that column, anything else
    * passes through as a literal (`main.gs:109-111`).
    */
  final case class DirectCol(header: String, parts: Vector[Part])
      extends OutputCol
  /** `constant:` — the literal instruction text (src/self splices still
    * apply, `main.gs:107-108,231-233`).
    */
  final case class ConstantCol(header: String, parts: Vector[Part])
      extends OutputCol
  /** `formula:` — spreadsheet formula TEXT; `src[]` splices the value
    * quoted-iff-non-numeric, `self[]` splices the A1 address of an
    * earlier output column in the same (post-filter) output row
    * (`main.gs:234-237,86-116`).
    */
  final case class FormulaCol(header: String, parts: Vector[Part])
      extends OutputCol

  /** `_join:Sheet` rule (reference roadmap "Multi-sheet joins",
    * `/root/reference/README.md:122` — never implemented there; the
    * semantics here are this engine's): instruction
    * `src[Col] == other[Col]` equi-joins the named sheet (inner, on
    * display-string equality) BEFORE filters and projections run.
    * The joined sheet's columns become addressable as `src[...]` in
    * every later rule; a name collision shadows the earlier column
    * (the displayString last-wins convention). Join KEYS resolve
    * sequentially — join i may reference the source and sheets joined
    * by rules 1..i-1 only.
    */
  final case class JoinRule(header: String, sheet: String,
      srcCol: String, otherCol: String)

  /** Cell types a `_type:` rule can declare (reference roadmap "Type
    * validation", `/root/reference/README.md:123` — never implemented
    * there; semantics defined here). All checks run on the TRIMMED
    * display string; a blank cell passes every type except `nonempty`
    * (spreadsheet blanks are ubiquitous — emptiness is its own check).
    */
  sealed abstract class CellType(val name: String)
  object CellType {
    /** Full-string decimal number (unlike the filter operators'
      * parseFloat PREFIX coercion: "123%" compares as 123 in a filter
      * but is NOT `numeric`). */
    case object Numeric extends CellType("numeric")
    /** Optional sign + digits only. */
    case object IntegerT extends CellType("integer")
    /** ISO calendar date, yyyy-MM-dd, validity-checked. */
    case object DateIso extends CellType("date")
    /** At least one non-whitespace character. */
    case object NonEmpty extends CellType("nonempty")
    val all: Vector[CellType] = Vector(Numeric, IntegerT, DateIso, NonEmpty)
    val byName: Map[String, CellType] = all.map(t => t.name -> t).toMap
  }

  /** `_type:Col` rule: instruction names a [[CellType]]; one
    * validation pass over the post-join, pre-filter frame fail-fasts
    * the run with a contextual error (violation count + an example
    * value) when any cell breaks the declaration.
    */
  final case class TypeRule(header: String, column: String,
      tpe: CellType)

  /** `_plugin:name` rule (reference roadmap "Plugin transformation
    * system", `/root/reference/README.md:126` — never implemented
    * there; semantics defined here): the instruction text is passed
    * verbatim as the plugin's argument. Plugins are whole-sheet row
    * transforms registered on the engine ([[graft.etl.Engine
    * .registerPlugin]]); they run AFTER `_join:` rules and BEFORE
    * `_type:` checks and filters, in rule order, and MUST preserve
    * the sheet's column layout (enforced at run time) so parse-time
    * `src[]` validation stays sound.
    */
  final case class PluginRule(header: String, name: String,
      args: String)

  final case class RuleSet(
      filters: Vector[FilterRule],
      outputs: Vector[OutputCol],
      joins: Vector[JoinRule] = Vector.empty,
      types: Vector[TypeRule] = Vector.empty,
      plugins: Vector[PluginRule] = Vector.empty) {
    /** Self-references force per-row output addressing (a row-number
      * over ingest order). Pure filter+project rule sets skip it and
      * stay embarrassingly parallel — the 100 TB path.
      */
    def usesSelf: Boolean = outputs.exists(_.parts.exists {
      case SelfPart(_) => true
      case _           => false
    })
  }

  /** Typed DSL error matching the reference's fail-fast, contextual
    * messages (`docs/expression-language.md:285-292`).
    */
  final case class DslError(message: String) extends Exception(message)
}
