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

  sealed trait FilterRule { def name: String }
  /** `_filter:` rule with `eval:` instruction. */
  final case class EvalFilter(name: String, predicate: Predicate)
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

  final case class RuleSet(
      filters: Vector[FilterRule],
      outputs: Vector[OutputCol]) {
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
