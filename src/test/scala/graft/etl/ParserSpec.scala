package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.dsl.{Ast, Parser}
import graft.etl.dsl.Ast._

/** Pure (no-Spark) grammar/validation tests against the BNF and the
  * reference's verified edge cases (SURVEY.md §5.1).
  */
class ParserSpec extends AnyFunSuite {
  private val headers = Seq("Name", "Age", "City", "Score", "Pct")

  test("classification: filter / direct / constant / formula / comment") {
    val rs = Parser.parse(Seq(
      "// demographics"   -> "ignored",
      "_filter:adults"    -> "eval: src[Age] >= 18",
      "_filter:note"      -> "anything",
      "Name"              -> "src[Name]",
      "Status"            -> "constant:Active",
      "Doubled"           -> "formula:=src[Score]*2"
    ), headers)
    assert(rs.filters.length == 2)
    assert(rs.filters(0).isInstanceOf[EvalFilter])
    assert(rs.filters(1) == NoopFilter("_filter:note"))
    assert(rs.outputs.map(_.header) == Vector("Name", "Status", "Doubled"))
    assert(rs.outputs(0) == DirectCol("Name", Vector(SrcPart("Name"))))
    assert(rs.outputs(1) == ConstantCol("Status", Vector(LitPart("Active"))))
    assert(rs.outputs(2).isInstanceOf[FormulaCol])
  }

  test("empty col A rows and comments are skipped") {
    val rs = Parser.parse(Seq("" -> "x", "  " -> "y", "//c" -> "z",
      "Keep" -> "v"), headers)
    assert(rs.outputs.map(_.header) == Vector("Keep"))
  }

  test("no output columns → error") {
    val e = intercept[DslError] {
      Parser.parse(Seq("_filter:a" -> "eval: src[Age] > 1"), headers)
    }
    assert(e.message.contains("output columns"))
  }

  test("unknown src column → contextual error") {
    val e = intercept[DslError] {
      Parser.parse(Seq("Bad" -> "src[Nope]"), headers)
    }
    assert(e.message.contains("Nope") && e.message.contains("Bad"))
  }

  test("_join: parses, validates sheet + both key columns, and keys " +
      "resolve SEQUENTIALLY (later sheets' columns invisible to " +
      "earlier join keys)") {
    val sheets = Map("Orders" -> Seq("OrderId", "Total"),
      "Items" -> Seq("ItemId", "OrderRef"))
    val rs = Parser.parse(Seq(
      "_join:Orders" -> "src[Name] == other[OrderId]",
      // second join keys off a column the FIRST join introduced
      "_join:Items" -> "src[OrderId] == other[ItemId]",
      "N" -> "src[Name]", "T" -> "src[Total]", "R" -> "src[OrderRef]"
    ), headers, sheets)
    assert(rs.joins == Vector(
      JoinRule("_join:Orders", "Orders", "Name", "OrderId"),
      JoinRule("_join:Items", "Items", "OrderId", "ItemId")))
    // unknown sheet
    val e1 = intercept[DslError] { Parser.parse(Seq(
      "_join:Nope" -> "src[Name] == other[X]", "N" -> "src[Name]"),
      headers, sheets) }
    assert(e1.message.contains("Nope") && e1.message.contains("Sheet"))
    // malformed instruction (only src[..] == other[..] is a join)
    val e2 = intercept[DslError] { Parser.parse(Seq(
      "_join:Orders" -> "src[Name] >= other[OrderId]",
      "N" -> "src[Name]"), headers, sheets) }
    assert(e2.message.contains("src[Col] == other[Col]"))
    // unknown column on the other sheet
    val e3 = intercept[DslError] { Parser.parse(Seq(
      "_join:Orders" -> "src[Name] == other[Missing]",
      "N" -> "src[Name]"), headers, sheets) }
    assert(e3.message.contains("Missing") &&
      e3.message.contains("Orders"))
    // a join key from a LATER sheet does not resolve
    val e4 = intercept[DslError] { Parser.parse(Seq(
      "_join:Orders" -> "src[ItemId] == other[OrderId]",
      "_join:Items" -> "src[OrderId] == other[ItemId]",
      "N" -> "src[Name]"), headers, sheets) }
    assert(e4.message.contains("ItemId"))
    // non-join rules MAY reference any joined sheet's columns (joins
    // are hoisted) — already proven by rs above; and a joined column
    // in a filter validates too
    Parser.parse(Seq(
      "_join:Orders" -> "src[Name] == other[OrderId]",
      "_filter:t" -> "eval: src[Total] >= 5",
      "N" -> "src[Name]"), headers, sheets)
  }

  test("_type: parses the four cell types, validates column and type " +
      "names") {
    val rs = Parser.parse(Seq(
      "_type:Age" -> "numeric",
      "_type:Name" -> " NONEMPTY ", // case/space-insensitive
      "_type:Score" -> "integer",
      "_type:City" -> "date",
      "N" -> "src[Name]"), headers)
    assert(rs.types.map(_.tpe) == Vector(CellType.Numeric,
      CellType.NonEmpty, CellType.IntegerT, CellType.DateIso))
    val e1 = intercept[DslError] { Parser.parse(Seq(
      "_type:Age" -> "float", "N" -> "src[Name]"), headers) }
    assert(e1.message.contains("float") && e1.message.contains("valid:"))
    val e2 = intercept[DslError] { Parser.parse(Seq(
      "_type:Ghost" -> "numeric", "N" -> "src[Name]"), headers) }
    assert(e2.message.contains("Ghost"))
    // a _type: on a JOINED column is legal (post-join validation)
    Parser.parse(Seq(
      "_join:Orders" -> "src[Name] == other[OrderId]",
      "_type:Total" -> "numeric",
      "N" -> "src[Name]"), headers,
      Map("Orders" -> Seq("OrderId", "Total")))
  }

  test("delimiter imbalance → error (both directions)") {
    intercept[DslError] { Parser.parse(Seq("Bad" -> "src[Name"), headers) }
    intercept[DslError] { Parser.parse(Seq("Bad" -> "src[Name]]"), headers) }
    // balanced nested is fine per the linear counter
    Parser.parse(Seq("Ok" -> "a[[b]]c"), headers)
  }

  test("malformed operators in eval filters → error") {
    Seq("src[Age] === 18", "src[Age] >> 2", "a <=> b").foreach { bad =>
      val e = intercept[DslError] {
        Parser.parse(Seq("_filter:x" -> s"eval: $bad", "K" -> "k"), headers)
      }
      assert(e.message.contains("_filter:x"))
    }
    // `===` in a FORMULA is fine — op validation is eval-path only
    Parser.parse(Seq("F" -> "formula:=A1===2"), headers)
  }

  test("operator priority: == found before >=") {
    val rs = Parser.parse(
      Seq("_filter:x" -> "eval: src[Age]>=1 == src[Name]", "K" -> "k"), headers)
    val EvalFilter(_, p) = rs.filters.head: @unchecked
    val Comparison(op, lhs, _) = p.disjuncts.head: @unchecked
    assert(op == CmpOp.Eq)
    assert(lhs == Vector(SrcPart("Age"), LitPart(">=1")))
  }

  test("op-less and mis-arity conditions compile to AlwaysFalse") {
    val rs = Parser.parse(Seq(
      "_filter:a" -> "eval: no operator here",
      "_filter:b" -> "eval: a==b==c",
      "K" -> "k"), headers)
    val ds = rs.filters.collect { case EvalFilter(_, p) => p.disjuncts }
    assert(ds(0) == Vector(AlwaysFalse))
    assert(ds(1) == Vector(AlwaysFalse))
  }

  test("OR chain splits and quote stripping") {
    val rs = Parser.parse(Seq(
      "_filter:x" -> "eval: src[City] == \"Cali\" || src[Age] >= 18",
      "K" -> "k"), headers)
    val EvalFilter(_, p) = rs.filters.head: @unchecked
    assert(p.disjuncts.length == 2)
    val Comparison(op, _, rhs) = p.disjuncts(0): @unchecked
    assert(op == CmpOp.Eq && rhs == Vector(LitPart("Cali")))
  }

  test("self tokens parse in outputs but stay literal in filters") {
    val rs = Parser.parse(Seq(
      "_filter:x" -> "eval: self[A] == b",
      "F" -> "formula:=self[F2]&src[Name]"), headers)
    val EvalFilter(_, p) = rs.filters.head: @unchecked
    val Comparison(_, lhs, _) = p.disjuncts.head: @unchecked
    assert(lhs == Vector(LitPart("self[A]")))
    val f = rs.outputs.head
    assert(f.parts == Vector(LitPart("="), SelfPart("F2"), LitPart("&"),
      SrcPart("Name")))
  }

  test("prefix stripping trims instruction bodies") {
    val rs = Parser.parse(Seq("C" -> "constant:  padded  "), headers)
    assert(rs.outputs.head.parts == Vector(LitPart("padded")))
  }

  test("eval2: extended grammar — precedence ! > && > ||, parens " +
      "group, != stays a comparison operator") {
    def parse(e: String) = Parser.parseBoolExpr(e, "_filter:x")
    // a || b && c associates as a || (b && c)
    val p = parse("src[Age] > 1 || src[Age] < 5 && src[City] == Cali")
    assert(p match {
      case OrExpr(LeafExpr(_), AndExpr(LeafExpr(_), LeafExpr(_))) => true
      case _ => false
    }, p)
    // (a || b) && c overrides it
    val q = parse("(src[Age] > 1 || src[Age] < 5) && src[City] == Cali")
    assert(q match {
      case AndExpr(OrExpr(LeafExpr(_), LeafExpr(_)), LeafExpr(_)) => true
      case _ => false
    }, q)
    // ! binds tighter than && and != is NOT a negation
    val r = parse("!(src[City] == Cali) && src[Name] != Bob")
    assert(r match {
      case AndExpr(NotExpr(LeafExpr(_)),
        LeafExpr(Comparison(CmpOp.Ne, _, _))) => true
      case _ => false
    }, r)
    // structural chars inside src[] brackets stay literal
    val s = parse("src[Weird(col)!] == x")
    assert(s match {
      case LeafExpr(Comparison(CmpOp.Eq,
        Vector(SrcPart("Weird(col)!")), _)) => true
      case _ => false
    }, s)
  }

  test("eval2: strict parse-time validation — unbalanced parens, " +
      "dangling connectors, op-less / mis-arity / malformed leaves") {
    def bad(e: String): String =
      intercept[DslError](Parser.parseBoolExpr(e, "_filter:x")).message
    assert(bad("(src[Age] > 1").contains("Missing \")\""))
    assert(bad("src[Age] > 1)").contains("trailing"))
    assert(bad("src[Age] > 1 &&").contains("Expected a condition"))
    assert(bad("|| src[Age] > 1").contains("no comparison operator")
      || bad("|| src[Age] > 1").contains("Expected a condition"))
    assert(bad("src[Age]").contains("no comparison operator"))
    assert(bad("a == b == c").contains("exactly one"))
    assert(bad("src[Age] === 1").contains("Invalid operator"))
    assert(bad("!src[Age]").contains("no comparison operator"))
    assert(bad("()").contains("Unexpected \")\"")
      || bad("()").contains("Expected a condition"))
  }

  test("faithful eval: is UNTOUCHED by the extended grammar — && in " +
      "an eval: condition still splits to mis-arity AlwaysFalse") {
    val rs = Parser.parse(Seq(
      "_filter:f" -> "eval: src[Age] == 1 && src[City] == Cali",
      "N" -> "src[Name]"), headers)
    val EvalFilter(_, p) = rs.filters.head: @unchecked
    // one disjunct; '==' found first; split on '==' gives 3 parts
    assert(p.disjuncts == Vector(AlwaysFalse))
  }

  test("_plugin: args are opaque — brackets and src[]-looking text " +
      "skip delimiter/column validation; plugin NAME still validated") {
    val rs = Parser.parse(Seq(
      "_plugin:p" -> "ranges=[1,5) and src[NotAColumn] [[",
      "Name" -> "src[Name]"), headers, plugins = Set("p"))
    assert(rs.plugins ==
      Vector(PluginRule("_plugin:p", "p", "ranges=[1,5) and src[NotAColumn] [[")))
    intercept[DslError] {
      Parser.parse(Seq("_plugin:ghost" -> "", "N" -> "src[Name]"),
        headers, plugins = Set("p"))
    }
  }
}

class ColumnLetterSpec extends AnyFunSuite {
  import graft.functions.GraftFunctions.columnLetter
  test("bijective base-26 (verified reference values)") {
    assert(columnLetter(1) == "A")
    assert(columnLetter(26) == "Z")
    assert(columnLetter(27) == "AA")
    assert(columnLetter(52) == "AZ")
    assert(columnLetter(703) == "AAA")
  }
  test("round-trip 1..2000") {
    def decode(s: String): Int = s.foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1))
    (1 to 2000).foreach(i => assert(decode(columnLetter(i)) == i))
  }
}
