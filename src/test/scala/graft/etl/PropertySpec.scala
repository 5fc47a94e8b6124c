package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.etl.dsl.{Ast, Parser}
import graft.functions.GraftFunctions
import graft.sources.Xlsx

/** Property-based tests (SURVEY §5.3): bijectivity, validator
  * round-trips, and a DIFFERENTIAL test of the compiled filter
  * semantics against an independent reimplementation of the
  * reference's `safeEval` contract (written from
  * docs/expression-language.md's documented semantics, not the code).
  *
  * Uses scalacheck generators with deterministic seeded sampling
  * (plain scalatest assertions — the scalatestplus bridge is not on
  * the offline classpath).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("columnLetter/colIndex are inverse over 1..100000") {
    samples(Gen.choose(1, 100000), 500).foreach { i =>
      assert(Xlsx.colIndex(GraftFunctions.columnLetter(i) + "1") == i - 1)
    }
    assert(GraftFunctions.columnLetter(1) == "A")
    assert(GraftFunctions.columnLetter(26) == "Z")
    assert(GraftFunctions.columnLetter(27) == "AA")
    assert(GraftFunctions.columnLetter(703) == "AAA")
  }

  test("delimiter validator agrees with a reference counter") {
    val chars = Gen.listOf(Gen.oneOf('[', ']', 'a', ' ', 'x'))
      .map(_.mkString)
    samples(chars, 300).foreach { s =>
      def refOk: Boolean = {
        var c = 0
        s.foreach { ch =>
          if (ch == '[') c += 1
          else if (ch == ']') { c -= 1; if (c < 0) return false }
        }
        c == 0
      }
      val ours = try { Parser.validateDelimiters(s, "t"); true }
        catch { case _: Ast.DslError => false }
      assert(ours == refOk, s"for '$s'")
    }
  }

  // ---- differential safeEval ----

  /** JS parseFloat on a string per the documented grammar: longest
    * numeric prefix after whitespace trim; NaN if none.
    */
  private def parseFloatJs(s: String): Double = {
    val m = "^[+-]?(Infinity|(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?)".r
      .findFirstIn(s.replaceAll("^\\s+", ""))
    m.map(_.toLowerCase match {
      case "infinity" | "+infinity" => Double.PositiveInfinity
      case "-infinity" => Double.NegativeInfinity
      case t => t.toDouble
    }).getOrElse(Double.NaN)
  }

  private def stripQuotes(s: String): String =
    s.replaceAll("^\"|\"$", "")

  /** Reference `safeEval` semantics: OR over "||" parts; each part:
    * first matching op of == != >= <= > < ; exactly-2-way split else
    * false; quote-strip + trim operands; ==/!= string equality;
    * relations via parseFloat (NaN comparisons false).
    */
  private def refEval(cond: String): Boolean =
    cond.split("\\|\\|", -1).exists { c =>
      Seq("==", "!=", ">=", "<=", ">", "<").find(c.contains) match {
        case None => false
        case Some(op) =>
          val parts = c.split(java.util.regex.Pattern.quote(op), -1)
          if (parts.length != 2) false
          else {
            val l = stripQuotes(parts(0).trim)
            val r = stripQuotes(parts(1).trim)
            op match {
              case "==" => l == r
              case "!=" => l != r
              case _ =>
                val (a, b) = (parseFloatJs(l), parseFloatJs(r))
                if (a.isNaN || b.isNaN) false
                else op match {
                  case ">=" => a >= b
                  case "<=" => a <= b
                  case ">" => a > b
                  case "<" => a < b
                }
            }
          }
      }
    }

  // Benign value pool: no ||/operator chars (the reference's textual
  // splice-injection quirk is a declared divergence, SURVEY §7.5) and
  // no surrounding quotes (ditto: literal-only quote stripping).
  private val values = Seq("10", "10.0", "-3.5", "50%", "1,5", "abc",
    "", " 7 ", "1e2", "Infinity", "-Infinity", "0x10", ".5", "+12",
    "NATION_7", "12abc", "  ", "007")
  private val literals = values ++ Seq("\"10\"", "\"abc\"", "\"\"")
  private val ops = Seq("==", "!=", ">=", "<=", ">", "<")

  private val condGen: Gen[String] = {
    val single = for {
      op <- Gen.oneOf(ops)
      lit <- Gen.oneOf(literals)
      srcLeft <- Gen.oneOf(true, false)
    } yield if (srcLeft) s"src[v] $op $lit" else s"$lit $op src[v]"
    val junk = Gen.oneOf("src[v]", "a==b==c", "noop here")
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(5 -> single, 1 -> junk))
        .map(_.mkString(" || ")))
  }

  test("compiled filter predicate matches the reference safeEval " +
      "semantics on randomized expressions") {
    val s = spark
    import s.implicits._
    val df = values.toDF("v")
    val exprs = samples(condGen, 40)
    exprs.foreach { cond =>
      val expected = values.filter(v =>
        refEval(cond.replace("src[v]", v))).sorted
      val actual = Engine.transform(df,
          Seq("_filter:t" -> s"eval: $cond", "Out" -> "src[v]"))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(actual == expected,
        s"for condition '$cond': spark=$actual ref=$expected")
    }
  }

  // ---- differential eval2 (extended mode) ----

  /** One comparison leaf under the extended contract: the same
    * single-condition semantics as refEval, forced two-valued (a NaN
    * relation is FALSE — so `!` over it is TRUE, never SQL null).
    */
  private def refLeaf(cond: String): Boolean = refEval(cond)

  private sealed trait BT
  private case class BL(cond: String) extends BT
  private case class BAnd(l: BT, r: BT) extends BT
  private case class BOr(l: BT, r: BT) extends BT
  private case class BNot(e: BT) extends BT

  /** Render a tree to eval2 text with the MINIMAL parens the grammar
    * needs (|| child under && gets parens; non-leaf under ! gets
    * parens; associativity needs none — re-parsing may re-associate
    * but evaluates identically), so the differential also exercises
    * precedence-driven parsing, not just fully-parenthesized trees.
    */
  private def renderB(t: BT): String = t match {
    case BL(c) => c
    case BNot(BL(c)) => s"!$c"
    case BNot(e) => s"!(${renderB(e)})"
    case BAnd(l, r) =>
      def part(x: BT) = x match {
        case BOr(_, _) => s"(${renderB(x)})"
        case _         => renderB(x)
      }
      s"${part(l)} && ${part(r)}"
    case BOr(l, r) => s"${renderB(l)} || ${renderB(r)}"
  }

  private def evalB(t: BT, v: String): Boolean = t match {
    case BL(c)      => refLeaf(c.replace("src[v]", v))
    case BNot(e)    => !evalB(e, v)
    case BAnd(l, r) => evalB(l, v) && evalB(r, v)
    case BOr(l, r)  => evalB(l, v) || evalB(r, v)
  }

  private val leafGen: Gen[BT] = for {
    op <- Gen.oneOf(ops)
    lit <- Gen.oneOf(literals)
    srcLeft <- Gen.oneOf(true, false)
  } yield BL(if (srcLeft) s"src[v] $op $lit" else s"$lit $op src[v]")

  private def treeGen(depth: Int): Gen[BT] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) }
        yield BAnd(l, r)),
      2 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) }
        yield BOr(l, r)),
      2 -> treeGen(depth - 1).map(BNot(_)))

  test("compiled eval2 expression tree matches the reference " +
      "two-valued boolean semantics on randomized &&/||/!/paren " +
      "trees (precedence-minimal rendering)") {
    val s = spark
    import s.implicits._
    val df = values.toDF("v")
    samples(treeGen(3), 60).foreach { tree =>
      val text = renderB(tree)
      val expected = values.filter(v => evalB(tree, v)).sorted
      val actual = Engine.transform(df,
          Seq("_filter:t" -> s"eval2: $text", "Out" -> "src[v]"))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(actual == expected,
        s"for expression '$text': spark=$actual ref=$expected")
    }
  }
}
