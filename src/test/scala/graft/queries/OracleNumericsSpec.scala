package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Enforces docs/HASH_NUMERICS.md: no engine-discretionary
  * double→DECIMAL cast may sit in an oracle's hash path. Three
  * rounds shipped a driver-only red from exactly that seam (r5
  * `sim_quantize`, r7 `text_lm_score`, r9 `profile_embeddings`), so
  * the rule is now mechanical: every `AS DECIMAL` in the oracle
  * corpus must cast either a stored fixed-point column / literal
  * (form 5 — one possible answer in any engine) or appear in one of
  * the two documented intermediate-only exceptions whose output
  * passes a ≥6-order-margin final rounding before being hashed.
  */
class OracleNumericsSpec extends AnyFunSuite {

  /** Stored 2dp money columns + integer literals: a decimal cast of
    * these terminates well inside double precision, so the cast has
    * one possible result in any engine (HASH_NUMERICS.md form 5).
    */
  private val storedFixedPoint = Set(
    "l_quantity", "l_extendedprice", "l_discount", "o_totalprice",
    "c_acctbal", "p_retailprice", "value", "0", "1")

  /** Intermediate-only decimal quantization with a documented
    * absorption margin (HASH_NUMERICS.md "Documented exceptions").
    */
  private val exemptQueries = Set("agg_udaf", "graph_pagerank")

  private val castRe =
    """(?is)CAST\s*\(\s*([A-Za-z0-9_.]+)\s+AS\s+DECIMAL""".r

  test("every AS DECIMAL in oracleSql casts a stored fixed-point " +
    "value, or the query is a documented exception") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) if exemptQueries(q) => Nil
      case (q, sql) =>
        // Two shapes are checkable mechanically: CAST(<simple token>
        // AS DECIMAL ...) where the token names the cast source, and
        // CAST(<anything else> AS DECIMAL ...) which by construction
        // casts a computed expression. Simple tokens are vetted
        // against the stored-fixed-point set (strip any table
        // qualifier); computed expressions are flat violations.
        val simpleOk = castRe.findAllMatchIn(sql).forall { m =>
          storedFixedPoint(m.group(1).split('.').last.toLowerCase)
        }
        val decimalCount = """(?i)AS\s+DECIMAL""".r
          .findAllMatchIn(sql).size
        val simpleCount = castRe.findAllMatchIn(sql).size
        if (simpleOk && decimalCount == simpleCount) Nil
        else Seq(q)
    }
    assert(bad.isEmpty,
      s"oracles with a non-whitelisted DECIMAL cast (see " +
        s"docs/HASH_NUMERICS.md): ${bad.mkString(", ")}")
  }

  test("no oracle hashes a bare SUM over BIGINT without re-pinning " +
    "BIGINT or feeding a double conversion (HUGEINT type-tag seam)") {
    // Smoke-level: profile_embeddings (the r10 fix) must carry the
    // BIGINT re-pin around its micro-unit SUM.
    val sql = SparkEntry.oracleSql("profile_embeddings")
    assert(sql.contains("FLOOR(n2 * 1000000.0)"),
      "profile_embeddings must quantize via floor micro-units")
    assert("""(?is)CAST\s*\(\s*SUM\s*\(\s*CAST\s*\(\s*FLOOR""".r
      .findFirstIn(sql).isDefined,
      "micro-unit SUM must be re-pinned to BIGINT for the hasher")
    assert(!sql.toUpperCase.contains("DECIMAL"),
      "profile_embeddings must not contain any DECIMAL cast")
  }
}
