package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ext.RollingHash64
import graft.functions.{BloomContains, DotDouble, KmvDistinct, QuantizeI8, SignBands}

/** Spark extensions entry point: registers the library's native
  * Catalyst expressions as SQL functions. Enable with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or programmatically via `SparkSession.builder.withExtensions`) —
  * the idiomatic installation path for a Spark-native library; the
  * per-session `register(spark)` helpers remain for ad-hoc use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.kmvDistinctBuilder

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (children: Seq[Expression]) => RollingHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotDouble].getName, "dot_double"),
      (children: Seq[Expression]) => DotDouble(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
      (children: Seq[Expression]) => QuantizeI8(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sign_bands"),
      new ExpressionInfo(classOf[SignBands].getName, "sign_bands"),
      (children: Seq[Expression]) =>
        SignBands(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[Expression]) => BloomContains(children(0),
        children(1), children(2), children(3), children(4))))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      kmvDistinctBuilder))
    // Keyless BETWEEN joins → binned equi-joins (opt-in via
    // spark.graft.rangeJoin.binWidth; see plans/RangeJoinRewrite).
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // Native sort-merge as-of join (plans/AsOfJoinPlan): plans the
    // AsOfJoinNode logical operator as AsOfJoinExec.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Left-only filters commute with the as-of join; push them below
    // the custom node so the standard rules can carry them to the
    // scan (custom operators otherwise BLOCK all predicate pushdown).
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
    // Unused payload columns drop below the node too — the
    // references-all contract otherwise forces a wide dimension's
    // every column through the shuffle.
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinColumnPruning)
    // Self-join-vs-own-aggregate → single-scan window (opt-in via
    // spark.graft.aggJoinToWindow; see plans/AggJoinToWindow). Runs
    // post-hoc on the ANALYZED plan — before column pruning makes the
    // join's two copies of the shared subtree structurally diverge.
    ext.injectPostHocResolutionRule(_ => graft.plans.AggJoinToWindow)
  }
}

object GraftExtensions {
  /** SQL builder for `kmv_distinct(col, k)`. The k argument must be
    * collapsed to an Int at registration time (it sizes the
    * aggregate's bounded state), so every malformed call — wrong
    * arity, non-foldable k, NULL, non-numeric, k < 2 — is rejected
    * HERE with a clean AnalysisException naming the function, rather
    * than surfacing as IndexOutOfBounds/ClassCast/NPE from the naive
    * `children(1).eval()` unpack. */
  private[graft] def kmvDistinctBuilder(
      children: Seq[Expression]): Expression = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" -> s"kmv_distinct: $msg"))
    if (children.length != 2)
      fail(s"expects exactly 2 arguments (column, k), got ${children.length}")
    val kExpr = children(1)
    if (!kExpr.foldable)
      fail("k must be a foldable (literal) expression")
    val kVal = kExpr.eval()
    if (kVal == null) fail("k must not be NULL")
    val k = kVal match {
      case n: java.lang.Number =>
        // no silent truncation: intValue() would wrap 2^32+2 to 2
        // and floor 2.9 to 2 — both must be rejected, not resized
        val l = n.longValue()
        if (n.doubleValue() != l)
          fail(s"k must be an integer, got $n")
        if (l < Int.MinValue || l > Int.MaxValue)
          fail(s"k out of Int range: $l")
        l.toInt
      case other => fail(
        s"k must be numeric, got ${other.getClass.getSimpleName}")
    }
    if (k < 2) fail(s"k must be >= 2, got $k")
    KmvDistinct(children(0), k)
  }
}
