package graft.plans

import graft.SparkSpec

/** RangeJoinRewrite: the naive BETWEEN-join spelling must plan as the
  * binned equi-join when opted in, stay semantically identical to the
  * nested-loop baseline, and leave every guarded case untouched.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  private val Width = "spark.graft.rangeJoin.binWidth"

  private def withWidth[A](w: String)(f: => A): A = {
    val old = spark.conf.get(Width, "0")
    spark.conf.set(Width, w)
    try f finally spark.conf.set(Width, old)
  }

  private def points = {
    import spark.implicits._
    (0L to 2000L).toDF("v")
  }
  private def intervals = {
    import spark.implicits._
    // covers: plain, overlapping, at-the-end, empty (lo > hi),
    // negative-lo (exercises floor-binning below zero)
    Seq((1L, 10L, 60L), (2L, 55L, 70L), (3L, 1900L, 2200L),
      (4L, 500L, 400L), (5L, -50L, 5L)).toDF("id", "lo", "hi")
  }

  private def naive = {
    import spark.implicits._
    points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
  }

  test("rewrite fires: no nested-loop join, results identical to " +
      "the BNLJ baseline") {
    val base = withWidth("0") {
      val df = naive
      assert(df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "baseline should be BNLJ")
      df.groupBy("id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    withWidth("32") {
      val df = naive
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val got = df.groupBy("id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == base)
      // empty interval (4) matches nothing; negative-lo interval (5)
      // keeps its matches through the below-zero bins
      assert(!got.exists(_._1 == 4L) && got.exists(_._1 == 5L))
    }
  }

  test("strict bounds and extra conjuncts are preserved verbatim") {
    import spark.implicits._
    def q = points.join(intervals,
      $"v" > $"lo" && $"v" < $"hi" && $"id" =!= 2L)
    val base = withWidth("0")(q.count())
    withWidth("32") {
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(q.count() == base)
    }
  }

  test("guards: cross-side equality or non-integral types leave the " +
      "join untouched") {
    import spark.implicits._
    withWidth("32") {
      // equi conjunct -> hash join territory; the rule must not stack
      // a bin key on top (also what makes the rule idempotent)
      val equi = points.withColumn("k", $"v" % 10)
        .join(intervals.withColumn("k", $"id" % 10),
          Seq("k"), "inner").where($"v" >= $"lo" && $"v" <= $"hi")
      assert(!equi.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      // double-typed point column: exact integer binning impossible
      val dp = points.select(($"v" + 0.5).as("vd"))
        .join(intervals, $"vd" >= $"lo" && $"vd" <= $"hi")
      assert(!dp.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      assert(dp.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }
}
