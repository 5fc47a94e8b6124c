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

  test("auto width: rewrite fires with a derived width, results " +
      "identical to the BNLJ baseline") {
    val base = withWidth("0")(naive.groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    withWidth("auto") {
      val df = naive
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "auto mode must derive a width and bin the join")
      val got = df.groupBy("id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == base)
    }
  }

  test("auto width is sane on skewed interval lengths: p90 ignores " +
      "the one huge interval") {
    import spark.implicits._
    // 99 intervals of length ~20, one of length 60000 (3000 bins at
    // the p90 width — inside the 4096 cap): a width picked from the
    // MEAN or MAX would be >600 and unselective; p90 must land near
    // the typical length.
    val skewed = ((1L to 99L).map(i => (i, i * 10, i * 10 + 19)) :+
      (100L, 0L, 59999L)).toDF("id", "lo", "hi")
    def q = points.join(skewed, $"v" >= $"lo" && $"v" <= $"hi")
    val base = withWidth("0")(q.count())
    withWidth("auto") {
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      // the chosen width is visible as the bin divisor in the plan
      val widths = "div (\\d+)".r
        .findAllMatchIn(q.queryExecution.optimizedPlan.toString)
        .map(_.group(1).toLong).toSet
      assert(widths.nonEmpty && widths.forall(w => w >= 10 && w <= 200),
        s"derived width should track the p90 (~20), got $widths")
      assert(q.count() == base)
    }
  }

  test("auto width declines on open-end sentinel intervals instead " +
      "of exploding Sequence at runtime") {
    import spark.implicits._
    val sentinel = Seq((1L, 10L, 60L), (2L, 0L, Long.MaxValue))
      .toDF("id", "lo", "hi")
    def q = points.join(sentinel, $"v" >= $"lo" && $"v" <= $"hi")
    withWidth("auto") {
      // widest interval spans ~2^63 bins at any sane width: the rule
      // must leave the nested-loop plan (correct, just unbinned) —
      // never a plan that throws "too long sequence" mid-query
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(q.count() == 2001 + 51) // all points + [10,60]
    }
  }

  test("malformed width disables the rewrite instead of failing " +
      "every query in the session") {
    withWidth("not-a-number") {
      assert(naive.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(naive.count() > 0)
    }
  }

  test("binning is overflow-safe at the bottom of the long range") {
    import spark.implicits._
    // v within w of Long.MinValue: the old `(v - pmod(v, w)) div w`
    // arithmetic wrapped (or threw under ANSI) and mis-binned
    val extremes = Seq(Long.MinValue, Long.MinValue + 1,
      Long.MinValue + 31, -1L, 0L, Long.MaxValue).toDF("v")
    val iv = Seq((1L, Long.MinValue, Long.MinValue + 100L),
      (2L, -10L, 10L)).toDF("id", "lo", "hi")
    def q = extremes.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val base = withWidth("0")(
      q.select("v", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    withWidth("32") {
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val got = q.select("v", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == base, s"got $got, want $base")
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

  private def ivA = {
    import spark.implicits._
    // plain, wide, degenerate, INVERTED (raw overlap predicate can
    // still match inverted rows — the rewrite must preserve that),
    // negative
    Seq((1L, 10L, 60L), (2L, -500L, 500L), (3L, 100L, 100L),
      (4L, 80L, 20L), (5L, -90L, -40L)).toDF("a_id", "a_lo", "a_hi")
  }
  private def ivB = {
    import spark.implicits._
    Seq((10L, 55L, 70L), (11L, 100L, 150L), (12L, -60L, -50L),
      (13L, 30L, 75L), (14L, 200L, 100L)).toDF("b_id", "b_lo", "b_hi")
  }
  private def naiveOverlap = {
    import spark.implicits._
    ivA.join(ivB, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
  }

  test("overlap rewrite fires: naive interval×interval join loses " +
      "its nested loop, results identical incl. inverted intervals") {
    val base = withWidth("0") {
      val df = naiveOverlap
      assert(df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "baseline should be BNLJ")
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    // the inverted b=(200,100) raw-matches the wide a=(-500,500):
    // -500<=100 && 200<=500 — the fixture must exercise exactly the
    // case where normalizing semantics (instead of spans) would lose
    // a pair
    assert(base.contains((2L, 14L)),
      "fixture must exercise an inverted-interval raw match")
    withWidth("32") {
      val df = naiveOverlap
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(df.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"), "fixed width should bin")
      val got = df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == base, s"got $got, want $base")
      // exactly-once: no pair duplicated across shared bins
      assert(got.distinct.size == got.size)
    }
  }

  test("overlap rewrite in auto mode: width derives from both " +
      "interval sides once the span can distribute") {
    import spark.implicits._
    // the crafted corners alone span too few buckets relative to the
    // p90 length — auto correctly declines there (the distribute
    // guard); spreading each side over a wide axis lets it fire
    val spreadA = (0 until 100).map(i =>
      (1000L + i, i * 100L, i * 100L + 50L)).toDF("a_id", "a_lo", "a_hi")
    val spreadB = (0 until 100).map(i =>
      (2000L + i, i * 100L + 25L, i * 100L + 80L))
      .toDF("b_id", "b_lo", "b_hi")
    val a = ivA.union(spreadA)
    val b = ivB.union(spreadB)
    def q = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
    val base = withWidth("0") {
      q.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    withWidth("auto") {
      val df = q
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "auto should fire")
      val got = df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == base)
      assert(got.distinct.size == got.size)
    }
  }

  test("overlap rewrite keeps extra conjuncts and strict bounds " +
      "verbatim") {
    import spark.implicits._
    def q = ivA.join(ivB,
      $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi" && $"b_id" =!= 13L)
    val base = withWidth("0") {
      q.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    withWidth("16") {
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val got = q.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == base, s"got $got, want $base")
    }
  }
}
