package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** plans/AggJoinToWindow: the self-join-vs-own-aggregate → window
  * rewrite — equivalence, null-key corner, plan shape, bail-outs. */
class AggJoinToWindowSpec extends SparkSpec {

  private def naive(df: DataFrame): DataFrame = {
    val agg = df.groupBy("k").agg(count(lit(1)).as("n"),
      sum("v").as("s"), avg("v").as("a"), min("v").as("mn"),
      max("v").as("mx"))
    df.join(agg, "k")
  }

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.aggJoinToWindow", on.toString)
    try body finally
      spark.conf.set("spark.graft.aggJoinToWindow", "true")
  }

  private def fixture: DataFrame = {
    val s = spark
    import s.implicits._
    Seq((Some(1L), 10L), (Some(1L), 20L), (Some(2L), 5L),
      (None, 99L), (Some(3L), 7L)).toDF("k", "v")
  }

  test("rewrite fires: no Join in the plan, exactly one scan, one " +
      "Window — and the result matches the un-rewritten join") {
    val on = withRule(true)(naive(fixture))
    val p = on.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    val got = on.collect().map(_.toSeq).map(_.toString).sorted
    val off = withRule(false) {
      val d = naive(fixture)
      val pOff = d.queryExecution.executedPlan.toString
      assert(pOff.contains("Join"), "control plan must keep the join")
      d.collect().map(_.toSeq).map(_.toString).sorted
    }
    assert(got.sameElements(off),
      s"rewrite changed results:\n${got.mkString("\n")}\nvs\n${off.mkString("\n")}")
  }

  test("null group keys: dropped by the rewrite exactly as the inner " +
      "join drops them") {
    val on = withRule(true)(naive(fixture)).collect()
    assert(on.length == 4, "null-key row must not survive")
    assert(on.forall(!_.isNullAt(0)))
  }

  test("one scan at the file-source level (join_agg_auto at sf0.001)") {
    val df = graft.SparkEntry.queries("join_agg_auto")(spark,
      "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans")
  }

  test("seeded-random differential: rule on == rule off, with null " +
      "keys, duplicate rows, and multi-column group keys") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 6)) {
      val rnd = new scala.util.Random(seed)
      val df = Seq.fill(400)((
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(6).toLong),
        rnd.nextInt(3).toLong, rnd.nextInt(100).toLong))
        .toDF("k", "k2", "v")
      def q = {
        val agg = df.groupBy("k", "k2").agg(sum("v").as("s"),
          max("v").as("mx"), count(lit(1)).as("n"))
        df.join(agg, Seq("k", "k2")).filter(col("v") * col("n") >= col("s"))
      }
      val on = withRule(true) {
        val d = q
        assert(!d.queryExecution.executedPlan.toString.contains("Join"),
          "multi-key rewrite must fire")
        d.collect().map(_.toSeq.toString).sorted
      }
      val off = withRule(false)(q.collect().map(_.toSeq.toString).sorted)
      assert(on.sameElements(off), s"seed $seed diverged")
    }
  }

  test("bails out: DISTINCT aggregate, outer join, extra join " +
      "conjunct, structurally different subtrees") {
    val s = spark
    import s.implicits._
    val df = fixture
    val other = Seq((Some(1L), 1L)).toDF("k", "v")

    val distinctAgg = df.join(
      df.groupBy("k").agg(countDistinct("v").as("n")), "k")
    assert(distinctAgg.queryExecution.executedPlan.toString
      .contains("Join"), "DISTINCT agg must not rewrite")

    val outer = df.join(df.groupBy("k").agg(count(lit(1)).as("n")),
      Seq("k"), "left")
    assert(outer.queryExecution.executedPlan.toString.contains("Join"),
      "outer join must not rewrite")

    val agg = df.groupBy("k").agg(count(lit(1)).as("n"))
    val extra = df.join(agg,
      df("k") === agg("k") && df("v") > agg("n"))
    assert(extra.queryExecution.executedPlan.toString.contains("Join"),
      "extra conjunct must not rewrite")

    val diff = df.join(other.groupBy("k").agg(count(lit(1)).as("n")), "k")
    assert(diff.queryExecution.executedPlan.toString.contains("Join"),
      "different subtree must not rewrite")
  }

  test("bails out: non-deterministic shared subtree (rand()) — the " +
      "naive plan's two scans see different rows, so collapsing to " +
      "one scan would silently change results") {
    val base = fixture.withColumn("r", rand(42))
    val nd = withRule(true) {
      base.join(base.groupBy("k").agg(sum("r").as("sr")), "k")
    }
    assert(nd.queryExecution.executedPlan.toString.contains("Join"),
      "rand()-bearing subtree must keep the two-scan join")
  }
}
