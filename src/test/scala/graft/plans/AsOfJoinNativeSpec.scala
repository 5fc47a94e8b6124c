package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{AsOfJoin, AsOfJoinNative}

/** The native sort-merge as-of operator (AsOfJoinNode → Strategy →
  * AsOfJoinExec) against the composed union+window implementation and
  * against hand-checked corners. */
class AsOfJoinNativeSpec extends SparkSpec {

  private def run(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    AsOfJoinNative.asofBackward(left, col("k"), col("t"),
      right, col("k"), col("t"),
      Seq("rt" -> col("t"), "rv" -> col("v")))

  test("backward match, inclusive ties, no-match nulls, unseen keys") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (1L, 40L, "c"),
      (2L, 10L, "d"), (3L, 7L, "e")).toDF("k", "t", "pid")
    val right = Seq((1L, 40L, 1.0), (1L, 90L, 2.0), (2L, 150L, 4.0),
      (9L, 1L, 9.9)).toDF("k", "t", "v")
    val got = run(left, right).collect()
      .map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got("a") == (Some(90L), Some(2.0)))  // latest ≤ 100
    assert(got("b") == (Some(40L), Some(1.0)))
    assert(got("c") == (Some(40L), Some(1.0)))  // tie is inclusive
    assert(got("d") == (None, None))            // right exists, later
    assert(got("e") == (None, None))            // key with no rights
  }

  test("equal (key, time) right rows tie-break to the max payload " +
      "tuple — lastEarlier's rule, deterministically") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "pid")
    val right = Seq((1L, 90L, 2.0), (1L, 90L, 7.0), (1L, 90L, 3.0))
      .toDF("k", "t", "v")
    val got = run(left, right).select("rv").head.getDouble(0)
    assert(got == 7.0)
  }

  test("null left key/time rows survive with null payload (left-outer" +
      " row preservation), null right times never match") {
    val s = spark
    import s.implicits._
    val left = Seq((Some(1L), Some(100L), "a"), (None, Some(5L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "pid")
    val right = Seq((Some(1L), Some(90L), 2.0),
      (Some(1L), None, 99.0)).toDF("k", "t", "v")
    val got = run(left, right).collect()
      .map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(got == Map("a" -> Some(2.0), "b" -> None, "c" -> None))
  }

  test("hash-agrees with AsOfJoin.lastEarlier on the sf0.001 events " +
      "attribution (cross-implementation differential)") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val native = AsOfJoinNative.asofBackward(
        purchases, col("user_id"), unix_micros(col("ts")),
        clicks, col("user_id"), unix_micros(col("ts")),
        Seq("click_us" -> unix_micros(col("ts")),
          "click_value" -> col("value")))
      .select(col("event_id"), col("click_us"), col("click_value"))
    val composed = AsOfJoin.lastEarlier(purchases, clicks, "user_id",
        "ts", "ts", Seq("value"))
      .select(col("event_id"), unix_micros(col("asof.ts")).as("click_us"),
        col("asof.value").as("click_value"))
    val n = native.collect().map(_.toSeq).sortBy(_.toString)
    val c = composed.collect().map(_.toSeq).sortBy(_.toString)
    assert(n.length == c.length && n.sameElements(c),
      s"native=${n.length} composed=${c.length}")
  }

  test("forward mode: earliest later match, inclusive boundary, " +
      "min-payload ties, shared match across lefts") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 90L, "b"), (1L, 90L, "b2"),
      (1L, 200L, "c"), (2L, 5L, "d")).toDF("k", "t", "pid")
    val right = Seq((1L, 90L, 5.0), (1L, 90L, 2.0), (1L, 150L, 7.0))
      .toDF("k", "t", "v")
    val got = AsOfJoinNative.asofForward(left, col("k"), col("t"),
        right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got("b") == (Some(90L), Some(2.0)))  // inclusive + min tie
    assert(got("b2") == (Some(90L), Some(2.0))) // same match, reused
    assert(got("a") == (Some(150L), Some(7.0)))
    assert(got("c") == (None, None))            // nothing later
    assert(got("d") == (None, None))            // keyless
  }

  test("forward seeded-random differential vs firstLater") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 12)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.fill(250)((rnd.nextInt(6).toLong,
        rnd.nextInt(30).toLong, rnd.nextInt(1000).toString))
        .toDF("k", "t", "pid")
      // unique (k,t) right rows: firstLater's min-payload tie is on
      // the struct (t, v), matching the exec's (t, payload) sort only
      // when v ties are impossible per instant — dedupe like the
      // fwd-native query does
      val right = Seq.fill(250)((rnd.nextInt(6).toLong,
        rnd.nextInt(30).toLong, rnd.nextInt(5).toDouble))
        .toDF("k", "t", "v").groupBy("k", "t")
        .agg(min("v").as("v")).repartition(7)
      val native = AsOfJoinNative.asofForward(left.repartition(5),
          col("k"), col("t"), right, col("k"), col("t"),
          Seq("rt" -> col("t"), "rv" -> col("v")))
        .select(col("k"), col("t"), col("pid"), col("rt"), col("rv"))
        .collect().map(_.toSeq.toString).sorted
      val composed = AsOfJoin.firstLater(left, right, "k", "t", "t",
          Seq("v"))
        .select(col("k"), col("t"), col("pid"),
          col("asof.t").as("rt"), col("asof.v").as("rv"))
        .collect().map(_.toSeq.toString).sorted
      assert(native.sameElements(composed), s"seed $seed diverged")
    }
  }

  test("nearest mode: min |dt| wins, exact-distance ties go backward, " +
      "one-sided fallbacks, keyless null") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 95L, "tie"), (1L, 10L, "pre"),
      (2L, 50L, "post"), (3L, 1L, "none")).toDF("k", "t", "pid")
    val right = Seq((1L, 90L, 1.0), (1L, 100L, 2.0), (2L, 60L, 3.0))
      .toDF("k", "t", "v")
    val got = AsOfJoinNative.asofNearest(left, col("k"), col("t"),
        right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got("a") == (Some(100L), Some(2.0)))   // dist 0 backward
    assert(got("tie") == (Some(90L), Some(1.0)))  // 5 back vs 5 fwd -> back
    assert(got("pre") == (Some(90L), Some(1.0)))  // only forward exists
    assert(got("post") == (Some(60L), Some(3.0))) // only forward exists
    assert(got("none") == (None, None))
  }

  test("nearest seeded-random differential vs AsOfJoin.nearest") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(21, 22)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.fill(250)((rnd.nextInt(6).toLong,
        rnd.nextInt(30).toLong, rnd.nextInt(1000).toString))
        .toDF("k", "t", "pid")
      val right = Seq.fill(250)((rnd.nextInt(6).toLong,
        rnd.nextInt(30).toLong, rnd.nextInt(5).toDouble))
        .toDF("k", "t", "v").groupBy("k", "t")
        .agg(min("v").as("v")).repartition(7)
      val native = AsOfJoinNative.asofNearest(left.repartition(5),
          col("k"), col("t"), right, col("k"), col("t"),
          Seq("rt" -> col("t"), "rv" -> col("v")))
        .select(col("k"), col("t"), col("pid"), col("rt"), col("rv"))
        .collect().map(_.toSeq.toString).sorted
      val composed = AsOfJoin.nearest(left, right, "k", "t", "t",
          Seq("v"))
        .select(col("k"), col("t"), col("pid"),
          col("asof.t").as("rt"), col("asof.v").as("rv"))
        .collect().map(_.toSeq.toString).sorted
      assert(native.sameElements(composed), s"seed $seed diverged")
    }
  }

  test("seeded-random differential vs lastEarlier: dense keys, heavy " +
      "(key,time) ties, duplicate rows, multi-partition") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // few keys + coarse times => many exact (key,time) collisions
      val left = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(1000).toString))
        .toDF("k", "t", "pid")
      val right = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(5).toDouble))
        .toDF("k", "t", "v").repartition(7)
      val native = run(left.repartition(5), right)
        .select(col("k"), col("t"), col("pid"), col("rt"), col("rv"))
        .collect().map(_.toSeq.toString).sorted
      val composed = AsOfJoin.lastEarlier(left, right, "k", "t", "t",
          Seq("v"))
        .select(col("k"), col("t"), col("pid"),
          col("asof.t").as("rt"), col("asof.v").as("rv"))
        .collect().map(_.toSeq.toString).sorted
      assert(native.sameElements(composed), s"seed $seed diverged")
    }
  }

  test("tolerance: stale matches null out, candidate tracking " +
      "survives for later rows, exact boundary is inclusive") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "in"), (1L, 200L, "out"),
      (1L, 95L, "edge")).toDF("k", "t", "pid")
    val right = Seq((1L, 90L, 1.0)).toDF("k", "t", "v")
    val got = AsOfJoinNative.asofBackwardWithin(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), tolerance = 10L)
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got("in") == (Some(90L), Some(1.0)))   // dt=10, inclusive
    assert(got("edge") == (Some(90L), Some(1.0))) // dt=5
    assert(got("out") == (None, None))            // dt=110, stale
  }

  test("tolerance seeded-random differential vs lastEarlierWithin") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(31, 32)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(1000).toString))
        .toDF("k", "t", "pid")
      val right = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(5).toDouble))
        .toDF("k", "t", "v").repartition(7)
      val native = AsOfJoinNative.asofBackwardWithin(
          left.repartition(5), col("k"), col("t"), right, col("k"),
          col("t"), Seq("rt" -> col("t"), "rv" -> col("v")),
          tolerance = 7L)
        .select(col("k"), col("t"), col("pid"), col("rt"), col("rv"))
        .collect().map(_.toSeq.toString).sorted
      val composed = AsOfJoin.lastEarlierWithin(left, right, "k", "t",
          "t", Seq("v"), tolerance = 7L)
        .select(col("k"), col("t"), col("pid"),
          col("asof.t").as("rt"), col("asof.v").as("rv"))
        .collect().map(_.toSeq.toString).sorted
      assert(native.sameElements(composed), s"seed $seed diverged")
    }
  }

  test("tolerance in forward and nearest modes: forward bound is " +
      "inclusive; nearest filters CANDIDATES, so an out-of-bound " +
      "backward match yields to an in-bound forward one") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "pid")
    // backward candidate at 60 (dt=40, out of bound 20); forward at
    // 115 (dt=15, in bound)
    val right = Seq((1L, 60L, 1.0), (1L, 115L, 2.0)).toDF("k", "t", "v")
    val near = AsOfJoinNative.asofNearestWithin(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), tolerance = 20L)
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(near("a") == (Some(115L), Some(2.0)),
      "stale backward candidate must not shadow in-bound forward")
    val fwd = AsOfJoinNative.asofForwardWithin(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), tolerance = 15L)
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(fwd("a") == Some(115L), "dt=15 at tolerance 15 is inclusive")
    val fwdTight = AsOfJoinNative.asofForwardWithin(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), tolerance = 14L)
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(fwdTight("a") == None, "dt=15 beyond tolerance 14 is null")
  }

  test("null-key divergence is as documented: native never matches a " +
      "null key; lastEarlier's window CAN pair null-key rows") {
    val s = spark
    import s.implicits._
    val left = Seq((Option.empty[Long], Some(100L), "nk"))
      .toDF("k", "t", "pid")
    val right = Seq((Option.empty[Long], Some(90L), 5.0))
      .toDF("k", "t", "v")
    val nat = run(left, right).collect()
      .map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(nat == Map("nk" -> None),
      "native must not match null keys")
    val comp = AsOfJoin.lastEarlier(left, right, "k", "t", "t",
        Seq("v")).select(col("pid"), col("asof.v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(comp == Map("nk" -> Some(5.0)),
      "composition groups null keys into one window partition — if " +
        "this changes, update the AsOfJoinNative doc divergence note")
  }

  test("join_asof_tol_native plan shape: the staleness-bounded query " +
      "runs on the native exec — no window buffer (the one Union is " +
      "the wrapper's null-key leftover re-attach, not a row blow-up)") {
    val df = graft.SparkEntry.queries("join_asof_tol_native")(spark,
      "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("AsOfJoinFilterPushdown: a post-join left-only filter reaches " +
      "the left scan's PushedFilters; results equal pre-filtering") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    def join(left: org.apache.spark.sql.DataFrame) =
      AsOfJoinNative.asofBackward(left, col("user_id"),
        unix_micros(col("ts")), clicks, col("user_id"),
        unix_micros(col("ts")),
        Seq("click_us" -> unix_micros(col("ts")),
          "click_value" -> col("value")))
    val post = join(purchases).filter(col("user_id") < 50)
    val p = post.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("LessThan(user_id,50)"),
      "filter must reach a scan's PushedFilters:\n" + p)
    val pre = join(purchases.filter(col("user_id") < 50))
    val a = post.collect().map(_.toSeq.toString).sorted
    val b = pre.collect().map(_.toSeq.toString).sorted
    assert(a.length > 0 && a.sameElements(b),
      s"pushdown changed results: post=${a.length} pre=${b.length}")
    // right-payload predicates must NOT push (left-outer semantics):
    // filtering on the payload after the join keeps only matched
    // rows, which pre-filtering the right side would NOT reproduce
    val payloadFiltered = join(purchases).filter(col("click_value") > 30)
    val p2 = payloadFiltered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p2.contains("PushedFilters: [IsNotNull(value), GreaterThan(value"),
      "payload filter must stay above the join:\n" + p2)
  }

  test("AsOfJoinColumnPruning: an unused wide payload column vanishes " +
      "from the right scan's ReadSchema; results unchanged, ties " +
      "among kept-identical rows stay deterministic") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_prune")
    val rightPath = s"$dir/right"
    Seq((1L, 90L, 5.0, "z" * 100), (1L, 90L, 5.0, "a" * 100),
      (1L, 80L, 3.0, "w" * 100))
      .toDF("k", "t", "v", "wide").write.parquet(rightPath)
    val left = Seq((1L, 100L, "a"), (1L, 85L, "b")).toDF("k", "t", "pid")
    val joined = AsOfJoinNative.asofBackward(left, col("k"), col("t"),
        s.read.parquet(rightPath), col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v"),
          "rwide" -> col("wide")))
      .select("pid", "rt", "rv") // rwide unused -> must prune
    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val rightScan = "ReadSchema: struct<([^>\\n]*)>".r
      .findAllMatchIn(p).map(_.group(1)).find(_.contains("v:double"))
    assert(rightScan.isDefined, p)
    assert(!rightScan.get.contains("wide"),
      s"unused payload must not be read: ${rightScan.get}")
    val got = joined.collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    // "a" matches the (90, 5.0) tie pair — identical in kept columns,
    // so pruning cannot change the visible pick; "b" matches (80, 3.0)
    assert(got("a") == (90L, 5.0) && got("b") == (80L, 3.0), got.toString)
  }

  test("AsOfJoinColumnPruning tie-safety: an unused payload that " +
      "PRECEDES a kept one is retained (pruning it would flip which " +
      "tie row wins); only the all-unused trailing suffix prunes") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_tie")
    val rightPath = s"$dir/right"
    // equal-(key,time) tie rows that differ in BOTH the dropped and a
    // kept column: under the full sort (t, p1, p2) the max tuple is
    // (5.0, 1.0) -> p2 = 1.0; if p1 were pruned the sort would become
    // (t, p2) and the winner would flip to p2 = 9.0.
    Seq((1L, 90L, 5.0, 1.0, "x"), (1L, 90L, 1.0, 9.0, "y"))
      .toDF("k", "t", "p1", "p2", "tail").write.parquet(rightPath)
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "pid")
    val joined = AsOfJoinNative.asofBackward(left, col("k"), col("t"),
        s.read.parquet(rightPath), col("k"), col("t"),
        Seq("rp1" -> col("p1"), "rp2" -> col("p2"),
          "rtail" -> col("tail")))
      .select("pid", "rp2") // rp1 unused but NON-trailing; rtail unused trailing
    assert(joined.head.getDouble(1) == 1.0,
      "pruning a non-trailing unused payload flipped the tie winner")
    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val rightScan = "ReadSchema: struct<([^>\\n]*)>".r
      .findAllMatchIn(p).map(_.group(1)).find(_.contains("p2:double"))
    assert(rightScan.isDefined, p)
    assert(rightScan.get.contains("p1"),
      s"non-trailing unused payload must stay in the sort: ${rightScan.get}")
    assert(!rightScan.get.contains("tail"),
      s"all-unused trailing suffix must still prune: ${rightScan.get}")
  }

  test("AsOfJoinFilterPushdown mirrors a key-range predicate to the " +
      "RIGHT scan's PushedFilters; results equal pre-filtering") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_mirror")
    (1 to 200).map(i => (i % 100, i.toLong, s"p$i"))
      .toDF("lk", "t", "pid").write.parquet(s"$dir/left")
    (1 to 200).map(i => (i % 100, i.toLong, i * 1.0))
      .toDF("rk", "t", "v").write.parquet(s"$dir/right")
    val leftDf = s.read.parquet(s"$dir/left")
    def join(l: org.apache.spark.sql.DataFrame) =
      AsOfJoinNative.asofBackward(l, col("lk"), col("t"),
        s.read.parquet(s"$dir/right"), col("rk"), col("t"),
        Seq("rv" -> col("v")))
    val post = join(leftDf).filter(col("lk") < 50)
    val p = post.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("LessThan(lk,50)"),
      "left scan must get the pushed filter:\n" + p)
    assert(p.contains("LessThan(rk,50)"),
      "right scan must get the MIRRORED key filter:\n" + p)
    val a = post.collect().map(_.toSeq.toString).sorted
    val b = join(leftDf.filter(col("lk") < 50)).collect()
      .map(_.toSeq.toString).sorted
    assert(a.length > 0 && a.sameElements(b),
      s"mirroring changed results: post=${a.length} pre=${b.length}")
  }

  test("skew posture: a hot probe key lands in ONE partition of the " +
      "hash-clustered exec (custom nodes sit outside AQE skew-split); " +
      "asofSalted spreads it over sub-keys with identical results") {
    val s = spark
    import s.implicits._
    // 20k probes on key 0 (the hot tenant), a 500-row tail over 7 keys
    val left = ((1 to 20000).map(i => (0L, i.toLong, i.toLong)) ++
      (1 to 500).map(i => ((i % 7 + 1).toLong, i.toLong, 100000L + i)))
      .toDF("k", "t", "pid")
    val right = (0L to 7L).flatMap(k => Seq((k, 10L, k * 10 + 1.0),
      (k, 5000L, k * 10 + 2.0))).toDF("k", "t", "v")
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "rt", "rv").collect()
        .map(_.toSeq.toString).sorted.toSeq
    // AQE's partition coalescing would merge these tiny shuffles and
    // mask the clustering we are demonstrating — turn it off here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val unsalted = run(left, right)
      val salted = AsOfJoinNative.asofSalted(left, col("k"), col("t"),
        right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), salts = 8)
      assert(collected(unsalted) == collected(salted),
        "salting must not change any row")
      // demonstrate the skew: per-partition row counts of each plan
      def maxPart(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("p", spark_partition_id()).groupBy("p")
          .count().agg(max("count")).head.getLong(0)
      val hot = maxPart(unsalted)
      val spread = maxPart(salted)
      assert(hot >= 20000L,
        s"hash clustering must pin the hot key to one partition: $hot")
      assert(spread <= hot / 2,
        s"salting must spread the hot key: $spread vs $hot")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("asofTimeSharded seeded-random differential vs the plain exec " +
      "in ALL directions: pre/post-range versions, ties, null keys, " +
      "several shard counts") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1, 2, 3); shards <- Seq(1, 4, 8);
        dir <- Seq("backward", "forward", "nearest")) {
      val rnd = new scala.util.Random(seed)
      // probes in [50, 90); versions in [0, 120) so some fall BEFORE
      // every probe bucket (earlier-carry path incl. the collapsed -1
      // bucket; dropped for forward) and some AFTER the last probe
      // (later-carry for forward/nearest; dropped for backward);
      // coarse values => many exact (key,time) ties exercising both
      // tuple tie rules
      val left = (Seq.fill(250)((Some(rnd.nextInt(6).toLong),
        Some((50 + rnd.nextInt(40)).toLong),
        rnd.nextInt(1000).toString)) :+
        ((None: Option[Long], None: Option[Long], "nullrow")))
        .toDF("k", "t", "pid")
      val right = Seq.fill(400)((rnd.nextInt(6).toLong,
        rnd.nextInt(120).toLong, rnd.nextInt(4).toDouble))
        .toDF("k", "t", "v").repartition(7)
      val payload = Seq("rt" -> col("t"), "rv" -> col("v"))
      val sharded = AsOfJoinNative.asofTimeSharded(
          left.repartition(5), col("k"), col("t"), right, col("k"),
          col("t"), payload, shards, dir)
        .select("pid", "rt", "rv").collect()
        .map(_.toSeq.toString).sorted
      val plainDf = dir match {
        case "backward" => AsOfJoinNative.asofBackward(left, col("k"),
          col("t"), right, col("k"), col("t"), payload)
        case "forward" => AsOfJoinNative.asofForward(left, col("k"),
          col("t"), right, col("k"), col("t"), payload)
        case "nearest" => AsOfJoinNative.asofNearest(left, col("k"),
          col("t"), right, col("k"), col("t"), payload)
      }
      val plain = plainDf.select("pid", "rt", "rv").collect()
        .map(_.toSeq.toString).sorted
      assert(sharded.sameElements(plain),
        s"seed $seed shards $shards dir $dir diverged")
    }
  }

  test("asofTimeSharded tolerance differential and degenerate " +
      "no-mergeable-probe fallback") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(200)((rnd.nextInt(5).toLong,
      (50 + rnd.nextInt(40)).toLong, rnd.nextInt(1000).toString))
      .toDF("k", "t", "pid")
    val right = Seq.fill(300)((rnd.nextInt(5).toLong,
      rnd.nextInt(120).toLong, rnd.nextInt(4).toDouble))
      .toDF("k", "t", "v")
    val sharded = AsOfJoinNative.asofTimeSharded(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), 4, tolerance = 7L)
      .select("pid", "rt", "rv").collect().map(_.toSeq.toString).sorted
    val plain = AsOfJoinNative.asofBackwardWithin(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), tolerance = 7L)
      .select("pid", "rt", "rv").collect().map(_.toSeq.toString).sorted
    assert(sharded.sameElements(plain))
    // all probe TIMES null: the bounds aggregate is null -> the
    // plain-join fallback path; a null-keyed (but timed) probe takes
    // the normal leftovers path — both must come back null-padded
    val nullLeft = Seq((Some(1L), None: Option[Long], "a"),
      (None: Option[Long], None: Option[Long], "b")).toDF("k", "t", "pid")
    val out = AsOfJoinNative.asofTimeSharded(nullLeft, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), 4)
      .collect()
    assert(out.length == 2 && out.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("asofTimeSharded skew posture: the hot key's probes spread " +
      "across time shards and version replication is one carried row " +
      "per occupied bucket — not salting's full-history copy") {
    val s = spark
    import s.implicits._
    // hot key 0: 20k probes over a wide time range, LONG version
    // history (2k versions); cold tail on keys 1..7
    val left = ((1 to 20000).map(i => (0L, i.toLong, i.toLong)) ++
      (1 to 500).map(i => ((i % 7 + 1).toLong, i.toLong, 100000L + i)))
      .toDF("k", "t", "pid")
    val right = ((1 to 2000).map(i => (0L, (i * 10).toLong, i * 1.0)) ++
      (1L to 7L).map(k => (k, 10L, k * 10 + 1.0))).toDF("k", "t", "v")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sharded = AsOfJoinNative.asofTimeSharded(left, col("k"),
        col("t"), right, col("k"), col("t"),
        Seq("rt" -> col("t"), "rv" -> col("v")), 8)
      val plain = run(left, right)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("pid", "rt", "rv").collect()
          .map(_.toSeq.toString).sorted.toSeq
      assert(rows(sharded) == rows(plain),
        "time-sharding must not change any row")
      def maxPart(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("p", spark_partition_id()).groupBy("p")
          .count().agg(max("count")).head.getLong(0)
      val hot = maxPart(plain)
      val spread = maxPart(sharded)
      assert(hot >= 20000L, s"unsharded hot partition: $hot")
      assert(spread <= hot / 2,
        s"time shards must spread the hot key: $spread vs $hot")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("composite-key overflow guard: a key beyond Long.MaxValue / " +
      "factor raises a contextual error instead of silently aliasing " +
      "another key (ADVICE r11), on either side; in-range keys pass") {
    val s = spark
    import s.implicits._
    val big = Long.MaxValue / 4 // over the salts=8 limit
    val badLeft = Seq((big, 10L, "a")).toDF("k", "t", "pid")
    // right time INSIDE the probe range: asofTimeSharded drops
    // out-of-range-bucket versions before the composite is built (an
    // over-limit key there can never match the guarded left keys
    // anyway, so the silent drop is sound — only rows that ENTER the
    // merge must be guarded)
    val badRight = Seq((big, 10L, 1.0)).toDF("k", "t", "v")
    val ok = Seq((1L, 10L, "a")).toDF("k", "t", "pid")
    val okR = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    def payload = Seq("rt" -> col("t"), "rv" -> col("v"))
    for ((l, r) <- Seq((badLeft, okR), (ok, badRight))) {
      val eS = intercept[Exception] {
        AsOfJoinNative.asofSalted(l, col("k"), col("t"), r, col("k"),
          col("t"), payload, salts = 8).collect()
      }
      assert(eS.getMessage != null &&
        eS.getMessage.contains("overflow"), eS.getMessage)
      val eT = intercept[Exception] {
        AsOfJoinNative.asofTimeSharded(l, col("k"), col("t"), r,
          col("k"), col("t"), payload, shards = 8).collect()
      }
      assert(eT.getMessage != null &&
        eT.getMessage.contains("overflow"), eT.getMessage)
    }
    // in-range keys still join normally through both wrappers
    assert(AsOfJoinNative.asofSalted(ok, col("k"), col("t"), okR,
      col("k"), col("t"), payload, salts = 8).collect().length == 1)
    assert(AsOfJoinNative.asofTimeSharded(ok, col("k"), col("t"), okR,
      col("k"), col("t"), payload, shards = 8).collect().length == 1)
  }

  test("exec metrics: numOutputRows == probe rows (left-outer " +
      "contract), matchedRows counts only real payload hits") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
        .toDF("k", "t", "pid")
      val right = Seq((1L, 90L, 1.0)).toDF("k", "t", "v")
      val df = run(left, right)
      df.collect()
      val execs = df.queryExecution.executedPlan.collect {
        case e: AsOfJoinExec => e
      }
      assert(execs.nonEmpty, "AsOfJoinExec not found in plan")
      assert(execs.head.metrics("numOutputRows").value == 3L)
      assert(execs.head.metrics("matchedRows").value == 1L) // only "a"
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan shape: AsOfJoin exec with two clustered exchanges — " +
      "no window, no union, no cartesian") {
    val s = spark
    import s.implicits._
    val left = (1 to 1000).map(i => (i.toLong % 7, i.toLong, s"p$i"))
      .toDF("k", "t", "pid")
    val right = (1 to 1000).map(i => (i.toLong % 7, i.toLong, i * 1.0))
      .toDF("k", "t", "v")
    val df = run(left, right)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window") && !p.contains("Union"), p)
    df.count() // and it actually executes under AQE
  }
}
