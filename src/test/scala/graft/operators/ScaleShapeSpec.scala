package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  test("saltedJoin equals the plain join on skewed data") {
    val s = spark
    import s.implicits._
    // one hot key (0) with 10k rows, a long tail, plus keys with no match
    val big = ((1 to 10000).map(i => (0L, i.toLong)) ++
      (1 to 500).map(i => (i.toLong % 7, i.toLong)) ++
      Seq((99L, 1L))).toDF("k", "payload")
    val small = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSeq
    assert(salted.sortBy(_.toString) == plain.sortBy(_.toString))
    assert(salted.size == 10500)
  }

  test("salted big side spreads a hot key over many salt values") {
    val s = spark
    import s.implicits._
    val big = (1 to 1000).map(i => (0L, i.toLong)).toDF("k", "payload")
    val nSalts = big.withColumn("__salt",
        pmod(xxhash64(col("payload")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(nSalts >= 6) // hot key fans out over most of the 8 buckets
  }
}

/** AQE's RUNTIME skew mitigation — the zero-code complement to
  * `SkewJoin.saltedJoin`: when the shuffle lands a hot key in one
  * oversized partition, the adaptive planner splits it into
  * sub-partitions (duplicating the matching other-side partition) and
  * the final sort-merge join reports `skew=true`. Salting remains the
  * tool when the skewed operator is an AGGREGATE or the join strategy
  * is not SMJ/SHJ; for plain joins, AQE at the right thresholds does
  * it for free.
  */
class AqeSkewSpec extends SparkSpec {
  test("adaptive skew-join split fires on a hot key: final plan " +
      "reports skew=true, results match the plain join") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // hot key 0: ~100k rows with a 32-char payload (several MB in
      // one reduce partition, far over the 8KB threshold); tail keys
      // tiny. Right side small per key so the split duplicates it.
      val left = ((1 to 100000).map(_ => 0L) ++
        (1 to 2000).map(_.toLong % 97))
        .toDF("k")
        .withColumn("pl", lpad(col("k").cast("string"), 32, "x"))
      val right = (0L to 96L).map(k => (k, s"d$k")).toDF("k", "name")
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so the inspected QueryExecution is
      // the one that ran — count() builds its own plan
      val n = joined.collect().length
      assert(n == 102000, s"row count: $n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE must split the skewed partition:\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}

/** Bucketed tables co-locate join keys at REST: a join of two tables
  * bucketed by the same key into the same bucket count needs NO
  * shuffle — the core 100 TB layout technique for fact-fact joins.
  */
class BucketingSpec extends SparkSpec {
  test("join of co-bucketed tables plans without a shuffle exchange") {
    val s = spark
    import s.implicits._
    val orders = (1L to 1000L).map(k => (k, s"o$k")).toDF("key", "o")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i"))
      .toDF("key", "i")
    orders.write.mode("overwrite").bucketBy(4, "key")
      .saveAsTable("b_orders")
    items.write.mode("overwrite").bucketBy(4, "key")
      .saveAsTable("b_items")
    // Force the shuffle-join planner path (broadcast would hide the
    // bucketing benefit on toy-sized data).
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("b_orders").join(s.table("b_items"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-bucketed join, got:\n$plan")
      assert(joined.count() == 3000)

      // contrast: the same join over plain (unbucketed) data shuffles
      val plain = orders.join(items, "key")
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class TopKSpec extends SparkSpec {
  test("topKPerKey equals the plain single-window top-k on skewed data") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // one hot key with 10k rows (the partition a plain window would
    // serialize into one task), plus a tail of normal keys
    val rows = (1 to 10000).map(i => (0L, i.toLong, (i * 37 % 9991).toLong)) ++
      (1 to 500).map(i => (1L + i % 7, i.toLong + 20000, i.toLong))
    val df = rows.toDF("k", "id", "score")
    val plain = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("k").orderBy(desc("score"), col("id"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sortBy(t => (t._1, t._4))
    val salted = TopK.topKPerKey(df, Seq("k"),
        Seq(desc("score"), col("id")), k = 5, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sortBy(t => (t._1, t._4))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.count(_._1 == 0L) == 5)
  }

  test("topKPerKey phase 1 bounds any single window partition") {
    val s = spark
    import s.implicits._
    // every row same key: phase-1 sub-partitions must each hold ~1/8
    val df = (1 to 4000).map(i => (0L, i.toLong)).toDF("k", "id")
    val perSalt = df
      .withColumn("__salt", pmod(xxhash64(col("k"), col("id")), lit(8L)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(perSalt.length >= 6) // hot key fans out
    assert(perSalt.max < 4000 / 2) // no sub-partition re-concentrates
  }
}

class RangeJoinSpec extends SparkSpec {
  test("pointInInterval equals the naive theta join, including " +
      "negatives and exact bin boundaries") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val pts = ((1 to 300).map(i => (i.toLong, rnd.nextLong() % 1000)) ++
      Seq((900L, -100L), (901L, 0L), (902L, 100L), (903L, 50L)))
      .toDF("pid", "v")
    // intervals of mixed widths incl. degenerate, inverted, boundary
    val ivs = Seq(
      (1L, -100L, 100L),   // spans negative/positive + exact ends
      (2L, 0L, 0L),        // degenerate single point
      (3L, 50L, 49L),      // inverted -> matches nothing
      (4L, -500L, 500L),   // wide
      (5L, 95L, 105L)      // straddles a bin boundary (width 100)
    ).toDF("iid", "lo", "hi")
    val naive = pts.crossJoin(ivs)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val binned = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
        binWidth = 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(binned == naive)
    assert(naive.nonEmpty)
    // each qualifying pair appears exactly once (no dedup needed)
    assert(binned.distinct.size == binned.size)
  }

  test("bin arithmetic is exact beyond 2^53 (double division would " +
      "mis-bucket edge values)") {
    val s = spark
    import s.implicits._
    // 2^60 + k values: a double cannot represent these exactly, so a
    // `/`-based bin() rounds some quotients to the wrong bucket and
    // drops boundary matches
    val base = 1L << 60
    val pts = (0L to 10L).map(k => (k, base + k)).toDF("pid", "v")
    val ivs = Seq((1L, base, base + 4L), (2L, base + 5L, base + 10L),
      (3L, -base - 10L, -base)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi",
        binWidth = 3L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == (0L to 4L).map((_, 1L)) ++ (5L to 10L).map((_, 2L)))
  }

  test("intervalOverlap matches the naive theta join exactly once " +
      "per pair: touching ends, negatives, degenerate, inverted, " +
      "nested, bin-boundary straddles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val mk = (n: Int, seedOff: Int) =>
      (1 to n).map { i =>
        val lo = rnd.nextLong() % 1000
        ((i + seedOff).toLong, lo, lo + math.abs(rnd.nextLong() % 180))
      }
    val a = (mk(120, 0) ++ Seq(
      (900L, -100L, 100L),  // spans zero
      (901L, 100L, 100L),   // degenerate, touches 900's end
      (902L, 50L, 49L),     // inverted -> matches nothing
      (903L, -1000L, 1000L) // wide: overlaps most of b
    )).toDF("a_id", "a_lo", "a_hi")
    val b = (mk(80, 5000) ++ Seq(
      (800L, 101L, 200L),  // touches nothing of 900 (gap of 1)
      (801L, 100L, 150L),  // touches 900 AND 901 exactly at 100
      (802L, -250L, -150L),// negative-only, bin-edge straddler
      (803L, 60L, 40L)     // inverted right side
    )).toDF("b_id", "b_lo", "b_hi")
    val naive = a.crossJoin(b)
      .filter(col("a_lo") <= col("a_hi") && col("b_lo") <= col("b_hi") &&
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val binned = RangeJoin.intervalOverlap(a, "a_lo", "a_hi",
        b, "b_lo", "b_hi", binWidth = 100L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(binned == naive)
    assert(naive.nonEmpty)
    // the first-shared-bin rule yields each pair exactly once — no
    // distinct pass hides duplicates
    assert(binned.distinct.size == binned.size)
    // the touching-pair corners specifically
    assert(naive.contains((900L, 801L)) && naive.contains((901L, 801L)))
    assert(!naive.contains((900L, 800L)))
  }
}

class TrianglesSpec extends SparkSpec {
  test("triangles: planted triangles found exactly once, hub star " +
      "contributes none, output convention deterministic") {
    val s = spark
    import s.implicits._
    // triangle {1,2,3}, triangle {3,4,5} sharing vertex 3, a star hub
    // 100 with 20 leaves (no triangles), duplicate + reversed edges
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 1L), (1L, 2L)) ++ // dup/reverse noise
      (200L to 219L).map(l => (100L, l))).toDF("id_a", "id_b")
    val got = Triangles.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // each triangle exactly once (as a set of vertex sets)
    assert(got.map(t => Set(t._1, t._2, t._3)).toSet ==
      Set(Set(1L, 2L, 3L), Set(3L, 4L, 5L)))
    assert(got.length == 2)
    // convention: v1 < v2, s not among them
    got.foreach { case (sv, v1, v2) =>
      assert(v1 < v2 && sv != v1 && sv != v2)
    }
  }
}

/** Skyline's scale contract: no window's input may depend on the data
  * distribution. The worst case for the r07 salted two-phase plan was
  * an ANTI-CORRELATED table — every point on the frontier, so the
  * local pass pruned nothing and the whole table reached one
  * unpartitioned global window task. The bucketed prefix-max plan
  * bounds every data-sized window by its bucket and the only
  * unpartitioned window by the constant bucket count.
  */
class SkylineSpec extends SparkSpec {
  private def naive(rows: Seq[(Long, Long, Long)]): Set[Long] =
    rows.filter { case (_, p, r) =>
      !rows.exists { case (_, p2, r2) =>
        p2 <= p && r2 >= r && (p2 < p || r2 > r) }
    }.map(_._1).toSet

  test("anti-correlated input (worst case): every point survives and " +
      "no unpartitioned window reads table-sized input") {
    val s = spark
    import s.implicits._
    // price and recency ascending together: every cheaper row is also
    // less recent, so nothing dominates anything (for minimize-price /
    // maximize-recency this IS the anti-correlated all-frontier case)
    val rows = (1L to 2000L).map(i => (i, i * 10L, i * 10L))
    val df = rows.toDF("id", "price", "rec")
    val out = Skyline.frontier2d(df, "price", "rec", buckets = 16)
    assert(out.count() == 2000L)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("hashpartitioning(__bucket"),
      "data-sized windows must partition by bucket")
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1,
      "only the bucket-aggregate prefix window may be unpartitioned")
  }

  test("matches the quadratic definition on mixed data with ties, " +
      "dominated clusters, and duplicate points") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1L to 400L).map { i =>
      (i, (rnd.nextInt(50) + 1).toLong, (rnd.nextInt(50) + 1).toLong)
    } ++ Seq((401L, 1L, 60L), (402L, 1L, 60L)) // duplicate frontier pts
    val df = rows.toDF("id", "price", "rec")
    val got = Skyline.frontier2d(df, "price", "rec", buckets = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == naive(rows))
  }

  test("single-bucket degenerate input (all prices equal) stays exact") {
    val s = spark
    import s.implicits._
    val rows = (1L to 100L).map(i => (i, 7L, i))
    val got = Skyline.frontier2d(rows.toDF("id", "price", "rec"),
      "price", "rec").select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(100L)) // only the max-recency row survives the tie
  }
}
