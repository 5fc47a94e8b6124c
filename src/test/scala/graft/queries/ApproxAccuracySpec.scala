package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Pins the accuracy contract of the sketch-based queries that have no
  * exact cross-engine oracle (the driver records them rows-only).
  * `approx_count_distinct(rsd = 0.01)` is HLL++ with a standard-error
  * guarantee; 3 sigma (3% here) bounds the estimate for any fixed
  * dataset with overwhelming probability, and both the data and the
  * sketch are deterministic, so this is a stable regression pin, not a
  * flaky statistical test.
  */
class ApproxAccuracySpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("approx_distinct: HLL estimates within 3x rsd of exact counts") {
    // The query itself now computes the 3-sigma bound check (the
    // driver hashes the booleans against a constant-truth oracle at
    // sf0.01/sf0.1); this spec keeps the sf0.001 coverage.
    val approx = SparkEntry.queries("approx_distinct")(spark, d).collect().head
    assert(approx.getAs[Boolean]("parts_ok"), "approx_parts out of bound")
    assert(approx.getAs[Boolean]("orders_ok"), "approx_orders out of bound")
  }

  test("freqItems returns a superset of the true heavy hitters") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val support = 0.2
    val got = li.stat.freqItems(Seq("l_returnflag"), support)
      .head.getSeq[String](0).toSet
    val n = li.count()
    val trueHeavy = li.groupBy("l_returnflag").count()
      .filter(col("count") > n * support)
      .collect().map(_.getString(0)).toSet
    // the sketch guarantees no false negatives above the support
    assert(trueHeavy.subsetOf(got), s"missing ${trueHeavy -- got}")
  }

  test("approx_percentile lands within the accuracy-bound rank window") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val acc = 1000 // max rank error = n / acc
    val approx = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)))
      .head.getDouble(0)
    val n = li.count()
    val maxRankErr = math.ceil(n.toDouble / acc).toLong
    // The sketch promises SOME rank of the returned value lies within
    // the error window, so compare the value's whole rank RANGE
    // [count(<), count(<=)] — a single <= count over-counts when the
    // value repeats and could reject a correct estimate.
    val lo = li.filter(col("l_extendedprice") < approx).count()
    val hi = li.filter(col("l_extendedprice") <= approx).count()
    val (wLo, wHi) = (n / 2 - maxRankErr - 1, n / 2 + maxRankErr + 1)
    assert(lo <= wHi && hi >= wLo,
      s"rank range [$lo,$hi] misses window [$wLo,$wHi]")
  }

  test("kmv_distinct: partition-invariant (merge = union-truncate), " +
      "set-semantic (duplicates don't move it), exact below k, " +
      "estimate within the relative-error bound") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val n = 5000
    val data = (1 to n).map(i => s"tok$i")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("kmv_distinct(t, 128)")).head.getLong(0)
    val one = est(data.toDF("t").repartition(1))
    val many = est((data ++ data ++ data).toDF("t").repartition(13))
    assert(one == many,
      s"partitioning/dups changed the estimate: $one vs $many")
    // KMV rel std err ~ 1/sqrt(k-2) ~ 9% at k=128; 4 sigma bound
    assert(math.abs(one - n).toDouble / n < 0.36,
      s"estimate $one vs exact $n")
    // below k the sketch IS the set
    val small = est((1 to 100).map(i => s"s$i").toDF("t").repartition(5))
    assert(small == 100L, s"sub-k must be exact, got $small")
  }
}
