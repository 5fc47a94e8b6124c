package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (SQL `percentile` / DuckDB
 *  `quantile_cont` semantics) in BOUNDED memory.
 *
 *  Spark's exact `percentile` is an ImperativeAggregate whose buffer
 *  materializes the full value multiset and merges it into one final
 *  reducer — at 100 TB that is an executor-memory wall. The usual
 *  escape (`approx_percentile`) gives up exactness AND run-to-run
 *  determinism (sketch compression depends on merge order), which the
 *  hash-based oracle gate cannot tolerate.
 *
 *  This computes exact order statistics instead, TeraSort-style but
 *  without the sort:
 *    pass 1  min / max / count                       (scalar agg)
 *    pass 2  fixed-width histogram, B buckets         (hash agg, B rows
 *            to the driver — B=8192 ≈ 64 KiB)
 *    pass 3  the ≤ 2·|ps| candidate buckets that contain a target
 *            rank are filtered out (≈ n/B rows each) and sorted
 *            PER BUCKET by a window — a distributed per-partition
 *            sort, never a global one.
 *  Skew/ties guard: a candidate bucket with min == max IS the answer
 *  (no sort); a bucket still larger than `refineLimit` with min < max
 *  recurses on its own sub-range, so heavy ties converge to the
 *  min==max shortcut and smooth skew halves geometrically. Every
 *  driver-side structure is O(B + |ps|); every executor task sorts at
 *  most `refineLimit` rows.
 *
 *  Determinism: bucket ids are a pure function of the value (never of
 *  partitioning), histogram counts are exact integers, and the value
 *  at a global rank is unique even under ties — so the result is
 *  bit-stable across runs, unlike a mergeable sketch.
 */
object ExactQuantiles {

  /** Exact `quantile_cont`-style percentiles of `valueCol` (nulls
   *  ignored), one double per requested `ps` entry. */
  def percentiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                  buckets: Int = 8192,
                  refineLimit: Long = 4L * 1024 * 1024): Seq[Double] = {
    val base = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val Row(mn: Double, mx: Double, n: Long) =
      base.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    require(n > 0, s"percentiles($valueCol) over empty input")
    // quantile_cont: pos = (n-1)*p; interpolate between the values at
    // 1-indexed global ranks floor(pos)+1 and ceil(pos)+1.
    val targets = ps.map { p =>
      val pos = (n - 1).toDouble * p
      val lo = math.floor(pos).toLong
      (lo + 1L, math.ceil(pos).toLong + 1L, pos - lo)
    }
    val ranks = targets.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val at = orderStatistics(base, mn, mx, n, ranks, buckets, refineLimit)
    targets.map { case (loR, hiR, frac) =>
      val a = at(loR)
      if (frac == 0.0) a else a + (at(hiR) - a) * frac
    }
  }

  /** Round like Spark's `round(col, 6)` / DuckDB's `round(x, 6)`
   *  (HALF_UP on the decimal expansion) so a driver-computed edge can
   *  stand in for an in-plan rounded aggregate bit-for-bit. */
  def round6(v: Double): Double =
    BigDecimal.valueOf(v)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Values at the given 1-indexed global ranks of `base.v` sorted
   *  ascending, within the known range [mn, mx] of count n. */
  private def orderStatistics(base: DataFrame, mn: Double, mx: Double,
      n: Long, ranks: Seq[Long], buckets: Int,
      refineLimit: Long): Map[Long, Double] = {
    require(ranks.forall(r => r >= 1 && r <= n), s"rank out of [1,$n]")
    if (mn == mx) return ranks.map(_ -> mn).toMap
    val width = (mx - mn) / buckets
    // Pure function of the value: same bucket on every run, and the
    // clamp folds fp edge cases (v == mx) into the last bucket.
    val bucketOf = least(lit(buckets - 1),
      greatest(lit(0), floor((col("v") - mn) / width).cast("int")))
    val hist = base.groupBy(bucketOf.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // driver-side cumulative walk over ≤ `buckets` entries
    val ordered = hist.toSeq.sortBy(_._1)
    var cum = 0L
    val cumBefore = ordered.map { case (b, c) =>
      val before = cum; cum += c; b -> (before, c)
    }.toMap
    val need: Map[Int, Seq[(Long, Long)]] = // bucket -> (globalRank, localRank)
      ranks.map { r =>
        val (b, (before, _)) = cumBefore.iterator
          .filter { case (_, (bef, c)) => r > bef && r <= bef + c }
          .minBy(_._1)
        (b, r, r - before)
      }.groupMap(_._1)(t => (t._2, t._3))

    val (big, small) =
      need.partition { case (b, _) => cumBefore(b)._2 > refineLimit }

    // All small candidate buckets resolve in ONE filtered scan: the
    // window partitions by the real bucket column, so each task sorts
    // only its own bucket's ≤ refineLimit rows — distributed
    // per-bucket, never a global sort.
    val fromSmall: Seq[(Long, Double)] = if (small.isEmpty) Nil else {
      val wanted = small.toSeq.flatMap { case (b, local) =>
        local.map { case (_, lr) => (b, lr) } }.toSet
      val pairCond = wanted.toSeq.sorted
        .map { case (b, lr) => col("b") === b && col("r") === lr }
        .reduce(_ || _)
      val picked = base.withColumn("b", bucketOf)
        .filter(col("b").isin(small.keys.toSeq.sorted: _*))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("b")).orderBy(col("v"))))
        .filter(pairCond)
        .select(col("b"), col("r"), col("v")).collect()
        .map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2))
        .toMap
      small.toSeq.flatMap { case (b, local) =>
        local.map { case (g, lr) => g -> picked((b, lr)) } }
    }

    // An oversized bucket recurses on its own sub-range; heavy ties
    // converge to the min==max shortcut, smooth skew halves each level.
    val fromBig: Seq[(Long, Double)] = big.toSeq.flatMap { case (b, local) =>
      val (_, cnt) = cumBefore(b)
      val inBucket = base.filter(bucketOf === b)
      val Row(bmn: Double, bmx: Double) =
        inBucket.agg(min(col("v")), max(col("v"))).head()
      if (bmn == bmx) local.map { case (g, _) => g -> bmn }
      else orderStatistics(inBucket, bmn, bmx, cnt,
          local.map(_._2).distinct.sorted, buckets, refineLimit)
        .toSeq.flatMap { case (lr, v) =>
          local.filter(_._2 == lr).map { case (g, _) => g -> v } }
    }
    (fromSmall ++ fromBig).toMap
  }
}
