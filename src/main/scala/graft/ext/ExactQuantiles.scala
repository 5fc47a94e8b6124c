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

  /** GROUPED exact percentiles — `GROUP BY g` + `percentile(v, p)`
   *  without the per-group full-multiset aggregation buffer. Returns a
   *  DataFrame (groupCol, p0, p1, ... one double per `ps` entry).
   *
   *  Same passes as the global path, vectorized over groups: one
   *  grouped min/max/count (G rows to the driver — profiling group
   *  cardinality must be driver-bounded, enforced by `maxGroups`); one
   *  histogram pass where each row's bucket comes from ITS group's
   *  range via a broadcast stats join (G×B counts to the driver); one
   *  filtered scan where a window partitioned by (group, bucket) sorts
   *  only the rank-carrying buckets — each task ≤ refineLimit rows.
   *  Oversized buckets recurse through the proven single-group path.
   */
  def groupedPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double], buckets: Int = 2048,
      refineLimit: Long = 4L * 1024 * 1024,
      maxGroups: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(groupCol).as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val stats = base.groupBy("g")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n")).collect()
    require(stats.length <= maxGroups,
      s"groupedPercentiles: ${stats.length} groups exceed $maxGroups — " +
        "driver-side rank targets need bounded group cardinality")
    val gField = base.schema("g")

    // per-group rank targets, exactly the global path's arithmetic
    case class GT(g: Any, mn: Double, mx: Double, n: Long,
        targets: Seq[(Long, Long, Double)])
    val gts = stats.map { r =>
      val n = r.getLong(3)
      GT(r.get(0), r.getDouble(1), r.getDouble(2), n,
        ps.map { p =>
          val pos = (n - 1).toDouble * p
          val lo = math.floor(pos).toLong
          (lo + 1L, math.ceil(pos).toLong + 1L, pos - lo)
        })
    }.toSeq
    val (flat, ranged) = gts.partition(t => t.mn == t.mx)

    val resolved: Map[Any, Map[Long, Double]] =
      if (ranged.isEmpty) Map.empty
      else {
        // histogram pass: bucket width is per-group, delivered to every
        // row by a broadcast join on the (tiny) stats table
        val statsDf = spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(
              ranged.map(t => Row(t.g, t.mn, t.mx))).asJava),
          org.apache.spark.sql.types.StructType(Seq(
            gField.copy(name = "sg"),
            org.apache.spark.sql.types.StructField("mn",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("mx",
              org.apache.spark.sql.types.DoubleType))))
        val bucketOf = least(lit(buckets - 1), greatest(lit(0),
          floor((col("v") - col("mn")) /
            ((col("mx") - col("mn")) / buckets)).cast("int")))
        val binned = base
          .join(broadcast(statsDf), col("g") === col("sg"))
          .select(col("g"), col("v"), bucketOf.as("b"))
        val hist: Map[Any, Seq[(Int, Long)]] = binned
          .groupBy("g", "b").agg(count(lit(1)).as("c")).collect()
          .map(r => (r.get(0), r.getInt(1), r.getLong(2)))
          .groupBy(_._1)
          .map { case (g, rs) =>
            g -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq }

        // driver cumsum per group → (group, bucket) -> local ranks
        case class Need(g: Any, b: Int, before: Long, cnt: Long,
            locals: Seq[(Long, Long)]) // (globalRank, localRank)
        val needs: Seq[Need] = ranged.flatMap { t =>
          val buckets0 = hist(t.g)
          var cum = 0L
          val cumBefore = buckets0.map { case (b, c) =>
            val before = cum; cum += c; (b, before, c) }
          val ranks = t.targets.flatMap(x => Seq(x._1, x._2)).distinct
          ranks.map { r =>
            val (b, before, c) = cumBefore
              .find { case (_, bef, c) => r > bef && r <= bef + c }.get
            (b, before, c, r)
          }.groupBy(x => (x._1, x._2, x._3))
            .map { case ((b, before, c), xs) =>
              Need(t.g, b, before, c,
                xs.map(x => (x._4, x._4 - before)).distinct) }
        }

        val (big, small) = needs.partition(_.cnt > refineLimit)
        val fromSmall: Seq[(Any, Long, Double)] =
          if (small.isEmpty) Nil
          else {
            val candDf = spark.createDataFrame(
              new java.util.ArrayList[Row](
                scala.jdk.CollectionConverters.SeqHasAsJava(
                  small.map(nd => Row(nd.g, nd.b))).asJava),
              org.apache.spark.sql.types.StructType(Seq(
                gField.copy(name = "cg"),
                org.apache.spark.sql.types.StructField("cb",
                  org.apache.spark.sql.types.IntegerType))))
            val wanted: Set[(Any, Int, Long)] = small.flatMap(nd =>
              nd.locals.map { case (_, lr) => (nd.g, nd.b, lr) }).toSet
            // pre-collect rank filter: only the wanted local ranks
            // (plus same-rank rows of other candidate buckets) reach
            // the driver — never a bucket's full contents
            val rankSet = wanted.map(_._3.toInt).toSeq.distinct.sorted
            val picked = binned
              .join(broadcast(candDf),
                col("g") === col("cg") && col("b") === col("cb"))
              .withColumn("r", row_number().over(
                Window.partitionBy("g", "b").orderBy("v")))
              .filter(col("r").isin(rankSet: _*))
              .collect()
              .map(r => (r.get(0), r.getInt(2), r.getInt(5).toLong) ->
                r.getDouble(1))
              .filter { case (k, _) => wanted.contains(k) }.toMap
            small.flatMap(nd => nd.locals.map { case (gr, lr) =>
              (nd.g, gr, picked((nd.g, nd.b, lr))) })
          }
        val fromBig: Seq[(Any, Long, Double)] = big.flatMap { nd =>
          val inBucket = binned
            .filter(col("g") === lit(nd.g) && col("b") === nd.b)
            .select("v")
          val Row(bmn: Double, bmx: Double) =
            inBucket.agg(min(col("v")), max(col("v"))).head()
          val at =
            if (bmn == bmx) nd.locals.map(_._2).distinct
              .map(_ -> bmn).toMap
            else orderStatistics(inBucket, bmn, bmx, nd.cnt,
              nd.locals.map(_._2).distinct.sorted, buckets, refineLimit)
          nd.locals.map { case (gr, lr) => (nd.g, gr, at(lr)) }
        }
        (fromSmall ++ fromBig).groupBy(_._1)
          .map { case (g, xs) => g -> xs.map(x => (x._2, x._3)).toMap }
      }

    val rows = gts.map { t =>
      val at: Long => Double =
        if (t.mn == t.mx) _ => t.mn else resolved(t.g)
      Row.fromSeq(t.g +: t.targets.map { case (loR, hiR, frac) =>
        val a = at(loR)
        if (frac == 0.0) a else a + (at(hiR) - a) * frac
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(
        gField.copy(name = groupCol) +:
          ps.indices.map(i => org.apache.spark.sql.types.StructField(
            s"p$i", org.apache.spark.sql.types.DoubleType))))
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
