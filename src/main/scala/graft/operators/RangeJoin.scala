package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure range join — point-in-interval pairing with NO equi key.
  *
  * Spark plans `p.v BETWEEN i.lo AND i.hi` with no equality conjunct
  * as a BroadcastNestedLoopJoin (or cartesian): every point row meets
  * every interval row — the O(n*m) shape that does not survive scale.
  * The standard fix is BINNING: quantize the value axis into
  * `binWidth` buckets, explode each interval over the buckets it
  * covers, map each point to its single bucket, and equi-join on the
  * bucket id — a plain hash/sort-merge join whose per-bucket work is
  * local. The exact BETWEEN filter then runs inside the matched
  * buckets. Each qualifying pair appears EXACTLY once (a point has
  * one bucket), so no dedup pass is needed.
  *
  * Cost model: interval rows replicate by ~(interval length /
  * binWidth) + 1 — pick binWidth near the TYPICAL interval length so
  * replication is a small constant while buckets stay selective.
  * Bucket arithmetic is integer floor-division (exact — no double
  * rounding at bucket edges, negatives bin consistently).
  */
object RangeJoin {

  /** @param points    relation with integral `pointCol`
    * @param intervals relation with integral `[loCol, hiCol]`
    *                  (inclusive; rows with lo > hi match nothing)
    * @return matched (point x interval) rows, all columns of both
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // floor(c / w) as truncating `div` adjusted when the remainder is
    // negative: exact integer arithmetic for the FULL long range
    // (double `/` would mis-round for |values| >= 2^53 and drop
    // matches at bucket edges; the `(c - pmod(c, w)) div w` spelling
    // overflows for c within w of Long.MinValue).
    def bin(c: org.apache.spark.sql.Column) =
      call_function("div", c, lit(binWidth)) +
        when(c % lit(binWidth) < 0, lit(-1L)).otherwise(lit(0L))
    val pb = points.withColumn("__bin", bin(col(pointCol)))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    pb.join(ib, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join — `a.lo <= b.hi AND b.lo <= a.hi`
    * (inclusive ends; touching intervals overlap), the range×range
    * sibling of `pointInInterval` (classic in genomics/log-window
    * correlation). Spark plans the bare conjunction as a
    * BroadcastNestedLoopJoin; here BOTH sides explode over the bins
    * they cover and equi-join on the bin id.
    *
    * Exactly-once without a dedup pass: an overlapping pair co-occurs
    * in every shared bin, but the overlap region starts at
    * max(a.lo, b.lo), and binning is monotone — so the pair is kept
    * only in bin max(bin(a.lo), bin(b.lo)), its FIRST shared bin,
    * which both sides provably cover. (The `pointInInterval` analog
    * gets this for free because a point covers one bin.)
    *
    * Cost model matches `pointInInterval`: each side replicates by
    * ~(interval length / binWidth) + 1 — pick binWidth near the
    * typical interval length of the LONGER-intervaled side.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: org.apache.spark.sql.Column) =
      call_function("div", c, lit(binWidth)) +
        when(c % lit(binWidth) < 0, lit(-1L)).otherwise(lit(0L))
    val lb = left.filter(col(lLo) <= col(lHi))
      .withColumn("__bin", explode(sequence(bin(col(lLo)), bin(col(lHi)))))
    val rb = right.filter(col(rLo) <= col(rHi))
      .withColumn("__bin", explode(sequence(bin(col(rLo)), bin(col(rHi)))))
    lb.join(rb, "__bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === greatest(bin(col(lLo)), bin(col(rLo))))
      .drop("__bin")
  }
}
