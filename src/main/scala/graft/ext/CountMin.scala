package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch — the scan-tier heavy-hitter summary
  * that completes the sketch family (HLL distinct, KLL-style
  * quantile, CMS frequency).
  *
  * A d×w counter grid: every key increments one counter per row r at
  * column h_r(key); a point estimate is the MIN over the d counters —
  * always an overestimate, within eps*N (eps ≈ e/w) with probability
  * 1 - (1/2)^d. The build is one explode(d) + one partial-agg'd
  * groupBy, and the sketch is d*w rows REGARDLESS of corpus size —
  * the reduction you ship off a 100 TB scan.
  *
  * Hashing mirrors `Dedup`: one md5 per key, two 32-bit slices,
  * Kirsch–Mitzenmacher double hashing h_r = (h1 + r*h2) mod P mod w —
  * fully deterministic, so estimates are oracle-checkable cross-engine
  * (every intermediate is non-negative, making Spark's pmod and
  * DuckDB's % agree).
  */
object CountMin {

  private val P = Dedup.MinhashPrime

  /** d×w sketch over a key column: (r, c, cnt) rows, at most d*w. */
  def sketch(keys: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    keys
      .select(
        conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long")
          .as("h1"),
        conv(substring(md5(col(keyCol)), 9, 8), 16, 10).cast("long")
          .as("h2"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("r"),
        col("h1"), col("h2"))
      .select(col("r"),
        pmod(pmod(col("h1") + col("r") * col("h2"), lit(P)), lit(w))
          .as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))

  /** Point estimates for `queries` keys: min over the d counters.
    * The sketch side is at most d*w rows — broadcast into the probe.
    */
  def estimate(sk: DataFrame, queries: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame =
    queries
      .select(col(keyCol),
        conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long")
          .as("h1"),
        conv(substring(md5(col(keyCol)), 9, 8), 16, 10).cast("long")
          .as("h2"))
      .select(col(keyCol), explode(sequence(lit(0), lit(d - 1))).as("r"),
        col("h1"), col("h2"))
      .select(col(keyCol), col("r"),
        pmod(pmod(col("h1") + col("r") * col("h2"), lit(P)), lit(w))
          .as("c"))
      .join(broadcast(sk), Seq("r", "c"), "left")
      .groupBy(keyCol)
      // a missing counter means nothing hashed there: count 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
