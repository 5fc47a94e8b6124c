package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe per-key top-k.
  *
  * A plain `row_number() OVER (PARTITION BY key ...)` puts EVERY row
  * of a key into one task — the hot-key failure mode at 100 TB (one
  * celebrity user, one default value, and the stage runs as long as
  * its worst key). Two-phase shape instead:
  *
  *   1. salt each row by a hash of the whole row, window over
  *      (key, salt) and keep k per sub-partition — no task sees more
  *      than ~|key| / salts rows of any key;
  *   2. re-window the survivors over the bare key — at most
  *      `salts * k` rows per key by construction — and keep the
  *      final k with ranks.
  *
  * The result is IDENTICAL to the single-window top-k whenever the
  * ordering is total (deterministic tie-break — same requirement any
  * oracle-checked top-k already has): the true top-k of a key can
  * never be eliminated in phase 1, because a row is only cut when k
  * rows of the SAME key rank above it. Both phases are plain windows —
  * codegen'd, no driver data, AQE-compatible.
  */
object TopK {

  /** @param ordering total order (include a tie-break column!)
    * @param salts    phase-1 fan-out; bounds any task's share of a hot
    *                 key at ~1/salts while phase 2 sees <= salts * k
    *                 rows per key
    * @return input rows that rank in their key's top k, plus `rank`
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      ordering: Seq[Column], k: Int, salts: Int = 16): DataFrame = {
    require(keyCols.nonEmpty && ordering.nonEmpty && k >= 1 && salts >= 1)
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))
    val w1 = Window
      .partitionBy((keyCols.map(col) :+ col("__salt")): _*)
      .orderBy(ordering: _*)
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__salt", salt)
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .drop("__salt", "__r1")
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }
}
