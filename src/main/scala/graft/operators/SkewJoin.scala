package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer; at
  * 100 TB a single hot key (null-ish ids, default values, bot users)
  * stalls the stage. Salting splits each big-side key into `salts`
  * sub-keys deterministically and replicates the (small) build side
  * once per salt, so the hot key fans out over `salts` reducers.
  * Result is row-identical to the plain join.
  *
  * AQE's skew-join handles MODERATE skew at runtime; explicit salting
  * is the tool when one key dominates by orders of magnitude or the
  * build side must stay a shuffle join (too big to broadcast).
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed, probe) with `small` (build;
    * replicated `salts` times).
    *
    * @param keys join column names (same names both sides)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0)
    // Deterministic spread: salt from a hash of the big side's
    // NON-KEY columns (rows of the hot key differ there, so they
    // spread; identical full rows co-locate, which is harmless).
    val nonKey = big.columns.filterNot(keys.contains).map(col).toSeq
    val saltExpr: Column =
      if (nonKey.isEmpty) (rand(42) * salts).cast("int")
      else pmod(xxhash64(nonKey: _*), lit(salts)).cast("int")
    val b = big.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
