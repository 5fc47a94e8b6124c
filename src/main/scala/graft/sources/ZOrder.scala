package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the table-maintenance pass that makes
  * MULTI-column range predicates skippable at rest.
  *
  * A sort on one column gives perfect file skipping for that column
  * and none for any other; interleaving the bits of two key columns
  * orders rows along a space-filling curve, so a range box on EITHER
  * column (or both) maps to a compact z-value range and parquet
  * min/max stats prune most files. This is the standard lakehouse
  * OPTIMIZE ZORDER BY shape, built from plain integer expressions —
  * fully codegen'd, no shuffle beyond the final range partition.
  *
  * Scale posture: zValue is a map-side projection; clusterBy is one
  * range exchange (sampled bounds) + an in-partition sort — the same
  * cost as any global sort-write, paid once at maintenance time.
  */
object ZOrder {

  /** 2-D Morton z-value: interleaves the low `bits` bits of two
    * non-negative long columns (x in even positions, y in odd).
    * 2*bits result bits — keep bits <= 31 so the value stays in a
    * signed long. Callers bucket raw values first (e.g.
    * `floor(price / width)`), capping with `% (1 << bits)`.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** The matching DuckDB SQL for `zValue` — keeps the driver oracle
    * and the Spark expression in one place (same term layout).
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " | ", ")")

  /** Rewrite `df` clustered by the z-value: range-partition into
    * `numFiles` output files on `z`, sorted within each, so every file
    * covers a compact z-range and parquet min/max footer stats carry
    * the pruning information for BOTH underlying columns.
    */
  def clusterBy(df: DataFrame, z: Column, numFiles: Int,
      outDir: String): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
