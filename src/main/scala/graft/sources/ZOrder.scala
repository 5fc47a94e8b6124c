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

  /** N-D Morton z-value: round-robin bit interleave of the low `bits`
    * bits of `cols.size` non-negative long columns — bit `b` of column
    * `i` lands at position `b * n + i`, so every column contributes
    * equally at every scale of the curve (the lakehouse OPTIMIZE
    * ZORDER BY (c1, .., cn) shape). n * bits result bits — must fit a
    * signed long. Callers bucket raw values first (e.g.
    * `floor(price / width)`), capping with `pmod(x, 1 << bits)`.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "need at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits = ${n * bits} must fit in a signed long")
    (for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_.bitwiseOR(_))
  }

  /** 2-D special case (x in even positions, y in odd) — identical bit
    * layout to `zValueN(Seq(x, y), bits)`.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** The matching DuckDB SQL for `zValueN` — keeps the driver oracle
    * and the Spark expression in one place (same term layout).
    * Operands must be non-negative: DuckDB's % follows the dividend's
    * sign while Spark's pmod never goes negative, so callers mirror
    * pmod as ((v % m) + m) % m in the oracle when bucketing.
    */
  def zValueNSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield s"((($c >> $b) & 1) << ${b * n + i})")
      .mkString("(", " | ", ")")
  }

  def zValueSql(x: String, y: String, bits: Int = 16): String =
    zValueNSql(Seq(x, y), bits)

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
