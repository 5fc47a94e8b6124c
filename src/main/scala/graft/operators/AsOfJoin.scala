package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the LATEST right row
  * of the same key with right.ts <= left.ts.
  *
  * Implementation is the scalable union-sort-window formulation:
  * tag both inputs, union them, and carry the last non-null right
  * payload forward within each key ordered by (ts, side) — right rows
  * sort BEFORE left rows at equal timestamps, so ties match
  * (`right.ts <= left.ts`, DuckDB ASOF semantics).
  *
  * Cost shape: ONE shuffle by key + one windowed scan — no range cross
  * product, no per-row subquery. At 100 TB this is a standard
  * sort-merge pass; skewed keys are plain window-partition skew
  * (saltable if a single key dominates).
  */
object AsOfJoin {

  /** @param left        rows to enrich (must contain `keyCol`, `leftTs`)
    * @param right       lookup rows (must contain `keyCol`, `rightTs`)
    * @param keyCol      equi-join key, same name on both sides
    * @param leftTs      left timestamp column name
    * @param rightTs     right timestamp column name
    * @param payloadCols right columns to attach
    * @return left rows + `asof` struct of (rightTs, payloadCols...),
    *         null when no right row precedes the left row.
    *
    * If several right rows share (key, ts), the surviving payload is
    * the max struct (deterministic tiebreak on payload order).
    */
  def lastEarlier(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(rightTs).as("__t"),
        struct((col(rightTs) +: payloadCols.map(col)): _*).as("__pay"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__pay")
  }
}
