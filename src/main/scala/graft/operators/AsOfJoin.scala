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
    * Null-timestamp convention (all three operators): a right row
    * with a null ts matches nothing; a LEFT row with a null ts gets
    * a null `asof` — never a phantom nulls-first match.
    */
  def lastEarlier(left: DataFrame, right0: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    // a right row with no timestamp matches nothing — left in, it
    // would sort nulls-first and become a phantom "earliest" payload
    val right = right0.filter(col(rightTs).isNotNull)
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

  /** Backward as-of with a staleness bound (pandas `merge_asof`
    * `tolerance`): the [[lastEarlier]] match is DISCARDED — null
    * `asof` — when the matched right row is more than `tolerance`
    * behind the left timestamp. Because the backward match is by
    * definition the LATEST right row `<=` the left ts, a post-check on
    * the carried right ts is exact (any other right row is staler), so
    * the bound costs one map-side comparison on top of the same single
    * shuffle + window — never a second join. `tolerance` is in the ts
    * column's integral domain: MICROSECONDS for timestamps, raw units
    * for integral keys.
    */
  def lastEarlierWithin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      payloadCols: Seq[String], tolerance: Long): DataFrame = {
    val toLong: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      left.schema(leftTs).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros
        case _ => _.cast("long")
      }
    lastEarlier(left, right, keyCol, leftTs, rightTs, payloadCols)
      .withColumn("asof", when(
        toLong(col(leftTs)) - toLong(col(s"asof.$rightTs")) <= tolerance,
        col("asof")))
  }

  /** Forward as-of: for each left row, the EARLIEST right row of the
    * same key with right.ts >= left.ts (ties match). Same
    * union-sort-window cost shape as [[lastEarlier]]; left rows sort
    * BEFORE right rows at equal timestamps so an equal-ts right lands
    * in the left row's forward frame. Several right rows sharing
    * (key, ts) resolve to the min struct — deterministic.
    */
  def firstLater(left: DataFrame, right0: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val right = right0.filter(col(rightTs).isNotNull)
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(0))
    val r = right.select(col(keyCol), col(rightTs).as("__t"),
        struct((col(rightTs) +: payloadCols.map(col)): _*).as("__pay"))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__side"), col("__pay"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      // a null LEFT ts sorts nulls-first and would otherwise see every
      // right row in its forward frame and claim the earliest payload;
      // it must get a null asof, mirroring lastEarlier (where the
      // empty backward frame yields null for the same input)
      .withColumn("asof", when(col("__t").isNotNull,
        first(col("__pay"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 0)
      .drop("__t", "__side", "__pay")
  }

  /** Nearest as-of (timestamp keys): the right row minimizing the
    * absolute time distance; an exact tie prefers the EARLIER side
    * (pandas merge_asof direction='nearest' with a deterministic
    * tie). ONE shuffle by key feeds BOTH direction windows — the
    * backward pass sees equal-ts rights (they sort first), the
    * forward pass starts strictly after them, which is harmless: an
    * equal-ts match has distance 0 and the backward side wins ties
    * by definition.
    */
  def nearest(left: DataFrame, right0: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    // the micros/long converter below is chosen from the LEFT ts
    // dtype but applied to both sides — mixed dtypes would compute
    // distances in mixed units (or fail analysis) instead of
    // diverging silently
    require(left.schema(leftTs).dataType ==
        right0.schema(rightTs).dataType,
      s"nearest: leftTs ${left.schema(leftTs).dataType} and rightTs " +
        s"${right0.schema(rightTs).dataType} must have the same type")
    val right = right0.filter(col(rightTs).isNotNull)
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(rightTs).as("__t"),
        struct((col(rightTs) +: payloadCols.map(col)): _*).as("__pay"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val ord = Seq(col("__t"), col("__side"), col("__pay"))
    val wb = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // distance in the ts column's own integral domain: micros for
    // timestamps, the raw value for integral keys
    val toLong: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      left.schema(leftTs).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros
        case _ => _.cast("long")
      }
    val distB = toLong(col("__t")) - toLong(col(s"__back.$rightTs"))
    val distF = toLong(col(s"__fwd.$rightTs")) - toLong(col("__t"))
    unioned
      .withColumn("__back", last(col("__pay"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", first(col("__pay"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("asof",
        // null LEFT ts: no distance is defined — null asof, matching
        // lastEarlier/firstLater (without this branch the row would
        // sort nulls-first and claim the earliest right payload)
        when(col("__t").isNull, lit(null))
          .when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(distB <= distF, col("__back"))
          .otherwise(col("__fwd")))
      .drop("__t", "__side", "__pay", "__back", "__fwd")
  }
}
