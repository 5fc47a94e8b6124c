package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert as a batch operator: apply a changeset to a snapshot,
  * source-wins per column — the maintenance pass every incremental
  * pipeline needs (no table format required; works on plain parquet).
  *
  * Shape: one full-outer shuffle join on the key. At scale both sides
  * hash-partition on the key; if the target is bucketed by the key the
  * join is shuffle-free on that side, and AQE handles a skewed
  * changeset. No driver involvement, no collect.
  */
object Upsert {

  /** @param target  current snapshot
    * @param updates changeset; same key column name, update columns
    *                are a subset of the target's (missing target rows
    *                become inserts)
    * @param key     join key column present in both
    * @return merged snapshot: updated ∪ inserted ∪ untouched rows.
    *         Columns = target's; a column absent from `updates` keeps
    *         the target value; an inserted row has nulls there.
    */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val t = target.alias("t")
    val u = updates.alias("u")
    val updateCols = updates.columns.toSet - key
    val merged = t.join(u, t(key) === u(key), "full_outer")
    val outCols = target.columns.map { c =>
      if (c == key) coalesce(u(key), t(key)).as(key)
      else if (updateCols(c)) coalesce(u(c), t(c)).as(c)
      else t(c).as(c)
    }
    merged.select(outCols.toIndexedSeq: _*)
  }
}
