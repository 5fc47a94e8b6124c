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
    *                become inserts). MUST be key-unique — a duplicate
    *                key would fan the snapshot row out into duplicates
    *                (standard MERGE raises on multiple source matches).
    * @param key     join key column present in both
    * @param validateUnique when true, spend one aggregation job
    *                asserting the changeset is key-unique before
    *                merging; leave false when uniqueness is
    *                guaranteed by construction (e.g. a groupBy).
    * @return merged snapshot: updated ∪ inserted ∪ untouched rows.
    *         Columns = target's; a column absent from `updates` keeps
    *         the target value; an inserted row has nulls there.
    */
  def upsert(target: DataFrame, updates: DataFrame, key: String,
      validateUnique: Boolean = false): DataFrame = {
    if (validateUnique) {
      // count(lit(1)) into a reserved alias — groupBy(key).count()
      // would produce a second column named "count", ambiguous when
      // the key itself is named "count".
      val dup = updates.groupBy(key)
        .agg(count(lit(1)).as("__graft_n"))
        .filter(col("__graft_n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"changeset has duplicate key ${dup.headOption.map(_.get(0)).orNull}")
    }
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
