package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: apply a changeset to
  * a versioned dimension, closing the current row of every key whose
  * attributes actually changed and appending the new version — the
  * warehouse pattern that keeps FULL HISTORY (vs `Upsert`'s Type-1
  * overwrite).
  *
  * Versioning columns: `valid_from` / `valid_to` (null = open) /
  * `is_current`. Plan shape: one key-hashed join of the changeset
  * against the CURRENT slice (history rows never move), a null-safe
  * attribute comparison to drop no-op changes map-side, then three
  * union legs (kept / closed / inserted). AQE broadcasts the
  * changeset when it is small — the common dimension-maintenance
  * regime; nothing collects to the driver.
  */
object Scd2 {

  /** @param dim       versioned dimension: keyCol ++ attrCols ++
    *                   (validFrom, validTo, currentFlag)
    * @param changes   changeset: keyCol ++ attrCols (latest value per
    *                   key — one row per key)
    * @param changeDate effective date of this batch (closes old rows,
    *                   opens new ones)
    * @return the maintained dimension, same schema as `dim`
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCol: String,
      attrCols: Seq[String], changeDate: Column,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      currentFlag: String = "is_current"): DataFrame = {
    val expected = (keyCol +: attrCols) ++
      Seq(validFrom, validTo, currentFlag)
    require(dim.columns.toSet == expected.toSet,
      s"dim columns ${dim.columns.toSeq} != expected $expected")
    val outCols = dim.columns.toSeq.map(col)
    val cur = dim.filter(col(currentFlag))
    val hist = dim.filter(!col(currentFlag))
    // a change is REAL when the key is new or any attribute differs
    // (null-safe compare — an all-null changeset row for a new key is
    // indistinguishable from absence and is dropped)
    val chg = changes.select(col(keyCol) +:
      attrCols.map(a => col(a).as(s"__n_$a")): _*)
    val isReal = attrCols
      .map(a => !(col(a) <=> col(s"__n_$a"))).reduce(_ || _)
    val real = chg
      .join(cur.select(col(keyCol) +: attrCols.map(col): _*),
        Seq(keyCol), "left")
      .filter(isReal)
      .select(col(keyCol) +: attrCols.map(a => col(s"__n_$a").as(a)): _*)
      .localCheckpoint(false) // feeds the semi/anti splits + the insert
    val realKeys = real.select(keyCol)
    val closed = cur.join(realKeys, Seq(keyCol), "left_semi")
      .withColumn(validTo, changeDate.cast("date"))
      .withColumn(currentFlag, lit(false))
    val kept = cur.join(realKeys, Seq(keyCol), "left_anti")
    val inserted = real
      .withColumn(validFrom, changeDate.cast("date"))
      .withColumn(validTo, lit(null).cast("date"))
      .withColumn(currentFlag, lit(true))
    hist.select(outCols: _*)
      .unionByName(kept.select(outCols: _*))
      .unionByName(closed.select(outCols: _*))
      .unionByName(inserted.select(outCols: _*))
  }
}
