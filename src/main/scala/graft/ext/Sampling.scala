package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Everything here is a pure map-side predicate — sampling never
  * shuffles, never collects, and commutes with partition pruning, so
  * it costs one scan at any corpus size. Determinism (hash of a key,
  * not `rand()`) makes samples reproducible across runs/engines and
  * lets an oracle re-derive the exact membership.
  */
object Sampling {

  /** Uniform hash bucket in [0, buckets): the first 8 hex digits of
    * md5(salt ++ key) as an integer, mod buckets. Cross-engine: DuckDB
    * computes the identical value as
    * `('0x' || substr(md5(salt || key), 1, 8))::BIGINT % buckets`.
    */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets

  /** Keep a row iff its hash bucket falls below `pctCol` (a per-row
    * percentage in [0,100]) — stratified sampling when pctCol varies
    * by stratum. The filter is pushable and shuffle-free.
    */
  def stratifiedKeep(key: Column, salt: String, pctCol: Column): Column =
    hashBucket(key, salt, 100) < pctCol

  /** Importance sampling: keep with probability `weight * rate`
    * (clamped at 1 by construction when weight * rate <= 1) — the
    * curation shape that keeps MORE of the high-quality documents.
    * A 1e6-bucket uniform gives ~1e-6 rate resolution; still one
    * map-side pushable predicate, still exactly reproducible by the
    * oracle (same md5 uniform, same single double multiply).
    */
  def weightedKeep(key: Column, salt: String, weight: Column,
      rate: Double): Column =
    hashBucket(key, salt, 1000000) < weight * (rate * 1e6)
}
