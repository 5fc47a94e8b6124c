package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` holds the DuckDB-runnable
  * equivalent for every SQL-expressible entry. Keys missing from
  * `oracleSql` get the driver's weaker rows-only check (hash-divergent
  * ops: approximate sketches, Spark-hash-dependent LSH internals).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.queries("etl_filter_project")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ RelationalQueries.queries ++
      ExtendedQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlQueries.oracleSql ++ RelationalQueries.oracleSql ++
      ExtendedQueries.oracleSql ++ PipelineQueries.oracleSql

  /** EQUALITY REFEREES (r17 — VERDICT r16 #7): queries that re-mine /
    * re-scan the corpus from scratch on every run and exist in the
    * battery ONLY to hash-pin their index-served scale-path
    * replacements (which share their oracles verbatim). They stay in
    * the battery — the equality check is the point — but they are NOT
    * the plan production would run at 100 TB, so the bench reports a
    * scale-path total alongside the full total
    * (`value_scale_path` in the summary line). Each entry names its
    * shipped replacement:
    *
    *   - dedup_minhash / dedup_ngram → dedup_minhash_index_pairs /
    *     dedup_ngram_index_pairs (at-rest signatures, no text re-sign)
    *   - dedup_incremental → dedup_minhash_index (index-served probe)
    *   - dedup_groups / dedup_survivors → the _incremental / _index
    *     at-rest groups chain
    *   - dedup_embed (sign-LSH, measured 25x at 10x data) →
    *     dedup_embed_ann / _p8 (capacity-bounded cells, ~linear)
    *   - dedup_embed_ann_groups (per-run re-mine + CC) →
    *     dedup_embed_ann_groups_index (at-rest labels)
    *   - dedup_bloom (per-run bitmap re-fold) → dedup_bloom_index
    *   - pipeline_ingest_gates (all-legs-always) →
    *     pipeline_ingest_gates_fast / _composed (short-circuited)
    */
  val refereeQueries: Set[String] = Set(
    "dedup_minhash", "dedup_ngram", "dedup_incremental",
    "dedup_groups", "dedup_survivors", "dedup_embed",
    "dedup_embed_ann_groups", "dedup_bloom", "pipeline_ingest_gates")
}
