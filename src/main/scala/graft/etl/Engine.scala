package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.dsl.{Ast, Compiler, Parser}
import graft.functions.GraftFunctions

/** The core ETL pipeline: read → compile rules → filter → project →
  * (write). Spark-first rendering of `/root/reference/main.gs:38-139`
  * (`runMapping`).
  *
  * Scale notes (100 TB posture):
  *   - Rule compilation is driver-side and O(rules); the produced plan
  *     is a single Filter + Project over the scan — embarrassingly
  *     parallel, no shuffle, fully whole-stage-codegen'd. Filters on
  *     typed sources push down to the scan.
  *   - ONLY when a mapping uses `self[]` (output-row A1 addressing) do
  *     we need a global row number — a global property, but NOT an
  *     inherently single-task one: the rows sort by the order key
  *     (range exchange) and are then numbered per partition with
  *     broadcast partition-count offsets (`RDD.zipWithIndex`, Spark's
  *     own count-job + offset-map implementation of the distributed
  *     prefix sum). No single-partition window anywhere; mappings
  *     without `self[]` never pay any of it.
  */
object Engine {

  private val IngestCol = "__graft_ingest"
  private val RowPosCol = "__graft_rowpos"

  /** Apply a Map-sheet rule list to a source table.
    *
    * @param source    any DataFrame; converted to the display-string
    *                  view (all columns cast to string, null → "",
    *                  duplicate headers last-wins) per `main.gs:52-59`
    * @param mapRules  (output header | `_filter:` tag, instruction)
    *                  pairs in Map-sheet order, header row excluded
    * @param ingestOrder expressions defining "spreadsheet row order"
    *                  for `self[]` addressing and order-preserving
    *                  sinks. Defaults to an ingest index stamped at
    *                  scan time. Must be provided (e.g. a key column)
    *                  when deterministic cross-engine row numbering is
    *                  required.
    */
  def transform(source: DataFrame, mapRules: Seq[(String, String)],
      ingestOrder: Seq[Column] = Nil): DataFrame = {
    val display = GraftFunctions.displayString(source)
    if (display.columns.isEmpty)
      throw Ast.DslError("Source has no header row.")
    val rules = Parser.parse(mapRules, display.columns.toSeq)

    val needsIngestStamp = rules.usesSelf && ingestOrder.isEmpty
    val ordered =
      if (needsIngestStamp)
        display.withColumn(IngestCol, monotonically_increasing_id())
      else display

    val orderCols: Seq[Column] =
      if (ingestOrder.nonEmpty) ingestOrder else Seq(col(IngestCol))
    // 1-based POST-filter row position (main.gs:69): numbers the rows
    // that survived the filter, in ingest order. Computed ONLY for
    // `self[]` mappings, and distributed: global sort (one range
    // exchange), then monotonically_increasing_id — whose value is exactly
    // (partition_id << 33) + local_row_index, i.e. the shard id and
    // within-shard position in one narrow projection. Per-shard
    // counts cumsum over the ≤|partitions|-row subtotal table (the
    // sample_pps shard-offset pattern; pmod keeps the constant
    // partition key non-foldable), broadcast back, global position =
    // offset + local index + 1. Range-partition ids ascend with the
    // sort order and the local index follows the within-partition
    // sort, so the numbering equals rank in global ingest order. The
    // stamped subtree has two consumers whose shard ids MUST come
    // from one physical layout: AQE can re-plan the range exchange
    // differently per consumer (observed at sf1.0 — coalesced
    // partition counts diverged, so the offset table covered fewer
    // shards than the data and the join dropped rows), so the
    // stamped frame is localCheckpoint'd: one materialization that
    // every consumer and every downstream action reads (the old
    // zipWithIndex shape re-ran the whole scan+filter+sort lineage
    // per action on top of its eager count job). Under AQE the
    // checkpoint materializes the sort's stages at transform() time
    // even with eager=false — the accepted cost of layout
    // consistency.
    val compiled = Compiler.compile(rules, display.columns.toSeq,
      col(RowPosCol))
    val filtered = ordered.filter(compiled.filter)
    val numbered =
      if (!rules.usesSelf) filtered
      else {
        val mid = "__graft_mid"
        val shard = "__graft_shard"
        val localMask = (1L << 33) - 1L
        val stamped = filtered.orderBy(orderCols: _*)
          .withColumn(mid, monotonically_increasing_id())
          .localCheckpoint(false)
        val offs = stamped
          .groupBy(shiftright(col(mid), 33).as(shard))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(
            sum(col("cnt")).over(
              Window.partitionBy(pmod(col(shard), lit(1)))
                .orderBy(shard)
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select(col(shard), col("off"))
        stamped
          .withColumn(shard, shiftright(col(mid), 33))
          .join(broadcast(offs), shard)
          .withColumn(RowPosCol,
            col("off") + (col(mid).bitwiseAND(localMask)) + 1L)
          .drop(mid, shard, "off")
      }
    numbered.select(compiled.projections: _*)
  }

  /** Full three-sheet run over CSV "sheets" in a directory:
    * `<dir>/<config.source>.csv` + `<dir>/<config.map>.csv` →
    * overwrite `<dir>/<config.output>` (CSV, header) —
    * clear-then-write ≙ `mode("overwrite")` (`main.gs:124-129`).
    */
  def runMapping(spark: SparkSession, dir: String,
      config: EngineConfig = EngineConfig()): Long = {
    val source = readSheetCsv(spark, s"$dir/${config.source}.csv")
    val rules = sheetPairs(readSheetCsv(spark, s"$dir/${config.map}.csv"))
    val out = transform(source, rules)
    out.write.mode("overwrite").option("header", true)
      .option("escape", "\"").csv(s"$dir/${config.output}")
    out.count()
  }

  /** All-string CSV read — the file text IS the display value
    * (`inferSchema=false` keeps getDisplayValues semantics).
    * `escape="` reads RFC-4180 doubled-quote escaping (what a
    * spreadsheet CSV export produces); Spark's default `\` escape
    * silently mis-parses quoted rule text otherwise.
    */
  def readSheetCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", false)
      .option("escape", "\"").csv(path)

  /** First two columns of a sheet as (colA, colB) pairs, null-safe —
    * the shape of both the Map rules and the Dashboard key/values.
    * One definition so null/short-row handling can't drift between
    * the batch CLI, the stream CLI, and runMapping.
    */
  def sheetPairs(df: DataFrame): Seq[(String, String)] =
    df.collect().toSeq.map { r =>
      (Option(r.get(0)).map(_.toString).getOrElse(""),
       if (r.size > 1) Option(r.get(1)).map(_.toString).getOrElse("")
       else "")
    }
}
