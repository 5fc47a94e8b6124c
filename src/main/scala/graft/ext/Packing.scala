package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-token-budget training
  * bins via an exclusive running token total. One lineage shared by
  * `pack_sequences` (the assignment itself) and `pack_report` (the
  * utilization report over the same bins).
  *
  * The window key is (lang, shard): a handful of langs alone would
  * concentrate a 100 TB corpus onto a handful of window tasks, so
  * deterministic doc_id shards keep every window partition bounded
  * while bins stay contiguous within a shard (training batches don't
  * need global contiguity).
  */
object Packing {

  /** @return (doc_id, lang, shard, n_tok, pack_id) — pack_id is the
    * bin index within (lang, shard), budget tokens per bin. */
  def assign(docs: DataFrame, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    require(budget > 0 && shards > 0, s"bad packing: $budget/$shards")
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(Dedup.tokens(col("text"))).as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / lit(budget)).cast("long")
          .as("pack_id"))
  }
}
