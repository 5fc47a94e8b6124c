package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed training of a hashed-feature multinomial text
  * classifier — the offline step behind every fastText/CCNet-style
  * corpus quality or language gate (the reference engine has no
  * learning surface at all; this is driver-mandated pipeline depth
  * next to the inference-only `text_classify_hash`).
  *
  * Design for 100 TB:
  *   - TRAIN is one `groupBy(label, bucket).count()` — map-side
  *     combinable, and the result is bounded by |labels| × buckets
  *     rows regardless of corpus size (hashed features, never a
  *     vocabulary scan).
  *   - CLASSIFY broadcasts that bounded weight table; the only
  *     data-sized shuffle is the per-doc score aggregation, and the
  *     argmax window partitions by doc_id (never global).
  *
  * Exact-numerics policy (docs/HASH_NUMERICS.md): the per-token
  * log-likelihood is quantized to `bit_length(count) = floor(log2
  * count) + 1` — an INTEGER computed via `length(bin(count))`, which
  * is exact and identical on every engine. Scores are then BIGINT
  * sums: order-independent, oracle-replayable, no float-log /
  * summation-order seam, and the argmax tie-break (score desc, label
  * asc) is total. The class prior is deliberately omitted (uniform
  * prior) — with per-class token volumes this close the likelihood
  * term dominates, and adding a float prior would reopen the seam.
  */
object NaiveBayes {

  /** Weight table `(wl, b, w)` from labeled docs: token occurrences
    * hashed into `buckets` features, `w = bit_length(count)`.
    */
  def trainWeights(docs: DataFrame, labelCol: String,
      buckets: Int): DataFrame =
    docs
      .select(col(labelCol).as("wl"),
        explode(Dedup.tokens(col("text"))).as("t"))
      .select(col("wl"),
        Sampling.hashBucket(col("t"), "nb", buckets).as("b"))
      .groupBy("wl", "b")
      .agg(count(lit(1)).as("cnt"))
      .select(col("wl"), col("b"),
        length(bin(col("cnt"))).cast("long").as("w"))

  /** Per-doc argmax prediction against a (broadcast) weight table.
    * Docs whose tokens hit no trained bucket for ANY class drop out
    * (they have no score row — the caller decides a fallback); any
    * doc with at least one hit keeps every class it overlaps, and
    * absent classes can only lose (scores are sums of positive
    * weights, so a missing class's implicit 0 never beats a present
    * one).
    */
  def classify(docs: DataFrame, weights: DataFrame, labelCol: String,
      buckets: Int): DataFrame = {
    val tb = docs
      .select(col("doc_id"), col(labelCol).as("true_label"),
        explode(Dedup.tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("true_label"),
        Sampling.hashBucket(col("t"), "nb", buckets).as("b"))
    tb.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"), col("wl"))
      .agg(max(col("true_label")).as("true_label"),
        sum(col("w")).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("wl"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("wl").as("pred_label"), col("score"),
        col("true_label"),
        (col("wl") === col("true_label")).as("correct"))
  }
}
