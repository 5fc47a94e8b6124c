package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw documents whose hashed n-gram feature distribution
  * looks like a TARGET distribution (the paper targets Wikipedia/
  * books; here any caller-supplied predicate marks the target split).
  * This is the modern pretraining-corpus selection method next to the
  * classifier gate (`ext/NaiveBayes`) and the perplexity gate
  * (`text_lm_score`) — the reference engine has no data-selection
  * surface at all.
  *
  * Log importance weight of a doc x under bag-of-hashed-unigram
  * multinomials with add-one smoothing over `buckets` features:
  *
  *   log w(x) = Σ_tokens [ log p_target(f) − log p_raw(f) ]
  *     p_target(f) = (ct_f + 1) / (Tt + B),   p_raw analogously
  *
  * Exact-numerics policy (docs/HASH_NUMERICS.md): every log2 is
  * quantized to the integer `bit_length = floor(log2 n) + 1` via
  * `length(bin(n))` — exact and identical on every engine — so the
  * per-token contribution is the INTEGER
  *
  *   [bitlen(ct+1) − bitlen(cr+1)] + [bitlen(Tr+B) − bitlen(Tt+B)]
  *
  * and doc weights are BIGINT sums: order-independent, no float-log /
  * summation-order seam, oracle-replayable bit-for-bit. Selection is
  * the deterministic analog of the paper's Gumbel top-k: rank by
  * (weight desc, doc_id) and keep the top k.
  *
  * Design for 100 TB:
  *   - The feature table is ONE map-side-combinable
  *     `groupBy(bucket)` with conditional sums, bounded by `buckets`
  *     rows at any corpus size (hashed features, never a vocabulary
  *     scan); corpus token totals fold out of that same bounded table
  *     (no extra pass).
  *   - Scoring broadcasts the bounded table; the only data-sized
  *     shuffle is the per-doc weight aggregation. DSIR is inherently
  *     two-pass over the corpus (estimate, then score) — both passes
  *     are single scans.
  *   - Top-k runs as TakeOrderedAndProject: per-partition bounded
  *     heaps merged on the driver, never a global sort.
  */
object Dsir {

  /** Bounded feature table `(b, ct, cr)`: per-bucket token-occurrence
    * counts on the target (`isTarget`) and raw (rest) splits. At most
    * `buckets` rows regardless of corpus size.
    */
  def featureTable(docs: DataFrame, isTarget: Column,
      buckets: Int, textCol: String = "text"): DataFrame =
    ScanSpread.spread(docs)
      .select(isTarget.as("tgt"),
        explode(Dedup.tokens(col(textCol))).as("t"))
      .select(col("tgt"),
        Sampling.hashBucket(col("t"), "dsir", buckets).as("b"))
      .groupBy("b")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))

  /** Per-doc quantized log importance weight `(doc_id, w, tgt)` —
    * the id/text columns are `idCol`/`textCol` (defaults match the
    * testdata `documents` table; the output id column is always named
    * `doc_id`) —
    * `tgt` marks docs of the target split (carried through the score
    * agg so selection needs no extra corpus-sized join). Docs with
    * no tokens (empty text) have no feature rows and drop out — a doc
    * scored against the split it was counted in always has every
    * token's bucket present, so nothing else can drop.
    */
  def weights(docs: DataFrame, isTarget: Column, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Two consumers of the bounded feature table (totals fold +
    // broadcast) — checkpoint it so the corpus-sized tokenize/count
    // subtree is guaranteed to run once even if exchange reuse is
    // off or AQE re-plans (the contamination_check pattern); the
    // checkpointed table itself is <= `buckets` rows.
    val ft = featureTable(docs, isTarget, buckets, textCol)
      .localCheckpoint(false)
    // Corpus token totals from the bounded table — no second pass.
    val totals = ft.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val perTok = lit(buckets)
    ScanSpread.spread(docs)
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        explode(Dedup.tokens(col(textCol))).as("t"))
      .select(col("doc_id"), col("tgt"),
        Sampling.hashBucket(col("t"), "dsir", buckets).as("b"))
      .join(broadcast(ft), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(length(bin(col("ct") + 1)) -
          length(bin(col("cr") + 1))).cast("long").as("s"),
        count(lit(1)).as("n"),
        max(col("tgt")).as("tgt"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (col("s") + col("n") *
          (length(bin(col("tr") + perTok)) -
           length(bin(col("tt") + perTok))).cast("long")).as("w"),
        col("tgt"))
  }

  /** The selection: top `k` RAW docs (target docs score high by
    * construction and are excluded — DSIR selects from the raw pool)
    * by importance weight, total deterministic order (w desc, doc_id
    * asc). Runs as TakeOrderedAndProject — bounded per-partition
    * heaps, never a global sort.
    */
  def selectTopK(docs: DataFrame, isTarget: Column, buckets: Int,
      k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    weights(docs, isTarget, buckets, idCol, textCol)
      .filter(!col("tgt"))
      .orderBy(col("w").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("w"))
}
