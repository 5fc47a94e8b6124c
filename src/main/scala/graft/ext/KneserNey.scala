package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language-model scoring — the
  * modern smoothing family (Kneser & Ney 1995; Chen & Goodman 1998)
  * next to the add-one model of `text_lm_score`, and the scorer a
  * CCNet-style perplexity gate would actually ship. The reference
  * engine has no LM surface; this is driver-mandated pipeline depth.
  *
  * Model, with discount d = 3/4 (dyadic on purpose):
  *
  *   p_KN(w|v) = max(c(vw) − d, 0)/c(v)
  *             + d·N1+(v·)/c(v) · N1+(·w)/N1+(··)
  *
  * where c(·) are reference-split bigram counts, N1+(v·) the number
  * of distinct continuations of v, N1+(·w) the number of distinct
  * contexts of w (the "novel-continuation" count that distinguishes
  * KN from plain interpolation), and N1+(··) the number of distinct
  * bigram types. Multiplying through by 4·c(v)·N1+(··) makes the
  * probability an EXACT BIGINT rational:
  *
  *   num = max(4·c(vw) − 3, 0)·Ncc + 3·N1+(v·)·max(N1+(·w), 1)
  *   den = 4·c(v)·Ncc
  *
  * An unseen context v backs off to the continuation distribution
  * alone: num = max(N1+(·w), 1), den = Ncc (the max(·,1) is the OOV
  * floor of one continuation type). No floats anywhere; the
  * per-bigram log2 is the bit_length quantization of
  * docs/HASH_NUMERICS.md form 4 — wq = bitlen(num) − bitlen(den) —
  * so doc scores are order-independent BIGINT sums, replayable
  * bit-for-bit by the DuckDB oracle.
  *
  * Design for 100 TB:
  *   - Training is bigram-TYPE-bounded: one groupBy(v,w) count, then
  *     two aggregates OVER THAT TABLE (contexts, continuations) and
  *     a 1-row type total — never a second corpus pass. The count
  *     table is checkpointed once for its four consumers.
  *   - Scoring is one lag window per doc (doc-partitioned) plus
  *     keyed joins against the bounded model tables; the model side
  *     of each join is the small side at any corpus scale.
  *   - Overflow ceiling: c(v)·Ncc < 2^61. At trillion-token scale
  *     train the reference model on a sample (standard practice) —
  *     the SCORED side is unbounded either way.
  */
object KneserNey {

  /** Required input schema for every entry point here: a `doc_id`
    * column (any orderable type) and a STRING `text` column — the
    * testdata `documents` shape. Fixed names, not parameters: the
    * model tables and gate share these internally, so a clear
    * fail-fast beats a silently-bound unrelated column.
    */
  private def requireDocs(df: DataFrame, where: String): Unit =
    for (c <- Seq("doc_id", "text"))
      require(df.columns.contains(c),
        s"KneserNey.$where needs a `$c` column; got " +
          df.columns.mkString("[", ", ", "]"))

  /** Word stream used by both LM scorers: lowercase letter runs. */
  private def toks(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      posexplode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as(Seq("pos", "w")))

  private def bigramRows(df: DataFrame): DataFrame =
    toks(df)
      .withColumn("w2", lead(col("w"), 1).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"), col("w2"))

  /** The quantized-KN weight from the (possibly-null) joined model
    * columns — shared by the batch scorer and the streaming `knGate`
    * so the two can never drift. `ncc` is a column here (the batch
    * path cross-joins the 1-row type total; the gate folds it to a
    * literal to avoid a stream-static cross join).
    */
  private[graft] def wq(c2: Column, cv: Column, nv: Column,
      nw: Column, ncc: Column): Column = {
    val cb = coalesce(c2, lit(0L))
    val nw1 = greatest(coalesce(nw, lit(0L)), lit(1L))
    val num = when(cv.isNotNull,
      greatest(cb * 4 - 3, lit(0L)) * ncc + nv * 3 * nw1)
      .otherwise(nw1)
    val den = when(cv.isNotNull, cv * 4 * ncc).otherwise(ncc)
    (length(bin(num)) - length(bin(den))).cast("long")
  }

  /** The trained model: bigram counts (w1, w2, c2), context stats
    * (v1, cv, nv), continuation stats (v2, nw), and the bigram-type
    * total as a SCALAR (so a streaming consumer needs no
    * stream-static cross join). All three tables are
    * bigram-TYPE-bounded.
    */
  case class Model(bigrams: DataFrame, contexts: DataFrame,
    continuations: DataFrame, nccTypes: Long)

  /** Train the KN model tables on a reference corpus. Runs one Spark
    * job (the type-total count; the checkpoint materializes under
    * it), like any training step.
    */
  def trainModel(refDocs: DataFrame): Model = {
    requireDocs(refDocs, "trainModel")
    val big = bigramRows(refDocs)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    Model(big,
      big.groupBy(col("w1").as("v1"))
        .agg(sum(col("c2")).as("cv"), count(lit(1)).as("nv")),
      big.groupBy(col("w2").as("v2"))
        .agg(count(lit(1)).as("nw")),
      big.count())
  }

  /** Per-bigram quantized KN log-scores of every non-reference doc:
    * (doc_id, known, wq) — `known` marks bigrams seen in the
    * reference split, `wq = bitlen(num) − bitlen(den)` the
    * integer-quantized log2 of the exact rational p_KN.
    *
    * @param refPred marks the training (reference) split; everything
    *                else is scored.
    */
  def bigramScores(docs: DataFrame, refPred: Column): DataFrame = {
    requireDocs(docs, "bigramScores")
    // bigram-type count table — four consumers (contexts,
    // continuations, type total, score join): checkpoint so the
    // reference corpus is tokenized once
    val big = bigramRows(docs.filter(refPred))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    val ctx = big.groupBy(col("w1").as("v1"))
      .agg(sum(col("c2")).as("cv"), count(lit(1)).as("nv"))
    val cont = big.groupBy(col("w2").as("v2"))
      .agg(count(lit(1)).as("nw"))
    val ncc = big.agg(count(lit(1)).as("ncc"))
    bigramRows(docs.filter(!refPred))
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, col("w1") === col("v1"), "left").drop("v1")
      .join(cont, col("w2") === col("v2"), "left").drop("v2")
      .crossJoin(broadcast(ncc))
      .select(col("doc_id"),
        col("c2").isNotNull.cast("long").as("known"),
        wq(col("c2"), col("cv"), col("nv"), col("nw"), col("ncc"))
          .as("wq"))
  }

  /** Per-doc roll-up: (doc_id, n_bigrams, n_known, kn_logq) with
    * kn_logq = Σ wq, the sum of bit_length-quantized log2 p_KN — the
    * integer total order a perplexity gate thresholds on.
    */
  def docScores(docs: DataFrame, refPred: Column): DataFrame =
    bigramScores(docs, refPred)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("known")).as("n_known"),
        sum(col("wq")).as("kn_logq"))
}
