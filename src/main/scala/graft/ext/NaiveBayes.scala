package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
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
  *     vocabulary scan). The per-class totals are a window over
  *     that bounded table, partitioned by class.
  *   - CLASSIFY broadcasts the bounded weight table; token rows
  *     fan out by |labels| (full class coverage — see below) and
  *     the only data-sized shuffle is the per-doc score
  *     aggregation. The argmax window partitions by doc_id, never
  *     global.
  *
  * Model: multinomial NB with Laplace smoothing and a uniform class
  * prior — `log p(bucket|class) = log(cnt+1) - log(tot_c+B)` where
  * `tot_c` is the class's training-token count and `B` the bucket
  * count. The denominator matters: without it every shared bucket's
  * weight scales with class volume and the classifier is
  * systematically biased toward the biggest class. Unseen
  * (class,bucket) pairs score `log(1) - log(tot_c+B)` — each class
  * scores EVERY token of a doc, hit or not, so a class cannot gain
  * by merely missing buckets (log-probabilities are negative; under
  * a hits-only sum a miss would out-score a hit).
  *
  * Exact-numerics policy (docs/HASH_NUMERICS.md form 4): each log2
  * term is quantized to HALF-bit precision with pure integer
  * arithmetic — `bit_length(n·n) - 1 = floor(2·log2 n)`, computed
  * via `length(bin(n*n))`, identical on every engine. Scores are
  * BIGINT sums: order-independent, oracle-replayable, no float-log
  * or summation-order seam, and the argmax tie-break (score desc,
  * label asc) is total. Squaring bounds `tot_c + B < 2^31.5`
  * (~3.0e9 training tokens per class); beyond that, train on a
  * per-class sample or shard labels — the weight table itself is
  * volume-independent.
  */
object NaiveBayes {

  /** floor(2·log2 n) + 1 for positive integer n, as a long column —
    * the half-bit log2 quantum (bit_length of n², exact integers
    * both engines).
    */
  private def bitLen2(n: Column): Column =
    length(bin(n * n)).cast("long")

  /** Weight table `(wl, b, w, u)` from labeled docs: token
    * occurrences hashed into `buckets` features,
    * `w = floor(2·log2(cnt+1)) - floor(2·log2(tot_c+buckets))` (the
    * half-bit-quantized Laplace log-likelihood, numerator AND
    * denominator so class volume cancels) and `u` the class's
    * unseen-bucket weight (`cnt = 0`), carried per row so `classify`
    * can score misses without a second table.
    */
  def trainWeights(docs: DataFrame, labelCol: String,
      buckets: Int): DataFrame = {
    requireText(docs, "trainWeights", Seq("text"))
    docs
      .select(col(labelCol).as("wl"),
        explode(Dedup.tokens(col("text"))).as("t"))
      .select(col("wl"),
        Sampling.hashBucket(col("t"), "nb", buckets).as("b"))
      .groupBy("wl", "b")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("tot",
        sum(col("cnt")).over(Window.partitionBy("wl")))
      .select(col("wl"), col("b"),
        (bitLen2(col("cnt") + 1) - bitLen2(col("tot") + buckets))
          .as("w"),
        (lit(1L) - bitLen2(col("tot") + buckets)).as("u"))
  }

  /** Required input schema (testdata `documents` shape): `doc_id` and
    * a STRING `text` column — fixed names shared with the streaming
    * gate, so a clear fail-fast beats binding an unrelated column.
    */
  private def requireText(df: DataFrame, where: String,
      cols: Seq[String] = Seq("doc_id", "text")): Unit =
    for (c <- cols if !df.columns.contains(c))
      throw new IllegalArgumentException(
        s"NaiveBayes.$where needs a `$c` column; got " +
          df.columns.mkString("[", ", ", "]"))

  /** Per-doc argmax prediction against a (broadcast) weight table.
    * Every trained class scores every token of every doc — hits via
    * `w`, misses via the class's unseen weight `u` (token rows fan
    * out by |labels| through a broadcast of the distinct class
    * stats; the weight lookup is a broadcast LEFT join, so the only
    * data-sized shuffle is the per-doc score aggregation). Docs
    * whose tokens hit no trained bucket for ANY class drop out
    * (all-unseen rows rank classes by size alone — the caller
    * decides a fallback); the drop is a doc-partitioned window max,
    * sharing the argmax window's exchange.
    */
  def classify(docs: DataFrame, weights: DataFrame, labelCol: String,
      buckets: Int): DataFrame = {
    requireText(docs, "classify")
    // spread before the token explode + |labels|x broadcast fan-out:
    // a 1-split scan runs that whole amplification single-task
    // (measured 1.75 s of text_nb_classify's 2.65 s — ScanSpread)
    val tb = ScanSpread.spread(docs)
      .select(col("doc_id"), col(labelCol).as("true_label"),
        explode(Dedup.tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("true_label"),
        Sampling.hashBucket(col("t"), "nb", buckets).as("b"))
    val classStats = weights.select(col("wl"), col("u")).distinct()
    tb.crossJoin(broadcast(classStats))
      .join(broadcast(weights.select(col("wl"), col("b"), col("w"))),
        Seq("wl", "b"), "left")
      .groupBy(col("doc_id"), col("wl"))
      .agg(max(col("true_label")).as("true_label"),
        sum(coalesce(col("w"), col("u"))).as("score"),
        max(when(col("w").isNotNull, 1).otherwise(0)).as("hit"))
      .withColumn("any_hit",
        max(col("hit")).over(Window.partitionBy("doc_id")))
      .filter(col("any_hit") === 1)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("wl"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("wl").as("pred_label"), col("score"),
        col("true_label"),
        (col("wl") === col("true_label")).as("correct"))
  }
}
