package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010, "Automatic keyword
  * extraction from individual documents"): candidate phrases are the
  * maximal runs of non-stopword tokens; each word scores
  * degree/frequency, where degree sums the lengths of every phrase
  * the word appears in (its co-occurrence count, self included) and
  * frequency counts its occurrences; a phrase scores the sum of its
  * member word scores (with multiplicity). The within-document
  * complement to the corpus-level `text_tfidf` ranking.
  *
  * Determinism / oracle replay: word scores are exact BIGINT
  * micro-units — deg·10⁶ DIV freq, floor division of non-negative
  * longs, identical cross-engine (docs/HASH_NUMERICS.md) — so no
  * double ever enters the hash path; phrase assembly sorts collected
  * (pos, word) structs so `collect_list` order can't leak in; the
  * top-k window orders by (score desc, phrase asc), a unique total
  * order after the per-(id, phrase) dedup.
  *
  * Scale shape: every step is keyed by the document id — one
  * posexplode, one doc-keyed running-sum window for segment ids, two
  * doc-keyed aggregates, one doc-keyed top-k window. Nothing is
  * corpus-global: the exchange count is constant and every exchange
  * clusters on id, so the operator scales with documents, not corpus
  * size.
  */
object Rake {

  /** @param k top phrases per document
    * @return (id, rake_rank 1..k, phrase, score_micro, n_occ) —
    *         n_occ counts instances of the identical phrase text in
    *         the document (they tie on score by construction)
    */
  def topPhrases(df: DataFrame, idCol: String, textCol: String, k: Int,
      stopwords: Seq[String] = TextAnalysis.Stopwords): DataFrame = {
    require(k >= 1, s"rake: k=$k")
    val stops = array(stopwords.map(lit): _*)
    // spread before the token explode (ScanSpread): the per-token
    // stopword probe + segment windows amplify a 1-split scan
    val tok = ScanSpread.spread(df).select(col(idCol).as("id"),
        posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "w")))
      .withColumn("is_stop", array_contains(stops, col("w")))
    // segment id = running stopword count at <= pos: constant within
    // a non-stopword run, bumps at each stopword
    val wdoc = Window.partitionBy("id").orderBy("pos")
    val seg = tok
      .withColumn("ph",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(wdoc))
      .filter(!col("is_stop"))
      .localCheckpoint(false) // feeds phrase-length agg, word stats, and phrase assembly
    val phraseLen = seg.groupBy("id", "ph").agg(count(lit(1)).as("plen"))
    val occ = seg.join(phraseLen, Seq("id", "ph"))
      .localCheckpoint(false) // feeds word-score agg and the phrase join
    val wordScore = occ.groupBy("id", "w")
      .agg(expr("sum(plen) * 1000000 DIV count(1)").as("wscore"))
    val phrases = occ.join(wordScore, Seq("id", "w"))
      .groupBy("id", "ph")
      .agg(sum("wscore").as("score"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("phrase"))
    // identical phrase text in one doc ties on score by construction;
    // collapse so the rank order (score desc, phrase asc) is unique
    val deduped = phrases.groupBy("id", "phrase")
      .agg(max("score").as("score_micro"), count(lit(1)).as("n_occ"))
    val wTop = Window.partitionBy("id")
      .orderBy(col("score_micro").desc, col("phrase"))
    deduped.withColumn("rake_rank", row_number().over(wTop).cast("long"))
      .filter(col("rake_rank") <= k)
      .select("id", "rake_rank", "phrase", "score_micro", "n_occ")
  }
}
