package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token stats,
  * quality scoring, marker-based language ID, fingerprinting. All
  * pure built-in expressions — per-document work is map-side,
  * codegen'd, and shuffle-free.
  */
object TextAnalysis {

  def tokens(text: Column): Column = Dedup.tokens(text)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, and
    * single other non-space chars — a cheap proxy for tokenizer cost.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"),
      lit(0)))

  // Shared with Rake's phrase segmentation — oracles embed the same
  // literal list, so keep additions mirrored there.
  val Stopwords =
    Seq("the", "a", "of", "and", "in", "to", "is", "on")

  /** Fraction of tokens that are stopwords (0 when no tokens). */
  def stopwordRatio(ws: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, t => array_contains(stops, t))).cast("double") /
        size(ws))
  }

  /** Mean token length (integer sums divided in double — exact
    * cross-engine).
    */
  def avgTokenLength(ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(
      aggregate(ws, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(ws))

  /** Composite quality score in [0,1]: rewards mid-length documents,
    * lexical diversity, and a sane stopword rate. Heuristic — the
    * point is the shape (pure column expression, trivially
    * distributable), thresholds are tunable.
    */
  def qualityScore(text: Column): Column = {
    val ws = tokens(text)
    val lenScore = least(size(ws).cast("double") / 100.0, lit(1.0))
    val diversity = size(array_distinct(ws)).cast("double") /
      greatest(size(ws), lit(1)).cast("double")
    val stopOk = lit(1.0) - stopwordRatio(ws)
    (lenScore * 0.4 + diversity * 0.3 + stopOk * 0.3)
  }

  // --- Gopher-style composite quality gate ---
  // The four public heuristics from the Gopher corpus-filtering recipe
  // (Rae et al. 2021, appendix A1.1), each as a pure column
  // expression: mean word length in a sane band, low symbol-to-word
  // ratio, mostly-alphabetic words, and stop-word presence. All are
  // exact integer-ratio doubles, so the indicator thresholds compare
  // identically cross-engine and the composite is oracle-checkable.

  /** Fraction of tokens containing '#' or an ellipsis (0 if empty). */
  def symbolWordRatio(ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, t => t.contains("#") || t.contains("...")))
        .cast("double") / size(ws))

  /** Fraction of tokens with at least one letter (tokens are already
    * lowercased by `tokens`).
    */
  def alphaWordFrac(ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, t => t.rlike("[a-z]"))).cast("double") / size(ws))

  /** Number of DISTINCT stopwords present in the document. */
  def distinctStopwords(ws: Column): Column =
    size(array_intersect(ws, array(Stopwords.map(lit): _*)))

  /** Composite Gopher-style quality in {0, .25, .5, .75, 1}: the mean
    * of the four pass/fail indicators. A continuous keep-weight for
    * `Sampling.weightedKeep` and a hard gate at 1.0.
    */
  def gopherScore(text: Column): Column = {
    val ws = tokens(text)
    val mwl = avgTokenLength(ws)
    (when(mwl >= 3.0 && mwl <= 10.0, 1.0).otherwise(0.0) +
      when(symbolWordRatio(ws) <= 0.1, 1.0).otherwise(0.0) +
      when(alphaWordFrac(ws) >= 0.8, 1.0).otherwise(0.0) +
      when(distinctStopwords(ws) >= 2, 1.0).otherwise(0.0)) / 4
  }

  /** Marker-word language/domain ID: score = marker occurrences per
    * class, argmax with a fixed precedence order on ties. The pattern
    * (tiny broadcast lexicon + argmax, one map-side pass) is the same
    * one a real n-gram language profile uses.
    */
  def markerLangId(text: Column): Column = {
    val ws = tokens(text)
    def score(markers: Seq[String]): Column = {
      val m = array(markers.map(lit): _*)
      size(filter(ws, t => array_contains(m, t)))
    }
    val sEng = score(Seq("the", "a", "big", "small", "fast", "slow"))
    val sDb = score(Seq("query", "table", "join", "sort", "merge", "scan"))
    val sMl = score(Seq("spark", "vector", "stream", "batch", "data"))
    when(sEng >= sDb && sEng >= sMl, lit("eng"))
      .when(sDb >= sMl, lit("db"))
      .otherwise(lit("ml"))
  }

  // --- PII detection / redaction ---
  // Patterns stay inside RE2-compatible syntax (no backreferences or
  // lookaround) so Spark's Java regex and a DuckDB oracle match the
  // same spans; \b, \d and bounded repetition behave identically.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Number of matches of a PII pattern. Map-side, codegen'd. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Redact all four PII classes with typed placeholders. Fixed
    * application order (email → ip → ssn → phone) makes overlap
    * resolution deterministic; SSN (3-2-4) and phone (3-3-4) shapes
    * cannot partially consume each other under \b anchors.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    val s = regexp_replace(i, SsnRe, "<SSN>")
    regexp_replace(s, PhoneRe, "<PHONE>")
  }

  // --- repetition (duplicate-n-gram quality signal) ---

  /** Adjacent word 2-grams of a token array (empty when < 2 tokens;
    * the guard also keeps `sequence` ascending).
    */
  def bigrams(ws: Column): Column =
    when(size(ws) < 2, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))

  /** Fraction of 2-gram occurrences that repeat an earlier one — the
    * classic "duplicate n-gram fraction" document-quality filter.
    * 0 for docs with < 2 tokens.
    */
  def dupBigramFraction(ws: Column): Column = {
    val gs = bigrams(ws)
    when(size(gs) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(gs)).cast("double") / size(gs))
  }

  /** Canonical text form for fingerprinting: lowercase, collapse
    * whitespace, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** 128-bit content fingerprint (hex) of the normalized text. md5 is
    * available in DuckDB too → oracle-checkable.
    */
  def fingerprint(text: Column): Column = md5(normalized(text))
}
