package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE vocabulary TRAINING and ENCODING — iterative pair-merge
  * learning, the one classic LLM-pipeline operator the counting-only
  * `text_tokens` query does not cover, plus the apply side.
  *
  * Algorithm (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units", ACL 2016): start from characters (the
  * word-final character carries a `</w>` marker), repeatedly find the
  * most frequent adjacent symbol pair across the corpus and merge it
  * into one symbol; the learned merge list IS the tokenizer. Encoding
  * replays the merge list (in learned order) over a vocabulary.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - The ONLY corpus-sized pass is the word-frequency aggregate
  *     (partial-agg'd hash count). Training then runs entirely on the
  *     VOCAB-bounded symbol table (top-K words × avg word length
  *     rows — millions, not trillions), the standard trick that makes
  *     BPE training tractable: pair counts are weighted by word
  *     frequency instead of re-scanning text. Encoding likewise
  *     segments the DISTINCT vocabulary once; documents then join the
  *     per-word segmentation — merges never re-run per document.
  *   - Each merge round is one lead() window over `word` partitions,
  *     one partial-agg'd pair count, and two skinny keyed joins to
  *     apply the merge — all distributed; the driver holds only the
  *     1-row argmax per round (the PageRank loop discipline), and
  *     `localCheckpoint` truncates the per-round lineage.
  *   - Determinism: ties break on (count DESC, left, right) with
  *     binary string order; greedy left-to-right non-overlap inside
  *     equal-symbol runs is resolved with the gaps-and-islands
  *     even-offset rule — a pure function of the data, not of
  *     partitioning. Every round is ONE aggregate + set operations,
  *     so a SQL engine can re-derive the whole merge table
  *     round-by-round (`oracleSql` generates that mirror).
  */
object BpeTrain {

  /** Learn `nMerges` merges from the `topWords` most frequent
    * lowercase words of `textCol`. Returns the merge table:
    * (merge_round, lhs, rhs, cnt) — row r says "round r merged
    * symbols lhs+rhs, which co-occurred cnt times (word-frequency
    * weighted)".
    */
  def train(docs: DataFrame, textCol: String, topWords: Int,
      nMerges: Int): DataFrame = {
    val (merges, _) = trainLoop(docs, textCol, topWords, nMerges)
    docs.sparkSession.createDataFrame(merges)
      .toDF("merge_round", "lhs", "rhs", "cnt")
  }

  /** The learned tokenizer applied to the TRAINING vocabulary: the
    * top-K words' subword segmentation — the final symbol table of
    * the training loop itself.
    */
  def segment(docs: DataFrame, textCol: String, topWords: Int,
      nMerges: Int): DataFrame =
    trainLoop(docs, textCol, topWords, nMerges)._2
      .select(col("word"), col("f"), col("pos"), col("sym"))

  /** The learned tokenizer applied to the FULL corpus vocabulary:
    * train on the top-K words, then replay the merge list (in learned
    * order) over EVERY distinct word — out-of-vocabulary words
    * degrade gracefully to whatever prefixes/characters the learned
    * merges cover, exactly like a production BPE encoder. Output is
    * the per-word segmentation (word, f, pos, sym); tokenizing
    * documents is then a join against this table.
    *
    * The replay itself is ONE map-side projection —
    * [[graft.functions.BpeReplay]], the apply-side scale shape: the
    * merge list is driver-held and vocab-bounded, each word's
    * segmentation depends on nothing else, so running the relational
    * per-round machinery (lead window + two joins per merge, built
    * for training's corpus-global pair counts) over the full
    * vocabulary was ~20 sequential shuffles where a single projection
    * suffices. BpeTrainSpec pins the expression equal to the
    * relational replay symbol-for-symbol.
    */
  def encode(docs: DataFrame, textCol: String, topWords: Int,
      nMerges: Int): DataFrame = {
    val (merges, _) = trainLoop(docs, textCol, topWords, nMerges)
    graft.functions.BpeReplay.register(docs.sparkSession)
    val flat = merges.flatMap { case (_, l, rr, _) => Seq(l, rr) }
    words(docs, textCol)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .select(col("word"), col("f"),
        posexplode(graft.functions.BpeReplay.bpe_replay(col("word"),
          flat)).as(Seq("p0", "sym")))
      .select(col("word"), col("f"),
        (col("p0") + 1).cast("int").as("pos"), col("sym"))
  }

  /** The relational replay of `encode` — training's per-round
    * machinery driven over the full vocabulary. Kept as the
    * differential baseline BpeTrainSpec pins `encode` against (the
    * two must agree symbol-for-symbol on every word, including greedy
    * equal-run behavior).
    */
  private[graft] def encodeRelational(docs: DataFrame, textCol: String,
      topWords: Int, nMerges: Int): DataFrame = {
    val (merges, _) = trainLoop(docs, textCol, topWords, nMerges)
    val allFreq = words(docs, textCol)
      .groupBy("word").agg(count(lit(1)).as("f"))
    var tok = initTok(allFreq)
    for ((_, l, rr, _) <- merges) tok = applyMerge(tok, l, rr)
    tok.select(col("word"), col("f"), col("pos"), col("sym"))
  }

  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)),
      lit("[a-z]+"), lit(0))).as("word"))

  /** Character-level init; the last character carries the end-of-word
    * marker so merges cannot cross word boundaries. sequence+substr
    * (not split(word, "")) — Spark's regex split emits a trailing
    * empty element the SQL mirror would not.
    */
  private def initTok(freq: DataFrame): DataFrame = freq
    .select(col("word"), col("f"),
      explode(sequence(lit(1), length(col("word")))).as("pos"))
    .select(col("word"), col("f"), col("pos"),
      concat(expr("substr(word, pos, 1)"),
        when(col("pos") === length(col("word")), lit("</w>"))
          .otherwise(lit(""))).as("sym"))
    .localCheckpoint(false)

  /** One merge application: replace every non-overlapping adjacent
    * (l, rr) pair with the concatenated symbol, renumber positions.
    * Greedy left-to-right non-overlap: in a run of consecutive
    * candidates (only possible when l == rr, e.g. "a a a a"), keep
    * the even offsets from the run start — gaps-and-islands, no
    * sequential scan needed.
    */
  private def applyMerge(tok: DataFrame, l: String, rr: String)
      : DataFrame = {
    val byWord = Window.partitionBy("word").orderBy("pos")
    val cand = tok
      .withColumn("nxt", lead(col("sym"), 1).over(byWord))
      .filter(col("sym") === l && col("nxt") === rr)
      .select("word", "pos")
    val sel = cand
      .withColumn("grp", col("pos") - row_number().over(byWord))
      .withColumn("off", col("pos") -
        min(col("pos")).over(Window.partitionBy("word", "grp")))
      .filter(col("off") % 2 === 0)
      .select(col("word"), col("pos")).localCheckpoint(false)
    val mSel = sel.select(col("word").as("mword"), col("pos").as("mpos"))
    val dSel = sel.select(col("word").as("dword"), col("pos").as("dpos"))
    tok
      .join(mSel, col("word") === col("mword") &&
        col("pos") === col("mpos"), "left")
      .join(dSel, col("word") === col("dword") &&
        col("pos") === col("dpos") + 1, "left")
      .filter(col("dpos").isNull)
      .select(col("word"), col("f"), col("pos"),
        when(col("mpos").isNotNull, concat(col("sym"), lit(rr)))
          .otherwise(col("sym")).as("sym"))
      .withColumn("pos", row_number().over(byWord))
      .localCheckpoint(false)
  }

  /** The training loop: returns (merge list, final symbol table) so
    * train / segment / encode share one implementation. */
  /** The training loop, with each round's symbol table REPLAYED from
    * the checkpointed frequency table by
    * [[graft.functions.BpeReplay]] (replay of merges 1..r equals r
    * iterated `applyMerge`s — exactly the equivalence the encode
    * differential in BpeTrainSpec pins), and the pair inventory
    * computed map-side by zip-shift instead of a lead window. Per
    * round: ONE projection + one partial-agg'd pair count + the 1-row
    * argmax collect — no window exchange, no joins, no per-round
    * checkpoint chain. Re-replaying r merges per round over the
    * topWords-bounded table is O(rounds²·wordlen) driver-scheduled
    * work on a vocab-bounded input — cheap where the old per-round
    * shuffle machinery (kept as `applyMerge` for the differential
    * baseline) was the whole family's bench cost.
    */
  private def trainLoop(docs: DataFrame, textCol: String, topWords: Int,
      nMerges: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    // corpus pass: lowercase letter-run words, frequency, top-K
    // (deterministic tie-break on the word itself)
    val freq = words(docs, textCol)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("word")).limit(topWords)
      .localCheckpoint(false)
    graft.functions.BpeReplay.register(docs.sparkSession)
    // materialize the corpus pass under the session's normal AQE,
    // then run the vocab-bounded merge rounds (one 1-row argmax
    // action per round over the checkpointed topWords-row table)
    // under the loop conf — fewer query-stage jobs per round, loop
    // partitions derived from the vocab size (IterConf scaladoc)
    freq.count()
    // r18: the merge loop runs on the caller's session under normal
    // AQE — the r17 loop-conf scope was re-measured after the
    // isolation rewrite and reverted (one 1-row argmax ACTION per
    // round either way; measured flat, and the vocab-bounded rounds
    // never shuffle enough bytes for the conf to matter)
    val fq = freq
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var flat = Seq.empty[String]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val syms = graft.functions.BpeReplay.bpe_replay(col("word"), flat)
      val n = greatest(size(col("s")) - 1, lit(0))
      val best = fq.select(col("f"), syms.as("s"))
        .select(col("f"), explode(zip_with(
          slice(col("s"), lit(1), n), slice(col("s"), lit(2), n),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("sym"), col("p.r").as("nxt"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(desc("cnt"), asc("sym"), asc("nxt")).limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, rr, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, l, rr, c))
        flat = flat ++ Seq(l, rr)
        r += 1
      }
    }
    val tok = fq.select(col("word"), col("f"),
      posexplode(graft.functions.BpeReplay.bpe_replay(col("word"), flat))
        .as(Seq("p0", "sym")))
      .select(col("word"), col("f"),
        (col("p0") + 1).cast("int").as("pos"), col("sym"))
    (merges.result(), tok)
  }

  /** DuckDB re-derivation of the merge table: one CTE block per round
    * mirroring the Spark computation exactly — same tokenization,
    * same argmax tie-break, same even-offset overlap rule, same
    * renumbering. Generated, so Spark and SQL can never drift apart
    * silently (the ZOrder.zValueNSql precedent).
    */
  def oracleSql(table: String, textCol: String, topWords: Int,
      nMerges: Int): String = {
    val out = (1 to nMerges).map { r =>
      s"SELECT CAST($r AS BIGINT) AS merge_round, l AS lhs, rr AS rhs, cnt FROM best$r"
    }.mkString("\n UNION ALL ")
    s"WITH ${trainCtes(table, textCol, topWords, nMerges)}\n $out"
  }

  /** Oracle for `segment`: the same generated chain, selecting the
    * final round's symbol table instead of the merge list. */
  def segmentOracleSql(table: String, textCol: String, topWords: Int,
      nMerges: Int): String =
    s"WITH ${trainCtes(table, textCol, topWords, nMerges)}\n" +
      s" SELECT word, f, pos, sym FROM tok$nMerges"

  /** Oracle for `encode`: the train chain feeds a second apply-only
    * chain over the FULL vocabulary — each round reuses `best{r}`
    * (no argmax) and the same candidate/overlap/rebuild CTEs. */
  def encodeOracleSql(table: String, textCol: String, topWords: Int,
      nMerges: Int): String = {
    val applyRounds = (1 to nMerges)
      .map(r => roundCtes("f", r, best = false)).mkString(",\n")
    s"""WITH ${trainCtes(table, textCol, topWords, nMerges)},
       ${initCtes("f", table, textCol, limit = None)},
       $applyRounds
       SELECT word, f, pos, sym FROM ftok$nMerges"""
  }

  /** The w/chars/tok0 CTE triple: top-K vocabulary when `limit` is
    * set (training), the full distinct vocabulary otherwise
    * (encoding). All MATERIALIZED: DuckDB inlines plain CTEs, and a
    * 10-round chain re-expands the scan exponentially without it. */
  private def initCtes(p: String, table: String, textCol: String,
      limit: Option[Int]): String = {
    val lim = limit.map(k => s"ORDER BY f DESC, word LIMIT $k")
      .getOrElse("")
    s"""${p}w AS MATERIALIZED (
         SELECT word, CAST(count(*) AS BIGINT) AS f FROM (
           SELECT unnest(regexp_extract_all(lower($textCol), '[a-z]+'))
             AS word FROM $table)
         GROUP BY word $lim),
       ${p}chars AS MATERIALIZED (
         SELECT word, f,
                unnest(generate_series(1, length(word))) AS pos
         FROM ${p}w),
       ${p}tok0 AS MATERIALIZED (
         SELECT word, f, pos,
                substr(word, CAST(pos AS INTEGER), 1) ||
                  CASE WHEN pos = length(word) THEN '</w>' ELSE '' END
                  AS sym
         FROM ${p}chars)"""
  }

  /** One round's CTEs under prefix `p`: pair inventory, (for training
    * only) the argmax `best{r}`, candidates, the even-offset overlap
    * rule, and the rebuilt symbol table. Apply-only chains (`best =
    * false`) join the TRAIN chain's `best{r}` instead. */
  private def roundCtes(p: String, r: Int, best: Boolean): String = {
    val bestCte = if (!best) "" else s"""
         best$r AS MATERIALIZED (
           SELECT sym AS l, nxt AS rr, CAST(sum(f) AS BIGINT) AS cnt
           FROM nx$r WHERE nxt IS NOT NULL
           GROUP BY sym, nxt ORDER BY cnt DESC, l, rr LIMIT 1),"""
    s"""${p}nx$r AS MATERIALIZED (
           SELECT word, f, pos, sym,
                  lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
           FROM ${p}tok${r - 1}),$bestCte
         ${p}cand$r AS MATERIALIZED (
           SELECT n.word, n.pos
           FROM ${p}nx$r n, best$r b WHERE n.sym = b.l AND n.nxt = b.rr),
         ${p}sel$r AS MATERIALIZED (
           SELECT word, pos FROM (
             SELECT word, pos,
                    pos - min(pos) OVER (PARTITION BY word, grp) AS off
             FROM (SELECT word, pos,
                          pos - row_number() OVER (PARTITION BY word
                            ORDER BY pos) AS grp
                   FROM ${p}cand$r))
           WHERE off % 2 = 0),
         ${p}tok$r AS MATERIALIZED (
           SELECT word, f,
                  row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
                  sym
           FROM (
             SELECT t.word, t.f, t.pos,
                    CASE WHEN m.pos IS NOT NULL THEN t.sym || b.rr
                         ELSE t.sym END AS sym
             FROM ${p}tok${r - 1} t
             LEFT JOIN best$r b ON true
             LEFT JOIN ${p}sel$r m ON t.word = m.word AND t.pos = m.pos
             LEFT JOIN ${p}sel$r d ON t.word = d.word AND t.pos = d.pos + 1
             WHERE d.pos IS NULL))"""
  }

  private def trainCtes(table: String, textCol: String, topWords: Int,
      nMerges: Int): String = {
    val rounds = (1 to nMerges)
      .map(r => roundCtes("", r, best = true)).mkString(",\n")
    s"""${initCtes("", table, textCol, Some(topWords))},
       $rounds"""
  }
}
