package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, RollingHash64, Similarity, TextAnalysis}
import Tables._

/** LLM-training-data pipeline operators (driver mandate): dedup,
  * similarity search, text analysis, multimodal columns — over the
  * `documents` and `embeddings` tables.
  *
  * Oracle strategy: everything whose arithmetic is reproducible
  * cross-engine gets DuckDB SQL (md5-derived MinHash AND SimHash, set
  * Jaccard, double-fold cosine rounded to 6dp); ops that are inherently
  * sketch/approximate (HLL approx_distinct, sign-LSH ANN) or tied to a
  * custom codegen expression (rolling hash) are rows-only here and
  * verified in ScalaTest against independent reimplementations /
  * brute-force baselines.
  */
object PipelineQueries {

  // MinHash parameters: 32 hashes = 8 bands × 4 rows → candidate
  // probability ≈ 1-(1-s⁴)⁸: >0.99 at s=0.9, ~0.004 at s=0.15 —
  // matches the corpus structure (planted dups ≥0.9, noise <0.2).
  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands
  private val JaccardThreshold = 0.6
  private val CosineThreshold = 0.45
  // SimHash radius; banding uses SimhashRadius+1 chunks → complete.
  private val SimhashRadius = 8
  // Sign-LSH bands for embedding pair mining: 24 bands x 6 planes.
  // At the (deliberately weak) 0.45 threshold this measures ~0.9
  // recall at sf0.1 with ~3x candidate pruning; at a production
  // near-dup threshold (cos >= 0.9, per-plane agreement p ≈ 0.86)
  // the same banding prunes to ~2% of pairs with recall > 0.999 —
  // the S-curve sharpens as the threshold rises.
  private val EmbedBands = 24
  private val EmbedRowsPerBand = 6

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- dedup ---
    // Group key is xxhash64 of the normalized text — a codegen'd
    // 64-bit hash, ~an order of magnitude cheaper per row than md5.
    // The key itself is engine-internal (not in the output); the
    // oracle groups by md5 of the same normalization, which induces
    // the identical partition of rows. Cross-engine-visible hex
    // fingerprints stay on `text_fingerprint` (md5).
    "dedup_exact" -> ((s, d) =>
      documents(s, d)
        .groupBy(xxhash64(TextAnalysis.normalized(col("text"))).as("fp64"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")),

    "dedup_key" -> ((s, d) =>
      documents(s, d).groupBy("lang", "source")
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_copies"))),

    "dedup_tokenset" -> ((s, d) =>
      documents(s, d)
        .groupBy(concat_ws(" ",
          array_sort(array_distinct(Dedup.tokens(col("text")))))
          .as("token_key"))
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_copies"))),

    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(documents(s, d), "doc_id", "text",
        NumHashes, Bands, JaccardThreshold)),

    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(documents(s, d), "doc_id", "text",
        maxHamming = SimhashRadius)),

    // Char-5-gram Jaccard near-dups (same LSH scaffold, char shingles).
    "dedup_ngram" -> ((s, d) =>
      Dedup.ngramPairs(documents(s, d), "doc_id", "text",
        n = 5, numHashes = 64, bands = 8, threshold = 0.7)),

    // Pair list → dedup GROUPS: iterative min-label connected
    // components; each doc labeled with its group's min doc_id.
    "dedup_groups" -> ((s, d) =>
      graft.operators.ConnectedComponents.labels(
          Dedup.minhashPairs(documents(s, d), "doc_id", "text",
            NumHashes, Bands, JaccardThreshold)
            .select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("label").as("group_id"))),

    "dedup_embed" -> ((s, d) =>
      Similarity.cosinePairsLsh(embeddings(s, d), "vec_id", "embedding",
          CosineThreshold, EmbedBands, EmbedRowsPerBand)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))),

    // --- similarity search ---
    "sim_topk" -> ((s, d) => {
      val q = embeddings(s, d).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      Similarity.topK(embeddings(s, d), "vec_id", "embedding", q, 10)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // IVF ANN — deterministic coarse cells (first 16 vectors), probe-2
    // search, exact scores within probed cells. Fully deterministic
    // (tie-breaks pinned) → SQL oracle below replicates cell
    // assignment, probing, and scoring.
    "sim_ann_ivf" -> ((s, d) => {
      val q = embeddings(s, d).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      Similarity.ivfTopK(embeddings(s, d), "vec_id", "embedding", q,
          nCentroids = 16, probes = 2, k = 10)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // Sign-LSH pruned ANN — bucket bit j = [dot(v, plane_j) > 0] with
    // the first 8 vectors as planes; multi-probe Hamming <= 2. The
    // dot-product fold is bit-identical cross-engine, so the sign
    // thresholds (and thus buckets) reproduce exactly → SQL oracle.
    "sim_ann_lsh" -> ((s, d) => {
      val planes = embeddings(s, d).filter(col("vec_id") < 8)
        .orderBy("vec_id").select("embedding")
        .collect().map(_.getSeq[Float](0).toSeq).toSeq
      val q = embeddings(s, d).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      Similarity.annTopK(embeddings(s, d), "vec_id", "embedding", q,
          planes, 10, probeHamming = 2)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // --- text analysis ---
    "text_stats" -> ((s, d) => {
      val ws = Dedup.tokens(col("text"))
      documents(s, d).select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_uniq"),
        TextAnalysis.bpeishCount(col("text")).as("n_bpeish"),
        TextAnalysis.avgTokenLength(ws).as("avg_len"),
        TextAnalysis.stopwordRatio(ws).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    }),

    "text_langid" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        TextAnalysis.markerLangId(col("text")).as("pred_lang"))),

    "text_fingerprint" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),

    // Custom Catalyst Expression (codegen'd rolling hash). Oracle
    // emulates the 64-bit wrap-around polynomial in DuckDB HUGEINT
    // arithmetic over codepoints (== UTF-8 bytes for this pure-ASCII
    // corpus; ScalaTest additionally covers the unicode byte path).
    "text_rollhash" -> ((s, d) => {
      RollingHash64.register(s)
      documents(s, d).select(col("doc_id"),
        RollingHash64.rolling_hash64(TextAnalysis.normalized(col("text")))
          .as("rh"))
    }),

    // --- multimodal (binary columns; decode is a marked stub) ---
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        documents(s, d).select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "doc_id", "payload").toDF()),

    "mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(
        documents(s, d).select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "doc_id", "payload", frameBytes = 64).toDF())
  )

  // ---- DuckDB oracles ----

  private val NormText =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val Toks = "string_split_regex(lower(trim(text)), '\\s+')"

  /** Shared MinHash-LSH oracle scaffold over any shingle-set CTE
    * `sh2(doc_id, ts)`: one md5 per shingle, double hashing
    * h_i = (h1 + i*h2) mod P over its two 32-bit hex slices, skinny
    * band join, then exact Jaccard on candidates — mirrors
    * Dedup.minhashPairsFromShingles.
    */
  private def minhashOracleFrom(shingleCtes: String, threshold: Double,
      numHashes: Int = NumHashes, nBands: Int = Bands): String = {
    val P = graft.ext.Dedup.MinhashPrime
    val rpb = numHashes / nBands
    val sig = (0 until numHashes)
      .map(i => s"list_min([(h[1] + $i * h[2]) % $P FOR h IN hs])")
      .mkString("[", ", ", "]")
    val bands = (0 until nBands).map { j =>
      (0 until rpb)
        .map(r => s"sig[${j * rpb + r + 1}]").mkString(" || '|' || ")
    }.mkString("[", ", ", "]")
    s"""WITH $shingleCtes,
       hx AS (SELECT doc_id, [[('0x' || substr(md5(t), 1, 8))::BIGINT,
                               ('0x' || substr(md5(t), 9, 8))::BIGINT]
                              FOR t IN ts] AS hs FROM sh2),
       sg AS (SELECT doc_id, $sig AS sig FROM hx),
       bd AS (SELECT doc_id, unnest($bands) AS bk,
              unnest(range(0, $nBands)) AS band FROM sg),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bd a JOIN bd b
                ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
       SELECT id_a, id_b,
         CAST(len(list_intersect(sa.ts, sb.ts)) AS DOUBLE) /
           len(list_distinct(sa.ts || sb.ts)) AS jaccard
       FROM cand JOIN sh2 sa ON cand.id_a = sa.doc_id
                 JOIN sh2 sb ON cand.id_b = sb.doc_id
       WHERE jaccard >= $threshold"""
  }

  /** Word-3-gram shingle CTEs (mirrors Dedup.shingleRows). */
  private val Word3Ctes =
    s"""w AS (SELECT doc_id, $Toks AS ws FROM documents),
       sh AS (SELECT doc_id, list_distinct([ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
               FOR i IN range(0, greatest(len(ws)-2, 0))]) AS ts FROM w),
       sh2 AS (SELECT doc_id, ts FROM sh WHERE len(ts) > 0)"""

  /** Char-5-gram shingle CTEs (mirrors Dedup.charGramRows, n=5). */
  private val Char5Ctes =
    s"""w AS (SELECT doc_id, $NormText AS nt FROM documents),
       sh2 AS (SELECT doc_id,
               list_distinct([substr(nt, i, 5) FOR i IN range(1, len(nt) - 3)]) AS ts
               FROM w WHERE len(nt) >= 5)"""

  private def minhashOracle: String =
    minhashOracleFrom(Word3Ctes, JaccardThreshold)

  /** Connected components over the minhash pair list via a recursive
    * transitive-closure CTE, labeling each doc with the min id of its
    * near-dup group — mirrors graft.operators.ConnectedComponents.
    */
  private def dedupGroupsOracle: String =
    s"""WITH RECURSIVE edges AS (SELECT id_a, id_b FROM ($minhashOracle)),
       nodes AS (SELECT DISTINCT id FROM
         (SELECT id_a AS id FROM edges UNION SELECT id_b FROM edges)),
       sym AS (SELECT id_a AS src, id_b AS dst FROM edges
               UNION SELECT id_b, id_a FROM edges),
       reach AS (
         SELECT id, id AS r FROM nodes
         UNION
         SELECT s.dst AS id, reach.r FROM reach
         JOIN sym s ON reach.id = s.src)
       SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id"""

  /** SQL for bits [off, off+w) of the split (sig_hi, sig_lo) signature —
    * the DuckDB mirror of Dedup.sliceBits, generated from the same
    * Dedup.chunkLayout so Spark and the oracle band identically.
    */
  private def chunkSql(off: Int, w: Int): String =
    if (off + w <= 32) s"((sig_lo >> $off) & ${(1L << w) - 1})"
    else if (off >= 32) s"((sig_hi >> ${off - 32}) & ${(1L << w) - 1})"
    else {
      val loBits = 32 - off
      s"(((sig_lo >> $off) & ${(1L << loBits) - 1}) | " +
        s"((sig_hi & ${(1L << (off + w - 32)) - 1}) << $loBits))"
    }

  /** Generated SimHash oracle mirroring Dedup.simhashPairs: md5-sliced
    * token hashes, 64 +-1 bit votes, signature packed as two 32-bit
    * words, maxHamming+1-chunk banding (complete for the radius),
    * exact Hamming on candidates.
    */
  private def simhashOracle: String = {
    val votes = (0 until 64).map { b =>
      val w = if (b < 32) "lo" else "hi"
      val s = if (b < 32) b else b - 32
      s"sum(CASE WHEN (($w >> $s) & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    def pack(base: Int) = (0 until 32).map { b =>
      s"(CASE WHEN v${base + b} > 0 THEN (1::BIGINT << $b) ELSE 0 END)"
    }.mkString(" | ")
    s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS t FROM documents),
       h AS (SELECT doc_id,
             ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo FROM tok),
       v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       s AS (SELECT doc_id, ${pack(32)} AS sig_hi, ${pack(0)} AS sig_lo
             FROM v),
       bd AS (SELECT doc_id,
              unnest([${graft.ext.Dedup.chunkLayout(SimhashRadius + 1)
                .map { case (o, w) => chunkSql(o, w) }.mkString(", ")}])
                AS chunk,
              unnest(range(0, ${SimhashRadius + 1})) AS band FROM s),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bd a JOIN bd b
                ON a.band = b.band AND a.chunk = b.chunk
                   AND a.doc_id < b.doc_id)
       SELECT id_a, id_b,
         CAST(bit_count(xor(sa.sig_hi, sb.sig_hi)) +
              bit_count(xor(sa.sig_lo, sb.sig_lo)) AS INTEGER) AS hamming
       FROM cand JOIN s sa ON cand.id_a = sa.doc_id
                 JOIN s sb ON cand.id_b = sb.doc_id
       WHERE hamming <= $SimhashRadius"""
  }

  private val VecD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"
  private def normSql(v: String) =
    s"sqrt(list_sum(list_transform($v, x -> x * x)))"

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
          FROM documents GROUP BY md5($NormText)""",

    "dedup_key" ->
      """SELECT lang, source, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
         FROM documents GROUP BY lang, source""",

    "dedup_tokenset" ->
      s"""SELECT array_to_string(list_sort(list_distinct($Toks)), ' ')
            AS token_key,
          MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
          FROM documents GROUP BY 1""",

    "dedup_minhash" -> minhashOracle,

    "dedup_ngram" -> minhashOracleFrom(Char5Ctes, 0.7,
      numHashes = 64, nBands = 8),

    "dedup_groups" -> dedupGroupsOracle,

    "dedup_simhash" -> simhashOracle,

    // 64-bit wrapping polynomial hash h = h*B + byte, emulated with
    // 128-bit HUGEINT + explicit mod 2^64 and a signed reinterpretation
    // at the end. Codepoints == bytes only for ASCII; the sf corpus is
    // ASCII (verified), non-ASCII coverage lives in ScalaTest.
    "text_rollhash" ->
      s"""SELECT doc_id,
          CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                    THEN h - 18446744073709551616::HUGEINT
                    ELSE h END AS BIGINT) AS rh
          FROM (SELECT doc_id,
            list_reduce(
              list_prepend(0::HUGEINT,
                [unicode(c)::HUGEINT FOR c IN string_split($NormText, '')
                 IF c != '']),
              (a, x) -> (a * ${graft.ext.RollingHash64.Base} + x)
                        % 18446744073709551616::HUGEINT) AS h
            FROM documents)""",

    // Mirrors Similarity.cosinePairsLsh: planes = first bands*rows
    // corpus vectors, band key j = bitmask of dot signs over its
    // rowsPerBand planes, candidates from the band self-join, exact
    // cosine on candidates only. Same double-fold dot product on both
    // engines → identical sign thresholds → identical buckets.
    "dedup_embed" ->
      s"""WITH v AS (SELECT vec_id, $VecD AS v FROM embeddings),
          pl AS (SELECT vec_id AS pid, v AS pv FROM v
                 WHERE vec_id < ${EmbedBands * EmbedRowsPerBand}),
          bits AS (SELECT a.vec_id, p.pid,
                   CASE WHEN ${dotSql("a.v", "p.pv")} > 0
                        THEN (1::BIGINT << (p.pid % $EmbedRowsPerBand))
                        ELSE 0::BIGINT END AS bit
                   FROM v a CROSS JOIN pl p),
          bands AS (SELECT vec_id, pid // $EmbedRowsPerBand AS band,
                    SUM(bit) AS bk FROM bits GROUP BY 1, 2),
          cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                   FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bk = b.bk
                      AND a.vec_id < b.vec_id),
          n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM v)
          SELECT id_a, id_b, round(cs, 6) AS cos FROM (
            SELECT id_a, id_b,
              ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cs
            FROM cand JOIN n a ON cand.id_a = a.vec_id
                      JOIN n b ON cand.id_b = b.vec_id)
          WHERE cs >= $CosineThreshold""",

    "sim_ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, $VecD AS v FROM embeddings),
          pl AS (SELECT vec_id AS pid, v AS pv FROM v WHERE vec_id < 8),
          q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
          bk AS (SELECT a.vec_id,
                 CAST(SUM(CASE WHEN ${dotSql("a.v", "p.pv")} > 0
                          THEN (1::BIGINT << p.pid) ELSE 0 END) AS BIGINT)
                   AS bucket
                 FROM v a CROSS JOIN pl p GROUP BY a.vec_id),
          qb AS (SELECT bucket AS qbucket FROM bk WHERE vec_id = 0),
          cand AS (SELECT v.vec_id, v.v FROM v
                   JOIN bk ON v.vec_id = bk.vec_id CROSS JOIN qb
                   WHERE bit_count(xor(bk.bucket, qb.qbucket)) <= 2)
          SELECT vec_id, round(s, 6) AS score FROM (
            SELECT c.vec_id,
              ${dotSql("c.v", "q.qv")} /
                (${normSql("c.v")} * ${normSql("q.qv")}) AS s
            FROM cand c CROSS JOIN q)
          ORDER BY s DESC, vec_id LIMIT 10""",

    "sim_ann_ivf" ->
      s"""WITH v AS (SELECT vec_id, $VecD AS v FROM embeddings),
          c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < 16),
          q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
          d AS (SELECT a.vec_id, a.v, c.cid,
                ${dotSql("a.v", "c.cv")} AS dp FROM v a CROSS JOIN c),
          cell AS (SELECT vec_id, v, cid FROM (
            SELECT vec_id, v, cid,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dp DESC, cid) AS rn
            FROM d) WHERE rn = 1),
          qc AS (SELECT c.cid FROM c CROSS JOIN q
                 ORDER BY ${dotSql("q.qv", "c.cv")} DESC, c.cid LIMIT 2)
          SELECT vec_id, round(s, 6) AS score FROM (
            SELECT cell.vec_id,
              ${dotSql("cell.v", "q.qv")} /
                (${normSql("cell.v")} * ${normSql("q.qv")}) AS s
            FROM cell JOIN qc ON cell.cid = qc.cid CROSS JOIN q)
          ORDER BY s DESC, vec_id LIMIT 10""",

    "sim_topk" ->
      s"""WITH q AS (SELECT $VecD AS qv FROM embeddings WHERE vec_id = 0),
          s AS (SELECT vec_id, $VecD AS v FROM embeddings)
          SELECT vec_id, round(score_raw, 6) AS score FROM (
            SELECT vec_id,
              ${dotSql("v", "qv")} / (${normSql("v")} * ${normSql("qv")})
                AS score_raw
            FROM s, q)
          ORDER BY score_raw DESC, vec_id LIMIT 10""",

    "text_stats" ->
      s"""SELECT doc_id,
          len(ws) AS n_tokens,
          len(list_distinct(ws)) AS n_uniq,
          len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
            AS n_bpeish,
          CASE WHEN len(ws) = 0 THEN 0.0
            ELSE CAST(list_sum([length(t) FOR t IN ws]) AS DOUBLE) / len(ws)
          END AS avg_len,
          CASE WHEN len(ws) = 0 THEN 0.0
            ELSE CAST(len([t FOR t IN ws
              IF list_contains(['the','a','of','and','in','to','is','on'], t)])
              AS DOUBLE) / len(ws) END AS stop_ratio,
          (least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0) * 0.4
           + CAST(len(list_distinct(ws)) AS DOUBLE)
             / CAST(greatest(len(ws), 1) AS DOUBLE) * 0.3
           + (1.0 - CASE WHEN len(ws) = 0 THEN 0.0
               ELSE CAST(len([t FOR t IN ws
                 IF list_contains(['the','a','of','and','in','to','is','on'], t)])
                 AS DOUBLE) / len(ws) END) * 0.3) AS quality
          FROM (SELECT doc_id, text, $Toks AS ws FROM documents)""",

    "text_langid" ->
      s"""SELECT doc_id,
          CASE
            WHEN s_eng >= s_db AND s_eng >= s_ml THEN 'eng'
            WHEN s_db >= s_ml THEN 'db'
            ELSE 'ml' END AS pred_lang
          FROM (SELECT doc_id,
            len([t FOR t IN ws IF list_contains(
              ['the','a','big','small','fast','slow'], t)]) AS s_eng,
            len([t FOR t IN ws IF list_contains(
              ['query','table','join','sort','merge','scan'], t)]) AS s_db,
            len([t FOR t IN ws IF list_contains(
              ['spark','vector','stream','batch','data'], t)]) AS s_ml
            FROM (SELECT doc_id, $Toks AS ws FROM documents))""",

    "text_fingerprint" ->
      s"SELECT doc_id, md5($NormText) AS fp FROM documents",

    "mm_features" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         md5(text) AS fp,
         CAST(ascii(substr(text, 1, 1)) % 640 AS INTEGER) AS width,
         CAST(ascii(substr(text, 2, 1)) % 480 AS INTEGER) AS height
         FROM documents""",

    "mm_frames" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
         md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_fp
         FROM documents
         CROSS JOIN unnest(range(0, octet_length(encode(text)) // 64))
           AS r(i)"""
  )
}
