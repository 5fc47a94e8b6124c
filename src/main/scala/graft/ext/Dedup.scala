package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * All built-in expressions (codegen'd, shuffle-minimal):
  *   - exact dedup: one hash-aggregate shuffle on the dedup key;
  *   - MinHash LSH: signatures computed map-side per document, then
  *     ONE shuffle on (band, bucket-key) — candidate verification only
  *     touches same-bucket pairs, never the O(n²) cross product. At
  *     cluster scale the band join partitions by bucket and skewed
  *     buckets are handled by AQE; a connected-components pass over
  *     the emitted pair list yields dedup groups.
  *   - SimHash: 64-bit signature map-side; banded bucket join for
  *     Hamming-neighbor candidates.
  *
  * The MinHash family uses md5 (same function exists in DuckDB) so the
  * whole pipeline is oracle-checkable cross-engine; lexicographic MIN
  * over fixed-width hex strings equals numeric MIN of the hashes.
  */
object Dedup {

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct 3-gram word shingles — the dedup unit. Much more
    * discriminative than unigrams on small vocabularies.
    */
  def shingles3(ws: Column): Column =
    when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ",
          element_at(ws, i + 1), element_at(ws, i + 2),
          element_at(ws, i + 3)))))

  /** MinHash signature: `numHashes` independent hash functions
    * h_i(s) = md5(s + ":" + i); the signature component is the MIN
    * over the shingle set (32-hex-char strings compare like the
    * underlying 128-bit integers).
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleSet, t => md5(concat(t, lit(s":$i")))))
    }: _*)

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`
    * components, each group hashed to one bucket key.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r =>
          element_at(sig, j * rowsPerBand + r + 1)): _*))
    }: _*)

  /** Exact Jaccard similarity of two (distinct-element) arrays —
    * integer set sizes divided in double, deterministic cross-engine.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b)))

  /** MinHash+LSH near-duplicate pair mining.
    *
    * @return (id_a, id_b, jaccard) for candidate pairs (same LSH
    *         bucket in ≥1 band) whose EXACT shingle Jaccard ≥ threshold;
    *         id_a < id_b.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes)
    val sh = df.select(col(idCol).as("id"),
        shingles3(tokens(col(textCol))).as("ts"))
      .filter(size(col("ts")) > 0)
    val banded = sh
      .select(col("id"), col("ts"),
        posexplode(bandKeys(minhashSignature(col("ts"), numHashes),
          bands, rowsPerBand)).as(Seq("band", "bk")))
    val a = banded.select(col("band"), col("bk"),
      col("id").as("id_a"), col("ts").as("ts_a"))
    val b = banded.select(col("band"), col("bk"),
      col("id").as("id_b"), col("ts").as("ts_b"))
    a.join(b, Seq("band", "bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ts_a"), col("ts_b"))
      .distinct() // a pair may collide in several bands
      .select(col("id_a"), col("id_b"),
        jaccard(col("ts_a"), col("ts_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of a token array: per token a 64-bit hash
    * (xxhash64, Spark-native); each signature bit is the sign of the
    * ±1 vote sum across tokens. Built-in higher-order functions only.
    */
  def simhash64(ws: Column): Column = {
    // votes[b] = Σ_tokens (bit b set ? 1 : -1), b = 0..63
    val votes = aggregate(
      ws,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, bitVector(xxhash64(t)),
        (a, v) => a + v))
    // pack sign bits into a long (shift amount is a column → SQL fn)
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) =>
          when(v > 0, call_function("shiftleft", lit(1L), i))
            .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** 64-element ±1 vector from the bits of a long. */
  private def bitVector(h: Column): Column =
    transform(sequence(lit(0), lit(63)),
      i => when(call_function("shiftright", h, i)
          .bitwiseAND(lit(1L)) === 1L, lit(1))
        .otherwise(lit(-1)))

  /** SimHash near-dup candidates: band the 64-bit signature into four
    * 16-bit chunks (pigeonhole: Hamming distance ≤ 3 ⇒ at least one
    * identical chunk), bucket-join, verify exact Hamming distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      simhash64(tokens(col(textCol))).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Popcount of (a XOR b) via bit_count (built-in). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
