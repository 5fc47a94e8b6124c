package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomContains

/** Bloom-filter membership gate for incremental corpus dedup.
  *
  * The scale story: `dedup_incremental` (MinHash band join) prices a
  * batch-vs-corpus JOIN — right for near-dups, overkill for the exact
  * "have we ingested this very document before?" gate that fronts
  * every crawl pipeline. A Bloom filter prices that gate at one
  * map-side probe per batch row against a fixed-size bitmap:
  *
  *   1. corpus pass — k bit positions per document key, OR-folded into
  *      per-partition bitmaps, tree-reduced to ONE m-bit array on the
  *      driver (driver memory = m/8 bytes, a sizing constant chosen
  *      from the corpus cardinality budget — NOT a function of the
  *      data actually seen; 2^18 bits here for the test corpora, 2^33+
  *      on a real crawl);
  *   2. batch pass — `bloom_contains` (codegen'd, bitmap pinned as a
  *      task-binary reference object) probes all k positions; no
  *      shuffle of the corpus, no join.
  *
  * Definitely-new documents (any unset bit) skip the expensive exact
  * verify; only bloom hits — true dups plus the deterministic false
  * positives — need one. Everything is md5-derived integer arithmetic
  * (`Dedup`'s Kirsch–Mitzenmacher family), so an oracle replays the
  * filter bit-exactly, false positives included.
  */
object Bloom {

  /** (id, key, h1, h2): md5 of the caller's canonical content key plus
    * the two 32-bit digest slices that seed the position family —
    * DuckDB: ('0x' || substr(md5(keyExpr), 1|9, 8))::BIGINT. */
  def keyed(df: DataFrame, idCol: String, keyExpr: Column): DataFrame = {
    val key = md5(keyExpr)
    df.select(col(idCol).as("id"), key.as("key"))
      .withColumn("h1", conv(substring(col("key"), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("h2", conv(substring(col("key"), 9, 8), 16, 10)
        .cast("long"))
  }

  /** All k bit positions of every row, as rows (id, pos). The k-wide
    * array is constant-size (not document-sized), so exploding it is
    * inside the `Dedup` design rules. */
  def positions(keyedDf: DataFrame, k: Int, mBits: Int): DataFrame =
    keyedDf.select(col("id"), explode(array((0 until k).map(i =>
      (col("h1") + lit(i.toLong) * col("h2")) % mBits): _*)).as("pos"))

  /** OR-fold the corpus's bit positions into one m-bit bitmap.
    *
    * mapPartitions + treeReduce is deliberate RDD use: building a
    * dense bitmap is genuine per-partition imperative work with no
    * relational shape. Shuffle cost is (#partitions × m/8) bytes of
    * partial bitmaps — independent of corpus size; `depth` 2 keeps the
    * driver merge fan-in bounded when partitions number in the
    * thousands. */
  def buildBitmap(pos: DataFrame, mBits: Int): Array[Byte] = {
    require(mBits > 0 && mBits % 8 == 0, s"mBits must be a multiple of 8")
    val nBytes = mBits / 8
    pos.select(col("pos").cast("long")).rdd
      .mapPartitions { it =>
        val b = new Array[Byte](nBytes)
        it.foreach { r =>
          val p = r.getLong(0)
          b((p >>> 3).toInt) = (b((p >>> 3).toInt) | (1 << (p & 7))).toByte
        }
        Iterator(b)
      }
      .treeReduce({ (a, b) =>
        var i = 0
        while (i < nBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
        a
      }, depth = 2)
  }

  /** Gate an incoming batch against a corpus: (id, bloom_hit,
    * exact_dup). `bloom_hit` is the filter's verdict (map-side probe);
    * `exact_dup` is ground truth via a key semi-join — emitted so the
    * false-positive seam is visible and oracle-checked. The guarantee
    * under test: no false negatives (exact_dup ⇒ bloom_hit). */
  def gate(batch: DataFrame, corpus: DataFrame, idCol: String,
      keyExpr: Column, k: Int, mBits: Int): DataFrame = {
    val kb = keyed(batch, idCol, keyExpr)
    val kc = keyed(corpus, idCol, keyExpr)
    val bitmap = buildBitmap(positions(kc, k, mBits), mBits)
    val corpusKeys = kc.select(col("key")).distinct()
    kb.withColumn("bloom_hit", BloomContains.bloom_contains(
        bitmap, col("h1"), col("h2"), k, mBits))
      .join(corpusKeys.withColumn("__in_corpus", lit(true)), Seq("key"),
        "left")
      .select(col("id").as(idCol), col("bloom_hit"),
        coalesce(col("__in_corpus"), lit(false)).as("exact_dup"))
  }
}
