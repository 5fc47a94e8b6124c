package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The HONEST sf10 decade for the TEXT index family (r17 — VERDICT
  * r16 #2): the ANN family got its 10× measurement on a clustered
  * synthetic in r16; the MinHash family was measured to sf1.0 only,
  * because deriving 10× text by stacking caesar shifts corrupts the
  * dup structure (shifts collide past 26 replicas and plant EXACT
  * dups — BENCH_SF1.md r16). This tool generates synthetic text with
  * PLANTED near-dup structure instead, entirely with Spark
  * expressions (no driver-side text), and measures the index
  * lifecycle at N and 10N:
  *
  *   - corpus shape matched to the real testdata's relevant axes:
  *     doc length 50–199 tokens (the documents table's prose range),
  *     a 50k-token vocabulary, ~30% of docs are near-dups of their
  *     10-block leader with a per-doc perturbation rate drawn from
  *     5–40% of tokens — which under word-3-gram shingling yields a
  *     shingle-overlap (Jaccard) spread from ~0.2 to ~0.86, i.e.
  *     pairs on BOTH sides of the 0.6 mining bar, like a real crawl;
  *   - measured per scale, all WARM (min of `passes`): full index
  *     BUILD (the sign-once pass), corpus-wide PAIRS off the at-rest
  *     signatures (`pairsVerified`, no estimate gate — the
  *     dedup_minhash_index_pairs plan), batch PROBE (5% of docs
  *     re-signed and probed, `probeVerified` est-gated at 0.5 — the
  *     ingest-verdict plan), and the APPEND FOLD (buildGroups over
  *     10/11 of the corpus, then appendGroups folding the last 1/11 —
  *     the at-rest groups maintenance plan).
  *
  * Linear-in-N holds when the 10× ratios stay ~10 (build/pairs) and
  * the batch-bounded legs scale with their BATCH (probe) / batch
  * reach (fold), not the corpus.
  *
  * Usage: runMain graft.tools.TextDecadeBench [N] [passes] [scales]
  * (default N=50000 ≈ the sf1.0 documents row count; the decade run
  * is 10N; scales=one runs only N — for re-measuring a single point).
  * Prints one JSON line per scale; record in BENCH_SF1.md.
  */
object TextDecadeBench {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(50000L)
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val scalesOne = args.lift(2).contains("one")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val scales = if (scalesOne) Seq(n) else Seq(n, n * 10)
      for (scale <- scales) run(spark, scale, passes)
    } finally spark.stop()
  }

  private val Vocab = 50000L

  /** Deterministic token for position `i` of seed doc `seed`. */
  private def tok(seed: Column, i: Column): Column =
    concat(lit("t"), pmod(xxhash64(seed * 1000003L + i), lit(Vocab)))

  /** The planted corpus: docs 0..n-1; ids with id%10 in 1..3 (~30%)
    * are near-dups of their 10-block leader (id - id%10) with
    * per-doc perturbation rate 5–40% of tokens; everyone else is an
    * original. Materialized to parquet so every measured pass reads
    * real files like the battery does.
    */
  def corpus(spark: SparkSession, n: Long, dir: String): DataFrame = {
    val id = col("id")
    val leader = id - pmod(id, lit(10L))
    val isDup = pmod(id, lit(10L)).between(1, 3)
    val seed = when(isDup, leader).otherwise(id)
    // length is the SEED's, so a dup pairs against a same-length base
    val len = (lit(50L) + pmod(xxhash64(seed * 7L), lit(150L)))
      .cast("int")
    // perturbation rate per dup doc: 50..400 of 1000 (5%..40%)
    val pRate = lit(50L) + pmod(xxhash64(id * 13L), lit(351L))
    val toks = transform(sequence(lit(1), len), i =>
      when(isDup && pmod(xxhash64(id * 31L + i), lit(1000L)) < pRate,
        concat(lit("x"), pmod(xxhash64(id * 17L + i), lit(Vocab))))
        .otherwise(tok(seed, i)))
    spark.range(0L, n, 1L, 64)
      .select(id.as("doc_id"), concat_ws(" ", toks).as("text"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def run(spark: SparkSession, n: Long, passes: Int): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory(s"textdecade_$n").toString
    val docs = corpus(spark, n, s"$root/docs")
    def time(op: () => Unit): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime(); op(); (System.nanoTime() - t0) / 1e9
    }.min
    val M = graft.ext.MinHashIndex
    // BUILD: rebuilt per pass into a throwaway dir (the sign-once pass)
    var bi = 0
    val tBuild = time { () =>
      bi += 1
      M.build(docs, "doc_id", "text", s"$root/idx_b$bi",
        numHashes = 32, bands = 8)
    }
    val dir = s"$root/idx_b$bi" // the last built index serves below
    val tPairs = time { () =>
      M.pairsVerified(docs, "doc_id", "text", dir, threshold = 0.6)
        .count(); ()
    }
    val nPairs = M.pairsVerified(docs, "doc_id", "text", dir,
      threshold = 0.6).count()
    val batch = docs.filter(pmod(col("doc_id"), lit(20L)) === 7L)
    val tProbe = time { () =>
      M.probeVerified(batch, docs, "doc_id", "text", dir,
        threshold = 0.6, estThreshold = 0.5).count(); ()
    }
    // APPEND FOLD: base = 10/11, fold the last 1/11 through the
    // at-rest groups (fresh dir per pass: the fold mutates markers);
    // only the appendGroups call is on the clock — build/buildGroups/
    // append are setup
    val splitCond = pmod(col("doc_id"), lit(11L)) === 5L
    val base = docs.filter(!splitCond)
    val extra = docs.filter(splitCond)
    val tFold = (1 to passes).map { pi =>
      val d = s"$root/idx_f$pi"
      M.build(base, "doc_id", "text", d, numHashes = 32, bands = 8)
      M.buildGroups(base, "doc_id", "text", d, 0.6)
      M.append(extra, "doc_id", "text", d)
      val t0 = System.nanoTime()
      M.appendGroups(extra, docs, "doc_id", "text", d, 0.6)
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"n":$n,"build":$tBuild%.2f,"pairs":$tPairs%.2f,""" +
      f""""n_pairs":$nPairs,"probe":$tProbe%.2f,"fold":$tFold%.2f}""")
  }
}
