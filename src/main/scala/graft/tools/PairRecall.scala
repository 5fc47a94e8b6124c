package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall audit for the approximate near-dup pair generators against
  * brute-force truth at a given SF — the "measure your index before
  * trusting it" ops tool for the PAIR shape (sim_recall_eval covers
  * the top-k shape). Compares `dedup_embed` (sign-LSH banding) and
  * `dedup_embed_ann` (probe-confined persisted-index candidates)
  * against `Similarity.cosinePairsBrute` at the same threshold.
  *
  * Usage: runMain graft.tools.PairRecall <sfDir> [threshold]
  * The brute leg is a deliberate O(N²) truth computation — run it at
  * audit SFs, not production ones.
  */
object PairRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.45
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val brute = pairs(graft.ext.Similarity.cosinePairsBrute(
      emb, "vec_id", "embedding", threshold))
    for (q <- Seq("dedup_embed", "dedup_embed_ann")) {
      val got = pairs(graft.SparkEntry.queries(q)(spark, sfDir)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b")))
      val hit = (got & brute).size
      println(f"[recall] $q truth=${brute.size} got=${got.size} " +
        f"hit=$hit recall=${hit.toDouble / math.max(1, brute.size)}%.3f " +
        f"precision=${hit.toDouble / math.max(1, got.size)}%.3f")
    }
    // probe-count sweep on the indexed leg (the recall/work knob:
    // candidate work grows with probes², recall saturates)
    val key = new java.io.File(sfDir).getCanonicalPath
      .replaceAll("[^A-Za-z0-9.]+", "_")
    val dir = s"target/ann_index/${key}_dedup"
    for (p <- Seq(2, 6, 8, 12)) {
      val t0 = System.nanoTime()
      val got = pairs(graft.ext.AnnIndex.cosinePairsIndexed(emb,
        "vec_id", "embedding", dir, threshold, probes = p))
      val secs = (System.nanoTime() - t0) / 1e9
      val hit = (got & brute).size
      println(f"[recall] ann probes=$p got=${got.size} " +
        f"recall=${hit.toDouble / math.max(1, brute.size)}%.3f " +
        f"time=$secs%.1f s")
    }
    // two-level assignment sweep (superProbes > 0): recall cost of the
    // O(sqrt(N))-per-row hierarchical quantizer vs the flat ranking at
    // the same probes — how much super-probing buys back the recall
    for ((p, sp) <- Seq((4, 3), (8, 3), (8, 4), (8, 6), (8, 8))) {
      val t0 = System.nanoTime()
      val got = pairs(graft.ext.AnnIndex.cosinePairsIndexed(emb,
        "vec_id", "embedding", dir, threshold, probes = p,
        superProbes = sp))
      val secs = (System.nanoTime() - t0) / 1e9
      val hit = (got & brute).size
      println(f"[recall] ann probes=$p superProbes=$sp got=${got.size} " +
        f"recall=${hit.toDouble / math.max(1, brute.size)}%.3f " +
        f"time=$secs%.1f s")
    }
    spark.stop()
  }
}
