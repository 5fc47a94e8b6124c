package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the ingest front door's exact-dup SHORT-CIRCUIT saving as
  * a function of the batch's PLANTED exact-dup fraction (r17 —
  * VERDICT r16 #6: the r16 battery batch is low-dup, so `_fast`
  * measured warm parity there and the "saving ∝ dup fraction" claim
  * was asserted by construction, not measured).
  *
  * Per fraction f ∈ {0, 0.3, 0.7}: the battery's incoming batch
  * (documents % 20 == 0 with an embedding row) has fraction f of its
  * TEXTS replaced by verbatim copies of corpus documents (the
  * token-set-canonical Bloom key then matches ⇒ exact_dup), then two
  * pipeline shapes run WARM (min of `passes` back-to-back runs each):
  *
  *   - all_legs: the `pipeline_ingest_gates` shape — bloom verdicts
  *     plus the MinHash probe/verify and batch-bounded ANN legs over
  *     EVERY incoming doc;
  *   - fast: the `pipeline_ingest_gates_fast` shape — the two
  *     near-dup legs restricted to the non-exact survivors.
  *
  * Both shapes share the batch-bounded ANN candidate rule (the
  * structural corpus-mining win was measured separately in r16), so
  * the fast−all_legs delta isolates the SHORT-CIRCUIT itself; by
  * construction it should scale with f. `composed` additionally times
  * `StreamingOps.ingestGates` (the r17 one-operator front door, batch
  * face) on the same batch.
  *
  * Usage: runMain graft.tools.FrontDoorBench [sfDir] [fracs] [passes]
  * [mod]. `mod` selects the incoming batch (doc_id % mod == 0, the
  * battery's 20 by default) — at small SFs the %20 batch is fixed-
  * cost-dominated (100 docs at sf0.1), so the at-scale measurement
  * runs sf1.0 with mod=2 (a 10k-doc batch against a 25k-doc corpus).
  * Prints one JSON line per fraction; record in BENCH_SF1.md.
  */
object FrontDoorBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val fracs = args.lift(1).getOrElse("0.0,0.3,0.7")
      .split(",").map(_.toDouble).toSeq
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val mod = args.lift(3).map(_.toInt).getOrElse(20)
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
    try run(spark, sfDir, fracs, passes, mod)
    finally spark.stop()
  }

  // battery constants (PipelineQueries): word3 32x8 @ 0.75 est 0.5,
  // cosine 0.9 probes 4, bloom 7 hashes / 2^22 bits
  private val NumHashes = 32
  private val Bands = 8
  private val JaccardThreshold = 0.75
  private val CosineThreshold = 0.9
  private val BloomK = 7
  private val BloomBits = 1 << 22

  private def run(spark: SparkSession, sfDir: String,
      fracs: Seq[Double], passes: Int, mod: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val key0 = new java.io.File(sfDir).getCanonicalPath
      .replaceAll("[^A-Za-z0-9.]+", "_")
    // the battery mod (20) reuses the battery's index dirs; any other
    // mod gets its own (same file fingerprint, different corpus split)
    val key = if (mod == 20) key0 else s"${key0}_m$mod"
    val tsKey = concat_ws(" ",
      array_sort(array_distinct(graft.ext.Dedup.tokens(col("text")))))
    val bdir = s"target/minhash_index/${key}_bloom"
    val bfp = graft.ext.AnnIndex.parquetFingerprint(spark,
      s"$sfDir/documents.parquet")
    graft.ext.BloomIndex.ensureBuilt(
      docs.filter(col("doc_id") % mod =!= 0), "doc_id", tsKey, bdir,
      k = BloomK, mBits = BloomBits, fingerprint = bfp)
    val mdir = s"target/minhash_index/$key"
    graft.ext.MinHashIndex.ensureBuilt(docs, "doc_id", "text", mdir,
      NumHashes, Bands, bfp)
    val adir = s"target/ann_index/${key}_dedup"
    val afp = graft.ext.AnnIndex.parquetFingerprint(spark,
      s"$sfDir/embeddings.parquet")
    val nCells = math.max(16L, emb.count() / 125L).toInt
    graft.ext.AnnIndex.ensureBuilt(emb, "vec_id", "embedding", adir,
      nCells = nCells, m = 32, nCentroids = 64, iters = 3,
      fingerprint = afp)
    val cells = graft.ext.AnnIndex.cellTable(emb, "vec_id",
      "embedding", adir, probes = 4).localCheckpoint(true)

    // 128 corpus texts to plant from, keyed by a stable slot
    val plantPool = docs.filter(col("doc_id") % mod =!= 0)
      .select(col("text")).limit(128).collect().map(_.getString(0))
    val poolDf = {
      import spark.implicits._
      plantPool.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toSeq.toDF("__slot", "__ptext")
    }
    for (f <- fracs) {
      // plant: slot = hash(doc_id) mod 1000; texts replaced where the
      // slot falls under f*1000 — deterministic, embedding untouched
      val incoming = docs.filter(col("doc_id") % mod === 0)
        .join(emb.filter(col("vec_id") % mod === 0)
            .select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id")
        .withColumn("__slot",
          pmod(xxhash64(col("doc_id")), lit(128L)))
        .join(broadcast(poolDf), Seq("__slot"))
        .withColumn("text",
          when(pmod(xxhash64(col("doc_id"), lit(7)), lit(1000L)) <
            (f * 1000).toLong, col("__ptext")).otherwise(col("text")))
        .drop("__slot", "__ptext")
        .localCheckpoint(true) // the planted batch, fixed across runs
      val nDup = incoming.join(
          docs.filter(col("doc_id") % mod =!= 0)
            .select(tsKey.as("__k")).distinct(),
          tsKey === col("__k"), "left_semi").count()
      val nAll = incoming.count()
      def time(mk: () => DataFrame): Double = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val tAll = time(() =>
        frontDoor(spark, incoming, docs, cells, bdir, mdir, adir,
          tsKey, shortCircuit = false))
      val tFast = time(() =>
        frontDoor(spark, incoming, docs, cells, bdir, mdir, adir,
          tsKey, shortCircuit = true))
      val tComposed = time(() =>
        graft.streaming.StreamingOps.ingestGates(
          incoming.withColumn("ts",
            lit("2026-01-01 00:00:00").cast("timestamp")),
          "doc_id", "text", "embedding", "ts", docs, bdir, tsKey,
          mdir, JaccardThreshold, 0.5, adir, cells, CosineThreshold,
          probes = 4))
      println(f"""{"frac":$f%.2f,"n":$nAll,"n_exact_dup":$nDup,""" +
        f""""all_legs":$tAll%.3f,"fast":$tFast%.3f,""" +
        f""""composed":$tComposed%.3f}""")
    }
  }

  /** The front-door composition over a (doc_id, text, embedding)
    * batch — `shortCircuit=false` is the `pipeline_ingest_gates`
    * shape (every leg over every doc), `true` the `_fast` shape (the
    * near-dup legs over non-exact survivors only). Both use the
    * batch-bounded ANN candidate rule so the measured delta isolates
    * the short-circuit.
    */
  private def frontDoor(spark: SparkSession, incoming: DataFrame,
      corpus: DataFrame, cells: DataFrame, bdir: String, mdir: String,
      adir: String, tsKey: org.apache.spark.sql.Column,
      shortCircuit: Boolean): DataFrame = {
    val bl = graft.ext.BloomIndex.gate(incoming, "doc_id", tsKey, bdir)
      .localCheckpoint(false)
    val probed =
      if (shortCircuit)
        incoming.join(bl.filter(!col("exact_dup")).select("doc_id"),
          Seq("doc_id"), "left_semi")
      else incoming
    // text leg: index probe + exact verify on candidates
    val pairs = graft.ext.MinHashIndex.probeVerified(probed, corpus,
        "doc_id", "text", mdir, threshold = JaccardThreshold,
        estThreshold = 0.5)
      .filter(col("id_a") =!= col("id_b"))
    val mh = probed.select(col("doc_id"))
      .join(pairs.groupBy(col("id_a").as("doc_id"))
          .agg(max(col("jaccard")).as("best_jaccard")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("best_jaccard").isNotNull.as("nd_text"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"))
    // embed leg: batch-bounded probe cells x the corpus cell table
    val (_, coarse, _) = graft.ext.AnnIndex.load(spark, adir)
    val pv = probed.select(col("doc_id"), col("embedding"),
      graft.ext.Similarity.l2norm(probed, col("embedding"))
        .as("__nrm"))
    val cand = pv.select(col("doc_id"), col("embedding"), col("__nrm"),
        explode(graft.ext.AnnIndex.flatProbeCellsCol(pv,
          col("embedding"), coarse, probes = 4)).as("cell"))
      .join(cells.select(col("cell"), col("id").as("__cid"),
        col("v").as("__cv"), col("nrm").as("__cnrm")), Seq("cell"))
      .filter(col("doc_id") =!= col("__cid"))
      .select(col("doc_id"),
        (graft.ext.Similarity.dot(pv, col("embedding"), col("__cv")) /
          (col("__nrm") * col("__cnrm"))).as("cos"))
      .filter(col("cos") >= CosineThreshold)
    val em = pv.select(col("doc_id"))
      .join(cand.groupBy("doc_id").agg(max(col("cos")).as("best_cos")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("best_cos").isNotNull.as("nd_embed"),
        round(coalesce(col("best_cos"), lit(0.0)), 6).as("best_cos"))
    bl.select(col("doc_id"), col("exact_dup"))
      .join(mh, Seq("doc_id"), "left")
      .join(em, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_dup"), col("nd_text"),
        col("best_jaccard"), col("nd_embed"), col("best_cos"),
        (!col("exact_dup") && !col("nd_text") && !col("nd_embed"))
          .as("admit"))
  }
}
