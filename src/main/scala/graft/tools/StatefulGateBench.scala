package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Measures the structural claim behind `StatefulGates` (r17): a
  * stream-static join gate re-executes its corpus-side static table
  * on EVERY micro-batch — per-batch cost grows with the corpus — while
  * the state-store gate pays the corpus once (initial-state load,
  * batch 1) and then O(batch) point lookups per micro-batch.
  *
  * Setup per corpus size N (TextDecadeBench's planted synthetic, so
  * the text family and dup structure match the decade measurements):
  * build the MinHash index at the battery geometry (32x8), then
  * stream `batches` micro-batches of `batchSize` NOVEL docs each
  * through
  *
  *   - join:     `StreamingOps.nearDupGate` with the static side =
  *               `MinHashIndex.bandBuckets(dir)` re-derived per batch
  *               (the at-scale posture — a 100 TB bucket table cannot
  *               be cached);
  *   - stateful: `StatefulGates.nearDupGateStateful` (frozen state).
  *
  * Reported per leg: batch-1 time (the stateful leg's state load
  * rides here) and the MEDIAN of the remaining batches — the
  * steady-state per-micro-batch cost. The claim holds when the join
  * leg's median grows ~linearly in N while the stateful leg's stays
  * ~flat.
  *
  * Usage: runMain graft.tools.StatefulGateBench [N] [batches]
  * [batchSize] [scales]  (defaults 50000, 8, 500; the decade run is
  * 10N; scales=one runs only N; SPARK_GRAFT_SG_DIAG=1 adds an
  * empty-initial-state leg that isolates the per-batch floor).
  * Prints one JSON line per (scale, leg); record in BENCH_SF1.md.
  */
object StatefulGateBench {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(50000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(8)
    val batchSize = args.lift(2).map(_.toInt).getOrElse(500)
    val scalesOne = args.lift(3).contains("one")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      // changelog checkpointing: commit the batch's delta, not a full
      // RocksDB snapshot, per state partition per micro-batch — the
      // production setting for large state with small per-batch writes
      .config("spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val scales = if (scalesOne) Seq(n) else Seq(n, n * 10)
      for (scale <- scales) run(spark, scale, batches, batchSize)
    } finally spark.stop()
  }

  private def run(spark: SparkSession, n: Long, batches: Int,
      batchSize: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory(s"sgbench_$n").toString
    val docs = TextDecadeBench.corpus(spark, n, s"$root/docs")
    val dir = s"$root/idx"
    graft.ext.MinHashIndex.build(docs, "doc_id", "text", dir,
      numHashes = 32, bands = 8)
    // novel incoming docs: ids past the corpus, fresh token space
    // ("q"-prefixed), so probes miss — the cost measured is the probe
    // machinery, not result-size effects
    def batchRows(b: Int): Seq[(Long, Timestamp, String)] =
      (0 until batchSize).map { i =>
        val id = n + b.toLong * batchSize + i
        val toks = (0 until 80).map(p => s"q${(id * 131 + p * 7) % 99991}")
        (id, new Timestamp(1700000000000L + b * 60000L),
          toks.mkString(" "))
      }
    def measure(leg: String, mk: DataFrame => DataFrame): Unit = {
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = mk(in.toDF().toDF("doc_id", "ts", "text"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/ckpt_$leg")
        .outputMode("append").start()
      val times = (0 until batches).map { b =>
        in.addData(batchRows(b): _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      q.stop()
      val rest = times.drop(1).sorted
      val median = rest(rest.size / 2)
      println(f"""{"n":$n,"leg":"$leg","batch1":${times.head}%.2f,""" +
        f""""median_rest":$median%.2f,""" +
        s""""times":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
    }
    measure("join", df => graft.streaming.StreamingOps.nearDupGate(
      df, "doc_id", "text", "ts",
      graft.ext.MinHashIndex.bandBuckets(spark, dir),
      numHashes = 32, bands = 8))
    measure("stateful", df =>
      graft.streaming.StatefulGates.nearDupGateStateful(
        df, "doc_id", "text", "ts", dir, threshold = 0.6,
        estThreshold = 0.5))
    if (sys.env.contains("SPARK_GRAFT_SG_DIAG")) {
      // DIAGNOSTIC leg: same gate against an EMPTY index — if the
      // per-batch median collapses, the initial-state SUBTREE is
      // being re-executed every micro-batch
      val edir = s"$root/idx_empty"
      graft.ext.MinHashIndex.build(docs.limit(0), "doc_id", "text",
        edir, numHashes = 32, bands = 8)
      measure("stateful_emptyinit", df =>
        graft.streaming.StatefulGates.nearDupGateStateful(
          df, "doc_id", "text", "ts", edir, threshold = 0.6,
          estThreshold = 0.5))
    }
  }
}
