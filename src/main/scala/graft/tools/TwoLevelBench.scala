package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity}

/** Measure the flat vs two-level coarse-assignment break-even at
  * nCells >= 1024 (VERDICT r14 #9): the r14 addendum extrapolated the
  * ~10^3-cell crossover from nCells=160 constant factors; this tool
  * PINS it on a widened synthetic corpus (seeded xxhash64-derived
  * vectors — deterministic, no external data) by timing the
  * (id, cell) probe-assignment leg both ways across a cell sweep,
  * plus one full `cosinePairsIndexed` comparison at the largest size.
  *
  * The flat path ranks ALL nCells dots per row inside one codegen'd
  * projection — O(nCells)/row and an expression whose generated code
  * grows with nCells until Janino stops compiling it (Spark then
  * falls back to interpreted evaluation: a time cliff, which this
  * sweep exposes as the flat column blowing up while the hierarchy
  * column stays flat). The two-level path ranks sqrt(nCells) supers
  * map-side and only the chosen supers' children after one skinny
  * id-keyed exchange — O(sp*sqrt(nCells))/row at any nCells.
  *
  * A second leg (r16) measures the DISTRIBUTED BATCH SERVE both ways:
  * `searchBatchDist` on a flat-marker index ranks all nCells per
  * query row (crossJoin + window — the r15 seam), on a hier-marker
  * index it routes through the recorded hierarchy; the sweep pins
  * where the flat serve goes super-linear and the hier serve does
  * not, on committed indexes at production-shaped nCells.
  *
  * Usage: runMain graft.tools.TwoLevelBench [nRows] [dim] [passes]
  *          [legs]
  * `legs` is a comma list of assign|pairs|serve (default: all).
  * Output: one JSON line per (leg, nCells, path) with min-of-passes
  * secs.
  */
object TwoLevelBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val passes = if (args.length > 2) args(2).toInt else 3
    val legs = args.lift(3).map(_.split(",").toSet)
      .getOrElse(Set("assign", "pairs", "serve"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // seeded synthetic embeddings: dim values in [-1, 1) from
    // xxhash64(id, i) — deterministic, cluster-free (the assignment
    // leg's cost does not depend on cluster structure)
    val emb = spark.range(0L, nRows, 1L, cpus.toInt)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), i =>
          ((pmod(xxhash64(col("id"), i), lit(2000L)).cast("double") /
            1000.0) - 1.0).cast("float")).as("embedding"))
      .localCheckpoint(true)
    emb.count()
    val n = emb.select(col("vec_id").as("id"),
      col("embedding").as("v")).localCheckpoint(true)
    n.count()

    def time(body: => Long): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val c = body
      require(c > 0)
      (System.nanoTime() - t0) / 1e9
    }.min

    val allVecs = emb.orderBy("vec_id").limit(4096)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toSeq).toSeq

    for (nCells <- Seq(160, 512, 1024, 2048, 4096)
         if legs("assign") && nCells <= allVecs.size) {
      val coarse = allVecs.take(nCells)
      // the flat projection's width grows with nCells (nCells*dim
      // literal doubles in ONE expression) — a failure here IS the
      // measurement (the Janino/codegen ceiling), report it as such
      try {
        val flat = time(
          AnnIndex.probeCells(n, coarse, probes = 4, superProbes = 0)
            .count())
        println(s"""{"leg":"assign","nCells":$nCells,"path":"flat","sec":${f"$flat%.2f"},"rows":$nRows}""")
      } catch {
        case e: Throwable =>
          println(s"""{"leg":"assign","nCells":$nCells,"path":"flat","failed":"${
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\n]", " ").take(120)}"}""")
      }
      for (sp <- Seq(3, 8)) {
        val hier = time(
          AnnIndex.probeCells(n, coarse, probes = 4, superProbes = sp)
            .count())
        println(s"""{"leg":"assign","nCells":$nCells,"path":"hier_sp$sp","sec":${f"$hier%.2f"},"rows":$nRows}""")
      }
    }

    val m = if (dim % 8 == 0) 8 else 4

    // corpus-wide PAIRS leg (r16, VERDICT #9's decade): the
    // dedup_embed_ann production posture — capacity-bounded cells
    // (nCells = N/125), probes=8 — measured at the sf1.0-equivalent
    // and sf10-equivalent corpus sizes, pinning the linear-in-N claim
    // one decade past the derived-sf1.0 measurement without a second
    // text derivation (stacked caesar shifts collide past 26 replicas
    // and would plant exact dups — see DeriveSf's scaladoc).
    //
    // The pairs corpus is CLUSTERED, not uniform: vec = direction of
    // (id % nCells) + 1.5x noise, so the first-N-vectors quantizer
    // gets ~one centroid per direction class and cells stay balanced
    // at ~125 members — the shape KMeans training produces on real
    // embeddings, and the premise of the capacity-bound argument. (A
    // cluster-free uniform corpus skews argmax-dot assignment toward
    // the highest-norm centroids — measured 507 s at the 60k point vs
    // the real sf1.0 corpus's ~30 s — i.e. it measures the hot-cell
    // pathology, not the posture under test.) The 1.5x noise keeps
    // same-class cosines around ~0.3, below the 0.45 bar, so verify
    // volume stays realistic. Candidate work is probes²·cellSize·N
    // with cellSize ~125 by construction → expected time ∝ N; the
    // measured ratio IS the result. Cells in the thousands → the
    // hierarchy (sp=3) carries the assignment, exactly as a
    // production index at this nCells would.
    for (nPair <- Seq(60000L, 600000L)
         if legs("pairs") && nPair <= nRows) {
      val nCells = math.max(16L, nPair / 125L).toInt
      val pEmb = spark.range(0L, nPair, 1L, cpus.toInt)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(dim)), i => {
            val dirC = (pmod(xxhash64(pmod(col("id"),
              lit(nCells.toLong)), i), lit(2000L)).cast("double") /
              1000.0) - 1.0
            val noise = (pmod(xxhash64(col("id"), i, lit(7L)),
              lit(2000L)).cast("double") / 1000.0) - 1.0
            (dirC + noise * 1.5).cast("float")
          }).as("embedding"))
        .localCheckpoint(true)
      val sp = if (nCells > 1000) 3 else 0
      val dir = java.nio.file.Files
        .createTempDirectory(s"tlbp_$nPair").toString + "/idx"
      val tb0 = System.nanoTime()
      AnnIndex.build(pEmb, "vec_id", "embedding", dir,
        nCells = nCells, m = m, nCentroids = 16, iters = 1, hier = 3)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val sec = time(
        AnnIndex.cosinePairsIndexed(pEmb, "vec_id", "embedding", dir,
          threshold = 0.45, probes = 8, superProbes = sp).count() + 1)
      println(s"""{"leg":"pairs","rows":$nPair,"nCells":$nCells,"sp":$sp,"sec":${f"$sec%.2f"},"buildSec":${f"$buildSec%.2f"}}""")
    }

    // batch-SERVE leg (r16): searchBatchDist flat vs hier on a
    // COMMITTED index at each nCells — build outside the timed body
    // (build is the amortized offline step), serve a 20k-query batch.
    // The flat build/serve at large nCells may hit the codegen
    // ceiling or the measured super-linear window; either outcome IS
    // the measurement.
    val serveRows = math.min(nRows, 100000L)
    val sEmb = emb.filter(col("vec_id") < serveRows)
      .localCheckpoint(true)
    sEmb.count()
    val nQ = math.min(serveRows, 20000L)
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    queries.count()
    for (nCells <- Seq(1024, 2048, 4096)
         if legs("serve") && nCells <= serveRows;
         (hier, label) <- Seq((0, "flat"), (3, "hier_sp3"))) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"tlb_${nCells}_$hier").toString + "/idx"
      try {
        val tb0 = System.nanoTime()
        AnnIndex.build(sEmb, "vec_id", "embedding", dir,
          nCells = nCells, m = m, nCentroids = 16, iters = 1,
          hier = hier)
        val buildSec = (System.nanoTime() - tb0) / 1e9
        val sec = time(
          AnnIndex.searchBatchDist(sEmb, "vec_id", "embedding", dir,
            queries, "vec_id", "embedding", probes = 4, k = 5,
            nCand = 40).count())
        println(s"""{"leg":"serve","nCells":$nCells,"path":"$label","sec":${f"$sec%.2f"},"buildSec":${f"$buildSec%.2f"},"rows":$serveRows,"queries":$nQ}""")
      } catch {
        case e: Throwable =>
          println(s"""{"leg":"serve","nCells":$nCells,"path":"$label","failed":"${
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\n]", " ").take(120)}"}""")
      }
    }
    spark.stop()
  }
}
