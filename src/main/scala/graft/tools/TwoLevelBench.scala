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
  * Usage: runMain graft.tools.TwoLevelBench [nRows] [dim] [passes]
  * Output: one JSON line per (nCells, path) with min-of-passes secs.
  */
object TwoLevelBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val passes = if (args.length > 2) args(2).toInt else 3
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
         if nCells <= allVecs.size) {
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
    spark.stop()
  }
}
