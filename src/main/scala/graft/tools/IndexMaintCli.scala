package graft.tools

import org.apache.spark.sql.SparkSession

import org.apache.hadoop.fs.Path

import graft.ext.{AnnIndex, BloomIndex, MinHashIndex}

/** Operational CLI for the three persisted-index families — the
  * documented form of the maintenance ops their scaladocs promise
  * (an operator recovering a crashed writer should not need a Scala
  * REPL). Reference anchor: the reference has no indexes at all
  * (whole-sheet rescan per run, `main.gs:51-52`); these lifecycles
  * are the driver-mandated 100 TB posture.
  *
  * Usage (kind = ann | minhash | bloom):
  *   runMain graft.tools.IndexMaintCli status     <dir>
  *   runMain graft.tools.IndexMaintCli compact    <kind> <dir>
  *   runMain graft.tools.IndexMaintCli break-lease <kind> <dir> [staleMillis]
  *
  * `status` prints the committed marker (params + every +append/
  * +delete/+ingest mutation line), lease presence, and which side
  * tables / segments / tombstone queues exist. `compact` runs the
  * family's seal (AnnIndex: fold the streaming segment + tombstones
  * into codes/; MinHash: sigs; Bloom: bitmap+keys). `break-lease`
  * refuses while the holder's heartbeat is fresh — see
  * `IndexFs.breakLease`.
  */
object IndexMaintCli {

  private val SideDirs = Seq("codes", "codes_stream", "sigs",
    "sigs_stream", "bitmap", "keys", "keys_stream", "deletes",
    "coarse", "codebooks", "meta")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toSeq)
    catch {
      case e: Exception =>
        System.err.println(s"[index-maint] ERROR: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }

  private def run(spark: SparkSession, args: Seq[String]): Unit =
    args match {
      case Seq("status", dir) =>
        status(spark, dir)
      case Seq("compact", kind, dir) =>
        val kept = kind match {
          case "ann" => AnnIndex.compactSegment(spark, dir)
          case "minhash" => MinHashIndex.compact(spark, dir)
          case "bloom" => BloomIndex.compact(spark, dir)
          case other => sys.error(s"unknown index kind '$other' " +
            "(ann | minhash | bloom)")
        }
        println(s"[index-maint] compacted $kind index at $dir: " +
          s"$kept rows at rest")
      case Seq("break-lease", kind, dir) =>
        breakLease(spark, kind, dir, None)
      case Seq("break-lease", kind, dir, stale) =>
        breakLease(spark, kind, dir, Some(stale.toLong))
      case _ =>
        sys.error("usage: status <dir> | compact <kind> <dir> | " +
          "break-lease <kind> <dir> [staleMillis]")
    }

  private def breakLease(spark: SparkSession, kind: String,
      dir: String, staleMillis: Option[Long]): Unit = {
    val marker = (kind, staleMillis) match {
      case ("ann", Some(ms)) => AnnIndex.breakLease(spark, dir, ms)
      case ("ann", None) => AnnIndex.breakLease(spark, dir)
      case ("minhash", Some(ms)) =>
        MinHashIndex.breakLease(spark, dir, ms)
      case ("minhash", None) => MinHashIndex.breakLease(spark, dir)
      case ("bloom", Some(ms)) => BloomIndex.breakLease(spark, dir, ms)
      case ("bloom", None) => BloomIndex.breakLease(spark, dir)
      case (other, _) => sys.error(s"unknown index kind '$other' " +
        "(ann | minhash | bloom)")
    }
    marker match {
      case Some(m) =>
        println(s"[index-maint] lease cleared at $dir (no-op if none" +
          s" was held); committed marker after fencing:\n" +
          m.linesIterator.map("  " + _).mkString("\n"))
      case None =>
        println(s"[index-maint] lease cleared at $dir; NO committed " +
          "marker — the crashed writer died pre-commit, rebuild " +
          "before serving")
    }
  }

  // status is read-only introspection, so it speaks Hadoop FS
  // directly rather than widening the ext-private IndexFs primitives
  private def status(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    println(s"[index-maint] $dir")
    val marker = new Path(dir, "INDEX_READY")
    if (fs.exists(marker)) {
      println("  marker: INDEX_READY")
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().foreach(l => println(s"    $l"))
      finally in.close()
    } else
      println("  marker: ABSENT (no committed index — build " +
        "running, crashed, or never ran)")
    val lease = new Path(dir, ".MAINT_LEASE")
    if (fs.exists(lease)) {
      val st = fs.getFileStatus(lease)
      val age = (System.currentTimeMillis() -
        st.getModificationTime) / 1000.0
      println(f"  lease: HELD (heartbeat age $age%.1f s — live " +
        "writer if fresh, crashed if stale; see break-lease)")
    } else println("  lease: free")
    for (sd <- SideDirs; p = new Path(dir, sd) if fs.exists(p)) {
      val sum = fs.getContentSummary(p)
      println(s"  $sd/: ${sum.getFileCount} files, " +
        s"${sum.getLength} bytes")
    }
  }
}
