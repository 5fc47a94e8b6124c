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
  * Usage (kind = ann | minhash | bloom; gkind = ann | minhash):
  *   runMain graft.tools.IndexMaintCli status      <dir>
  *   runMain graft.tools.IndexMaintCli compact     <kind> <dir>
  *   runMain graft.tools.IndexMaintCli break-lease <kind> <dir> [staleMillis]
  *   runMain graft.tools.IndexMaintCli groups      <gkind> <dir>
  *   runMain graft.tools.IndexMaintCli groups-build <gkind> <dir> \
  *     <corpusParquet> <idCol> <contentCol> <threshold>
  *   runMain graft.tools.IndexMaintCli groups-append <gkind> <dir> \
  *     <batchParquet> <corpusParquet> <idCol> <contentCol> <threshold>
  *   runMain graft.tools.IndexMaintCli groups-delete <gkind> <dir> \
  *     <corpusParquet> <idCol> <contentCol> <threshold>
  *
  * `status` prints the committed marker (params + every +append/
  * +delete/+ingest mutation line), the GROUPS_READY marker and its
  * staleness vs the current index marker, lease presence, and which
  * side tables / segments / tombstone queues exist. `compact` runs
  * the family's seal (AnnIndex: fold the streaming segment +
  * tombstones into codes/; MinHash: sigs; Bloom: bitmap+keys).
  * `break-lease` refuses while the holder's heartbeat is fresh — see
  * `IndexFs.breakLease`. The `groups*` subcommands drive the at-rest
  * groups lifecycle (`buildGroups` / `appendGroups` / `deleteGroups`).
  * A MULTI-mutation marker folds as a sequence of `groups-append` /
  * `groups-delete` calls IN MARKER ORDER, one bounded fold per
  * mutation line (r17 — `IndexFs.requireFoldable` walks the suffix);
  * a fold whose kind does not match the next un-folded line refuses
  * loudly. `groups` alone reports freshness.
  */
object IndexMaintCli {

  private val SideDirs = Seq("codes", "codes_stream", "sigs",
    "sigs_stream", "bitmap", "keys", "keys_stream", "deletes",
    "coarse", "codebooks", "meta", "groups")

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
      case Seq("groups", kind, dir) =>
        groupsReport(spark, kind, dir)
      case Seq("groups-build", kind, dir, corpus, idCol, cCol, thr) =>
        kind match {
          case "minhash" => MinHashIndex.buildGroups(
            spark.read.parquet(corpus), idCol, cCol, dir, thr.toDouble)
          case "ann" => AnnIndex.buildGroups(
            spark.read.parquet(corpus), idCol, cCol, dir, thr.toDouble)
          case other => sys.error(s"unknown groups kind '$other' " +
            "(ann | minhash)")
        }
        println(s"[index-maint] groups built for $kind index at $dir")
      case Seq("groups-append", kind, dir, batch, corpus, idCol, cCol,
          thr) =>
        kind match {
          case "minhash" => MinHashIndex.appendGroups(
            spark.read.parquet(batch), spark.read.parquet(corpus),
            idCol, cCol, dir, thr.toDouble)
          case "ann" => AnnIndex.appendGroups(
            spark.read.parquet(batch), spark.read.parquet(corpus),
            idCol, cCol, dir, thr.toDouble)
          case other => sys.error(s"unknown groups kind '$other' " +
            "(ann | minhash)")
        }
        println(s"[index-maint] batch folded into $kind groups at $dir")
      case Seq("groups-delete", kind, dir, corpus, idCol, cCol,
          thr) =>
        kind match {
          case "minhash" => MinHashIndex.deleteGroups(
            spark.read.parquet(corpus), idCol, cCol, dir, thr.toDouble)
          case "ann" => AnnIndex.deleteGroups(
            spark.read.parquet(corpus), idCol, cCol, dir, thr.toDouble)
          case other => sys.error(s"unknown groups kind '$other' " +
            "(ann | minhash)")
        }
        println(s"[index-maint] tombstones folded into $kind " +
          s"groups at $dir")
      case _ =>
        sys.error("usage: status <dir> | compact <kind> <dir> | " +
          "break-lease <kind> <dir> [staleMillis] | " +
          "groups <kind> <dir> | " +
          "groups-build <kind> <dir> <corpus> <idCol> <contentCol> <thr> | " +
          "groups-append <kind> <dir> <batch> <corpus> <idCol> <contentCol> <thr> | " +
          "groups-delete <kind> <dir> <corpus> <idCol> <contentCol> <thr>")
    }

  private def groupsReport(spark: SparkSession, kind: String,
      dir: String): Unit = {
    val st = kind match {
      case "minhash" => MinHashIndex.groupsStatus(spark, dir)
      case "ann" => AnnIndex.groupsStatus(spark, dir)
      case other => sys.error(s"unknown groups kind '$other' " +
        "(ann | minhash)")
    }
    st match {
      case Some((marker, fresh)) =>
        println(s"[index-maint] $dir groups: GROUPS_READY " +
          (if (fresh) "(FRESH vs current index marker)"
           else "(STALE — index mutated since; fold the trailing " +
             "mutation with groups-append/groups-delete, or " +
             "groups-build)"))
        println(s"    $marker")
      case None =>
        println(s"[index-maint] $dir groups: ABSENT (groups-build " +
          "to create)")
    }
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
    val gmarker = new Path(dir, "GROUPS_READY")
    if (fs.exists(gmarker)) {
      // staleness = the digest recorded at build time vs the digest
      // of the current index marker (the groupsStatus rule, kindless)
      val gin = fs.open(gmarker)
      val gtext =
        try scala.io.Source.fromInputStream(gin, "UTF-8").mkString
        finally gin.close()
      val fresh = fs.exists(marker) && {
        val in2 = fs.open(marker)
        val itext =
          try scala.io.Source.fromInputStream(in2, "UTF-8").mkString
          finally in2.close()
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(itext.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        gtext.contains(s"index[$digest]")
      }
      println("  groups marker: GROUPS_READY " +
        (if (fresh) "(FRESH)" else "(STALE vs current index marker)"))
      gtext.linesIterator.foreach(l => println(s"    $l"))
    } else println("  groups marker: ABSENT")
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
