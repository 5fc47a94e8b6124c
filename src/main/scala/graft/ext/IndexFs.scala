package graft.ext

import org.apache.spark.sql.SparkSession

/** Hadoop-FS primitives shared by the persisted index lifecycles
  * (`AnnIndex`, `MinHashIndex`): marker read/commit and the exclusive
  * maintenance lease. Every filesystem touch resolves the Hadoop
  * FileSystem from the index dir's scheme — a java.nio marker on an
  * HDFS/S3 index dir would land on LOCAL disk and silently disagree
  * with the actual remote index state.
  */
private[ext] object IndexFs {

  def hfs(spark: SparkSession, dir: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def hpath(parts: String*): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(parts.mkString("/"))

  def readMarker(spark: SparkSession, dir: String,
      marker: String): Option[String] = {
    val fs = hfs(spark, dir)
    val p = hpath(dir, marker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Single-writer guard for index MAINTENANCE (build/append/delete/
    * compact): an exclusive lease file created atomically
    * (`FileSystem.create(overwrite = false)` — one winner per path on
    * HDFS/local; S3A needs a stronger store for true atomicity, like
    * every filesystem-rename commit protocol). A second concurrent
    * writer fails the create and ABORTS LOUDLY instead of interleaving
    * half-written segments under the other writer's marker. Fails
    * CLOSED on a crash: the dead writer's lease blocks maintenance
    * (searches are unaffected — they never take the lease) until an
    * operator verifies no job is running and removes the lease file;
    * the failure mode is a refused rebuild, never a corrupted index.
    */
  def withLease[T](spark: SparkSession, dir: String, lease: String,
      what: String)(body: => T): T = {
    val fs = hfs(spark, dir)
    fs.mkdirs(hpath(dir))
    val p = hpath(dir, lease)
    val acquired =
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!acquired)
      throw new IllegalStateException(
        s"$what maintenance lease held at $p — another " +
          "build/append/delete/compact is running (or crashed: verify " +
          "and remove the lease file)")
    try body
    finally { fs.delete(p, false); () }
  }

  /** Write the marker via tmp + rename: a crashed write leaves either
    * the previous marker or none — never a truncated one.
    */
  def writeMarker(spark: SparkSession, dir: String, marker: String,
      text: String): Unit = {
    val fs = hfs(spark, dir)
    val tmp = hpath(dir, s".$marker.tmp")
    val dst = hpath(dir, marker)
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"could not commit marker at $dst")
  }
}
