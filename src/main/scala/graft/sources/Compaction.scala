package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass that keeps a
  * 100 TB lake scannable (a million 100 KB files turns every scan
  * into a metadata storm and every task into a seek).
  *
  * Sizing comes from the actual on-disk byte count, not a row guess;
  * the rewrite uses `coalesce` (narrow dependency — no shuffle) since
  * compaction only ever reduces file count. Skew across coalesced
  * outputs is bounded by targetBytes granularity.
  */
object Compaction {

  final case class Report(bytesIn: Long, filesIn: Int, filesOut: Int)

  /** Rewrite `inDir`'s parquet files into ≈`targetBytes` outputs at
    * `outDir`.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Report = {
    val conf = spark.sparkContext.hadoopConfiguration
    // Recursive listing (partitionBy layouts nest part files under
    // key=value subdirs — a top-level listing would see zero bytes and
    // degenerate to coalesce(1)); each dir resolves its own
    // FileSystem, so in and out may live on different schemes.
    def parquetFiles(dir: String) = {
      val fs = FileSystem.get(URI.create(dir), conf)
      // Qualified so the ancestor walk in hidden() terminates AT the
      // input dir — listFiles returns fully-qualified paths, and an
      // unqualified base would never compare equal, letting the walk
      // reach a '.'/'_'-prefixed ancestor (e.g. ~/.cache/...) and
      // classify every file as hidden.
      val base = fs.makeQualified(new Path(dir))
      // Skip any path under a '_'/'.'-prefixed segment (mirrors
      // Spark's InMemoryFileIndex filtering) — debris like
      // _temporary task output is invisible to spark.read.parquet and
      // must not inflate the byte count that sizes the rewrite.
      def hidden(p: Path): Boolean =
        p != null && !p.equals(base) && {
          val n = p.getName
          n.startsWith("_") || n.startsWith(".") || hidden(p.getParent)
        }
      val it = fs.listFiles(base, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet") && !hidden(f.getPath))
          buf += f
      }
      buf.toSeq
    }
    val in = parquetFiles(inDir)
    // Fail fast with a clear message — an empty dir would otherwise
    // surface as an obscure schema-inference error from the read below.
    if (in.isEmpty)
      throw new IllegalArgumentException(
        s"Compaction.compact: no parquet files found under $inDir")
    val bytes = in.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // Preserve a partitionBy layout: the key=value path segments of
    // the first data file name the partition columns (in directory
    // order) — rewriting a partitioned table flat would turn every
    // partition-pruned scan on the copy into a full scan.
    val partCols = in.headOption.toSeq.flatMap { f =>
      val fs = FileSystem.get(URI.create(inDir), conf)
      val base = fs.makeQualified(new Path(inDir))
      def segs(p: Path): List[String] =
        if (p == null || p.equals(base)) Nil
        else segs(p.getParent) :+ p.getName
      segs(f.getPath.getParent)
        .filter(_.contains("=")).map(_.takeWhile(_ != '='))
    }
    // Read partition values as strings, not re-inferred types: a
    // numeric-looking STRING partition value (key=01) would otherwise
    // be inferred as int and rewritten as key=1 — silently changing
    // both layout and values. Data-file column types are unaffected
    // (they come from the parquet footers). Partition inference runs
    // eagerly at relation resolution, so the conf can be restored
    // immediately after the read call.
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val oldInfer = spark.conf.get(inferKey, "true")
    val df = try {
      spark.conf.set(inferKey, "false")
      spark.read.parquet(inDir)
    } finally spark.conf.set(inferKey, oldInfer)
    val out = df.coalesce(n)
    val w = out.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(outDir)
    Report(bytes, in.length, parquetFiles(outDir).length)
  }
}
