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
    val fs = FileSystem.get(URI.create(inDir), conf)
    def parquetFiles(dir: String) =
      fs.listStatus(new Path(dir))
        .filter(_.getPath.getName.endsWith(".parquet"))
    val in = parquetFiles(inDir)
    val bytes = in.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n)
      .write.mode("overwrite").parquet(outDir)
    Report(bytes, in.length, parquetFiles(outDir).length)
  }
}
