package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.{Engine, EngineConfig}
import graft.streaming.StreamingOps

/** Streaming counterpart of `RunMappingCli`: the same sheet directory
  * layout, but `<dir>/<source>/` is a DIRECTORY of CSV files that may
  * keep growing, and the output is a checkpointed parquet sink at
  * `<dir>/<output>/` (checkpoint at `<dir>/_checkpoint`). Re-running
  * resumes from the checkpoint and processes only new files —
  * exactly-once incremental ETL with zero rule changes vs batch.
  *
  * The Source sheet's headers are sniffed from the files already
  * present (a streaming read needs a declared schema), so at least one
  * CSV must exist on first run.
  *
  * Usage: runMain graft.tools.RunMappingStreamCli <sheets-dir>
  *   processes everything currently available, then exits (run it on a
  *   schedule, or embed `StreamingOps.runMappingStream` for a
  *   continuous query).
  */
object RunMappingStreamCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RunMappingStreamCli <sheets-dir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-run-mapping-stream")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val config =
        if (new java.io.File(s"$dir/Dashboard.csv").exists()) {
          val kvs = spark.read.option("header", false)
            .csv(s"$dir/Dashboard.csv").collect().toSeq.map { r =>
              (Option(r.get(0)).map(_.toString).getOrElse(""),
               if (r.size > 1) Option(r.get(1)).map(_.toString).getOrElse("")
               else "")
            }
          EngineConfig.fromKeyValues(kvs)
        } else EngineConfig()
      val srcDir = s"$dir/${config.source}"
      val headers = Engine.readSheetCsv(spark, srcDir).columns.toSeq
      val mapRules = Engine.readSheetCsv(spark, s"$dir/${config.map}.csv")
        .collect().toSeq.map { r =>
          (Option(r.get(0)).map(_.toString).getOrElse(""),
           if (r.size > 1) Option(r.get(1)).map(_.toString).getOrElse("")
           else "")
        }
      val q = StreamingOps.runMappingStream(spark, srcDir, headers,
        mapRules, s"$dir/${config.output}", s"$dir/_checkpoint")
      q.processAllAvailable()
      q.stop()
      val n = spark.read.parquet(s"$dir/${config.output}").count()
      println(s"[graft] stream mapping caught up: $n total rows -> " +
        s"$dir/${config.output}")
    } catch {
      case e: Throwable =>
        System.err.println(s"[graft] run aborted: ${e.getMessage}")
        sys.exit(1)
    } finally spark.stop()
  }
}
