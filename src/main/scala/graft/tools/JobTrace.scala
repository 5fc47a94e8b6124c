package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Traces every Spark job fired by one query: start offset, duration,
  * #tasks, and call site — the attribution companion to QProfile.
  * Usage: JobTrace <sfDir> <query> [passes]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q = args(1)
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.rangeJoin.binWidth", "auto")
      .config("spark.graft.aggJoinToWindow", "true")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, t0: Long, var t1: Long = 0L,
      var tasks: Int = 0, var site: String = "")
    val jobs = mutable.LinkedHashMap[Int, J]()
    // stageId -> owning jobId, recorded at job START (ADVICE r17: the
    // old "most recently started job" heuristic misattributed tasks
    // whenever jobs overlap or a stage completes after a later job
    // starts)
    val stageOwner = mutable.HashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val j = J(e.jobId, e.time)
          j.site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs(e.jobId) = j
          e.stageIds.foreach(sid => stageOwner(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute tasks to the job that SUBMITTED this stage
          stageOwner.get(e.stageInfo.stageId)
            .flatMap(jobs.get)
            .foreach(_.tasks += e.stageInfo.numTasks)
          val si = e.stageInfo
          val dur = (for (a <- si.submissionTime; b <- si.completionTime)
            yield b - a).getOrElse(0L)
          if (dur > 250)
            println(f"[stage] ${si.stageId}%4d dur=$dur%5dms " +
              f"tasks=${si.numTasks}%3d ${si.name.take(90)} | " +
              si.details.linesIterator.filter(_.contains("graft"))
                .take(3).mkString(" <- "))
        }
    })
    val fn = graft.SparkEntry.queries(q)
    // measure the trivial-action floor
    for (_ <- 1 to 3) spark.range(1).count()
    val floor = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); spark.range(1).count()
      (System.nanoTime() - t0) / 1e6
    }.min
    println(f"[trace] trivial-action floor: $floor%.1f ms")
    for (p <- 1 to passes) {
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      jobs.synchronized { jobs.clear(); stageOwner.clear() }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      if (p == passes) {
        println(f"[trace] $q pass$p total=$dt%.2fs rows=$n jobs=${jobs.size}")
        val base = jobs.values.headOption.map(_.t0).getOrElse(0L)
        var prevEnd = base
        jobs.values.foreach { j =>
          val gap = j.t0 - prevEnd
          prevEnd = math.max(prevEnd, j.t1)
          println(f"[trace]   job ${j.id}%3d +${(j.t0 - base)}%6dms " +
            f"dur=${j.t1 - j.t0}%5dms gap=$gap%5dms tasks=${j.tasks}%3d ${j.site}")
        }
      } else println(f"[trace] $q pass$p total=$dt%.2fs rows=$n jobs=${jobs.size}")
    }
    spark.stop()
  }
}
