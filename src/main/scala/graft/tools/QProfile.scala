package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Per-query profiler (r17 optimization round): times each named query
  * warm (min of `passes`), counting Spark jobs / stages / tasks per
  * pass via a listener, and optionally writes `.explain("formatted")`
  * to plans/<tag>/<query>_<suffix>.txt. The same session config as
  * Bench (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, graft
  * extensions), so plan shapes match what the bench measures.
  *
  * Usage: QProfile <sfDir> <plansDirOrNONE> <suffix> <passes> <q1,q2,...|ALL>
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val plansDir = args(1)
    val suffix = args(2)
    val passes = args(3).toInt
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
    // extra session confs: SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    // longest single stage that ran on <= 2 tasks: the "serial
    // hotspot" indicator (a 1-split scan doing amplified work)
    val serMs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        val si = sc.stageInfo
        if (si.numTasks <= 2)
          for (t0 <- si.submissionTime; t1 <- si.completionTime) {
            val d = (t1 - t0).toInt
            var cur = serMs.get()
            while (d > cur && !serMs.compareAndSet(cur, d)) cur = serMs.get()
          }
      }
    })
    val names0 = args(4)
    val names =
      if (names0 == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else names0.split(",").toSeq
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      // warmup pass (JIT + codegen cache + index build)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[qprof] $q WARMUP FAILED: ${e.getMessage.take(200)}") }
      val times = (1 to passes).map { _ =>
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = true))
        jobs.set(0); stages.set(0); tasks.set(0); serMs.set(0)
        val t0 = System.nanoTime()
        val n = try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat
        Thread.sleep(150)
        (dt, jobs.get(), stages.get(), tasks.get(), n, serMs.get())
      }
      // a failed pass (rows = -1) must not win the min (ADVICE r17: a
      // fast-failing pass used to be reported as the best warm time)
      val ok = times.filter(_._5 >= 0)
      if (ok.isEmpty)
        println(f"[qprof] $q%-34s FAILED all $passes passes")
      else {
        val best = ok.minBy(_._1)
        println(f"[qprof] $q%-34s min=${best._1}%6.2fs jobs=${best._2}%3d " +
          f"stages=${best._3}%3d tasks=${best._4}%5d ser=${best._6}%5dms " +
          f"rows=${best._5}" +
          (if (ok.size < times.size)
            s" (${times.size - ok.size} failed passes excluded)" else ""))
      }
      if (plansDir != "NONE") {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val dir = java.nio.file.Paths.get(plansDir)
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(
            dir.resolve(s"${q}_$suffix.txt"), txt)
        } catch { case e: Throwable =>
          println(s"[qprof] $q explain failed: ${e.getMessage.take(200)}")
        }
      }
    }
    spark.stop()
  }
}
