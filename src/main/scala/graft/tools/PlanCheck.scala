package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-only audit: either dump a query's Window nodes (2 args) or
  * sweep EVERY battery query for WindowExec nodes with an empty
  * partitionSpec — the single-task global window this repo bans on
  * data-sized inputs (bounded 32-row shard/bucket tables carry a
  * pmod(col,1) key so they never trip this audit OR the runtime
  * warning).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var bad = 0
    for (q <- names) {
      try {
        val plan = graft.SparkEntry.queries(q)(spark, d)
          .queryExecution.executedPlan
        val empties = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (empties.nonEmpty) {
          bad += 1
          println(s"[plancheck] $q: ${empties.size} unpartitioned window(s)")
        }
      } catch { case e: Throwable =>
        println(s"[plancheck] $q: PLAN ERROR ${e.getClass.getSimpleName}")
        bad += 1
      }
    }
    println(s"[plancheck] done: $bad flagged of ${names.size}")
    spark.stop()
  }
}
