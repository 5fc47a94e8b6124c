package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    for (q <- args) {
      val p = graft.SparkEntry.queries(q)(spark, d).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $q =====")
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
        l.contains("Aggregate")).mkString("\n"))
    }
    spark.stop()
  }
}
