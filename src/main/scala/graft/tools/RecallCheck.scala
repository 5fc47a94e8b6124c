package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
      val exact = Similarity.topK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val pq = Similarity.pqTopK(emb, "vec_id", "embedding", q, 32, 64, 10)
        .collect().map(_.getLong(0)).toSet
      val pqr = Similarity.pqTopKRescored(emb, "vec_id", "embedding", q, 32, 64, 10, 80)
        .collect().map(_.getLong(0)).toSet
      println(s"RECALL $d: adc=${(exact & pq).size}/10 rescored=${(exact & pqr).size}/10")
    }
    spark.stop()
  }
}
