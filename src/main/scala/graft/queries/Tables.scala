package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table readers (TESTDATA.md). One parquet per table; reads
  * are columnar and filter/projection pushdown applies — `.explain`
  * should show PushedFilters + a pruned ReadSchema on every query.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  /** events.parquet's `ts` physical type varies across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader only
    * accepts as a raw long) or TIMESTAMP(MICROS) (read natively).
    * Adapt on the observed schema: longs are nanos → truncate to
    * micros (Spark timestamp precision); native timestamps pass
    * through. DuckDB reads either natively — both engines agree at
    * any granularity ≥ 1µs.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      // native micros arrive as TIMESTAMP_NTZ; cast to session-tz
      // timestamp (session tz is pinned UTC, so the wall-clock value
      // is unchanged) so unix_micros & friends resolve
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
