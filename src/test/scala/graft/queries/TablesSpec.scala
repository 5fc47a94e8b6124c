package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins `Tables.events`' dual-encoding contract. The driver's testdata
  * has shipped `events.ts` BOTH ways across generations — as
  * TIMESTAMP(NANOS) (which Spark's parquet reader only surfaces as a
  * raw long) and as native TIMESTAMP(MICROS) — and the unconditional
  * nanos arithmetic took down all 23 events-touching queries when the
  * encoding flipped. Both paths must yield the same timestamps.
  */
class TablesSpec extends SparkSpec {

  private val micros = Seq(0L, 1755043200000000L, 1755043200123456L)

  test("events: long nanos column truncates to micros") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evnanos").toString
    // nanos-as-long with sub-micro noise that must truncate away
    micros.map(us => (1L, us * 1000 + 999))
      .toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = Tables.events(s, dir)
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(got.select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0)).sorted.toSeq == micros.sorted)
  }

  test("events: native NTZ timestamp column passes through " +
      "value-identical (session tz pinned UTC)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evmicros").toString
    // TIMESTAMP_NTZ parquet (isAdjustedToUTC=false) — exactly how the
    // driver's pandas-written testdata encodes ts
    micros.toDF("us")
      .select(lit(1L).as("event_id"),
        expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(s, dir)
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(got.select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0)).sorted.toSeq == micros.sorted)
  }
}
