package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class TickEvent(user_id: Long, ts: Long, value: Double)

/** asofEnrichStream — the streaming leg of join_asof: versioned-dim
  * enrichment via the precomputed-interval broadcast join. */
class StreamingAsOfSpec extends SparkSpec {

  test("stream rows pick the latest dim version <= their ts; rows " +
      "before the first version survive with null payload; " +
      "stream-equals-batch vs AsOfJoin.lastEarlier") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // user 1: versions at 10 (bronze), 50 (silver), 90 (gold)
    // user 2: single version at 100; user 3: no versions at all
    val dim = Seq((1L, 10L, "bronze"), (1L, 50L, "silver"),
      (1L, 90L, "gold"), (2L, 100L, "solo")).toDF(
      "user_id", "ver_ts", "tier")
    val events = Seq(
      TickEvent(1L, 5L, 1.0),   // before first version -> null
      TickEvent(1L, 10L, 2.0),  // boundary: inclusive -> bronze
      TickEvent(1L, 60L, 3.0),  // -> silver
      TickEvent(1L, 400L, 4.0), // open-ended last -> gold
      TickEvent(2L, 99L, 5.0),  // before solo -> null
      TickEvent(2L, 101L, 6.0), // -> solo
      TickEvent(3L, 50L, 7.0))  // keyless -> null

    val in = MemoryStream[TickEvent]
    val q = StreamingOps.asofEnrichStream(in.toDF(), dim,
        "user_id", "ts", "ver_ts", Seq("tier"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    in.addData(events.take(3): _*)
    q.processAllAvailable()
    in.addData(events.drop(3): _*) // second micro-batch: stateless op
    q.processAllAvailable()
    val got = s.sql("SELECT user_id, ts, tier FROM asof_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    q.stop()

    assert(got == Set(
      (1L, 5L, None), (1L, 10L, Some("bronze")),
      (1L, 60L, Some("silver")), (1L, 400L, Some("gold")),
      (2L, 99L, None), (2L, 101L, Some("solo")),
      (3L, 50L, None)))

    // batch oracle: the composed as-of on identical inputs
    val batch = graft.operators.AsOfJoin.lastEarlier(
        events.toDF("user_id", "ts", "value"),
        dim.withColumnRenamed("ver_ts", "vts"),
        "user_id", "ts", "vts", Seq("tier"))
      .select(col("user_id"), col("ts"),
        col("asof.tier").as("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(batch == got, s"stream/batch divergence: $batch vs $got")
  }
}
