package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Impression(imp_id: Long, ts: Timestamp, user_id: Long)
case class Click(click_id: Long, ts: Timestamp, user_id: Long)
case class SessEvent(event_id: Long, ts: Timestamp, user_id: Long,
    value: Double)

class StreamingJoinSpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("stream-stream interval join attributes clicks to impressions") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamingOps.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id",
      watermark = "10 minutes", maxLag = "5 minutes")
      .select(col("imp_id"), col("click_id"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    imps.addData(Impression(1, t(0), 100), Impression(2, t(0), 200))
    clicks.addData(
      Click(10, t(2), 100),  // within 5 min of imp 1 -> match
      Click(11, t(8), 200),  // 8 min after imp 2 -> outside window
      Click(12, t(1), 999))  // unknown user -> no match
    q.processAllAvailable()
    val got = s.sql("SELECT imp_id, click_id FROM attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 10L)))
  }

  test("left-outer interval join emits unmatched impressions with " +
      "null clicks after the watermark closes their window") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamingOps.intervalJoin(
      imps.toDF(), clicks.toDF(), "user_id",
      watermark = "10 minutes", maxLag = "5 minutes",
      joinType = "leftOuter")
      .select(col("imp_id"), col("click_id"))
    val q = joined.writeStream.format("memory").queryName("attrib_lo")
      .outputMode("append").start()
    imps.addData(Impression(1, t(0), 100), Impression(2, t(0), 200))
    clicks.addData(Click(10, t(2), 100)) // only user 100 clicks
    q.processAllAvailable()
    // advance both watermarks far past imp 2's join window so the
    // unmatched row is emitted with a null click
    imps.addData(Impression(3, t(60), 300))
    clicks.addData(Click(11, t(60), 300))
    q.processAllAvailable()
    val got = s.sql("SELECT imp_id, click_id FROM attrib_lo").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    q.stop()
    assert(got.contains((1L, Some(10L)))) // matched pair
    assert(got.contains((2L, None)),      // unmatched -> null click row
      s"got $got")
  }

  test("session windows split activity on the gap, merge within it") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[SessEvent]
    val q = StreamingOps.sessionCounts(in.toDF(), gap = "30 minutes",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    in.addData(
      SessEvent(1, t(0), 7L, 1.0),   // user 7, session A
      SessEvent(2, t(10), 7L, 2.0),  // 10 min later -> same session
      SessEvent(3, t(60), 7L, 4.0),  // 50 min gap -> new session
      SessEvent(4, t(5), 8L, 8.0))   // other user
    q.processAllAvailable()
    val got = s.sql(
      "SELECT user_id, n_events, sum_value FROM sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(got == Set((7L, 2L, 3.0), (7L, 1L, 4.0), (8L, 1L, 8.0)))
  }

  test("stream enriched by a static broadcast dimension") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[Impression]
    val dim = Seq((100L, "paid"), (200L, "organic")).toDF("user_id", "tier")
    val q = StreamingOps.enrichStream(in.toDF(), dim, "user_id")
      .select(col("imp_id"), col("tier"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData(Impression(1, t(0), 100), Impression(2, t(1), 200),
      Impression(3, t(2), 300))
    q.processAllAvailable()
    val got = s.sql("SELECT imp_id, tier FROM enriched").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    q.stop()
    assert(got == Set((1L, "paid"), (2L, "organic"))) // 300 drops (inner)
  }

  test("ingest dedup: stream-static anti join drops docs whose " +
      "fingerprint already exists in the corpus") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // the static corpus side: fingerprints of already-ingested docs —
    // the batch Dedup.tokens/normalized machinery reused verbatim
    val corpus = Seq("the quick brown fox", "known document")
      .toDF("text")
      .select(graft.ext.TextAnalysis.fingerprint(col("text")).as("fp"))
    val in = MemoryStream[String]
    val incoming = in.toDF().toDF("text")
      .withColumn("fp", graft.ext.TextAnalysis.fingerprint(col("text")))
    val q = incoming.join(corpus, Seq("fp"), "left_anti")
      .writeStream.format("memory").queryName("ingest_dedup")
      .outputMode("append").start()
    in.addData("THE  quick   Brown fox", // dup after normalization
      "a genuinely new document",
      "known document")                  // exact dup
    q.processAllAvailable(); q.stop()
    val got = s.sql("SELECT text FROM ingest_dedup").collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("a genuinely new document"))
  }
}
