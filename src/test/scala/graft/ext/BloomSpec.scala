package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomSpec extends SparkSpec {

  private val K = 7
  private val M = 1 << 14

  test("gate: exact dups always hit (no false negatives), definite-new pass") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val batch = Seq((100L, "alpha beta gamma"), // exact dup of 1
      (101L, "delta epsilon"),                  // exact dup of 2
      (102L, "totally novel content here"),
      (103L, "another unseen document")).toDF("doc_id", "text")
    val out = Bloom.gate(batch, corpus, "doc_id", lower(trim(col("text"))),
        K, M)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
      .toSeq.take(2) === Seq((100L, true, true), (101L, true, true)))
    // every exact dup must bloom-hit; novel docs may only FP, never FN
    out.foreach { r =>
      if (r.getBoolean(2)) assert(r.getBoolean(1),
        s"false negative for doc ${r.getLong(0)}") }
  }

  test("probe agrees with a driver-side replay of the position family") {
    val s = spark; import s.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc number $i content"))
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 3 =!= 0)
    val batch = docs.filter($"doc_id" % 3 === 0)
    val keyedC = Bloom.keyed(corpus, "doc_id", col("text"))
    val keyedB = Bloom.keyed(batch, "doc_id", col("text"))
    // replay: distinct corpus positions, then the all-k-present test
    val cpos = Bloom.positions(keyedC, K, M)
      .select("pos").distinct().as[Long].collect().toSet
    val expect = keyedB.select($"id", $"h1", $"h2").collect().map { r =>
      val (id, h1, h2) = (r.getLong(0), r.getLong(1), r.getLong(2))
      id -> (0 until K).forall(i => cpos((h1 + i.toLong * h2) % M))
    }.toMap
    val got = Bloom.gate(batch, corpus, "doc_id", col("text"), K, M)
      .select($"doc_id", $"bloom_hit").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === expect)
  }

  test("bitmap build is order/partitioning-independent") {
    val s = spark; import s.implicits._
    val docs = (0L until 500L).map(i => (i, s"content $i")).toDF("doc_id", "text")
    val keyedDocs = Bloom.keyed(docs, "doc_id", col("text"))
    val pos = Bloom.positions(keyedDocs, K, M)
    val a = Bloom.buildBitmap(pos.repartition(13), M)
    val b = Bloom.buildBitmap(pos.repartition(1), M)
    assert(java.util.Arrays.equals(a, b))
  }
}
