package graft.queries

import graft.SparkSpec

/** Boundary pins for pipeline_ccnet_buckets' integer tercile
  * assignment (the sf-corpus path is oracle-checked; these are the
  * crafted corners): a tie group straddling the n/3 boundary buckets
  * WHOLESALE by its start rank — CCNet's ties-go-together semantics —
  * even when that empties a bucket, and languages bucket
  * independently.
  */
class CcnetBucketsSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String, String)])
      : Map[Long, String] = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccnet").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("pipeline_ccnet_buckets")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
  }

  test("tie group straddling n/3 buckets wholesale; per-lang " +
      "independence") {
    // Reference doc (id 0, id%5==0) trains: uni a=3 b=2 c=1 (v=3),
    // bigrams ab=2 ba=2 ac=1. Scored en docs get exact integer
    // scores: "b a" -> (2+1)e8 DIV (2+3) = 60000000,
    // "a b" -> (2+1)e8 DIV (3+3) = 50000000,
    // "c a" -> (0+1)e8 DIV (1+3) = 25000000.
    val en = Seq(
      0L -> "a b a b a c", // reference split
      1L -> "b a", 2L -> "b a", // start rank 0 -> head
      3L -> "a b", 4L -> "a b", 6L -> "a b", 7L -> "a b",
      // ^ tie group start rank 2 < t1=3 -> ALL head (crosses the
      //   boundary; middle ends up empty)
      8L -> "c a", 9L -> "c a", 11L -> "c a") // start 6 = t2 -> tail
    // fr: 3 docs with distinct scores -> one per bucket (t1=1, t2=2)
    val fr = Seq(12L -> "b a", 13L -> "a b", 14L -> "c a")
    val got = run(en.map { case (i, t) => (i, t, "en") } ++
      fr.map { case (i, t) => (i, t, "fr") })
    val want = Map(
      1L -> "head", 2L -> "head",
      3L -> "head", 4L -> "head", 6L -> "head", 7L -> "head",
      8L -> "tail", 9L -> "tail", 11L -> "tail",
      12L -> "head", 13L -> "middle", 14L -> "tail")
    assert(got == want, s"\ngot  $got\nwant $want")
  }
}
