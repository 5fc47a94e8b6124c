package graft.ext

import graft.SparkSpec

class RakeSpec extends SparkSpec {

  private def run(text: String, k: Int = 10) = {
    val s = spark
    import s.implicits._
    Rake.topPhrases(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
      .toSeq
  }

  test("hand-checked RAKE scores: phrases split at stopwords, word " +
      "score = deg*1e6 DIV freq, phrase sums member scores") {
    // phrases: [fast spark join], [fast scan], [spark]
    // freq: fast=2 spark=2 join=1 scan=1
    // deg:  fast=3+2=5 spark=3+1=4 join=3 scan=2
    // wscore(micro): fast=2500000 spark=2000000 join=3000000 scan=2000000
    // phrase scores: "fast spark join"=7500000, "fast scan"=4500000,
    //                "spark"=2000000
    val got = run("fast spark join the fast scan of spark")
    assert(got == Seq(
      (1L, "fast spark join", 7500000L, 1L),
      (2L, "fast scan", 4500000L, 1L),
      (3L, "spark", 2000000L, 1L)), got.mkString(";"))
  }

  test("repeated identical phrase collapses to one row with n_occ, " +
      "degree counts both instances") {
    // phrases: [big join], [big join] -> freq big=2 join=2,
    // deg big=4 join=4, wscore 2000000 each, phrase score 4000000
    val got = run("big join the big join")
    assert(got == Seq((1L, "big join", 4000000L, 2L)), got.mkString(";"))
  }

  test("score ties break on phrase text ascending") {
    // [alpha beta] and [gamma delta]: all words freq 1, deg 2 ->
    // wscore 2000000 each, both phrases score 4000000; alpha < gamma
    val got = run("alpha beta the gamma delta")
    assert(got.map(g => (g._1, g._2)) ==
      Seq((1L, "alpha beta"), (2L, "gamma delta")), got.mkString(";"))
  }

  test("all-stopword document yields no phrases") {
    assert(run("the a of and").isEmpty)
  }
}
