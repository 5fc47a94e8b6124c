package graft.ext

import graft.SparkSpec

/** BpeTrain must reproduce the classic hand-derivable merge sequences:
  * the Sennrich et al. example corpus, and an equal-symbol run where a
  * wrong overlap rule (merging both positions of "a a a a") would show
  * up directly in the learned counts.
  */
class BpeTrainSpec extends SparkSpec {
  private lazy val implicits = spark.implicits
  import implicits._

  private def corpus(wordFreq: (String, Int)*) =
    wordFreq.flatMap { case (w, n) => Seq.fill(n)(w) }
      .mkString(" ").split(" ").grouped(8).map(_.mkString(" ")).toSeq
      .toDF("text")

  test("classic low/lower/newest/widest corpus learns the textbook " +
      "merge sequence with exact counts") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3)
    val got = BpeTrain.train(docs, "text", 10, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      // (e,s) and (s,t</w>) tie at 9 — lexicographic tie-break picks e
      (1L, "e", "s", 9L),
      (2L, "es", "t</w>", 9L),
      (3L, "l", "o", 7L),
      // (n,e), (e,w), (w,est</w>) tie at 6 — lexicographic pick (e,w)
      (4L, "e", "w", 6L),
      // (ew,est</w>) vs (n,ew) tie at 6 — "ew" < "n"
      (5L, "ew", "est</w>", 6L)))
  }

  test("equal-symbol runs merge greedily left-to-right, never " +
      "overlapping") {
    // "aaaa" = a a a a</w>: the (a,a) candidates at pos 1 and 2
    // overlap; greedy BPE merges only pos 1 → "aa a a</w>". A rule
    // that merged both would corrupt the round-2 pair inventory.
    val docs = corpus("aaaa" -> 3)
    val got = BpeTrain.train(docs, "text", 10, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "a", "a", 6L),
      (2L, "a", "a</w>", 3L),
      (3L, "aa", "aa</w>", 3L)))
    // the loop stops once every word is a single symbol (3 < nMerges)
  }

  test("segment returns the learned segmentation of each vocab word") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3)
    val seg = BpeTrain.segment(docs, "text", 10, 5).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (w, rows) => w -> rows.sortBy(_._2).map(_._3).toSeq }
    // after merges es, est</w>, lo, ew, ewest</w>:
    assert(seg("low") == Seq("lo", "w</w>"))
    assert(seg("lower") == Seq("lo", "w", "e", "r</w>"))
    assert(seg("newest") == Seq("n", "ewest</w>"))
    assert(seg("widest") == Seq("w", "i", "d", "est</w>"))
  }

  test("encode replays merges over the FULL vocabulary; OOV words " +
      "get partial merges, never an error") {
    // train sees only the top-2 words (newest x6, widest x3); "lowest"
    // never enters training but shares the e-s-t</w> suffix, so the
    // learned merges (e,s) and (es,t</w>) still compress it
    val docs = corpus("newest" -> 6, "widest" -> 3, "lowest" -> 1)
    val seg = BpeTrain.encode(docs, "text", 2, 3).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (w, rows) => w -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(seg.keySet == Set("newest", "widest", "lowest"),
      "every distinct word must be segmented, in or out of vocab")
    assert(seg("lowest").contains("est</w>"),
      s"OOV word should still benefit from learned merges: " +
        seg("lowest").mkString("|"))
  }

  test("training is deterministic across runs") {
    val docs = corpus("banana" -> 4, "bandana" -> 2, "cabana" -> 3)
    val a = BpeTrain.train(docs, "text", 10, 8).collect().toSeq
    val b = BpeTrain.train(docs, "text", 10, 8).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("map-side encode equals the relational replay " +
      "symbol-for-symbol, including greedy equal-symbol runs") {
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getString(3)))
      .groupBy(_._1)
      .map { case (w, rs) =>
        (w, rs.head._2) -> rs.sortBy(_._3).map(_._4).toSeq
      }
    // aaaa/aaab force repeated (a,a) merges where the even-offset
    // rule and the sequential greedy must agree; banana-family words
    // exercise overlapping learned merges; OOV comes via topWords=3
    val docs = corpus("banana" -> 5, "bandana" -> 3, "aaaa" -> 4,
      "aaab" -> 2, "cabana" -> 2, "abracadabra" -> 1)
    val fast = asMap(BpeTrain.encode(docs, "text", 3, 8).collect())
    val slow = asMap(
      BpeTrain.encodeRelational(docs, "text", 3, 8).collect())
    assert(fast == slow, s"\nfast $fast\nslow $slow")
    assert(fast.nonEmpty &&
      fast.keys.map(_._1).toSet.contains("abracadabra"))
  }
}
