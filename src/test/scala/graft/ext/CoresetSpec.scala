package graft.ext

import graft.SparkSpec

class CoresetSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("hand-checked farthest-point traversal: seed is the smallest " +
      "id, then argmax of the running min-d2 with (d2 desc, id) " +
      "tie-break") {
    val df = vecs(
      1L -> Seq(0f, 0f), 2L -> Seq(10f, 0f),
      3L -> Seq(0f, 1f), 4L -> Seq(6f, 0f))
    val got = Coreset.kCenter(df, "vec_id", "embedding", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // seed 1 at (0,0); round 2 picks 2 (d2=100); round 3 picks 4
    // (min(36, 16) = 16 beats 3's min(1, 101) = 1); round 4 picks 3
    assert(got.toSeq == Seq((1L, 1L, 0.0), (2L, 2L, 100.0),
      (3L, 4L, 16.0), (4L, 3L, 1.0)), got.mkString(";"))
  }

  test("duplicate points cannot force a re-pick: explicit exclusion " +
      "selects the zero-distance duplicate last instead of looping") {
    val df = vecs(1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f),
      3L -> Seq(5f, 0f))
    val got = Coreset.kCenter(df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 0.0), (2L, 3L, 25.0),
      (3L, 2L, 0.0)), got.mkString(";"))
  }

  test("assignReport: k=2 on the hand fixture — 1,3 cover to the " +
      "seed (radius 1e6 micro), 2,4 to the far center (16e6 micro)") {
    val df = vecs(
      1L -> Seq(0f, 0f), 2L -> Seq(10f, 0f),
      3L -> Seq(0f, 1f), 4L -> Seq(6f, 0f))
    val got = Coreset.assignReport(df, "vec_id", "embedding", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 2L, 1000000L), (2L, 2L, 2L, 16000000L)),
      got.mkString(";"))
  }

  test("assignReport: k=n — every point is its own center with " +
      "radius 0 (self-distance exactly 0.0, ties keep earliest rank)") {
    val df = vecs(
      1L -> Seq(0f, 0f), 2L -> Seq(10f, 0f),
      3L -> Seq(0f, 1f), 4L -> Seq(6f, 0f))
    val got = Coreset.assignReport(df, "vec_id", "embedding", 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 0L), (2L, 1L, 0L),
      (3L, 1L, 0L), (4L, 1L, 0L)), got.mkString(";"))
  }

  test("k=1 returns just the seed") {
    val df = vecs(7L -> Seq(1f, 2f), 9L -> Seq(3f, 4f))
    val got = Coreset.kCenter(df, "vec_id", "embedding", 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 7L)
  }
}
