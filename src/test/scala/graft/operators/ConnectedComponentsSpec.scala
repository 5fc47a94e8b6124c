package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  test("labels chains, merges and isolates components; min id wins") {
    val s = spark
    import s.implicits._
    // 1-2-3-4 chain, 10-11 pair, 20-21 + 21-22 triangle-ish
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L),
      (21L, 20L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val got = ConnectedComponents.labels(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge set: converges to empty labels, does not trip the " +
      "overflow guard (null Σlabel means no-nodes only before round 0)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.labels(empty).collect().isEmpty)
  }

  test("long path converges within iteration budget") {
    val s = spark
    import s.implicits._
    val edges = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = ConnectedComponents.labels(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 30 && got.forall(_._2 == 1L))
  }
}
