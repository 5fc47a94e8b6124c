package graft.operators

import graft.SparkSpec

/** LabelPropagation + Bfs unit semantics on hand-checkable graphs. */
class GraphIterSpec extends SparkSpec {

  private def df(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  test("LabelPropagation: two cliques joined by one bridge edge " +
      "settle to two communities labelled by their min member") {
    // clique A = {0,1,2}, clique B = {10,11,12}, bridge 2-10
    val e = df((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val got = LabelPropagation.propagate(e, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within-clique majority beats the single bridge neighbour
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L, got)
    assert(got(10L) == got(11L) && got(11L) == got(12L), got)
    assert(got(10L) != got(0L), "bridge must not merge the cliques")
  }

  test("LabelPropagation: tie on neighbour frequency breaks to the " +
      "smallest label (deterministic)") {
    // node 5 sees one neighbour labelled 1 and one labelled 2 after
    // round 1 — the tie must go to 1, every run
    val e = df((1L, 5L), (2L, 5L))
    val got = LabelPropagation.propagate(e, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1L, got)
  }

  test("Bfs: exact hop counts on a path, unreached nodes absent") {
    // path 0-1-2-3-4-5-6, depth 3 → dists 0..3, nodes 4+ absent
    val e = df((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L))
    val got = Bfs.hops(e, 0L, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), got)
  }

  test("Bfs: shortest path wins over a longer alternative route") {
    // 0-1-2 and direct 0-2: dist(2) must be 1
    val e = df((0L, 1L), (1L, 2L), (0L, 2L))
    val got = Bfs.hops(e, 0L, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 1L, got)
  }
}
