package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class LinkPredictSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    pairs.toDF("id_a", "id_b")
  }

  test("4-cycle: the two diagonals are predicted with cn=2, ranked " +
      "by (cn desc, u, v)") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val got = LinkPredict.commonNeighbors(g, maxDeg = 10,
        minCommon = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 2L), (2L, 4L, 2L)), got.mkString(";"))
  }

  test("already-adjacent pairs are never predicted (triangle yields " +
      "nothing)") {
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L))
    assert(LinkPredict.commonNeighbors(g, 10, 1, 10).count() == 0)
  }

  test("hub exclusion: a center above maxDeg contributes no wedges") {
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
    // center 0 has degree 5 — with maxDeg=4 the only wedge center is
    // excluded, so no predictions at all
    assert(LinkPredict.commonNeighbors(star, 4, 1, 10).count() == 0)
    // raising the cap readmits it: all C(5,2)=10 leaf pairs at cn=1
    assert(LinkPredict.commonNeighbors(star, 5, 1, 100).count() == 10)
  }
}
