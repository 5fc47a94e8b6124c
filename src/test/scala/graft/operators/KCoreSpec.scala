package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  /** Symmetric closure, self-loop-free, distinct — the contract
    * KCore.core expects from its caller.
    */
  private def sym(pairs: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    val e0 = pairs.toDF("src", "dst")
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
  }

  test("hand-checked peel: triangle with a tail — the tail peels one " +
      "layer per round, the triangle is the 2-core") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val got = KCore.core(g, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1's raw-degree filter drops 5; round 2 recomputes inside
    // {1,2,3,4} and the final >= k filter drops 4 (deg 1); round 3
    // confirms the triangle fixpoint at degree 2 each
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got.toString)
    // a single round sees only raw degrees: 4 (deg 2) still shows
    val early = KCore.core(g, k = 2, rounds = 1)
      .select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(early == Set(1L, 2L, 3L, 4L), early.toString)
  }

  test("pre-fixpoint deg is recomputed INSIDE the survivor set — " +
      "never counts a just-dropped neighbor (ADVICE r11)") {
    // chain 1-2-3-4-5, k=2, 1 round: raw degrees keep {2,3,4}; the
    // returned deg must be survivor-internal (1, 2, 1), not the raw
    // pre-peel (2, 2, 2) the old code reported
    val chain = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val got = KCore.core(chain, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L, 3L -> 2L, 4L -> 1L), got.toString)
    // a survivor isolated by the peel reports deg 0 (membership is
    // still defined by exactly `rounds` peels)
    val star = sym(Seq((10L, 1L), (10L, 2L)))
    val iso = KCore.core(star, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iso == Map(10L -> 0L), iso.toString)
  }

  test("k above the max degree empties the graph; k=1 keeps every " +
      "non-isolated vertex with its full degree") {
    val g = sym(Seq((1L, 2L), (2L, 3L)))
    assert(KCore.core(g, k = 3, rounds = 4).count() == 0)
    val all = KCore.core(g, k = 1, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), all.toString)
  }

  test("the battery's generator graph converges inside the 8-round " +
      "budget (round 8 == round 9), so fixed-round output is the " +
      "true 3-core") {
    val s = spark
    import s.implicits._
    val n = 2000L
    val docs = (0L until n).toDF("doc_id")
    val e0 = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 2 + 1) % n).as("dst"))
      .union(docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 3 + 7) % n).as("dst")))
    val g = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    val r8 = KCore.core(g, k = 3, rounds = 8)
    val r9 = KCore.core(g, k = 3, rounds = 9)
    assert(r8.exceptAll(r9).count() == 0 &&
      r9.exceptAll(r8).count() == 0, "8 rounds must be a fixpoint")
    assert(r8.count() > 0, "the 3-core must be non-empty")
  }
}
