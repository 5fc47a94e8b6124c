package graft.queries

import graft.SparkSpec

/** Crafted pins for dedup_semantic's keep rule (the sf corpus path is
  * oracle-checked): within a cluster, the member with the LOWEST
  * similarity-to-centroid survives a near-dup pair — SemDeDup's
  * diversity-keeping priority — and singleton-cluster members are
  * always kept.
  */
class SemanticDedupSpec extends SparkSpec {

  test("near-dup pair drops the more centroid-like member; " +
      "singleton cluster keeps") {
    val s = spark
    import s.implicits._
    // ids 0..15 are the coarse centroids (the first-16 quantizer):
    // cell 0 along +x, cell 1 along +y, cells 2..15 tiny decoys that
    // cannot win an argmax-dot assignment for the +x/+y test docs
    val decoys = (2 to 15).map(i =>
      (i.toLong, Seq(-0.01f, -0.001f * i)))
    val rows = Seq(
      (0L, Seq(10f, 0f)), (1L, Seq(0f, 10f))) ++ decoys ++ Seq(
      // near-dup pair in cell 0: 16 hugs the centroid direction,
      // 17 sits a bit off it (lower centroid-sim -> earlier priority)
      (16L, Seq(100f, 1f)),
      (17L, Seq(100f, 5f)),
      // alone in cell 1
      (18L, Seq(1f, 120f)))
    val dir = java.nio.file.Files.createTempDirectory("semdedup")
      .toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = graft.SparkEntry.queries("dedup_semantic")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Boolean]("kept")))).toMap
    assert(got(16L)._1 == 0 && got(17L)._1 == 0,
      s"pair must share cell 0: $got")
    assert(got(18L)._1 == 1 && got(18L)._2,
      "singleton cluster member is kept")
    assert(got(17L)._2 && !got(16L)._2,
      "the farther-from-centroid member of the pair survives; the " +
        s"centroid-hugger is the duplicate dropped: $got")
  }
}
