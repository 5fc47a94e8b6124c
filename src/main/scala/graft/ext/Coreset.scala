package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985's farthest-point
  * traversal — the classic 2-approximation to the k-center optimum):
  * pick the point farthest (squared L2) from everything selected so
  * far, k times. The DIVERSITY selection next to the similarity
  * family's relevance ranking (`sim_mmr`) and the distribution
  * matching of `sample_dsir` — the standard seed for coresets,
  * facility location, and embedding-space coverage sampling.
  *
  * Determinism / oracle replay: distances are squared L2 via the
  * three-dot identity d² = ⟨x,x⟩ + ⟨c,c⟩ − 2⟨x,c⟩, each dot the
  * codegen'd left-fold `DotDouble` (bit-identical to DuckDB's
  * `list_sum(list_transform(...))` — the proven `sim_*` seam), the
  * three doubles combined in one fixed parse tree spelled the same
  * on both engines. The argmax tie-break (d² desc, id asc) is a
  * unique total order, already-selected ids are explicitly excluded
  * (duplicate points at distance 0 can never force a re-pick), and
  * the reported distance is 6dp-rounded at the end
  * (docs/HASH_NUMERICS.md form 4).
  *
  * Scale shape: k linear scans — the running min-distance column is
  * updated against ONLY the newest center each round (never
  * recomputed against all selected), checkpointed per round so
  * lineage stays O(1). Each round's argmax is a 1-row
  * TakeOrdered-style collect: the selected set is a bounded driver
  * artifact exactly like IVF's Lloyd centroids. Greedy k-center is
  * inherently k sequential passes; at corpus scale run it on a
  * sampled pool (standard practice), or raise k only with the scan
  * budget in mind.
  */
object Coreset {

  /** @param vecs (idCol, vecCol: array<float>) — ids unique
    * @return (sel_rank 1..k, id, d2) — d2 the 6dp-rounded squared L2
    *         from the already-selected set at the moment of
    *         selection (0.0 for the seed, which is the smallest id)
    */
  def kCenter(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"kcenter: k=$k")
    val spark = vecs.sparkSession
    import spark.implicits._
    def dot(a: Column, b: Column) = Similarity.dot(vecs, a, b)
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("xx", dot(col("v"), col("v")))
      .localCheckpoint(false)
    val seed = base.orderBy("id").select(col("id"), col("v")).head()
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val picked = scala.collection.mutable.ArrayBuffer(
      (1L, seed.getLong(0), 0.0))
    var centerVec: Seq[Float] = seed.getSeq[Float](1)
    var md: DataFrame = null
    for (r <- 2L to k.toLong) {
      // ⟨c,c⟩ as the same strict left fold DotDouble runs
      var yy = 0.0
      centerVec.foreach(f => yy += f.toDouble * f.toDouble)
      val cLit = array(centerVec.map(f => lit(f.toDouble)): _*)
      val d2 = (col("xx") + lit(yy)) - (lit(2.0) * dot(col("v"), cLit))
      md = (if (md == null) base.withColumn("md", d2)
            else md.withColumn("md", least(col("md"), d2)))
        .localCheckpoint(false)
      val pick = md
        .filter(!col("id").isin(picked.map(_._2).toSeq: _*))
        .orderBy(col("md").desc, col("id"))
        .limit(1).select(col("id"), col("v"), col("md")).head()
      picked += ((r, pick.getLong(0), round6(pick.getDouble(2))))
      centerVec = pick.getSeq[Float](1)
    }
    picked.toSeq.toDF("sel_rank", "id", "d2")
  }
}
