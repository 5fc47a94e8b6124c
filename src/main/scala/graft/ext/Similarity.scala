package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Arithmetic policy: cast each element to DOUBLE before multiplying,
  * then left-fold the sum — both Spark's `aggregate` HOF and DuckDB's
  * `list_sum(list_transform(...))` evaluate in list order, so scores
  * are bit-identical cross-engine (oracle-checkable).
  *
  * Scale paths:
  *   - brute-force top-k: one scan, per-row score, ORDER BY LIMIT k —
  *     Spark's TakeOrdered keeps only k rows per partition; fine for a
  *     single query vector even on huge tables.
  *   - LSH ANN: sign-bit bucketing against fixed hyperplanes prunes
  *     the scan to matching buckets; the bucket id is computed
  *     map-side and can back a partition/bucket layout at rest, so a
  *     query touches a handful of partitions instead of 100 TB.
  */
object Similarity {

  /** Element-wise double view of a float vector. */
  def vecD(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k against one query vector. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(x => lit(x.toDouble)): _*)
    df.select(col(idCol),
        cosine(vecD(col(vecCol)), q).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Sign-bit LSH bucket id: bit j = [dot(v, plane_j) > 0]. Planes are
    * caller-supplied fixed vectors (deterministic — e.g. the first
    * `nPlanes` corpus vectors), broadcast as literals.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val pl = array(p.map(x => lit(x.toDouble)): _*)
      when(dot(vec, pl) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: restrict the scan to vectors whose LSH bucket is
    * within `probeHamming` bits of the query's bucket (multi-probe),
    * then exact cosine. Approximate — recall measured in tests against
    * `topK`.
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], planes: Seq[Seq[Float]], k: Int,
      probeHamming: Int = 1): DataFrame = {
    val qd = array(query.map(x => lit(x.toDouble)): _*)
    val qBucket = lshBucket(qd, planes)
    df.select(col(idCol), vecD(col(vecCol)).as("v"),
        lshBucket(vecD(col(vecCol)), planes).as("bucket"))
      .filter(Dedup.hamming64(col("bucket"), qBucket) <= probeHamming)
      .select(col(idCol), cosine(col("v"), qd).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** All pairs with cosine ≥ threshold. Brute force O(n²) — correct
    * baseline and the oracle target; the LSH path above is the scale
    * variant. Keep for small/verification inputs.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), vecD(col(vecCol)).as("va"))
    val b = df.select(col(idCol).as("id_b"), vecD(col(vecCol)).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
