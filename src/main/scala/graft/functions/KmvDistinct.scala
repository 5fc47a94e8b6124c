package graft.functions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a REAL custom
  * aggregate function — the `TypedImperativeAggregate` shape every
  * production sketch library (Datasketches HLL, Spark's own
  * percentile_approx) uses, with the three properties that make a
  * sketch 100 TB-grade:
  *
  *   - **map-side combinable**: partials build per partition and
  *     merge by union-truncate, so a corpus-sized scan reduces to
  *     k longs per group before the shuffle (the window/TopK spelling
  *     of KMV in `approx_jaccard_kmv` sorts per group instead);
  *   - **bounded state**: a k-capped ordered set, serialized as
  *     4 + 8k bytes regardless of input size;
  *   - **deterministic**: the hash is the first 15 hex chars of
  *     md5 (60 bits, non-negative), so the estimate is a pure
  *     function of the input SET and an oracle replays it exactly —
  *     no randomness, unlike sampled sketches.
  *
  * Estimator (Bar-Yossef et al. 2002): with h_(k) the k-th smallest
  * of the distinct 60-bit hash values, DV ≈ (k-1) · 2^60 / h_(k);
  * fewer than k distinct hashes means the set IS the answer. The
  * float work is one exact product (127·2^60 is dyadic) and one IEEE
  * divide + floor — bit-identical in any engine.
  *
  * SQL: `kmv_distinct(expr, k)` (k a foldable literal ≥ 2),
  * registered by `GraftExtensions`.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a string column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  override def update(buf: JTreeSet[java.lang.Long],
      input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null)
      Kmv.add(buf, Kmv.hash60(md5,
        v.asInstanceOf[UTF8String].getBytes), k)
    buf
  }

  override def merge(buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    Kmv.merge(buf, other, k)
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any =
    Kmv.estimate(buf, k)

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] =
    Kmv.serialize(buf)

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] =
    Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(off: Int): KmvDistinct =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvDistinct =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(
      newChild: Expression): KmvDistinct = copy(child = newChild)
}
