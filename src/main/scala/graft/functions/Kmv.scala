package graft.functions

import java.util.{TreeSet => JTreeSet}

/** KMV sketch core shared by the batch aggregate ([[KmvDistinct]])
  * and the streaming estimator (`StreamingOps.kmvDistinctStream`):
  * one definition of the hash, the k-cap, the estimator, and the
  * wire format, so batch and stream cannot drift. All operations are
  * pure functions of the input SET (md5 order statistics, no
  * randomness), which is what makes the streaming estimate
  * arrival-order independent.
  */
object Kmv {

  /** First 15 hex chars of md5 as a non-negative 60-bit long —
    * byte-identical to `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def hash60(md5: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    val d = md5.digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  /** Insert one hash, keeping only the k smallest. */
  def add(buf: JTreeSet[java.lang.Long], h: Long, k: Int): Unit = {
    buf.add(h)
    if (buf.size > k) { buf.pollLast(); () }
  }

  /** Union-truncate `other` into `buf`. */
  def merge(buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long], k: Int): Unit = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next().longValue(), k)
  }

  /** Bar-Yossef et al. 2002: DV ≈ (k-1)·2^60/h_(k); below k the
    * sketch IS the set. (k-1)·2^60 is dyadic (exact double), then one
    * IEEE divide + exact floor — bit-identical in any engine. */
  def estimate(buf: JTreeSet[java.lang.Long], k: Int): Long =
    if (buf.size < k) buf.size.toLong
    else {
      val hk = math.max(buf.last().longValue(), 1L)
      math.floor((k - 1).toDouble * 1152921504606846976.0 /
        hk.toDouble).toLong
    }

  def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}
