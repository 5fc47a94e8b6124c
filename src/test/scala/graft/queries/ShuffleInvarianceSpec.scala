package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Battery-wide physical-nondeterminism net: every oracle-checked
  * query must be a PURE FUNCTION of the data — invariant to shuffle
  * partition count and scan split size, both of which permute row
  * encounter order without touching semantics.
  *
  * This is the class of bug the sf1.0 oracle sweep caught in
  * `window_running` (a ROWS frame ordered by a non-unique key: the
  * running sums at a tie tracked physical row order, and sf0.1 was
  * green only because both engines happened to scan in the same
  * order). A query that passes its oracle once can still carry the
  * seam; flipping the partitioning here surfaces it in-repo instead
  * of in a driver red at a new scale factor.
  *
  * Runs at sf0.001 — the point is order perturbation, not volume.
  */
class ShuffleInvarianceSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def runAll(parts: String, maxPartitionBytes: String)
      : Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
    try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, d).collect().map(_.toString).sorted.toSeq
    }.toMap
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    }
  }

  test("every battery query returns identical rows under permuted " +
      "shuffle partitioning and scan splits") {
    // baseline: the test session's defaults (4 partitions, 128MB
    // splits = one scan task per file at sf0.001)
    val a = runAll("4", "134217728")
    // perturbed: prime partition count remaps every hash bucket and
    // reorders merges; 64KB splits shatter each parquet into many
    // scan tasks, permuting encounter order
    val b = runAll("13", "65536")
    val diverged = a.keys.filter(k => a(k) != b(k)).toSeq.sorted
    assert(diverged.isEmpty,
      s"physically order-dependent queries: ${diverged.mkString(", ")}")
  }
}
