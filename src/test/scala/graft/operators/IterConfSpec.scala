package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r17 loop-execution optimization: iterative operators run
  * their fixed-shape loops under IterConf (AQE off, state-derived
  * partition count) and return MATERIALIZED results — and the
  * documented opt-out (spark.graft.loop.aqe=true) produces identical
  * rows via the pre-r17 lazy path. Also pins conf restoration: the
  * scope must never leak AQE-off or a shrunken partition count into
  * the session.
  */
class IterConfSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (7L, 8L), (10L, 10L), (4L, 5L), (5L, 6L),
    (6L, 4L), (20L, 21L)).toDF("id_a", "id_b")

  test("session confs are restored after the loop scope") {
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    IterConf.withLoopConf(spark, 5L) {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "1")
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqe0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parts0)
  }

  test("loop partition count derives from state rows (2M rows per " +
      "partition), capped by the session ceiling") {
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    IterConf.withLoopConf(spark, 7_000_000L) {
      val expect = math.min(parts0.toLong, 4L)
      assert(spark.conf.get("spark.sql.shuffle.partitions")
        == expect.toString)
    }
  }

  test("CC labels identical under the materialized loop and the " +
      "loop.aqe=true lazy opt-out (incl. the fused one-hop seed)") {
    val fast = ConnectedComponents.labels(edges).collect().toSet
    spark.conf.set("spark.graft.loop.aqe", "true")
    val slow =
      try ConnectedComponents.labels(edges).collect().toSet
      finally spark.conf.unset("spark.graft.loop.aqe")
    assert(fast == slow)
    // ground truth: label = min id of the component
    val want = Set((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L),
      (10L, 10L), (4L, 4L), (5L, 4L), (6L, 4L), (20L, 20L), (21L, 20L))
    assert(fast.map(r => (r.getLong(0), r.getLong(1))) == want)
  }

  test("PageRank ranks identical under both paths and served " +
      "materialized (cached-RDD scan, no re-execution)") {
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val fast = PageRank.ranks(e, 6, 0.85)
    // materialized: the served plan is a scan of checkpointed blocks
    assert(fast.queryExecution.optimizedPlan.collectLeaves().forall(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    val fastRows = fast.collect().map(r =>
      (r.getLong(0), math.round(r.getDouble(1) * 1e12))).toSet
    spark.conf.set("spark.graft.loop.aqe", "true")
    val slowRows =
      try PageRank.ranks(e, 6, 0.85).collect().map(r =>
        (r.getLong(0), math.round(r.getDouble(1) * 1e12))).toSet
      finally spark.conf.unset("spark.graft.loop.aqe")
    assert(fastRows == slowRows)
  }
}
