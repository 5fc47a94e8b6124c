package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** Algebraic invariants the oracle's row-hash can't state directly —
  * conservation laws that must hold at ANY scale. */
class InvariantSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("sample_pps: multiplicities sum to exactly k=100 and no doc " +
      "draws more than its weight share allows") {
    val out = SparkEntry.queries("sample_pps")(spark, d)
    val total = out.agg(sum("mult")).head.getLong(0)
    assert(total == 100L, s"sum of multiplicities = $total")
    assert(out.filter(col("mult") <= 0).count() == 0)
  }

  test("events_attribution: every purchase's credits sum to exactly " +
      "1000 milli") {
    val out = SparkEntry.queries("events_attribution")(spark, d)
    val bad = out.groupBy("p_id").agg(sum("credit_milli").as("s"))
      .filter(col("s") =!= 1000L).count()
    assert(bad == 0, s"$bad purchases with credits != 1000")
  }

  test("anon_coarsen: no row dropped and every released non-suppressed" +
      " QI group has size >= k=12") {
    val out = SparkEntry.queries("anon_coarsen")(spark, d)
    val n = graft.queries.Tables.customer(spark, d).count()
    assert(out.count() == n, "anonymization must keep the population")
    val small = out.filter(col("qi_geo") =!= "*")
      .groupBy("qi_geo", "qi_seg").agg(count(lit(1)).as("g"))
      .filter(col("g") < 12).count()
    assert(small == 0, s"$small released groups below k")
  }

  test("pipeline_split_leakfree: no mined near-dup pair spans " +
      "splits; population conserved; the naive per-doc split WOULD " +
      "have leaked (n_moved > 0)") {
    val out = SparkEntry.queries("pipeline_split_leakfree")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val nDocs = Tables.documents(spark, d).count()
    assert(out.values.map(_._1).sum == nDocs,
      "every document lands in exactly one split")
    assert(out.values.map(_._3).sum > 0,
      "the op must move SOME docs relative to the naive per-doc " +
        "hash — otherwise it proves nothing on this corpus")
    // leak-freedom against the PAIRS (the contamination mechanism):
    // both sides of every mined near-dup pair get the same split.
    // Per-doc splits re-derived with the query's own deterministic
    // pieces (CC labels + md5 bucket of the group id).
    val groups = graft.operators.ConnectedComponents.labels(
      graft.ext.Dedup.minhashPairs(Tables.documents(spark, d),
        "doc_id", "text", 32, 8, 0.6).select("id_a", "id_b"))
    val b = graft.ext.Sampling.hashBucket(col("label"), "split", 16)
    val split = groups.select(col("id"),
      when(b === 15, "test").when(b === 14, "val")
        .otherwise("train").as("split"))
    val spanning = graft.ext.Dedup.minhashPairs(
        Tables.documents(spark, d), "doc_id", "text", 32, 8, 0.6)
      .join(split.select(col("id").as("id_a"),
        col("split").as("sa")), "id_a")
      .join(split.select(col("id").as("id_b"),
        col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(spanning == 0, s"$spanning near-dup pairs span splits")
  }

  test("join_skew_salted: row-identical to the plain join") {
    val salted = SparkEntry.queries("join_skew_salted")(spark, d)
    val li = Tables.lineitem(spark, d).select(
      col("l_suppkey").as("suppkey"), col("l_orderkey"),
      col("l_linenumber"))
    val plain = li.join(Tables.supplier(spark, d)
      .select(col("s_suppkey").as("suppkey"), col("s_name")), "suppkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }

  test("approx_jaccard_kmv: sketch size <= k, both-count <= sketch, " +
      "estimate in [0, 10000] bp, every lang pair present once") {
    val out = SparkEntry.queries("approx_jaccard_kmv")(spark, d)
      .collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length, "duplicate pair")
    assert(pairs.forall { case (a, b) => a < b }, "unordered pair")
    out.foreach { r =>
      val (n, both, bp) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 1 && n <= 64, s"sketch size $n")
      assert(both >= 0 && both <= n, s"both=$both > sketch=$n")
      assert(bp >= 0 && bp <= 10000, s"jaccard_bp $bp")
      assert(bp == both * 10000 / n, "estimate formula")
    }
  }
}
