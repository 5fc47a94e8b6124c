package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSpec extends SparkSpec {

  test("upsert updates, inserts, and leaves untouched rows alone") {
    val s = spark
    import s.implicits._
    val target = Seq(
      (1L, "ana", "A", 10.0),
      (2L, "bob", "B", 20.0),
      (3L, "cleo", "C", 30.0)
    ).toDF("k", "name", "seg", "bal")
    val updates = Seq(
      (2L, "B2", 99.0),  // update
      (9L, "NEW", 0.0)   // insert
    ).toDF("k", "seg", "bal")
    val got = Upsert.upsert(target, updates, "k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2), r.getDouble(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("ana"), "A", 10.0),
      (2L, Some("bob"), "B2", 99.0),
      (3L, Some("cleo"), "C", 30.0),
      (9L, None, "NEW", 0.0)))
  }

  test("validateUnique rejects a changeset with duplicate keys") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "x")).toDF("k", "seg")
    val dupUpdates = Seq((1L, "a"), (1L, "b")).toDF("k", "seg")
    intercept[IllegalArgumentException] {
      Upsert.upsert(target, dupUpdates, "k", validateUnique = true)
    }
    // without validation the fan-out is the (documented) consequence
    assert(Upsert.upsert(target, dupUpdates, "k").count() == 2)
  }

  test("null update values fall back to target values") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "x", 5.0)).toDF("k", "seg", "bal")
    val updates = Seq((1L, null.asInstanceOf[String], 7.0))
      .toDF("k", "seg", "bal")
    val got = Upsert.upsert(target, updates, "k").head
    assert(got.getString(1) == "x") // null in changeset keeps target
    assert(got.getDouble(2) == 7.0)
  }
}

class PageRankSpec extends SparkSpec {

  /** Driver-side reference power method over adjacency lists. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val mass = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * mass.getOrElse(v, 0.0)))
        .toMap
    }
    r
  }

  test("ranks match a driver-side power method on a small graph") {
    val s = spark
    import s.implicits._
    // two triangles bridged by one edge, plus a sink-free tail
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L), (5L, 0L), (0L, 3L), (3L, 0L))
    val want = refRanks(edges, 10, 0.85)
    val got = PageRank.ranks(edges.toDF("src", "dst"), 10, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"node $k: $v vs ${want(k)}")
    }
  }

  test("ranks sum to ~1 and favor high-in-degree nodes") {
    val s = spark
    import s.implicits._
    // star: everyone links to 0; 0 links back to 1 to avoid dangling
    val edges = (1L to 6L).map(i => (i, 0L)) :+ (0L, 1L)
    val got = PageRank.ranks(edges.toDF("src", "dst"), 10, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    assert(got(0L) > got(2L) * 3, s"hub=${got(0L)} leaf=${got(2L)}")
  }
}

class Scd2Spec extends SparkSpec {
  test("applyChanges: closes changed keys, keeps history across two " +
      "generations, drops no-op changes, inserts new keys") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    def dim0 = Seq(
      (1L, "A", "2020-01-01", null.asInstanceOf[String], true),
      (2L, "B", "2020-01-01", null.asInstanceOf[String], true)
    ).toDF("k", "seg", "vf", "vt", "cur")
      .select(col("k"), col("seg"), col("vf").cast("date").as("valid_from"),
        col("vt").cast("date").as("valid_to"), col("cur").as("is_current"))
    // gen 1: key 1 changes A->X, key 2 no-op (B->B), key 3 inserts
    val c1 = Seq((1L, "X"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    val g1 = Scd2.applyChanges(dim0, c1, "k", Seq("seg"),
      to_date(lit("2021-06-01")))
    val rows1 = g1.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getDate(2)).map(_.toString).orNull,
      Option(r.getDate(3)).map(_.toString).orNull,
      r.getBoolean(4))).toSet
    assert(rows1 == Set(
      (1L, "A", "2020-01-01", "2021-06-01", false), // closed
      (1L, "X", "2021-06-01", null, true),          // new version
      (2L, "B", "2020-01-01", null, true),          // no-op kept open
      (3L, "C", "2021-06-01", null, true)))         // insert
    // gen 2 on top of gen 1: key 1 changes again X->Y
    val g2 = Scd2.applyChanges(g1, Seq((1L, "Y")).toDF("k", "seg"),
      "k", Seq("seg"), to_date(lit("2022-01-01")))
    val k1hist = g2.filter(col("k") === 1).collect()
      .map(r => (r.getString(1), r.getBoolean(4))).toSet
    // full lineage preserved: A (closed), X (closed), Y (open)
    assert(k1hist == Set(("A", false), ("X", false), ("Y", true)))
    assert(g2.filter(col("is_current")).count() == 3)
  }
}
