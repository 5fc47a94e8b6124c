package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("lastEarlier picks latest earlier row per key, ties inclusive") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 100L), // after two rights -> picks t=90
      (1L, 50L),  // equal-ts tie -> inclusive (right at 50 matches)
      (1L, 10L),  // before all rights -> null
      (2L, 100L)  // key with no rights at all -> null
    ).toDF("k", "t")
    val right = Seq(
      (1L, 50L, "a"),
      (1L, 90L, "b")
    ).toDF("k", "t", "v")
    val got = AsOfJoin.lastEarlier(left, right, "k", "t", "t", Seq("v"))
      .select(col("k"), col("t"), col("asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 100L, Some("b")),
      (1L, 50L, Some("a")),
      (1L, 10L, None),
      (2L, 100L, None)))
  }

  test("lastEarlierWithin nulls matches staler than the tolerance, " +
      "keeps fresh ones, tolerance boundary inclusive") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 100L), // match at 90: age 10 <= 15 -> kept
      (1L, 70L),  // match at 50: age 20 > 15 -> nulled
      (1L, 65L),  // match at 50: age 15 == tolerance -> kept (inclusive)
      (1L, 10L),  // no earlier right -> null either way
      (2L, 100L)  // keyless -> null
    ).toDF("k", "t")
    val right = Seq((1L, 50L, "a"), (1L, 90L, "b")).toDF("k", "t", "v")
    val got = AsOfJoin.lastEarlierWithin(left, right, "k", "t", "t",
        Seq("v"), tolerance = 15L)
      .select(col("k"), col("t"), col("asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 100L, Some("b")),
      (1L, 70L, None),
      (1L, 65L, Some("a")),
      (1L, 10L, None),
      (2L, 100L, None)))
  }

  test("left columns survive untouched") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "payload")).toDF("k", "t", "extra")
    val right = Seq((1L, 5L, 2.5)).toDF("k", "t", "x")
    val row = AsOfJoin.lastEarlier(left, right, "k", "t", "t", Seq("x"))
      .select(col("extra"), col("asof.x")).head()
    assert(row.getString(0) == "payload" && row.getDouble(1) == 2.5)
  }

  test("firstLater picks earliest later row per key, ties inclusive") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L),  // before both rights -> picks t=50
      (1L, 50L),  // equal-ts tie -> inclusive (right at 50 matches)
      (1L, 95L),  // after all rights -> null
      (2L, 10L)   // key with no rights -> null
    ).toDF("k", "t")
    val right = Seq(
      (1L, 50L, "a"),
      (1L, 90L, "b")
    ).toDF("k", "t", "v")
    val got = AsOfJoin.firstLater(left, right, "k", "t", "t", Seq("v"))
      .select(col("k"), col("t"), col("asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 10L, Some("a")),
      (1L, 50L, Some("a")),
      (1L, 95L, None),
      (2L, 10L, None)))
  }

  test("nearest minimizes |dt|, exact tie prefers the earlier side, " +
      "matches brute force on seeded random data") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 60L),  // back 50 (d=10) vs fwd 90 (d=30) -> back
      (1L, 80L),  // back 50 (d=30) vs fwd 90 (d=10) -> fwd
      (1L, 70L),  // exact tie d=20 both sides -> earlier (50)
      (1L, 50L),  // d=0 backward -> 50
      (2L, 10L)   // no rights -> null
    ).toDF("k", "t")
    // the null-ts right row must be ignored, not become a phantom
    // nulls-first "earliest" match (key 2 has ONLY the null-ts row)
    val right = Seq((1L, Some(50L), "a"), (1L, Some(90L), "b"),
      (2L, Option.empty[Long], "z")).toDF("k", "t", "v")
    val got = AsOfJoin.nearest(left, right, "k", "t", "t", Seq("v"))
      .select(col("k"), col("t"), col("asof.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 60L, Some("a")),
      (1L, 80L, Some("b")),
      (1L, 70L, Some("a")),
      (1L, 50L, Some("a")),
      (2L, 10L, None)))

    // seeded random differential vs brute force
    val rnd = new scala.util.Random(11)
    val ls = (1 to 80).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i.toLong))
    val rs = (1 to 40).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i.toLong))
      .groupBy(x => (x._1, x._2)).map(_._2.minBy(_._3)).toSeq // dedupe
    val gotR = AsOfJoin.nearest(ls.toDF("k", "t", "id"),
        rs.toDF("k", "t", "v"), "k", "t", "t", Seq("v"))
      .select(col("id"), col("asof.v").as("v"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val brute = ls.map { case (k, t, id) =>
      val cands = rs.filter(_._1 == k)
      id -> (if (cands.isEmpty) None else {
        val best = cands.minBy(c =>
          (math.abs(c._2 - t), c._2 >= t && c._2 != t, c._3))
        Some(best._3)
      })
    }.toMap
    assert(gotR == brute)
  }

  test("null LEFT ts yields a null asof in all three operators — " +
      "never a phantom nulls-first match") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, Option.empty[Long], "nullts"),
      (1L, Some(60L), "ok")).toDF("k", "t", "tag")
    val right = Seq((1L, 50L, "a"), (1L, 90L, "b")).toDF("k", "t", "v")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select(col("tag"), col("asof.v").as("v")).collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val back = run(AsOfJoin.lastEarlier(left, right, "k", "t", "t",
      Seq("v")))
    val fwd = run(AsOfJoin.firstLater(left, right, "k", "t", "t",
      Seq("v")))
    val near = run(AsOfJoin.nearest(left, right, "k", "t", "t",
      Seq("v")))
    assert(back("nullts").isEmpty && fwd("nullts").isEmpty &&
      near("nullts").isEmpty, "null left ts must not match")
    // the non-null row still joins normally in the same run
    assert(back("ok").contains("a") && fwd("ok").contains("b") &&
      near("ok").contains("a"))
  }

  test("nearest rejects mixed leftTs/rightTs dtypes up front") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 60L)).toDF("k", "t")
    val right = Seq((1L, new java.sql.Timestamp(50000L), "a"))
      .toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.nearest(left, right, "k", "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("same type"))
  }
}
