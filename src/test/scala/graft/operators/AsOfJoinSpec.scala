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

  test("left columns survive untouched") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "payload")).toDF("k", "t", "extra")
    val right = Seq((1L, 5L, 2.5)).toDF("k", "t", "x")
    val row = AsOfJoin.lastEarlier(left, right, "k", "t", "t", Seq("x"))
      .select(col("extra"), col("asof.x")).head()
    assert(row.getString(0) == "payload" && row.getDouble(1) == 2.5)
  }
}
