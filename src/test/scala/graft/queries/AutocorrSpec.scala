package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the profile_autocorr arithmetic (the query is oracle-gated;
  * this diffs the n-scaled-deviation pipeline against an independent
  * exact-integer reference and covers the degenerate corners).
  */
class AutocorrSpec extends SparkSpec {

  // the same pipeline the query runs, over a hand-built daily table
  private def acf(series: Map[String, Seq[Long]]) = {
    val s = spark
    import s.implicits._
    val daily = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (x, i) => (k, i, x) }
    }.toDF("event_type", "day", "x")
    val w = Window.partitionBy("event_type").orderBy("day")
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    daily.withColumn("xl", lag("x", 7).over(w))
      .join(tot, "event_type")
      .withColumn("dx", expr("CAST(n AS DECIMAL(38,0)) * x - sx"))
      .withColumn("dxl", expr(
        """CASE WHEN xl IS NULL THEN NULL
             ELSE CAST(n AS DECIMAL(38,0)) * xl - sx END"""))
      .groupBy("event_type")
      .agg(max("n").cast("long").as("n_days"),
        sum(expr("dx * dxl")).as("num"), sum(expr("dx * dx")).as("den"))
      .select(col("event_type"),
        expr("""CAST(CASE WHEN num < 0
                  THEN -((-num) * 1000000 DIV nullif(den, 0))
                  ELSE num * 1000000 DIV nullif(den, 0) END AS BIGINT)""")
          .as("acf"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  // independent exact-integer reference (BigInt, no window machinery)
  private def ref(xs: Seq[Long]): Option[Long] = {
    val n = BigInt(xs.length); val sx = BigInt(xs.sum)
    val dx = xs.map(x => n * x - sx)
    val den = dx.map(d => d * d).sum
    if (den == 0) return None
    val num = (7 until xs.length).map(t => dx(t) * dx(t - 7)).sum
    val q = (num.abs * 1000000) / den
    Some((if (num < 0) -q else q).toLong)
  }

  test("matches the exact-integer reference on periodic, trending, " +
      "and noisy series, including a negative-correlation case") {
    val series = Map(
      "periodic7" -> Seq.tabulate(21)(t => 10L + (t % 7)),
      "trend" -> Seq.tabulate(20)(t => 5L + 3L * t),
      "noisy" -> Seq(3L, 9, 1, 7, 7, 2, 8, 5, 5, 4, 9, 1, 2, 6, 3, 8),
      // period-14 square wave: x(t+7) sits on the opposite level,
      // so the lag-7 correlation is strongly negative
      "anti" -> Seq.tabulate(28)(t => if (t % 14 < 7) 10L else 20L))
    val got = acf(series)
    series.foreach { case (k, xs) =>
      assert(got(k) == ref(xs), s"$k: ${got(k)} vs ${ref(xs)}")
    }
    // 3 periods pair 14 of 21 days -> exactly 2/3; the square wave
    // pairs 21 of 28 days all on the opposite level -> exactly -3/4
    assert(got("periodic7").contains(666666L), s"${got("periodic7")}")
    assert(got("anti").contains(-750000L), s"${got("anti")}")
  }

  test("constant series yields NULL (nullif guard), not a " +
      "divide-by-zero") {
    assert(acf(Map("const" -> Seq.fill(15)(4L))) == Map("const" -> None))
  }

  test("series shorter than the lag yields NULL numerator -> NULL acf") {
    val got = acf(Map("short" -> Seq(1L, 5, 3)))
    assert(got("short").isEmpty)
  }
}
