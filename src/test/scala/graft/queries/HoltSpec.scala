package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked pins for the events_holt fold (the query itself is
  * oracle-gated; this pins the recurrence against hand arithmetic —
  * all dyadic, so the expected values are exact).
  */
class HoltSpec extends SparkSpec {

  private def holt(ys: Seq[Double]) = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(ys)).toDF("ys")
      .withColumn("st", expr(
        """aggregate(
             slice(ys, 2, size(ys) - 1),
             named_struct('l', ys[0], 'b', CAST(NULL AS DOUBLE)),
             (a, y) -> CASE WHEN a.b IS NULL
               THEN named_struct('l', y, 'b', y - a.l)
               ELSE named_struct(
                 'l', 0.5D * y + 0.5D * (a.l + a.b),
                 'b', 0.125D * (y - a.l) + 0.875D * a.b)
               END)"""))
      .select(col("st.l"), col("st.b")).head()
  }

  test("hand-checked chain: 10,12,11,15 -> l=14.5625, b=1.734375") {
    // t2: l=12 b=2; t3: l=.5*11+.5*14=12.5, b=.125*(11-12)+.875*2=1.625
    // t4: l=.5*15+.5*14.125=14.5625, b=.125*(15-12.5)+.875*1.625=1.734375
    val r = holt(Seq(10, 12, 11, 15))
    assert(r.getDouble(0) == 14.5625 && r.getDouble(1) == 1.734375, r)
  }

  test("two points: level = y2, trend = y2 - y1") {
    val r = holt(Seq(3, 8))
    assert(r.getDouble(0) == 8.0 && r.getDouble(1) == 5.0, r)
  }

  test("single point: level = y1, trend null (forecast degrades to " +
      "null, not a crash)") {
    val r = holt(Seq(42))
    assert(r.getDouble(0) == 42.0 && r.isNullAt(1), r)
  }

  test("constant series: trend decays to exactly 0 (dyadic arithmetic " +
      "introduces no drift)") {
    val r = holt(Seq.fill(20)(7.0))
    assert(r.getDouble(0) == 7.0 && r.getDouble(1) == 0.0, r)
  }
}
