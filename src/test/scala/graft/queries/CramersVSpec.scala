package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked chi² / Cramér's V arithmetic for profile_cramers_v,
  * run through the same cell-term pipeline as the query (the query
  * itself is oracle-gated; this pins the formula against hand math
  * and the independence / perfect-association extremes).
  */
class CramersVSpec extends SparkSpec {

  // mirror of the query body over an arbitrary (rcat, ccat) frame
  private def cramers(rows: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    val o = rows.toDF("rcat", "ccat")
    val obs = o.groupBy("rcat", "ccat").agg(count(lit(1)).as("obs"))
    val rt = o.groupBy("rcat").agg(count(lit(1)).as("r"))
    val ct = o.groupBy("ccat").agg(count(lit(1)).as("c"))
    val n = o.agg(count(lit(1)).as("n"))
    rt.crossJoin(broadcast(ct))
      .join(broadcast(obs), Seq("rcat", "ccat"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("term", expr(
        """CAST((CAST(n AS DECIMAL(38,0))*obs - CAST(r AS DECIMAL(38,0))*c)
             * (CAST(n AS DECIMAL(38,0))*obs - CAST(r AS DECIMAL(38,0))*c)
             * 1000000
             DIV (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"""))
      .agg(max("n").as("n"), countDistinct("rcat").as("n_rcat"),
        countDistinct("ccat").as("n_ccat"), sum("term").as("chi2_micro"))
      .select(col("n"), col("chi2_micro"),
        expr("chi2_micro DIV (n * greatest(least(n_rcat, n_ccat) - 1, 1))")
          .as("v2_micro"))
      .head()
  }

  test("exact independence gives chi2 = 0 (zero cells included)") {
    // 2x2, perfectly proportional: obs = r*c/n in every cell
    val rows = Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(2)(("y", "p")) ++ Seq.fill(2)(("y", "q"))
    val r = cramers(rows)
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L, r.toString)
  }

  test("perfect association gives V^2 = 1 (micro-units)") {
    // 2x2 diagonal: chi2 = n, V^2 = 1
    val rows = Seq.fill(3)(("x", "p")) ++ Seq.fill(3)(("y", "q"))
    val r = cramers(rows)
    // n=6: each diagonal cell term = (6*3-3*3)^2*1e6/(6*3*3) = 1.5e6,
    // each zero cell term = (0-9)^2*1e6/54 = 1.5e6 -> chi2 = 6e6
    assert(r.getLong(1) == 6000000L, r.toString)
    assert(r.getLong(2) == 1000000L, r.toString)
  }

  test("hand-checked asymmetric 2x2") {
    // obs: (x,p)=3 (x,q)=1 (y,p)=1 (y,q)=3; n=8, r=c=4 for all
    // delta = 8*obs - 16 -> +8/-8; term = 64*1e6/(8*16) = 500000 each
    // chi2_micro = 2000000; v2 = chi2/(n*1) -> 250000
    val rows = Seq.fill(3)(("x", "p")) ++ Seq(("x", "q")) ++
      Seq(("y", "p")) ++ Seq.fill(3)(("y", "q"))
    val r = cramers(rows)
    assert(r.getLong(1) == 2000000L && r.getLong(2) == 250000L, r.toString)
  }
}
