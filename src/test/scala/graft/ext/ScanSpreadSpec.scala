package graft.ext

import graft.SparkSpec

/** Pins the r17 scale-adaptive scan spreading: the conditional
  * round-robin fires only on under-parallel scans, is the IDENTITY
  * when the input already has >= cluster-parallelism partitions (the
  * production case — no corpus reshuffle at scale), passes streaming
  * frames through, and honors the documented opt-out conf.
  */
class ScanSpreadSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("an under-parallel input is repartitioned to the cluster's " +
      "default parallelism") {
    val narrow = (1 to 100).toDF("x").coalesce(1)
    val out = ScanSpread.spread(narrow)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // rows unchanged
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == (1 to 100))
  }

  test("a wide input passes through untouched — no round-robin " +
      "exchange at production parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(p + 1)
    val out = ScanSpread.spread(wide)
    assert(out eq wide) // identity, not just equal
  }

  test("spark.graft.scan.spread=false opts out entirely") {
    spark.conf.set("spark.graft.scan.spread", "false")
    try {
      val narrow = (1 to 10).toDF("x").coalesce(1)
      assert(ScanSpread.spread(narrow) eq narrow)
    } finally spark.conf.unset("spark.graft.scan.spread")
  }

  test("streaming frames pass through") {
    val stream = spark.readStream.format("rate").load()
    assert(ScanSpread.spread(stream) eq stream)
  }

  test("workParts is the larger of core parallelism and the " +
      "configured shuffle width") {
    val df = (1 to 3).toDF("x")
    val expect = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    assert(ScanSpread.workParts(df) == expect)
  }
}
