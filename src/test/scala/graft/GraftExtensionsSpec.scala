package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkSpec {
  test("extensions register native expressions for SQL use") {
    // The shared test session already exists, so instead of rebuilding
    // a session we apply the injected function builders to its
    // registry directly — same code path `withExtensions` runs.
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShims.applyExtensions(ext, spark)
    val r = spark.sql(
      """SELECT rolling_hash64('hi') AS rh,
                dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp""")
      .head()
    assert(r.getLong(0) ==
      graft.ext.RollingHash64.hash("hi".getBytes("UTF-8")))
    assert(r.getDouble(1) == 11.0)
  }
}
