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
                dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
                quantize_i8(array(1.0D, -2.0D, 0.5D)) AS q,
                sign_bands(array(1.0D, 1.0D),
                  array(1.0D, 0.0D, 0.0D, 1.0D, -1.0D, 0.0D), 1, 3) AS sb""")
      .head()
    assert(r.getLong(0) ==
      graft.ext.RollingHash64.hash("hi".getBytes("UTF-8")))
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[Byte](2) == Seq[Byte](64, -127, 32))
    // planes (1,0), (0,1), (-1,0) against vec (1,1): signs +,+,- ->
    // one band of 3 rows packs bits 1,1,0
    assert(r.getSeq[Long](3) == Seq(3L))
  }

  test("kmv_distinct builder rejects malformed calls with a clean " +
      "AnalysisException naming the function, not IOOBE/CCE/NPE") {
    import org.apache.spark.sql.AnalysisException
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(sql).collect())
      assert(e.getMessage.contains("kmv_distinct") &&
        e.getMessage.contains(frag), s"$sql -> ${e.getMessage}")
    }
    bad("SELECT kmv_distinct('x')", "exactly 2 arguments")
    bad("SELECT kmv_distinct('x', 2, 3)", "exactly 2 arguments")
    bad("SELECT kmv_distinct(t, id % 7) FROM (SELECT 'a' t, 1 id)",
      "foldable")
    bad("SELECT kmv_distinct('x', CAST(NULL AS INT))", "NULL")
    bad("SELECT kmv_distinct('x', 'many')", "numeric")
    bad("SELECT kmv_distinct('x', 1)", ">= 2")
    // no silent truncation: intValue() would wrap 2^32+2 to k=2 and
    // floor 2.9 to k=2 — both must reject, not run with a tiny sketch
    bad("SELECT kmv_distinct('x', 4294967298)", "out of Int range")
    bad("SELECT kmv_distinct('x', CAST(2.9 AS DOUBLE))", "integer")
    // and the well-formed call still works through the same builder
    assert(spark.sql("SELECT kmv_distinct(t, 16) FROM VALUES ('a'), " +
      "('b'), ('a') AS v(t)").head.getLong(0) == 2L)
  }
}
