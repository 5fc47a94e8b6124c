package org.apache.spark.sql

/** Test-only shim: `SparkSessionExtensions.registerFunctions` is
  * private[sql], but the test suite shares one SparkSession, so
  * rebuilding a session `withExtensions` is not an option — apply the
  * injected builders to the live registry instead (the same call
  * `withExtensions` performs at session construction).
  */
object GraftTestShims {
  def applyExtensions(ext: SparkSessionExtensions,
      spark: SparkSession): Unit = {
    ext.registerFunctions(spark.sessionState.functionRegistry)
    ()
  }
}
