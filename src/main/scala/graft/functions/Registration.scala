package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared session-registry helper for the library's custom Catalyst
  * expressions. One place for the idempotence guard: a bare
  * `createOrReplaceTempFunction` per call site logs a noisy
  * SimpleFunctionRegistry "replacing" warning on every
  * re-registration, so each `X.register(spark)` checks existence
  * first — and any future fix to the guard lands here once instead
  * of in every function object.
  */
object Registration {

  /** Every builder ever registered through [[registerOnce]], so an
    * ISOLATED loop session (IterConf) can mirror the runtime-registered
    * expressions a caller's session carries — extension-injected
    * functions cross `newSession()` on their own, but ad-hoc
    * `X.register(spark)` registrations are session-local.
    */
  private val known = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Expression] => Expression]()

  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    known.putIfAbsent(name, builder)
    if (!spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }

  /** Register every known graft expression on `spark` (idempotent). */
  def mirror(spark: SparkSession): Unit =
    known.forEach((name, builder) => registerOnce(spark, name)(builder))
}
