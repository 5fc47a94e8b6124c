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

  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}
