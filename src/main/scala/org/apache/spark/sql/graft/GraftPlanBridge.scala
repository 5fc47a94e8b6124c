package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the library uses: turning a custom
  * [[LogicalPlan]] node into a `DataFrame`. Spark deliberately keeps
  * `Dataset.ofRows` package-private — extension libraries (Delta,
  * Iceberg, spark-rapids…) all open this same door with a shim in a
  * subpackage of `org.apache.spark.sql`. Nothing else in the library
  * lives outside the `graft` namespace.
  */
object GraftPlanBridge {
  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(spark, plan)
  }

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
