package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a library-level custom operator
  * needs: turning a hand-built [[LogicalPlan]] into a DataFrame.
  * Spark's own extension points (SparkSessionExtensions) let a library
  * inject rules and strategies but give no public constructor for a
  * Dataset over a custom logical node — every serious Spark extension
  * (Delta, Iceberg, Sedona…) carries exactly this bridge file. Only
  * the two bridge objects live in this package. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
