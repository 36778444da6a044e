package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard extension-
  * library escape hatch (Spark offers no public "DataFrame from custom
  * LogicalPlan" API; every Catalyst-extending library ships one of these).
  * Kept to the two one-liners the graft planner nodes need.
  */
object GraftSqlBridge {

  /** Wrap an analyzed/unanalyzed logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan beneath a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
