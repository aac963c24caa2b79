package org.apache.spark.sql.graftplan

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Logical-plan → DataFrame bridge for the graft DML commands
  * ([[graft.ops.GraftMergeCommand]]/[[graft.ops.GraftUpdateCommand]]):
  * they assemble plans from the statement's RESOLVED expressions
  * (preserving attribute ids), and `Dataset.ofRows` is `private[sql]`
  * — same third-party-integration pattern as
  * [[org.apache.spark.sql.graftstream.StreamingBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
