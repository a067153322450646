package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into Spark's `private[sql]` Dataset constructor so
  * the engine can hand a custom resolved LogicalPlan (graft.plans.*)
  * back to the session as a DataFrame. Lives under the
  * org.apache.spark.sql namespace purely for access scope; contains
  * no Spark code.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
