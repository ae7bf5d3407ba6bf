package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crack in the door: `Dataset.ofRows` is
  * `private[sql]`, and building a [[DataFrame]] from a custom
  * LogicalPlan (graft.plans.AsOfJoinPlan) needs it. Standard practice
  * for Spark extension libraries — a single shim object inside the
  * `org.apache.spark.sql` package, nothing else.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
