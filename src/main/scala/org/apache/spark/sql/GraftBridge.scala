package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private escape hatch: build a DataFrame from a hand-constructed
  * logical plan (`Dataset.ofRows` is `private[sql]`). Needed to hand custom
  * logical nodes (graft.plans.AsOfJoin) to the planner. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
