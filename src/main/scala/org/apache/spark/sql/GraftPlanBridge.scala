package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this library needs: turning a
  * hand-built [[LogicalPlan]] (the custom as-of join node,
  * [[graft.plans.AsOfJoinPlan]]) into a DataFrame. `Dataset.ofRows`
  * is the canonical entry Spark itself uses for every parsed query;
  * it is `private[sql]`, so the call lives in this package — the
  * standard pattern for whole-operator extension libraries (the
  * public SparkSessionExtensions surface injects rules, strategies,
  * and functions, but offers no "plan in, DataFrame out"). Kept to a
  * single delegating method so the private-API footprint is one line
  * that a Spark upgrade can re-validate at a glance. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
