package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to Spark's `private[sql]` Dataset factory so the engine can wrap
  * a custom LogicalPlan (graft.plans.TopKPerKey) as a DataFrame. Lives in
  * a subpackage of org.apache.spark.sql purely for access; contains no
  * Spark-internal logic of its own.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
