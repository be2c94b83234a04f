package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into the `org.apache.spark.sql` package-private API:
  * building a DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
  * private[sql]). This is the standard extension-library technique; the
  * only thing exposed is plan → DataFrame construction. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
