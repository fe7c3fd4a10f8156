package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one constructor a custom-operator library needs that
  * Spark scopes `private[sql]`: building a DataFrame from a hand-made
  * LogicalPlan (`Dataset.ofRows`). A file in the `org.apache.spark.sql`
  * package is the standard, widely-used extension-library idiom for this —
  * everything else in graft goes through public APIs or the sanctioned
  * `SparkSessionExtensions` hooks. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
