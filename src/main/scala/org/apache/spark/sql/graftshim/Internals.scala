package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The single Spark-internal bridge in this engine: rebuilding a
  * DataFrame from a transformed logical plan. `Dataset.ofRows` is
  * `private[sql]`, so the bridge lives under the `org.apache.spark.sql`
  * package; nothing else in graft reaches into Spark internals this way.
  */
object Internals {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
