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

  /** The catalog's CURRENT plan object for temp view `name` (None if not
    * registered). Reference-stable until the view is replaced — which is
    * exactly what the fixture registry's memo must detect: a public
    * catalog-existence probe sees a same-named replacement as "still
    * there" and would serve hijacked data.
    */
  def tempViewPlan(spark: SparkSession, name: String): Option[AnyRef] =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalog.getTempView(name)
}
