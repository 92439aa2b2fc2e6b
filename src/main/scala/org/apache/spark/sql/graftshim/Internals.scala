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

  /** The catalog's CURRENT stored view object for temp view `name` (None
    * if not registered). This must be the RAW `TemporaryViewRelation` the
    * catalog map holds — `getTempView` builds a fresh `View` wrapper per
    * call, so its identity is useless for a freshness probe (an eq-based
    * memo over it NEVER short-circuits). The raw object is
    * reference-stable until the view is dropped or replaced — which is
    * exactly what the fixture registry's memo must detect: a public
    * catalog-existence probe sees a same-named replacement as "still
    * there" and would serve hijacked data.
    */
  def tempViewPlan(spark: SparkSession, name: String): Option[AnyRef] =
    spark.asInstanceOf[classic.SparkSession].sessionState.catalog.getRawTempView(name)

  /** `NormalizeFloatingNumbers.normalize` (-0.0 → 0.0, canonical NaN) is
    * `private[sql]`; the struct-keyed sketches apply it to their key
    * projections so sketch keys group exactly like SQL GROUP BY.
    */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
