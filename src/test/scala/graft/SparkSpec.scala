package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites are
  * cheap at sf0.001).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  /** Run `action` and return the observed row of `metricName` from the
    * last successful execution that carried it (QueryExecutionListener is
    * async — drained via the graftest shim). Shared by every suite that
    * reads `Dataset.observe` metrics. Matches the name OR a
    * `name_<suffix>` variant — production observe names carry a unique
    * counter suffix so two observed stages can compose in one plan.
    */
  def observedMetric(metricName: String)(action: => Unit): Option[org.apache.spark.sql.Row] = {
    @volatile var row: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.collect {
          case (n, r) if n == metricName || n.startsWith(metricName + "_") => r
        }.foreach(r => row = Some(r))
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      org.apache.spark.graftest.ListenerDrain.drain(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    row
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
