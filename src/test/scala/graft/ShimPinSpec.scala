package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the one Spark-internal API the engine bridges to
  * (`graftshim.Internals.ofRows` → `classic.Dataset.ofRows`). The method is
  * `private[sql]`, NOT public Spark API, so a Spark upgrade may move or
  * rename it — this spec turns that breakage into a named failure instead
  * of an opaque NoSuchMethodError at runtime.
  */
class ShimPinSpec extends AnyFunSuite {

  test("classic.Dataset.ofRows(classic.SparkSession, LogicalPlan) still exists") {
    val companion = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val hit = companion.getMethods.exists { m =>
      m.getName == "ofRows" && m.getParameterCount == 2 && {
        val p = m.getParameterTypes
        p(0).getName == "org.apache.spark.sql.classic.SparkSession" &&
          p(1).getName == "org.apache.spark.sql.catalyst.plans.logical.LogicalPlan"
      }
    }
    assert(hit,
      "Spark upgrade broke the graftshim bridge: " +
        "org.apache.spark.sql.classic.Dataset.ofRows(classic.SparkSession, LogicalPlan) " +
        "is gone. Update org.apache.spark.sql.graftshim.Internals.ofRows — it re-roots " +
        "transformed logical plans for the SlicedFileIndex progressive partials " +
        "(plans/FileSlices.scala) — to whatever the internal constructor is now.")
  }
}
