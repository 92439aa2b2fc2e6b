package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchTables

/** Mergeable HLL sketch tables: accuracy at fixture cardinalities and —
  * the load-bearing property — rollup-by-merge consistency with direct
  * sketching of the coarser grain.
  */
class SketchTablesSpec extends SparkSpec {

  private lazy val events = graft.sources.Tables.open(spark, sf, "events")
    .withColumn("day", to_date(col("ts")))
    .withColumn("week", date_trunc("week", col("ts")).cast("date"))

  test("per-day estimates land within HLL error of exact distinct counts") {
    val est = SketchTables.hllEstimate(
        SketchTables.hllTable(events, Seq("day"), "user_id"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = events.groupBy("day")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val e = est(d)
      // lgK=12 → rsd ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 5 sigma + slack for
      // tiny-set coupon mode
      assert(math.abs(e - n) <= math.max(2.0, 0.1 * n),
        s"day $d: estimate $e vs exact $n")
    }
  }

  test("weekly rollup by sketch MERGE equals direct weekly sketching") {
    val daily = SketchTables.hllTable(events, Seq("week", "day"), "user_id")
    val merged = SketchTables.hllEstimate(
        SketchTables.hllRollup(daily, Seq("week")))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val direct = SketchTables.hllEstimate(
        SketchTables.hllTable(events, Seq("week"), "user_id"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(merged.keySet == direct.keySet)
    // union of a partition of the data is the SAME distinct set — the
    // sketch algebra must agree with direct sketching up to HLL mode
    // promotions (tiny tolerance, usually exact)
    merged.foreach { case (w, m) =>
      val d = direct(w)
      assert(math.abs(m - d) <= math.max(1.0, 0.02 * d),
        s"week $w: merged $m vs direct $d")
    }
  }

  test("sketch table survives a parquet round trip (build once, serve later)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val daily = SketchTables.hllTable(events, Seq("day"), "user_id")
    daily.write.mode("overwrite").parquet(dir)
    val served = SketchTables.hllEstimate(
        SketchTables.hllRollup(spark.read.parquet(dir), Seq("day")))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val direct = SketchTables.hllEstimate(daily)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(served == direct)
  }
}
