package graft

import org.apache.spark.sql.functions._

/** Round-18 relational additions: the scale-safe ntile twin (value
  * parity with the window form + the no-window plan shape it exists
  * for), FULL OUTER null extension on BOTH sides, and the
  * pivot ⇄ unpivot round trip.
  */
class RelationalShapeSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("window_ntile_scalable equals the window form row-for-row") {
    val win = run("window_ntile").collect().map(_.toSeq).toSeq
    val ms = run("window_ntile_scalable").collect().map(_.toSeq).toSeq
    assert(ms === win)
  }

  test("window_ntile_scalable plans NO window — the per-key sort is gone") {
    // the boundary refinement runs in bounded sub-jobs during plan
    // construction; the RETURNED plan must be scan + broadcast join +
    // map-side tile arithmetic, with no Window exec (whose parallelism
    // ceiling would be the ~5-key priority cardinality) anywhere
    for (row <- Seq("window_ntile_scalable", "window_ntile_scalable_multi")) {
      val p = run(row).queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$row still plans a window:\n$p")
      assert(!p.contains("ntile("), s"$row still calls ntile():\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$row boundary table is not broadcast:\n$p")
    }
  }

  test("new rows prune and push down at the scan") {
    // pivot: only the two grouping/pivot columns reach the parquet reader
    val pp = run("pivot_status_matrix").queryExecution.executedPlan.toString
    assert(pp.contains("o_orderstatus") && !pp.contains("o_totalprice"),
      s"pivot scan reads more than (priority, status):\n$pp")
    // full outer: both acctbal range filters reach their scans, and the
    // unused wide columns are pruned
    val fp = run("join_full_outer").queryExecution.executedPlan.toString
    assert(fp.contains("LessThan(c_acctbal,") && fp.contains("LessThan(s_acctbal,"),
      s"acctbal filters not pushed to the scans:\n$fp")
    assert(!fp.contains("c_mktsegment") && !fp.contains("s_name"),
      s"full-outer scan reads unused columns:\n$fp")
  }

  test("join_full_outer null-extends BOTH sides at sf0.001") {
    val rows = run("join_full_outer").collect()
    assert(rows.nonEmpty)
    // left-only: a nation with indebted customers but no cheap supplier
    assert(rows.exists(r => !r.isNullAt(1) && r.isNullAt(3)),
      "no left-only (customer-side) null extension")
    // right-only: a cheap-supplier nation with no indebted customer
    assert(rows.exists(r => r.isNullAt(1) && !r.isNullAt(3)),
      "no right-only (supplier-side) null extension")
    // the coalesced key is never null and strictly ordered
    val keys = rows.map(_.getInt(0))
    assert(keys.sameElements(keys.sorted.distinct))
  }

  test("pivot matrix cells equal the long-form group counts; unpivot round-trips") {
    val long = graft.sources.Tables.open(spark, sf, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val wide = run("pivot_status_matrix").collect()
    assert(wide.length === long.keys.map(_._1).toSet.size)
    wide.foreach { r =>
      val p = r.getString(0)
      assert(r.getLong(1) === long.getOrElse((p, "F"), 0L))
      assert(r.getLong(2) === long.getOrElse((p, "O"), 0L))
      assert(r.getLong(3) === long.getOrElse((p, "P"), 0L))
    }
    val melted = run("unpivot_status_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(melted === long)
  }
}
