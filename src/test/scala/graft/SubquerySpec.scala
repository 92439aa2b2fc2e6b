package graft

/** Correlated-subquery relational rows (q4/q17/q21/q22-lite): value pins
  * at sf0.001 (independently computed with DuckDB over the same parquet)
  * and DECORRELATION plan shapes — EXISTS/NOT EXISTS must execute as
  * left-semi/left-anti hash joins, correlated scalar aggregates as
  * joined-back aggregates, and none of the four may fall back to a
  * nested-loop/cartesian plan (the scale-killer the rewrite exists to
  * avoid).
  */
class SubquerySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q4: EXISTS with non-equi outer reference — values") {
    val rows = run("q4_order_priority").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(
      "1-URGENT" -> 9L, "2-HIGH" -> 9L, "3-MEDIUM" -> 11L,
      "4-NOT SPECIFIED" -> 8L, "5-LOW" -> 9L))
  }

  test("q4: EXISTS executes as a left-semi hash join") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"no semi join in q4 plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q4 decorrelation fell back to nested loop:\n$p")
  }

  test("q17: twin correlated scalar aggregates — values") {
    val r = run("q17_small_quantity").head()
    assert(r.getDouble(0) === 51661.35571428571)
    assert(r.getLong(1) === 7L)
  }

  test("q17: scalar subqueries decorrelate to joined-back aggregates") {
    val p = plan("q17_small_quantity")
    // the per-partkey COUNT/SUM appear as aggregate operators joined back
    // into the main scan — and never as a per-row nested-loop re-scan
    assert(p.contains("HashAggregate"), s"no aggregate join-back in q17 plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q17 decorrelation fell back to nested loop:\n$p")
  }

  test("q21: EXISTS + NOT EXISTS — values") {
    val rows = run("q21_waiting_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(
      "Supplier#000000001" -> 17L, "Supplier#000000005" -> 14L,
      "Supplier#000000007" -> 14L, "Supplier#000000002" -> 12L,
      "Supplier#000000006" -> 12L, "Supplier#000000003" -> 11L,
      "Supplier#000000004" -> 10L, "Supplier#000000009" -> 10L,
      "Supplier#000000008" -> 9L, "Supplier#000000000" -> 6L))
  }

  test("q21: plans one left-semi AND one left-anti join") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"no semi join in q21 plan:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join in q21 plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q21 decorrelation fell back to nested loop:\n$p")
  }

  test("q22: uncorrelated scalar pair + NOT EXISTS — values") {
    val rows = run("q22_idle_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq((19L, 1L, 7234.68)))
  }

  test("q22: NOT EXISTS executes as a left-anti join") {
    val p = plan("q22_idle_balance")
    assert(p.contains("LeftAnti"), s"no anti join in q22 plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q22 decorrelation fell back to nested loop:\n$p")
  }
}
