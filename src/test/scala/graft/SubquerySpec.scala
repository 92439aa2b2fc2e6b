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

  // ---- TPC-H -lite extension pack -----------------------------------------

  test("q7: nation-pair volume by year — values") {
    val rows = run("q7_nation_volume").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(rows === Seq(
      ("NATION_3", "NATION_7", 1996, 137444.2596),
      ("NATION_3", "NATION_7", 1997, 114305.5872)))
  }

  test("q10: returned-item top 20 — page head and size") {
    val rows = run("q10_returned_items").collect()
    assert(rows.length === 20)
    assert(rows.take(3).map(r => (r.getLong(0), r.getDouble(3))).toSeq ===
      Seq((54L, 425472.8761), (45L, 346137.4167), (70L, 281875.4238)))
  }

  test("q12: CASE-conditional priority counts — values") {
    val rows = run("q12_priority_lines").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(("A", 26L, 47L), ("N", 29L, 32L), ("R", 22L, 48L)))
  }

  test("q13: left-outer order-count distribution — values and plan") {
    val rows = run("q13_order_distribution").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq(7L -> 26L, 9L -> 19L, 10L -> 17L, 8L -> 17L,
      5L -> 12L, 4L -> 11L, 12L -> 10L, 11L -> 10L, 6L -> 10L,
      14L -> 4L, 13L -> 4L, 3L -> 4L, 2L -> 3L, 17L -> 1L, 16L -> 1L,
      15L -> 1L))
    // the distribution must cover every customer exactly once
    assert(rows.map(_._2).sum === 150L)
    val p = plan("q13_order_distribution")
    assert(p.contains("LeftOuter"), s"q13 lost its left-outer join:\n$p")
  }

  test("q14: promo revenue share — value") {
    assert(run("q14_promo_share").head().getDouble(0) === 23.11738184733367)
  }

  test("q15: scalar max over the CTE'd aggregate — values") {
    val rows = run("q15_top_supplier").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((9L, "Supplier#000000009", 1419420.6503)))
  }

  test("q19: disjunctive predicates stay on the equi join — values and plan") {
    val r = run("q19_disjunctive").head()
    assert(r.getDouble(0) === 5175935.989 && r.getLong(1) === 89L)
    val p = plan("q19_disjunctive")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q19's OR-of-conjunctions fell off the partkey equi join:\n$p")
  }

  test("q20: nested IN chains — values and two semi joins") {
    val rows = run("q20_part_suppliers").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows === Seq(
      ("Supplier#000000001", 3235.99), ("Supplier#000000002", 6035.19),
      ("Supplier#000000005", 4256.65), ("Supplier#000000007", 1558.27),
      ("Supplier#000000008", 3042.63), ("Supplier#000000009", 3030.32)))
    val p = plan("q20_part_suppliers")
    assert(p.split("LeftSemi").length >= 3,
      s"q20 must stack two left-semi joins (supplier IN ..., partkey IN ...):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q20 fell back to nested loop:\n$p")
  }
}
