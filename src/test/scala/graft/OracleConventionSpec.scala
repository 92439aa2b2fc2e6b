package graft

import org.scalatest.funsuite.AnyFunSuite

/** Convention guard for the DuckDB oracle SQL: DuckDB widens `SUM` over an
  * integer column to HUGEINT while Spark stays BIGINT, and the driver's
  * value hash is type-sensitive — so an uncast aggregate `SUM(...) AS x`
  * hash-fails the gate even when every value matches (the round-10
  * `pipeline_quality_tiers` slip). The repo convention is
  * `CAST(SUM(...) AS BIGINT)` (or `AS DOUBLE` for decimal sums); this test
  * makes the convention structural: any directly-aliased, uncast `SUM(...)`
  * in any oracle fails the suite before the driver ever runs.
  *
  * Window sums (`SUM(...) OVER`) are naturally exempt — `OVER` sits between
  * the closing paren and any alias, and the repo's window sums either feed
  * comparisons (type washes out) or are themselves cast at the output site.
  */
class OracleConventionSpec extends AnyFunSuite {

  /** Index just past the parenthesized argument starting at `open`. */
  private def balancedEnd(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    sql.length
  }

  test("every directly-aliased SUM in an oracle is wrapped in a CAST") {
    val sumRe = "(?i)\\bsum\\s*\\(".r
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      sumRe.findAllMatchIn(sql).flatMap { m =>
        val before = sql.substring(0, m.start).reverse.dropWhile(_.isWhitespace).reverse
        val wrapped = before.toUpperCase.endsWith("CAST(") ||
          before.toUpperCase.stripSuffix("(").trim.toUpperCase.endsWith("CAST")
        val after = sql.substring(balancedEnd(sql, sql.indexOf('(', m.start)))
          .dropWhile(_.isWhitespace).toUpperCase
        val aliased = after.startsWith("AS ")
        if (aliased && !wrapped)
          Some(s"$name: ...${sql.substring(m.start, math.min(sql.length, m.start + 60))}...")
        else None
      }
    }
    assert(offenders.isEmpty,
      "uncast aliased SUM() in oracle SQL (DuckDB returns HUGEINT, the driver hash " +
        s"is type-sensitive — wrap in CAST(... AS BIGINT/DOUBLE)):\n${offenders.mkString("\n")}")
  }

  test("every steady-state serve tag names a live catalog row") {
    // Bench warms ExtensionQueries.steadyStateServeRows at the bench dir
    // before the timed passes; a renamed or removed row would silently
    // turn its warmup into a no-op and put build cost back into pass 1
    val dead = ExtensionQueries.steadyStateServeRows -- SparkEntry.queries.keySet
    assert(dead.isEmpty,
      s"steadyStateServeRows names rows absent from the catalog: ${dead.mkString(", ")}")
  }
}
