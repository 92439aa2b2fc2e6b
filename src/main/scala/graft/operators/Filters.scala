package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column sort key — the engine's `RecordOrder` element
  * (reference: `ref:P/table/RecordOrder.java`,
  * `ColumnSortOrientation{col, asc}`).
  */
case class SortKey(name: String, asc: Boolean = true) {
  /** Canonical null placement: ASC→NULLS FIRST, DESC→NULLS LAST (Spark
    * defaults, made explicit so the DuckDB oracle can mirror them).
    */
  def toCol: Column = if (asc) col(name).asc_nulls_first else col(name).desc_nulls_last
}

/** Row filters — the reference's filter "maps". Each returns a new
  * DataFrame that shares lineage with its parent (zero-copy view semantics:
  * a Catalyst `Filter` over the same scan, the Spark analog of hiero's
  * membership sets — `ref:P/table/api/IMembershipSet.java`,
  * `ref:P/maps/FilterMap.java`).
  *
  * Scale note: all predicates here are plain Catalyst expressions, so they
  * push down to the parquet scan (visible as PushedFilters in explain) and
  * stay inside whole-stage codegen.
  */
object Filters {

  /** Equality filter, optionally matching missing values
    * (`ref:P/table/filters/EqualityFilterDescription.java`).
    */
  def equality(df: DataFrame, column: String, value: Any,
               matchMissing: Boolean = false): DataFrame = {
    val p = if (matchMissing) col(column).isNull else col(column) === lit(value)
    df.filter(p)
  }

  /** Numeric/date range [lo, hi], inclusive — histogram brush-zoom
    * (`ref:P/table/filters/RangeFilterDescription.java`).
    */
  def range(df: DataFrame, column: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(column).between(lit(lo), lit(hi)))

  /** 2-D range — heatmap brush
    * (`ref:P/table/filters/Range2DFilterDescription.java`).
    */
  def range2d(df: DataFrame, xCol: String, xLo: Any, xHi: Any,
              yCol: String, yLo: Any, yHi: Any): DataFrame =
    df.filter(col(xCol).between(lit(xLo), lit(xHi)) &&
              col(yCol).between(lit(yLo), lit(yHi)))

  sealed trait StringMatch
  case object Substring extends StringMatch
  case object Exact extends StringMatch
  case object Regex extends StringMatch
  case object CaseInsensitive extends StringMatch

  /** String search filter ("find") —
    * `ref:P/table/filters/StringFilterDescription.java`.
    */
  def stringSearch(df: DataFrame, column: String, pattern: String,
                   mode: StringMatch = Substring,
                   negate: Boolean = false): DataFrame = {
    val p = mode match {
      case Substring       => col(column).contains(pattern)
      case Exact           => col(column) === lit(pattern)
      case Regex           => col(column).rlike(pattern)
      case CaseInsensitive => lower(col(column)) === lit(pattern.toLowerCase)
    }
    df.filter(if (negate) !p else p)
  }

  /** Lexicographic "row ≥ snapshot" predicate under a RecordOrder — the
    * spreadsheet jump/paging filter
    * (`ref:P/table/filters/RowComparisonFilterDescription.java`). Encoded
    * as the OR-of-ANDs boolean expansion so it stays a pushable predicate
    * (struct comparison would block parquet pushdown).
    *
    * Null-safe under the canonical null placement (ASC→NULLS FIRST,
    * DESC→NULLS LAST): equality prefixes use `<=>`, and the strict
    * comparisons spell out where nulls sort — a plain `>`/`<` would
    * silently drop null-keyed rows from every page.
    */
  def rowAtLeast(order: Seq[SortKey], start: Seq[Column]): Column = {
    require(order.length == start.length, "order/start arity mismatch")
    // strictly after `v` in sort order, null-aware
    def after(k: SortKey, v: Column): Column = {
      val c = col(k.name)
      if (k.asc) when(v.isNull, c.isNotNull).otherwise(c > v) // nulls first
      else when(v.isNull, lit(false)).otherwise(c < v || c.isNull) // nulls last
    }
    val n = order.length
    val disjuncts = (0 until n).map { i =>
      val eqPrefix = (0 until i).map(j => col(order(j).name) <=> start(j))
      val cmp =
        if (i == n - 1) after(order(i), start(i)) || (col(order(i).name) <=> start(i))
        else after(order(i), start(i))
      (eqPrefix :+ cmp).reduce(_ && _)
    }
    disjuncts.reduce(_ || _)
  }

  def rowComparison(df: DataFrame, order: Seq[SortKey], start: Seq[Column]): DataFrame =
    df.filter(rowAtLeast(order, start))
}
