package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle contract (SURVEY.md §7.5).
  *
  * Double SUMs are order-dependent; the fix used throughout this engine is
  * to cast each row to DECIMAL(30,6) before summing (exact, associative)
  * and cast the exact decimal result back to DOUBLE. The oracle SQL mirrors
  * the identical shape: `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`.
  * Derived moments (avg, stddev, corr) are then plain IEEE arithmetic over
  * identical doubles on both sides.
  */
object Det {
  private val S = DecimalType(30, 6)

  /** Order-independent exact sum, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(S)).cast("double")

  /** High-precision variant for unit-magnitude values (dot products,
    * similarities) where scale-6 truncation would be visible after
    * rounding: DECIMAL(38,20) keeps 20 fractional digits.
    */
  def dsumHi(c: Column): Column =
    sum(c.cast(DecimalType(38, 20))).cast("double")

  /** Windowed order-independent exact sum, returned as double. */
  def dsumOver(c: Column, w: WindowSpec): Column = sum(c.cast(S)).over(w).cast("double")

  /** Canonical timestamp rendering (matches DuckDB strftime '%Y-%m-%d %H:%M:%S'). */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Canonical date rendering (matches DuckDB strftime '%Y-%m-%d'). */
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Total order over every output column — ASC NULLS FIRST, mirrored in the
    * oracle as explicit `ASC NULLS FIRST` (DuckDB defaults to NULLS LAST).
    */
  def orderAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(n => col(n).asc_nulls_first).toIndexedSeq: _*)
}
