package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-count / distinct-values sketches.
  *
  * Reference analogs: `ref:P/sketches/HLogLogSketch.java` (HyperLogLog) and
  * `ref:P/sketches/DistinctStringsSketch.java` (capped distinct strings for
  * category menus).
  */
object DistinctOps {

  /** Exact distinct count (shuffles only the distinct keys). */
  def distinctCount(df: DataFrame, column: String): DataFrame =
    df.agg(count_distinct(col(column)).as("n_distinct"))

  /** Approximate distinct count — Spark's HLL++, the engine's `HLogLog`.
    * rsd = relative standard deviation (reference uses fixed 2^k registers).
    */
  def approxDistinctCount(df: DataFrame, column: String, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as("n_distinct_approx"))

  /** The distinct values themselves, capped (`DistinctStringsSketch`). */
  def distinctValues(df: DataFrame, column: String, limit: Int = 100): DataFrame =
    df.select(col(column).as("value")).distinct()
      .orderBy(col("value").asc_nulls_first)
      .limit(limit)
}
