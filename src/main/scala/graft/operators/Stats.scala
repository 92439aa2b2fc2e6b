package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Summary / moment sketches.
  *
  * Reference analogs: `ref:P/sketches/SummarySketch.java` (schema+count),
  * `ref:P/sketches/BasicColStatSketch.java` (presence, min/max, moments),
  * `ref:P/sketches/DoubleDataRangeSketch.java` (histogram phase 1),
  * `ref:P/sketches/PCACorrelationSketch.java` (moment matrix),
  * `ref:P/sketches/CentroidsSketch.java`.
  *
  * Each is a single Spark aggregation — one partial/final pass, the exact
  * `treeAggregate` shape of the reference's sketch monoid (SURVEY.md §1.3).
  * Moments are accumulated as exact decimals (Det.dsum) so results are
  * bit-stable for the oracle; derived stats (avg/stddev/corr) are computed
  * from those exact sums with plain IEEE arithmetic.
  */
object Stats {

  /** Row count + per-column presence — `SummarySketch`. */
  def summary(df: DataFrame, column: String): DataFrame =
    df.agg(
      count(lit(1)).as("row_count"),
      count(col(column)).as("present_count"))

  /** min/max/present/missing — `DoubleDataRangeSketch` (phase 1 of every
    * histogram render).
    */
  def dataRange(df: DataFrame, column: String): DataFrame =
    df.agg(
      min(col(column)).as("min_val"),
      max(col(column)).as("max_val"),
      count(col(column)).as("present_count"),
      (count(lit(1)) - count(col(column))).as("missing_count"))

  /** Full basic stats — `BasicColStatSketch`: count, missing, min, max,
    * mean, sample stddev. Mean/stddev derive from exact decimal moments.
    */
  def basicStats(df: DataFrame, column: String): DataFrame = {
    val x = col(column).cast("double")
    val agg = df.agg(
      count(x).as("cnt"),
      (count(lit(1)) - count(x)).as("missing_count"),
      min(x).as("min_val"),
      max(x).as("max_val"),
      Det.dsum(x).as("s1"),
      Det.dsum(x * x).as("s2"))
    agg.select(
      col("cnt"), col("missing_count"), col("min_val"), col("max_val"),
      (col("s1") / col("cnt")).as("avg_val"),
      sqrt((col("s2") - col("s1") * col("s1") / col("cnt")) / (col("cnt") - lit(1)))
        .as("stddev_val"))
  }

  /** Pearson correlation of two numeric columns from exact moment sums —
    * one cell of the reference's `CorrMatrixSketch`.
    */
  def correlation(df: DataFrame, xName: String, yName: String): DataFrame = {
    val x = col(xName).cast("double")
    val y = col(yName).cast("double")
    val m = df.agg(
      count(lit(1)).as("n"),
      Det.dsum(x).as("sx"), Det.dsum(y).as("sy"),
      Det.dsum(x * y).as("sxy"),
      Det.dsum(x * x).as("sxx"), Det.dsum(y * y).as("syy"))
    m.select(
      col("n"),
      ((col("sxy") - col("sx") * col("sy") / col("n")) /
        (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
         sqrt(col("syy") - col("sy") * col("sy") / col("n")))).as("corr_val"))
  }

  /** Full correlation matrix over numeric columns (pairwise, single pass).
    * Output: one row per (col_x, col_y) pair, x ≤ y.
    */
  def correlationMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.map(c => Det.dsum(col(c).cast("double")).as(s"s_$c")) ++
      columns.map(c => Det.dsum(col(c).cast("double") * col(c).cast("double")).as(s"ss_$c")) ++
      (for (i <- columns.indices; j <- columns.indices if i <= j)
        yield Det.dsum(col(columns(i)).cast("double") * col(columns(j)).cast("double"))
          .as(s"sp_${i}_$j")) :+ count(lit(1)).as("n")
    val m = df.agg(aggs.head, aggs.tail: _*)
    val pairs = for (i <- columns.indices; j <- columns.indices if i <= j) yield {
      val (a, b) = (columns(i), columns(j))
      val num = col(s"sp_${i}_$j") - col(s"s_$a") * col(s"s_$b") / col("n")
      val den = sqrt(col(s"ss_$a") - col(s"s_$a") * col(s"s_$a") / col("n")) *
                sqrt(col(s"ss_$b") - col(s"s_$b") * col(s"s_$b") / col("n"))
      struct(lit(a).as("col_x"), lit(b).as("col_y"), (num / den).as("corr_val"))
    }
    m.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.corr_val"))
  }

  /** Per-category centroids of numeric columns — `CentroidsSketch`
    * (LAMP control points). avg = exact sum / count.
    */
  def centroids(df: DataFrame, category: String, numerics: Seq[String]): DataFrame = {
    val sums = numerics.map(c => Det.dsum(col(c).cast("double")).as(s"s_$c"))
    val g = df.groupBy(col(category))
      .agg(count(lit(1)).as("n"), sums: _*)
    val outs = col(category) +: col("n") +:
      numerics.map(c => (col(s"s_$c") / col("n")).as(s"avg_$c"))
    g.select(outs.toIndexedSeq: _*)
  }
}
