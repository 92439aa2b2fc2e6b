package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile sketches.
  *
  * Reference analog: `ref:P/sketches/SampleQuantileSketch.java` (paper
  * §4.2) — a uniform sample sorted at the root giving an equi-depth
  * quantile table; powers the scroll bar.
  *
  * We expose: exact interpolated percentiles (matches DuckDB
  * `quantile_cont` for the oracle), Spark's Greenwald-Khanna
  * `approx_percentile` (the scale path — bounded memory, single pass,
  * mergeable like every sketch), and the scroll-position map
  * (`percent_rank`).
  */
object Quantiles {

  /** Exact interpolated percentiles (one row, one column per prob). All
    * probs share ONE percentile aggregate (array form) — a single value
    * buffer and a single pass, instead of buffering the column once per
    * prob.
    */
  def exact(df: DataFrame, column: String, probs: Seq[Double]): DataFrame =
    df.agg(percentile(col(column), typedlit(probs)).as("q"))
      .select(probs.zipWithIndex.map { case (p, i) =>
        round(element_at(col("q"), i + 1), 6).as(s"p${(p * 100).round}")
      }: _*)

  /** Approximate percentiles — GK sketch, the 100 TB path (one shared
    * sketch for all probs).
    */
  def approx(df: DataFrame, column: String, probs: Seq[Double],
             accuracy: Int = 10000): DataFrame =
    df.agg(approx_percentile(col(column), typedlit(probs), lit(accuracy)).as("q"))
      .select(probs.zipWithIndex.map { case (p, i) =>
        element_at(col("q"), i + 1).as(s"p${(p * 100).round}")
      }: _*)

  /** Equi-depth quantile table of size q over a sort column — the
    * reference's quantile "scroll bar" table.
    */
  def table(df: DataFrame, column: String, q: Int): DataFrame = {
    val probs = (1 until q).map(i => i.toDouble / q)
    df.agg(percentile(col(column), typedlit(probs)).as("qs"))
      .select(probs.zipWithIndex.map { case (p, i) =>
        round(element_at(col("qs"), i + 1), 6).as(f"q${(p * q).round}%02d")
      }: _*)
  }
}
