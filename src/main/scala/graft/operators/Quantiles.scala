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

  /** Exact interpolated percentiles (one row, one column per prob). */
  def exact(df: DataFrame, column: String, probs: Seq[Double]): DataFrame = {
    val aggs = probs.map { p =>
      round(percentile(col(column), lit(p)), 6).as(s"p${(p * 100).round}")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate percentiles — GK sketch, the 100 TB path. */
  def approx(df: DataFrame, column: String, probs: Seq[Double],
             accuracy: Int = 10000): DataFrame = {
    val aggs = probs.map { p =>
      approx_percentile(col(column), lit(p), lit(accuracy)).as(s"p${(p * 100).round}")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Equi-depth quantile table of size q over a sort column — the
    * reference's quantile "scroll bar" table.
    */
  def table(df: DataFrame, column: String, q: Int): DataFrame = {
    val probs = (1 until q).map(i => i.toDouble / q)
    val aggs = probs.map { p =>
      round(percentile(col(column), lit(p)), 6).as(f"q${(p * q).round}%02d")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
