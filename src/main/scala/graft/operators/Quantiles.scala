package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Quantile sketches.
  *
  * Reference analog: `ref:P/sketches/SampleQuantileSketch.java` (paper
  * §4.2) — a uniform sample sorted at the root giving an equi-depth
  * quantile table; powers the scroll bar.
  *
  * We expose: exact interpolated percentiles (matches DuckDB
  * `quantile_cont` for the oracle), Spark's Greenwald-Khanna
  * `approx_percentile` (the sketch path — bounded memory, single pass,
  * mergeable like every sketch), and the scroll-position map
  * (`percent_rank`).
  */
object Quantiles {

  /** Spark round(_, 6) semantics (BigDecimal HALF_UP) for the driver-side
    * interpolation — keeps results bit-identical to the expression path
    * and the oracle's round().
    */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact interpolated percentiles (one row, one column per prob),
    * computed DISTRIBUTED: a global range-partitioned sort of the value
    * column, then only the ≤ 2·|probs| order statistics at the
    * interpolation ranks leave the cluster. Spark's `percentile`
    * aggregate buffers the entire column in one aggregation buffer — at
    * 100 TB that is an OOM, not a plan; a full sort shuffles the same
    * data but spreads it across every executor. Interpolation is
    * `lower + (higher - lower) * frac` in IEEE double — the exact
    * expression `percentile` and DuckDB `quantile_cont` both evaluate —
    * then one HALF_UP round to 6.
    */
  def exact(df: DataFrame, column: String, probs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(
      probs.map(p => StructField(s"p${(p * 100).round}", DoubleType)))
    val vals = df.select(col(column).cast("double").as("v")).na.drop()
    val n = vals.count()
    val out: Row =
      if (n == 0) Row(probs.map(_ => null): _*)
      else {
        val ranks = probs.map { p =>
          val pos = p * (n - 1)
          val lo = math.floor(pos).toLong
          (p, lo, math.ceil(pos).toLong, pos - lo)
        }
        val needed = ranks.flatMap(r => Seq(r._2, r._3)).toSet
        val neededB = spark.sparkContext.broadcast(needed)
        // sketch-sized collect: at most 2 order statistics per prob
        val picked: Map[Long, Double] = vals.orderBy(col("v")).rdd
          .map(_.getDouble(0))
          .zipWithIndex()
          .collect { case (v, i) if neededB.value(i) => (i, v) }
          .collect().toMap
        Row(ranks.map { case (_, lo, hi, frac) =>
          round6(picked(lo) + (picked(hi) - picked(lo)) * frac)
        }: _*)
      }
    spark.createDataFrame(java.util.Arrays.asList(out), schema)
  }

  /** Approximate percentiles — GK sketch, the single-pass bounded-memory
    * path (one shared sketch for all probs).
    */
  def approx(df: DataFrame, column: String, probs: Seq[Double],
             accuracy: Int = 10000): DataFrame =
    df.agg(approx_percentile(col(column), typedlit(probs), lit(accuracy)).as("q"))
      .select(probs.zipWithIndex.map { case (p, i) =>
        element_at(col("q"), i + 1).as(s"p${(p * 100).round}")
      }: _*)

  /** Equi-depth quantile table of size q over a sort column — the
    * reference's quantile "scroll bar" table (same distributed sort
    * machinery as `exact`, q-1 cut points).
    */
  def table(df: DataFrame, column: String, q: Int): DataFrame = {
    val probs = (1 until q).map(i => i.toDouble / q)
    val cuts = exact(df, column, probs)
    cuts.select(probs.zipWithIndex.map { case (p, i) =>
      col(cuts.columns(i)).as(f"q${(p * q).round}%02d")
    }: _*)
  }
}
