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

  /** Exact interpolated percentiles (one row, one column per prob). */
  def exact(df: DataFrame, column: String, probs: Seq[Double]): DataFrame =
    exactNamed(df, column, probs, probs.map(p => s"p${(p * 100).round}"))

  /** Exact interpolated percentiles, computed DISTRIBUTED: a global
    * range-partitioned sort of the value column, then only the
    * ≤ 2·|probs| order statistics at the interpolation ranks leave the
    * cluster. Spark's `percentile` aggregate buffers the entire column
    * in one aggregation buffer — at 100 TB that is an OOM, not a plan; a
    * full sort shuffles the same data but spreads it across every
    * executor. Semantics match `percentile`/`quantile_cont` exactly:
    * nulls are dropped, NaN ranks above every value (Spark sort order),
    * interpolation is `lower + (higher - lower) * frac` in IEEE double —
    * the same expression both engines evaluate — then one HALF_UP round
    * to 6. The column is pinned for its two passes (count + sort) and
    * released before returning.
    */
  private def exactNamed(df: DataFrame, column: String, probs: Seq[Double],
                         names: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(names.map(n => StructField(n, DoubleType)))
    // filter ONLY nulls — na.drop would also drop NaN, which percentile
    // and quantile_cont keep (ranked last)
    val vals = df.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
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
            Det.round6(picked(lo) + (picked(hi) - picked(lo)) * frac)
          }: _*)
        }
      spark.createDataFrame(java.util.Arrays.asList(out), schema)
    } finally vals.unpersist()
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
    * machinery as `exact`; names are positional q01..q(q-1), never
    * colliding regardless of q).
    */
  def table(df: DataFrame, column: String, q: Int): DataFrame = {
    val probs = (1 until q).map(i => i.toDouble / q)
    exactNamed(df, column, probs, probs.indices.map(i => f"q${i + 1}%02d"))
  }
}
