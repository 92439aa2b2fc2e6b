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
    // deliberately NOT Det.spread: with only two dsums the round-robin
    // shuffle costs more than the parallel partials recover (measured
    // 0.85 s -> 1.1 s at sf0.1); spread pays from ~4 heavy aggregates up
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
      // sample stddev is undefined below 2 observations — NULL, not NaN/∞
      when(col("cnt") > 1,
        sqrt((col("s2") - col("s1") * col("s1") / col("cnt")) / (col("cnt") - lit(1))))
        .as("stddev_val"))
  }

  /** Pearson correlation of two numeric columns from exact moment sums —
    * one cell of the reference's `CorrMatrixSketch`. Rows with a missing
    * value in EITHER column are excluded up front (listwise deletion), so
    * every moment is computed over the same population.
    */
  def correlation(df0: DataFrame, xName: String, yName: String): DataFrame = {
    val x = col(xName).cast("double")
    val y = col(yName).cast("double")
    // distinct: correlation(df, c, c) is legal, and selecting the same
    // column twice would make every later col(c) reference ambiguous
    val df = Det.spread(
      df0.filter(col(xName).isNotNull && col(yName).isNotNull)
        .select(Seq(xName, yName).distinct.map(col): _*))
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
    * Output: one row per (col_x, col_y) pair, x ≤ y. Listwise deletion:
    * a row missing ANY of the columns is excluded, keeping every moment
    * on one consistent population.
    */
  def correlationMatrix(df0: DataFrame, columns: Seq[String]): DataFrame = {
    // the k(k+1)/2 pair sums subsume the squared sums (sp_ii == ss_i), so
    // only k + k(k+1)/2 + 1 aggregates run — no duplicated moments
    val df = Det.spread(
      df0.filter(columns.map(col(_).isNotNull).reduce(_ && _))
        .select(columns.map(col).toIndexedSeq: _*))
    val aggs = columns.map(c => Det.dsum(col(c).cast("double")).as(s"s_$c")) ++
      (for (i <- columns.indices; j <- columns.indices if i <= j)
        yield Det.dsum(col(columns(i)).cast("double") * col(columns(j)).cast("double"))
          .as(s"sp_${i}_$j")) :+ count(lit(1)).as("n")
    val m = df.agg(aggs.head, aggs.tail: _*)
    val pairs = for (i <- columns.indices; j <- columns.indices if i <= j) yield {
      val (a, b) = (columns(i), columns(j))
      val num = col(s"sp_${i}_$j") - col(s"s_$a") * col(s"s_$b") / col("n")
      val den = sqrt(col(s"sp_${i}_$i") - col(s"s_$a") * col(s"s_$a") / col("n")) *
                sqrt(col(s"sp_${j}_$j") - col(s"s_$b") * col(s"s_$b") / col("n"))
      struct(lit(a).as("col_x"), lit(b).as("col_y"), (num / den).as("corr_val"))
    }
    m.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.corr_val"))
  }

  /** Jacobi eigendecomposition of a small symmetric matrix (driver-side;
    * the reference likewise eigendecomposes the merged moment matrix at
    * the root — `ref:P/sketches/PCACorrelationSketch.java`, paper §4.5).
    * Returns (eigenvalues desc, eigenvectors as rows in matching order).
    * Pure Scala (no linear-algebra dependency); cyclic Jacobi converges
    * quadratically for the ≤ tens-of-columns matrices this engine sees.
    */
  def symmetricEigen(m0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag: Double = {
      var s = 0.0
      for (i <- 0 until n; j <- 0 until n if i != j) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (sweep < 64 && offDiag > 1e-22) {
      for (p <- 0 until n - 1; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var i = 0
        while (i < n) { // A ← A·R (columns p, q)
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
          i += 1
        }
        i = 0
        while (i < n) { // A ← Rᵀ·A (rows p, q)
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
          i += 1
        }
        i = 0
        while (i < n) { // V ← V·R (eigenvector accumulation)
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
          i += 1
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(j => -a(j)(j))
    val vals = order.map(j => a(j)(j)).toArray
    val vecs = order.map(j => Array.tabulate(n)(i => v(i)(j))).toArray
    (vals, vecs)
  }

  /** PCA of the given numeric columns: one exact-moment aggregation pass
    * (the sketch — a single small row leaves the cluster), covariance at
    * the driver, Jacobi eigen. Returns (means, eigenvalues desc,
    * components as rows).
    */
  def pcaComponents(df0: DataFrame, columns: Seq[String])
      : (Array[Double], Array[Double], Array[Array[Double]]) = {
    val df = Det.spread(
      df0.filter(columns.map(col(_).isNotNull).reduce(_ && _))
        .select(columns.map(col).toIndexedSeq: _*))
    val k = columns.length
    val aggs =
      columns.map(c => Det.dsum(col(c).cast("double")).as(s"s_$c")) ++
        (for (i <- 0 until k; j <- i until k)
          yield Det.dsum(col(columns(i)).cast("double") * col(columns(j)).cast("double"))
            .as(s"sp_${i}_$j")) :+ count(lit(1)).as("n")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n").toDouble
    val s = columns.map(c => row.getAs[Double](s"s_$c")).toArray
    val cov = Array.tabulate(k, k) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      (row.getAs[Double](s"sp_${a}_$b") - s(i) * s(j) / n) / (n - 1.0)
    }
    val (vals, vecs) = symmetricEigen(cov)
    (s.map(_ / n), vals, vecs)
  }

  /** Project rows onto the top `nComponents` principal components —
    * `LinearProjectionMap` fed by the PCA sketch, exactly the reference's
    * PCA-to-screen path. The projection itself is codegen'd weighted
    * column sums; only the k×k moment matrix ever reaches the driver.
    */
  def pcaProject(df: DataFrame, columns: Seq[String], nComponents: Int,
                 outPrefix: String = "pc_"): DataFrame = {
    val (means, _, vecs) = pcaComponents(df, columns)
    val top = vecs.take(nComponents)
    val projected = Projections.linearProjection(
      df, columns, top.map(_.toSeq).toSeq, outPrefix)
    top.zipWithIndex.foldLeft(projected) { case (d, (w, i)) =>
      val offset = w.zip(means).map { case (wi, mi) => wi * mi }.sum
      d.withColumn(s"$outPrefix$i", col(s"$outPrefix$i") - lit(offset))
    }
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
