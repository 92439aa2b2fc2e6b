package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LAMP — Local Affine Multidimensional Projection
  * (`ref:P/maps/LAMPMap.java`; Joia et al., IEEE TVCG 2011): project
  * d-dimensional rows to 2-D through a per-row weighted orthogonal affine
  * map fitted to a small set of control points with known 2-D positions
  * (in the reference, per-category centroids placed by the user).
  *
  * Math per row x: weights αᵢ = 1/‖x−xᵢ‖²; weighted centroids x̃, ỹ;
  * M = UVᵀ from the SVD of C = Σ αᵢ x̂ᵢ ŷᵢᵀ (d×2) — the orthogonal
  * Procrustes solution; y = (x−x̃)M + ỹ. The d×2 SVD reduces to a 2×2
  * symmetric eigenproblem (CᵀC), solved with the same Jacobi kernel as
  * PCA.
  *
  * Scale: control points are a sketch-sized driver array closed over by
  * the row kernel (Spark broadcasts the closure); the projection itself
  * is embarrassingly parallel per row with zero shuffle.
  */
object Lamp {

  /** Control point: d-dim position + target 2-D coordinates. */
  final case class Control(x: Array[Double], y0: Double, y1: Double)

  /** Pure per-row LAMP kernel (exposed for tests). */
  def projectPoint(x: Array[Double], controls: Array[Control]): (Double, Double) = {
    val k = controls.length
    val d = x.length
    val eps = 1e-9
    val alpha = Array.tabulate(k) { i =>
      var s = 0.0; var j = 0
      while (j < d) { val t = x(j) - controls(i).x(j); s += t * t; j += 1 }
      1.0 / (s + eps)
    }
    val asum = alpha.sum
    val xt = Array.tabulate(d) { j =>
      var s = 0.0; var i = 0
      while (i < k) { s += alpha(i) * controls(i).x(j); i += 1 }
      s / asum
    }
    var yt0 = 0.0; var yt1 = 0.0
    for (i <- 0 until k) { yt0 += alpha(i) * controls(i).y0; yt1 += alpha(i) * controls(i).y1 }
    yt0 /= asum; yt1 /= asum
    // C = Σ αᵢ x̂ᵢ ŷᵢᵀ  (d×2)
    val c = Array.ofDim[Double](d, 2)
    for (i <- 0 until k; j <- 0 until d) {
      val a = alpha(i) * (controls(i).x(j) - xt(j))
      c(j)(0) += a * (controls(i).y0 - yt0)
      c(j)(1) += a * (controls(i).y1 - yt1)
    }
    // SVD of C via the 2×2 eigenproblem of CᵀC
    val g = Array.ofDim[Double](2, 2)
    for (j <- 0 until d; a <- 0 until 2; b <- 0 until 2) g(a)(b) += c(j)(a) * c(j)(b)
    val (vals, vecs) = Stats.symmetricEigen(g)
    // M = U Vᵀ with U col e = C·vₑ/σₑ  →  M(j)(q) = Σₑ (C·vₑ)(j)/σₑ · vₑ(q)
    val m = Array.ofDim[Double](d, 2)
    for (e <- 0 until 2) {
      val sigma = math.sqrt(math.max(vals(e), 0.0))
      if (sigma > 1e-12) {
        val cv = Array.tabulate(d)(j => c(j)(0) * vecs(e)(0) + c(j)(1) * vecs(e)(1))
        for (j <- 0 until d; q <- 0 until 2) m(j)(q) += cv(j) / sigma * vecs(e)(q)
      }
    }
    var y0 = yt0; var y1 = yt1
    var j = 0
    while (j < d) {
      val xc = x(j) - xt(j)
      y0 += xc * m(j)(0); y1 += xc * m(j)(1)
      j += 1
    }
    (y0, y1)
  }

  /** Project `inputs` columns to 2-D columns (`outPrefix`x, `outPrefix`y)
    * through the LAMP map defined by `controls`.
    */
  def project(df: DataFrame, inputs: Seq[String], controls: Array[Control],
              outPrefix: String = "lamp_"): DataFrame = {
    val kernel = udf((xs: Seq[Double]) => projectPoint(xs.toArray, controls))
    val packed: Column = array(inputs.map(c => col(c).cast("double")): _*)
    df.withColumn("__lamp", kernel(packed))
      .withColumn(s"${outPrefix}x", col("__lamp._1"))
      .withColumn(s"${outPrefix}y", col("__lamp._2"))
      .drop("__lamp")
  }

  /** Reference-faithful control points: per-category centroids
    * (`CentroidsSketch` feeds LAMP in hiero), laid out on a circle.
    */
  def centroidControls(df: DataFrame, category: String,
                       numerics: Seq[String]): Array[Control] = {
    val cents = Stats.centroids(df, category, numerics)
      .orderBy(col(category).asc_nulls_first)
      .collect()
    val k = cents.length
    cents.zipWithIndex.map { case (r, i) =>
      val x = numerics.indices.map(j => r.getDouble(2 + j)).toArray
      val theta = 2 * math.Pi * i / k
      Control(x, math.cos(theta), math.sin(theta))
    }
  }
}
