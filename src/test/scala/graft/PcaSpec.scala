package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Eigen/PCA checks: Jacobi correctness on known and random symmetric
  * matrices, and the end-to-end PCA projection invariants (decorrelated
  * outputs whose variances are the eigenvalues).
  */
class PcaSpec extends SparkSpec {

  test("Jacobi eigen solves a known 2x2 exactly") {
    val (vals, vecs) = Stats.symmetricEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val inv = 1.0 / math.sqrt(2.0)
    // eigenvectors defined up to sign
    assert(math.abs(math.abs(vecs(0)(0)) - inv) < 1e-12)
    assert(vecs(0)(0) * vecs(0)(1) > 0, "first eigenvector is (1,1)-directed")
    assert(vecs(1)(0) * vecs(1)(1) < 0, "second eigenvector is (1,-1)-directed")
  }

  test("Jacobi eigen satisfies A·v = λ·v on a random symmetric 6x6") {
    val rnd = new scala.util.Random(7)
    val n = 6
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rnd.nextDouble() * 4 - 2
      m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = Stats.symmetricEigen(m)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "eigenvalues sorted desc")
    assert(math.abs(vals.sum - (0 until n).map(i => m(i)(i)).sum) < 1e-9, "trace preserved")
    for (e <- 0 until n; i <- 0 until n) {
      val av = (0 until n).map(j => m(i)(j) * vecs(e)(j)).sum
      assert(math.abs(av - vals(e) * vecs(e)(i)) < 1e-8, s"A·v=λ·v fails at ($e,$i)")
    }
  }

  test("PCA projection decorrelates and carries eigenvalue variance") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = sources.Tables.open(spark, sf, "lineitem")
    val (_, eigvals, _) = Stats.pcaComponents(li, cols)
    val proj = Stats.pcaProject(li, cols, 2)
    val row = proj.agg(
      avg(col("pc_0")).as("m0"), avg(col("pc_1")).as("m1"),
      var_samp(col("pc_0")).as("v0"), var_samp(col("pc_1")).as("v1"),
      covar_samp(col("pc_0"), col("pc_1")).as("cv")).head()
    val scale0 = math.max(1.0, eigvals(0))
    assert(math.abs(row.getAs[Double]("m0")) < 1e-6 * scale0, "pc_0 centered")
    assert(math.abs(row.getAs[Double]("m1")) < 1e-6 * scale0, "pc_1 centered")
    assert(math.abs(row.getAs[Double]("v0") - eigvals(0)) < 1e-4 * scale0, "var(pc_0)=λ0")
    assert(math.abs(row.getAs[Double]("v1") - eigvals(1)) < 1e-4 * scale0, "var(pc_1)=λ1")
    assert(math.abs(row.getAs[Double]("cv")) < 1e-6 * scale0, "components decorrelated")
  }
}
