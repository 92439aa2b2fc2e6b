package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVectorDot, HyperplaneSignature, NearestCentroids}

/** Spark-native packaging of the engine's custom Catalyst expressions:
  * set `spark.sql.extensions=graft.GraftExtensions` on the cluster (or
  * `builder.withExtensions(new GraftExtensions)`) and `graft_fdot`,
  * `graft_nearest_centroids`, and `graft_hyperplane_sig` resolve in
  * every session of the application — `spark.sql` included — without a
  * per-session `VectorExprs.register` call. The imperative register
  * path stays for ad-hoc sessions; both feed the same expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_fdot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_fdot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroids].getName, "graft_nearest_centroids"),
      (exprs: Seq[Expression]) => NearestCentroids(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSignature(exprs.head, exprs(1))))
  }
}
