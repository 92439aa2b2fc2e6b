package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VectorExprs

/** Spark-native packaging of the engine's custom Catalyst expressions:
  * set `spark.sql.extensions=graft.GraftExtensions` on the cluster (or
  * `builder.withExtensions(new GraftExtensions)`) and every function in
  * `VectorExprs.functionTable` resolves in all sessions of the
  * application — `spark.sql` included — without a per-session
  * `VectorExprs.register` call. Both registration paths consume the same
  * table, so they cannot diverge.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    VectorExprs.functionTable.foreach { case (name, arity, build) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorExprs.type].getName, name),
        VectorExprs.builderFor(name, arity, build)))
    }
}
