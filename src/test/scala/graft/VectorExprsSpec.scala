package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.operators.Similarity

/** Native FloatVectorDot vs the lambda-fold baseline: bit-identical
  * results (same sequential double accumulation), and the expression
  * stays inside whole-stage codegen.
  */
class VectorExprsSpec extends SparkSpec {

  private lazy val emb = sources.Tables.open(spark, sf, "embeddings")

  test("native fdot is bit-identical to the fold dot on every fixture vector") {
    VectorExprs.register(spark)
    val both = emb.select(
      Similarity.dot(col("embedding"), col("embedding")).as("fold"),
      VectorExprs.fdot(col("embedding"), col("embedding")).as("native"))
    assert(both.filter(col("fold") =!= col("native")).count() == 0)
    // and against a distinct vector (self-join a shifted copy)
    val a = emb.select(col("vec_id"), col("embedding").as("va"))
    val b = emb.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("vb"))
    val cross = a.join(b, "vec_id")
    assert(cross.filter(
      Similarity.dot(col("va"), col("vb")) =!= VectorExprs.fdot(col("va"), col("vb"))
    ).count() == 0)
  }

  test("fdot participates in whole-stage codegen") {
    VectorExprs.register(spark)
    val plan = emb.select(VectorExprs.fdot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [graft_fdot"), s"no codegen span:\n$plan")
  }

  test("fdot is null-safe") {
    VectorExprs.register(spark)
    val row = emb.limit(1)
      .select(VectorExprs.fdot(lit(null).cast("array<float>"), col("embedding")).as("d"))
      .head()
    assert(row.isNullAt(0))
  }
}
