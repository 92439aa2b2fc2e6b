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

  test("fdot returns null on length mismatch, matching the fold") {
    VectorExprs.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val r = df.select(
      VectorExprs.fdot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("fold")).head()
    assert(r.isNullAt(0), "native must refuse a ragged pair")
    assert(r.isNullAt(1), "fold baseline also yields null")
  }

  test("fdot is null-safe") {
    VectorExprs.register(spark)
    val row = emb.limit(1)
      .select(VectorExprs.fdot(lit(null).cast("array<float>"), col("embedding")).as("d"))
      .head()
    assert(row.isNullAt(0))
  }
}
