package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Document-level fuzzy decontamination: candidates come from broadcast
  * LSH bands but every emitted pair is exact-Jaccard verified, so the
  * result is always a SUBSET of the exact train × eval pair set — and on
  * the fixture (planted near-dups at j ≥ 0.97, far above the 8×4 banding
  * knee) recall is 1.0, which the oracle row also pins at sf0.01.
  */
class FuzzyDecontamSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables.open(spark, sf, "documents")
  private lazy val train = docs.filter(col("doc_id") % 2 === 0)
  private lazy val evalSet = docs.filter(col("doc_id") % 2 === 1)

  /** Exact train × eval bigram Jaccard at ≥ 0.5, computed the quadratic
    * way (sf0.001 is tiny).
    */
  private lazy val exact: Map[(Long, Long), Double] = {
    val tg = TextOps.shingleSet(train, "doc_id", "text", 2)
      .select(col("doc_id").as("tid"), col("sh"))
    val eg = TextOps.shingleSet(evalSet, "doc_id", "text", 2)
      .select(col("doc_id").as("eid"), col("sh"))
    val tsz = tg.groupBy("tid").agg(count(lit(1)).as("n1"))
    val esz = eg.groupBy("eid").agg(count(lit(1)).as("n2"))
    tg.join(eg, Seq("sh"))
      .groupBy("tid", "eid").agg(count(lit(1)).as("i"))
      .join(tsz, Seq("tid")).join(esz, Seq("eid"))
      .select(col("tid"), col("eid"),
        (col("i") * lit(1.0) / (col("n1") + col("n2") - col("i"))).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private lazy val got: Map[(Long, Long), Double] =
    Dedup.contaminationFuzzy(train, evalSet, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("fixture recall 1.0: flagged pairs equal the exact cross-Jaccard set") {
    assert(got.keySet == exact.keySet,
      s"extra=${got.keySet -- exact.keySet} missing=${exact.keySet -- got.keySet}")
    got.foreach { case (k, j) =>
      assert(math.abs(j - exact(k)) < 1e-12, s"pair $k: jacc $j vs exact ${exact(k)}")
    }
    assert(exact.nonEmpty, "fixture should plant at least one even-odd near-dup pair")
  }

  test("no false positives: every flagged pair verifies at >= threshold") {
    got.values.foreach(j => assert(j >= 0.5))
  }

  test("an identical doc planted on both sides is flagged at jacc 1.0") {
    import spark.implicits._
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val tr = Seq((2L, txt)).toDF("doc_id", "text")
    val ev = Seq((3L, txt), (5L, "totally different words here now")).toDF("doc_id", "text")
    val flagged = Dedup.contaminationFuzzy(tr, ev, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(flagged == Map((2L, 3L) -> 1.0))
  }
}
