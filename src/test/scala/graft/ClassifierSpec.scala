package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Hashed-n-gram logistic classifier: planted separation, monotone
  * training loss, scoring contracts, and bit-determinism across
  * partitionings.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint planted vocabularies — a linearly separable fixture
  private def planted(nPerSide: Int): (org.apache.spark.sql.DataFrame,
                                        org.apache.spark.sql.DataFrame) = {
    val good = Seq("clean", "curated", "reference", "quality", "encyclopedic",
      "verified", "edited", "sourced")
    val bad = Seq("spam", "click", "win", "casino", "pills", "free", "xxx", "lottery")
    def mk(words: Seq[String], base: Long) = (0 until nPerSide).map { i =>
      val r = new scala.util.Random(base + i)
      (base + i, Seq.fill(12)(words(r.nextInt(words.length))).mkString(" "))
    }
    (mk(good, 1000L).toDF("doc_id", "text"), mk(bad, 2000L).toDF("doc_id", "text"))
  }

  private lazy val (pos, neg) = planted(30)
  private lazy val model =
    Classifier.trainLogistic(pos, neg, "doc_id", "text", n = 2, buckets = 256, iters = 40)

  test("training separates the planted vocabularies") {
    val ps = Classifier.scoreLogistic(pos, "doc_id", "text", model, n = 2)
      .agg(avg("score")).head().getDouble(0)
    val ns = Classifier.scoreLogistic(neg, "doc_id", "text", model, n = 2)
      .agg(avg("score")).head().getDouble(0)
    assert(ps > 0.6 && ns < 0.4, s"pos=$ps neg=$ns")
    // and every single doc lands on its side of 0.5: the fixture is
    // linearly separable, so train accuracy must be perfect
    val wrongP = Classifier.scoreLogistic(pos, "doc_id", "text", model, n = 2)
      .filter(col("score") <= 0.5).count()
    val wrongN = Classifier.scoreLogistic(neg, "doc_id", "text", model, n = 2)
      .filter(col("score") >= 0.5).count()
    assert(wrongP == 0 && wrongN == 0)
  }

  test("log-loss decreases with training") {
    val losses = Seq(1, 10, 40).map { it =>
      Classifier.logLoss(
        Classifier.trainLogistic(pos, neg, "doc_id", "text", n = 2,
          buckets = 256, iters = it),
        pos, neg, "doc_id", "text", n = 2)
    }
    assert(losses(0) > losses(1) && losses(1) > losses(2), losses.toString)
  }

  test("training is bit-deterministic across partitionings") {
    val m2 = Classifier.trainLogistic(pos.repartition(7), neg.repartition(3),
      "doc_id", "text", n = 2, buckets = 256, iters = 40)
    assert(m2.bias == model.bias)
    assert(m2.weights.toSeq == model.weights.toSeq)
  }

  test("scoring is a single linear pass that covers every doc") {
    val extra = Seq((9000L, null.asInstanceOf[String]), (9001L, "")).toDF("doc_id", "text")
    val scored = Classifier.scoreLogistic(pos.unionByName(extra), "doc_id", "text",
      model, n = 2)
    assert(scored.count() == pos.count() + 2)
    // featureless docs score the prior sigma(bias)
    val prior = operators.Det.round6(1.0 / (1.0 + math.exp(-model.bias)))
    val got = scored.filter(col("doc_id") >= 9000L).select("score")
      .collect().map(_.getDouble(0)).toSet
    assert(got == Set(prior), s"$got vs $prior")
  }

  test("the model is sketch-sized") {
    assert(model.weights.length == 256)
  }
}
