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

  test("gradient passes reuse the cached __lid partitioning (no feats-side Exchange)") {
    // the round-21 optimization contract: feats persists repartition'd on
    // __lid, so the per-pass margin aggregation needs NO exchange (its
    // grouping keys ⊇ the cache partitioning keys) and the feats ⋈ resid
    // gradient join re-exchanges NEITHER side — the only shuffle left per
    // pass is the sketch-sized bucket-keyed gradient rollup
    // AQE's AdaptiveSparkPlanExec hides the operator tree from collect();
    // the shape under test is the static planner's (AQE only coalesces)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val feats = Classifier.labeledFeatures(pos, neg, "doc_id", "text", 2, 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      feats.count() // materialize the cache so plans build on it
      def shuffles(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      val resid = Classifier.residFrame(feats, typedlit(Seq.fill(64)(0.0)), 0.0)
      assert(shuffles(resid).isEmpty,
        s"margin aggregation re-exchanged the cached feature frame:\n" +
          resid.queryExecution.executedPlan)
      val g = Classifier.gradientFrame(feats, resid)
      val gShuffles = shuffles(g)
      assert(gShuffles.size == 1 &&
        gShuffles.head.outputPartitioning.toString.contains("bucket"),
        s"expected only the bucket-keyed gradient exchange:\n" +
          g.queryExecution.executedPlan)
    } finally {
      feats.unpersist()
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }
}
