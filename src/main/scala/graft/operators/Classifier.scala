package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed n-gram features — the
  * discriminative sibling of DSIR ([[Sampling.importanceWeights]]) and
  * the shape of the fastText/CCNet-style filters real pipelines train to
  * separate a reference corpus (Wikipedia, curated text) from raw crawl:
  * logistic regression on a BUCKETS-sized hashed bag-of-n-grams, trained
  * by full-batch gradient descent, scored map-side.
  *
  * Scale shape: the model is sketch-sized (buckets + 1 doubles) and lives
  * on the driver between iterations, exactly like DSIR's bucket models
  * and the k-means centroid loop; each iteration is two linear shuffles
  * over the (id, bucket, tf) feature frame (doc-keyed margins, then
  * bucket-keyed gradient) and one buckets-sized collect. The feature
  * frame is built ONCE and cached — iterations never re-read text. Real
  * deployments train on a corpus SAMPLE (pass md5-sampled frames; the
  * weights are what scales) and score the full corpus with
  * [[scoreLogistic]], a pure per-row expression.
  *
  * Determinism: features are md5-bucketed (the engine's portable hash
  * convention), per-doc tf and per-bucket gradients accumulate through
  * [[Det.dsum]] (exact decimal), residuals and weights round to 6
  * decimals each pass — so training is BIT-IDENTICAL across runs,
  * partitionings, and cluster sizes (pinned in ClassifierSpec).
  */
object Classifier {

  /** Trained model: bias + per-bucket weights (all rounded to 6). */
  final case class LogisticModel(bias: Double, weights: Array[Double]) {
    def buckets: Int = weights.length
  }

  /** (id, bucket, tf) hashed bag-of-n-grams: tf = the bucket's share of
    * the doc's shingles, rounded to 6 (length-normalized so weights are
    * document-length-invariant). Docs with no shingles produce no rows.
    */
  def features(df: DataFrame, idCol: String, textCol: String,
               n: Int = 2, buckets: Int = 1024): DataFrame = {
    val sh = Sampling.hashedNgramBuckets(df, idCol, textCol, n, buckets)
    val counts = sh.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    // per-doc totals fold the (much smaller) bucket counts, not a second
    // full pass over the exploded shingle frame: Σ_b C(id,b) ≡ C(id)
    // exactly (long sums), and the shuffle carries one row per (id,
    // bucket) instead of one per shingle occurrence
    val totals = counts.groupBy(col(idCol)).agg(sum(col("__c")).as("__t"))
    counts.join(totals, Seq(idCol))
      .select(col(idCol), col("__b").as("bucket"),
        round(col("__c") / col("__t"), 6).as("tf"))
  }

  /** Full-batch logistic regression: minimize mean log-loss + (l2/2)·|w|²
    * over {pos → 1, neg → 0} via `iters` fixed gradient steps (no early
    * stop — determinism over cleverness). The default `lr` is
    * guaranteed-stable for tf-share features: per-doc squared feature
    * norm ≤ 1 (shares sum to 1) + 1 (the implicit bias feature), so the
    * logistic Hessian's spectral norm is ≤ 0.25 · 2 = 0.5 and any
    * lr < 2 / 0.5 = 4 cannot oscillate — larger values were measured to
    * diverge on separable fixtures.
    * Ids must be unique within each frame; a doc in both
    * frames contributes one row per side, which is also well-defined.
    */
  /** The labeled training-feature frame — (__lid, bucket, tf, __y),
    * REPARTITIONED on __lid so that, once persisted, every gradient
    * pass's margin aggregation (groupBy __lid, __y — satisfied by the
    * __lid hash partitioning) and the feats ⋈ resid join (both sides
    * derive from the cache) reuse the cached partitioning instead of
    * re-exchanging per pass. Partition count stays the session's shuffle
    * default (scale-adaptive). Exposed private[graft] so the spec can
    * pin the no-feats-side-Exchange plan shape.
    */
  private[graft] def labeledFeatures(pos: DataFrame, neg: DataFrame,
                                     idCol: String, textCol: String,
                                     n: Int, buckets: Int): DataFrame = {
    // disambiguate colliding ids across sides; labels ride the feature rows
    val labeled = pos.select(col(idCol), col(textCol), lit(1.0).as("__y"))
      .unionByName(neg.select(col(idCol), col(textCol), lit(0.0).as("__y")))
      .select(concat(col("__y").cast("int"), lit("_"), col(idCol).cast("string")).as("__lid"),
        col(textCol), col("__y"))
    features(labeled, "__lid", textCol, n, buckets)
      .join(labeled.select(col("__lid"), col("__y")), Seq("__lid"))
      .repartition(col("__lid"))
  }

  /** One pass's per-doc residuals σ(m) − y over the (cached) feature
    * frame — rounded to 6, the one lossy step per pass (shared with the
    * weight rounding). Private[graft] for the plan-shape spec.
    */
  private[graft] def residFrame(feats: DataFrame,
                                wLit: org.apache.spark.sql.Column,
                                bias: Double): DataFrame =
    feats
      .groupBy(col("__lid"), col("__y"))
      .agg((Det.dsum(col("tf") * element_at(wLit, col("bucket") + 1)) + lit(bias))
        .as("__m"))
      .select(col("__lid"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__m"))) - col("__y"), 6).as("__r"))

  /** One pass's gradient frame: bucket gradients Σ r·tf with the bias
    * gradient Σ r riding the same aggregation under sentinel bucket −1
    * (real buckets are 0-based; dsum is exact decimal and
    * order-independent, so the weights stay bit-identical).
    * Private[graft] for the plan-shape spec.
    */
  private[graft] def gradientFrame(feats: DataFrame, resid: DataFrame): DataFrame =
    feats.join(resid, Seq("__lid"))
      .select(col("bucket"), (col("__r") * col("tf")).as("__c"))
      .unionByName(resid.select(lit(-1).as("bucket"), col("__r").as("__c")))
      .groupBy(col("bucket")).agg(Det.dsum(col("__c")).as("g"))

  def trainLogistic(pos: DataFrame, neg: DataFrame, idCol: String, textCol: String,
                    n: Int = 2, buckets: Int = 1024, iters: Int = 30,
                    lr: Double = 3.0, l2: Double = 1e-4): LogisticModel = {
    require(iters >= 1 && buckets >= 2)
    // persisted pre-partitioned (see labeledFeatures): 30 iterations,
    // zero feats-side Exchanges — pinned in ClassifierSpec
    val feats = labeledFeatures(pos, neg, idCol, textCol, n, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = feats.select(col("__lid")).distinct().count().toDouble
      require(nDocs > 0, "no training documents with features")
      var bias = 0.0
      var w = Array.fill(buckets)(0.0)
      var it = 0
      while (it < iters) {
        val wLit = typedlit(w.toIndexedSeq)
        // residuals persisted per pass — referenced by both union sides
        // of the gradient frame; without the pin both references re-run
        // the margin aggregation (MEASURED +0.5 s/pass at sf0.1)
        val resid = residFrame(feats, wLit, bias)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // ONE Spark job per pass (this loop ran TWO actions per
          // iteration) — see gradientFrame
          val g = gradientFrame(feats, resid)
            .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          val gBias = g.getOrElse(-1, 0.0)
          w = Array.tabulate(buckets)(b =>
            Det.round6(w(b) - lr * (g.getOrElse(b, 0.0) / nDocs + l2 * w(b))))
          bias = Det.round6(bias - lr * gBias / nDocs)
        } finally { resid.unpersist(); () }
        it += 1
      }
      LogisticModel(bias, w)
    } finally { feats.unpersist(); () }
  }

  /** Map-side scoring: (id, score) with score = σ(bias + w·tf) rounded 6.
    * Docs with no shingles score σ(bias) — the prior. One linear pass;
    * the model rides the plan as a literal.
    */
  def scoreLogistic(df: DataFrame, idCol: String, textCol: String,
                    model: LogisticModel, n: Int = 2): DataFrame = {
    val f = features(df, idCol, textCol, n, model.buckets)
    val wLit = typedlit(model.weights.toIndexedSeq)
    val m = f.groupBy(col(idCol))
      .agg((Det.dsum(col("tf") * element_at(wLit, col("bucket") + 1)) + lit(model.bias))
        .as("__m"))
    df.select(col(idCol)).distinct()
      .join(m, Seq(idCol), "left")
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-coalesce(col("__m"), lit(model.bias)))), 6)
          .as("score"))
  }

  /** Map-side LOGIT serving — the deployment half under the exact-oracle
    * contract: (id, logit) with logit = round6(bias + Σ_b tf_b·w_b), the
    * dot product accumulated through [[Det.dsum]] (exact DECIMAL(30,6)).
    * Unlike [[scoreLogistic]] (sigmoid probabilities — exp() is not
    * bit-portable across libms), a logit is literal-weight lookup +
    * exact decimal sum + one IEEE add and round: every step re-derives
    * bit-identically in any engine with md5 and decimal arithmetic, so a
    * SQL oracle can replay the whole featurize-and-dot pass. Ranking by
    * logit ≡ ranking by σ(logit) (σ is monotone), so a serving gate
    * loses nothing thresholding logits instead of probabilities. Docs
    * with no shingles (null text, single token) emit the bare bias —
    * the model's prior.
    */
  def logitScore(df: DataFrame, idCol: String, textCol: String,
                 model: LogisticModel, n: Int = 2): DataFrame = {
    val f = features(df, idCol, textCol, n, model.buckets)
    val wLit = typedlit(model.weights.toIndexedSeq)
    val m = f.groupBy(col(idCol))
      .agg(Det.dsum(col("tf") * element_at(wLit, col("bucket") + 1)).as("__m"))
    df.select(col(idCol)).distinct()
      .join(m, Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("__m"), lit(0.0)) + lit(model.bias), 6).as("logit"))
  }

  /** Mean log-loss of a model on a labeled (pos, neg) pair — the
    * train-progress metric ClassifierSpec pins as decreasing.
    */
  def logLoss(model: LogisticModel, pos: DataFrame, neg: DataFrame,
              idCol: String, textCol: String, n: Int = 2): Double = {
    def side(df: DataFrame, y: Double): DataFrame =
      scoreLogistic(df, idCol, textCol, model, n)
        .select((lit(-1.0) * (lit(y) * log(greatest(col("score"), lit(1e-12))) +
          lit(1.0 - y) * log(greatest(lit(1.0) - col("score"), lit(1e-12))))).as("l"))
    val all = side(pos, 1.0).unionByName(side(neg, 0.0))
    all.agg(avg(col("l"))).head().getDouble(0)
  }
}
