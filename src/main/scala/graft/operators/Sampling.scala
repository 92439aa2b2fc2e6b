package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row sampling — `ref:P/sketches/RandomSamplingSketch.java` and the
  * resolution-aware sampled histograms of paper §4.1.
  */
object Sampling {

  /** Seeded uniform sample (reference seeds per-leaf; Spark seeds per
    * partition deterministically from `seed`).
    */
  def uniform(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Seeded stratified sample: per-stratum fractions over a key column —
    * the training-data mixing primitive (rebalance languages / sources /
    * quality tiers without a shuffle; sampleBy filters per partition).
    * Strata absent from `fractions` are dropped (fraction 0).
    */
  def stratified(df: DataFrame, column: String, fractions: Map[String, Double],
                 seed: Long = 42L): DataFrame =
    df.stat.sampleBy(column, fractions, seed)

  /** Temperature-scaled source mixing — the corpus-rebalancing step of a
    * training-data pipeline: source s with n_s rows is sampled at a rate
    * that makes its share of the output ∝ n_s^(1/T), clamped at keeping
    * every row. T = 1 preserves natural proportions; T → ∞ flattens
    * toward uniform shares; T < 1 sharpens toward the biggest sources.
    *
    * Scale shape: one count aggregation (sources are FEW — the collected
    * table is sketch-sized), then `sampleBy`, which filters per partition
    * with no shuffle. Seeded and deterministic per partition.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, temperature: Double,
                     targetRows: Long, seed: Long = 42L): DataFrame = {
    require(temperature > 0, "temperature must be > 0")
    val counts = df.groupBy(sourceCol).count()
      .collect() // one row per SOURCE — sketch-sized by contract
      .map(r => r.get(0) -> r.getLong(1))
    val scaled = counts.map { case (k, n) => (k, n, math.pow(n.toDouble, 1.0 / temperature)) }
    val z = scaled.map(_._3).sum
    val fractions: Map[Any, Double] = scaled.map { case (k, n, p) =>
      k -> math.min(1.0, targetRows * p / z / n.toDouble)
    }.toMap
    df.stat.sampleBy(df(sourceCol), fractions, seed)
  }

  /** Exactly-k uniform sample PER GROUP — the "n examples per language /
    * source / quality tier" primitive `sampleBy` cannot express (a
    * fraction yields a binomial count, not exactly k; tiny strata come
    * back empty). Bottom-k-by-hash: rank rows by `xxhash64(id, seed)`
    * and keep each group's k smallest — over the hash's uniform order
    * this IS a simple random sample without replacement, and unlike a
    * true reservoir it is DETERMINISTIC under any partitioning and
    * merge order (hash ties broken by id; a collision only perturbs
    * which of the colliding rows enters, never the sample size).
    *
    * Shape: one [[graft.functions.NextKPageAgg]] bounded buffer per
    * (group, partition) carrying the FULL ROW as payload behind the
    * (hash, id) sort prefix, so only `partitions · groups · k` rows
    * shuffle and no join back to the corpus is needed — the
    * `row_number().over(partitionBy(group).orderBy(hash))` form this
    * replaces sorts every group's entire row set through one task per
    * group (parity-pinned in the spec). Groups with < k rows return all
    * their rows.
    *
    * Extends the reference's uniform `RandomSamplingSketch` to grouped
    * exact-size samples (not present there).
    */
  def uniformPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    graft.functions.VectorExprs.register(df.sparkSession)
    val payload = df.columns.filter(c => c != groupCol && c != idCol)
    // the (hash, id) prefix is unique so payload fields never decide a
    // comparison, but the page comparator is built over the whole key —
    // fail loudly on non-orderable payload (map<,>) rather than at codegen
    payload.foreach { c =>
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(df.schema(c).dataType),
        s"uniformPerGroup payload column '$c' has non-orderable type " +
          s"${df.schema(c).dataType.simpleString}; project it out first")
    }
    val keyCols = Seq(xxhash64(col(idCol), lit(seed)).as("__h"), col(idCol)) ++
      payload.map(col)
    val flags = Seq.fill(keyCols.length)(true)
    df.groupBy(col(groupCol))
      .agg(call_function("graft_nextk_page",
        struct(keyCols: _*), typedlit(flags), lit(k)).as("pg"))
      .select(col(groupCol), explode(col("pg")).as("e"))
      .select(col(groupCol) +: col(s"e.key.$idCol").as(idCol) +:
        payload.toIndexedSeq.map(c => col(s"e.key.$c").as(c)): _*)
  }

  /** Resolution-aware sampling rate (paper §4.1): a histogram rendered at
    * `pixelHeight` with `buckets` bars is statistically indistinguishable
    * from exact when built on ~ c·buckets·pixelHeight² samples (Chernoff
    * argument). Returns min(1, that / rowCount).
    */
  def resolutionRate(rowCount: Long, buckets: Int, pixelHeight: Int,
                     c: Double = 5.0): Double = {
    if (rowCount <= 0) 1.0
    else math.min(1.0, c * buckets.toDouble * pixelHeight * pixelHeight / rowCount)
  }
}
