package graft.operators

import org.apache.spark.sql.DataFrame

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
