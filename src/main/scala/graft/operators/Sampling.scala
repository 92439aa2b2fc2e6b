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
