package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a typed Spark Aggregator.
  *
  * The reference's trickiest sketch (`ref:P/sketches/FreqKSketch.java`,
  * paper §4.4): k counters per partition, pairwise-mergeable, candidate
  * counts are lower bounds with error ≤ N/(k+1); every value with true
  * frequency > N/(k+1) is guaranteed present (no false negatives above
  * threshold).
  *
  * Algorithm (from the published Misra-Gries construction, not the
  * reference code):
  *  - reduce: increment; if > k counters, decrement all by the minimum
  *    excess and drop zeros;
  *  - merge: sum counts, then subtract the (k+1)-th largest count from all
  *    and drop non-positives (standard mergeable-summaries result).
  *
  * Scale: this is the shuffle-free path for unbounded-cardinality keys —
  * partial aggregation produces one ≤k-entry map per partition, merged on
  * the driver/reducer like the reference's merge tree. The exact
  * `HeavyHitters.exact` path shuffles (key, partialCount) pairs instead;
  * tests cross-check the two.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] = {
    val m = b.updatedWith(a) { c => Some(c.getOrElse(0L) + 1L) }
    if (m.size <= k) m else compress(m)
  }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val m = b2.foldLeft(b1) { case (acc, (v, c)) =>
      acc.updatedWith(v)(x => Some(x.getOrElse(0L) + c))
    }
    if (m.size <= k) m else compress(m)
  }

  /** Subtract the (k+1)-th largest count from every counter; drop ≤ 0. */
  private def compress(m: Map[String, Long]): Map[String, Long] = {
    val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
    m.collect { case (v, c) if c - d > 0 => v -> (c - d) }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Column form: mg_sketch(col) → map<string,bigint> of candidates. */
  def sketch(c: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(c)
}
