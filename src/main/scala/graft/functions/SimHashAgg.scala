package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SimHash (Charikar random-hyperplane sketch over token hashes) as a
  * typed Aggregator: input = 64-bit token hash, state = 64 signed
  * accumulators, output = 64-bit fingerprint (bit b set iff accumulator b
  * positive). Near-duplicate docs have small Hamming distance.
  *
  * Commutative-monoid shape — exactly the reference's ISketch contract
  * (SURVEY.md §1.3): per-partition partials merge by vector addition.
  */
class SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) {
      if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(r: Array[Long]): Long = {
    var out = 0L
    var i = 0
    while (i < 64) { if (r(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimHashAgg {
  /** Column form: simhash(tokenHashCol) → long fingerprint. */
  def simhash(tokenHash: Column): Column =
    udaf(new SimHashAgg, Encoders.scalaLong).apply(tokenHash)
}
