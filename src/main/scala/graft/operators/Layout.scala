package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for
  * data-skipping scans. The reference renders histograms over whatever
  * layout the loaded files have; at 100 TB the LAYOUT is the query
  * optimization — a 2-D range filter over a corpus laid out on a
  * space-filling curve touches O(perimeter) files instead of all of
  * them, because parquet row-group min/max stats become tight boxes on
  * BOTH dimensions at once (no single-column sort can do that for two
  * filter columns).
  */
object Layout {

  /** 32-bit → even-bit spread (Morton): pure bitwise Column arithmetic —
    * five mask-shift rounds, whole-stage codegen'd, no UDF.
    */
  private def spread(x: Column): Column = {
    val m = Seq(
      0x0000FFFF0000FFFFL -> 16,
      0x00FF00FF00FF00FFL -> 8,
      0x0F0F0F0F0F0F0F0FL -> 4,
      0x3333333333333333L -> 2,
      0x5555555555555555L -> 1)
    m.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (mask, sh)) =>
      (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(mask))
    }
  }

  /** Z-order (Morton) key of two int columns as an order-preserving
    * long: each input is biased to unsigned (so negative values sort
    * before positive, matching the natural 2-D order), bits are
    * interleaved x→even / y→odd, and the 64-bit result's sign bit is
    * flipped so SIGNED long comparison equals unsigned curve order.
    */
  def zOrderKey(x: Column, y: Column): Column = {
    val xb = x.cast("long") - Int.MinValue.toLong
    val yb = y.cast("long") - Int.MinValue.toLong
    spread(xb).bitwiseOR(shiftleft(spread(yb), 1))
      .bitwiseXOR(lit(Long.MinValue))
  }

  /** Write `df` to `path` clustered on the z-order curve of `(xCol,
    * yCol)`: range-partition into `numFiles` curve intervals (a range
    * exchange — the one shuffle; its bounds job samples the key, not
    * the data), sort each interval in place, drop the key, write. Each
    * output file then covers a compact curve segment, so its parquet
    * footer min/max on BOTH columns is a tight box and a 2-D range scan
    * prunes to the files whose boxes intersect the query box — the
    * data-skipping contract the spec pins against a hash layout.
    *
    * At 100 TB pick `numFiles` for file-sized outputs (the same sizing
    * contract as `Export.shuffleShards`); the curve key is 64-bit, so
    * two full 32-bit dimensions are supported losslessly.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zOrderKey(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
