package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / analytic / time windows.
  *
  * Ranking+frames are beyond the reference surface (north star ⊇
  * reference); time windows cover the `events` capability row
  * (SURVEY.md §2.9). All are single-shuffle on the partition keys.
  */
object Windows {

  private def spec(partitionBy: Seq[String], orderBy: Seq[SortKey]) = {
    val w = if (partitionBy.isEmpty) Window.partitionBy()
            else Window.partitionBy(partitionBy.map(col).toIndexedSeq: _*)
    w.orderBy(orderBy.map(_.toCol).toIndexedSeq: _*)
  }

  /** Top-n per group via row_number (orderBy must be a total order inside
    * each partition for determinism).
    */
  def topNPerGroup(df: DataFrame, partitionBy: Seq[String],
                   orderBy: Seq[SortKey], n: Int,
                   rankCol: String = "rn"): DataFrame =
    df.withColumn(rankCol, row_number().over(spec(partitionBy, orderBy)))
      .filter(col(rankCol) <= n)

  def withRank(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[SortKey],
               dense: Boolean = false, rankCol: String = "rk"): DataFrame =
    df.withColumn(rankCol,
      (if (dense) dense_rank() else rank()).over(spec(partitionBy, orderBy)))

  def withLag(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[SortKey],
              valueCol: String, offset: Int = 1,
              outCol: String = "lag_val"): DataFrame =
    df.withColumn(outCol, lag(col(valueCol), offset).over(spec(partitionBy, orderBy)))

  def withLead(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[SortKey],
               valueCol: String, offset: Int = 1,
               outCol: String = "lead_val"): DataFrame =
    df.withColumn(outCol, lead(col(valueCol), offset).over(spec(partitionBy, orderBy)))

  /** Running total with a rows frame (exact decimal sum → double for
    * oracle determinism).
    */
  def runningSum(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[SortKey],
                 valueCol: String, outCol: String = "running_sum"): DataFrame = {
    val w = spec(partitionBy, orderBy)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, Det.dsumOver(col(valueCol), w))
  }
}

/** Event-time windows over a timestamp column (batch form; the streaming
  * form reuses the same expressions under readStream + watermark —
  * `graft.streaming.StreamWindows`, asserted stream ≡ batch by
  * StreamingSpec).
  */
object TimeWindows {

  /** Tumbling window aggregation; emits window_start as formatted string
    * (oracle: date_trunc equivalent).
    */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val g = df.groupBy((window(col(tsCol), duration).as("w") +: keys.map(col)).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
    g.withColumn("window_start", Det.fmtTs(col("w.start"))).drop("w")
  }

  /** Sliding window aggregation (slide < duration → overlapping windows). */
  def sliding(df: DataFrame, tsCol: String, duration: String, slide: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val g = df.groupBy((window(col(tsCol), duration, slide).as("w") +: keys.map(col)).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
    g.withColumn("window_start", Det.fmtTs(col("w.start"))).drop("w")
  }

  /** Session windows with a fixed inactivity gap. */
  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val g = df.groupBy((session_window(col(tsCol), gap).as("w") +: keys.map(col)).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
    g.withColumn("session_start", Det.fmtTs(col("w.start"))).drop("w")
  }
}
