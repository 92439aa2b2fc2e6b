package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SketchTables

/** Sketch TABLES maintained under a STREAM (SURVEY.md §2.9 × the
  * mergeable-sketch-table model): the per-fine-group sketch build — the
  * only stage that touches raw events — runs as ONE streaming
  * aggregation (HLL sketches merge in the state store exactly as they
  * merge in a batch shuffle: same monoid), and every coarser rollup is
  * served from the compact sketch table by [[SketchTables]] merge ops,
  * never rescanning the stream.
  *
  * Correctness: Spark's HLL sketch aggregate is deterministic for a
  * given input SET (seed-fixed hash), and the stream delivers exactly
  * the batch's rows, so the streamed sketch table — and any rollup of
  * it — is BYTE-equal to the batch-built table: StreamingSpec pins
  * stream ≡ batch at the estimate level.
  */
object StreamSketches {

  /** Per-(week, day) HLL user sketch table, driven to completion over
    * the replayed fixture stream.
    */
  def dailyUserSketches(spark: SparkSession, sfDir: String): DataFrame =
    StreamWindows.runToResult(
      StreamWindows.eventsStream(spark, sfDir)
        .withColumn("day", to_date(col("ts")))
        .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        .groupBy(col("week"), col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("hll")),
      "sketch_table")

  /** Weekly distinct-user rollup answered from the STREAMED sketch
    * table — the batch `events_distinct_rollup` shape with the build
    * side live.
    */
  def weeklyDistinctRollup(spark: SparkSession, sfDir: String): DataFrame =
    SketchTables.hllEstimate(
      SketchTables.hllRollup(dailyUserSketches(spark, sfDir), Seq("week")))
}
