package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Det

/** Structured Streaming mode for the `events` table (SURVEY.md §2.9,
  * build-plan P5): the same event-time window expressions as the batch
  * `TimeWindows`, run under `readStream` with a watermark, by file-replay
  * of the fixture parquet. The batch results are the correctness oracle —
  * StreamingSpec asserts stream ≡ batch, and the catalog exposes the
  * streaming tumbling query against the same DuckDB SQL as its batch twin.
  *
  * Scale: the streaming plan keeps the batch shuffle shape (partial
  * aggregation per micro-batch into a state store keyed by window), and
  * the watermark bounds state — rows later than it are dropped, so state
  * tracks the window width and key cardinality, not the stream length.
  */
object StreamWindows {

  private val nameSeq = new AtomicLong(0)

  /** The events fixture as a replayed stream (schema from the parquet
    * footer; nanos→µs conversion identical to Tables.open).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file stream source wants a directory — replay the sf dir with a
    // glob filter selecting just the events file
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Drive a streaming aggregation to completion over all available input
    * (Trigger.AvailableNow) and return the final result from the memory
    * sink. Complete output mode: the sink holds the full aggregate, the
    * watermark still exercises the state-store path.
    */
  def runToResult(stream: DataFrame, label: String): DataFrame = {
    val spark = stream.sparkSession
    val name = s"graft_stream_${label}_${nameSeq.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    spark.table(name)
  }

  /** Tumbling windows, streamed: counts + exact value sums per
    * (1h window, event_type) with a 1h watermark — the streaming twin of
    * the batch `events_time_window` query (same output schema).
    */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame =
    runToResult(
      eventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value"))
        .select(Det.fmtTs(col("w.start")).as("window_start"),
          col("event_type"), col("cnt"), col("sum_value")),
      "tumbling")

  /** Sliding 1h/15m windows, streamed (epoch-seconds start). */
  def sliding(spark: SparkSession, sfDir: String): DataFrame =
    runToResult(
      eventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp(col("w.start")).as("ws_epoch"),
          col("event_type"), col("cnt")),
      "sliding")

  /** Session windows (30 min gap), streamed. */
  def session(spark: SparkSession, sfDir: String): DataFrame =
    runToResult(
      eventsStream(spark, sfDir)
        .withWatermark("ts", "30 minutes")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), Det.fmtTs(col("w.start")).as("session_start"), col("cnt")),
      "session")
}
