package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Funnels

/** Streaming product analytics (SURVEY.md §2.9): conversion funnel and
  * cohort retention maintained over an event STREAM, as two layers with
  * the sketch-table split of responsibilities:
  *
  *  1. STATE — one streaming aggregation compacts the arriving log into a
  *     per-user funnel-event table: `user_id -> [(ts, step type)]`,
  *     filtered map-side to the k funnel step types before the shuffle.
  *     This is the only stage that touches the raw stream, and it is a
  *     single stateful shuffle keyed by user; state size is each user's
  *     FUNNEL-RELEVANT events (the log filtered to k types), not the
  *     event log — the same compaction a production deployment would
  *     TTL with a watermark per closed funnel window.
  *  2. ROLLUP — the anchor fold + step counts run over the compact state
  *     table by the SAME batch operator ([[Funnels.funnel]]), re-run per
  *     trigger: anchors are per-user minima over a handful of rows, so
  *     the rollup never rescans the log (the mergeable-sketch-table
  *     model: maintain cheap state continuously, answer from the state).
  *
  * Correctness: the state table carries exactly the multiset of funnel-
  * type events seen, so the rollup equals the batch funnel over the full
  * log by construction — pinned stream ≡ batch in StreamingSpec and by
  * the catalog row sharing `events_funnel`'s DuckDB oracle.
  */
object StreamFunnels {

  /** The per-user funnel-event state table, driven to completion over the
    * replayed fixture stream (memory sink, complete mode — the state IS
    * the aggregate).
    */
  def userFunnelState(spark: SparkSession, sfDir: String,
                      steps: Seq[String]): DataFrame =
    StreamWindows.runToResult(
      StreamWindows.eventsStream(spark, sfDir)
        .filter(col("event_type").isin(steps: _*))
        .groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts"), col("event_type"))).as("evts")),
      "funnel_state")

  /** Streamed ordered funnel: (step, event_type, n_users) — the batch
    * funnel's output schema, computed from the maintained state.
    */
  def funnel(spark: SparkSession, sfDir: String,
             steps: Seq[String]): DataFrame = {
    val st = userFunnelState(spark, sfDir, steps)
    Funnels.funnel(
      st.select(col("user_id"), explode(col("evts")).as("e"))
        .select(col("user_id"), col("e.ts").as("ts"),
          col("e.event_type").as("event_type")),
      "user_id", "event_type", "ts", steps)
  }

  /** Per-user activity state for retention: each user's DISTINCT active
    * days, maintained by one streaming aggregation (events collapse
    * map-side to (user, day) before the shuffle; `collect_set` dedups in
    * state, so state size is user-days — bounded by calendar span, not
    * event volume).
    */
  def userActivityState(spark: SparkSession, sfDir: String): DataFrame =
    StreamWindows.runToResult(
      StreamWindows.eventsStream(spark, sfDir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"))
        .agg(collect_set(col("day")).as("days")),
      "retention_state")

  /** Streamed weekly cohort retention: (cohort_week, week_offset,
    * n_users) — the batch schema, computed from the compact user-day
    * state (which carries exactly the distinct (user, day) set the batch
    * operator reduces the log to, so stream ≡ batch by construction).
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val st = userActivityState(spark, sfDir)
    Funnels.retention(
      st.select(col("user_id"), explode(col("days")).as("ts")),
      "user_id", "ts")
  }

  /** Hourly per-type window counts maintained as streaming state — the
    * anomaly detector's state layer (one watermarked tumbling
    * aggregation; state size is windows × types, never event volume).
    */
  def windowCountState(spark: SparkSession, sfDir: String): DataFrame =
    StreamWindows.runToResult(
      StreamWindows.eventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(graft.operators.Det.fmtTs(col("w.start")).as("window_start"),
          col("event_type"), col("cnt")),
      "anomaly_state")

  /** Streamed anomaly detection: z-scored window counts from the
    * maintained state table, by the same exact-integer-moment rollup as
    * the batch operator — counts are identical multisets, moments are
    * integer sums, so stream ≡ batch holds bit-for-bit (pinned in
    * StreamingSpec and by the catalog row sharing `events_anomaly`'s
    * oracle).
    */
  def anomalies(spark: SparkSession, sfDir: String,
                zThreshold: Double = 2.0): DataFrame =
    Funnels.anomaliesFromWindowCounts(
      windowCountState(spark, sfDir), "event_type", zThreshold)
}
