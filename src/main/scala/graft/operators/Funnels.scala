package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream: ordered-step funnel
  * conversion and cohort retention — the interactive drill-down queries an
  * analytics engine runs on its `events` table (extends the reference's
  * event windowing toward the standard product-analytics family).
  *
  * Both are compositions of linear user-keyed aggregations — no windows
  * over the full event log, no per-user state bigger than a few
  * timestamps — so they hold their shape at 100 TB: every shuffle is
  * keyed by user (or cohort), and step/offset cardinality is tiny.
  */
object Funnels {

  /** Ordered funnel: for each user, step 1 anchors at the user's EARLIEST
    * `steps(0)` event; step i+1 at the earliest `steps(i+1)` event
    * STRICTLY AFTER the user's step-i time. Returns one row per step:
    * (step, event_type, n_users) — the classic conversion funnel, with
    * strictly-increasing timestamps guaranteeing each step is a distinct
    * later event.
    *
    * Shape: one filtered min-aggregation per step joined user-keyed to
    * the previous frontier (k tiny linear shuffles for a k-step funnel;
    * the per-step frames are (user, ts) pairs, never raw events). The
    * single-pass window alternative (collect each user's full sorted
    * event list) ships every event of every user through one task per
    * user — strictly worse at scale.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var frontier = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val counts = scala.collection.mutable.ListBuffer[DataFrame]()
    def stepRow(i: Int, name: String, f: DataFrame): DataFrame =
      f.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).cast("int").as("step"),
          lit(name).as("event_type"), col("n_users"))
    counts += stepRow(0, steps.head, frontier)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      frontier = events.filter(col(typeCol) === st)
        .join(frontier, Seq(userCol))
        .filter(col(tsCol) > col("__t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      counts += stepRow(i, st, frontier)
    }
    counts.reduce(_.unionByName(_))
  }

  /** Window-count anomaly detection: bucket events into fixed windows
    * per `typeCol`, score each (window, type) count against that type's
    * mean/stddev across windows, keep |z| > `zThreshold`. The monitoring
    * query over an event pipeline ("which hours spiked?").
    *
    * Determinism note (engine-portable on purpose): moments are computed
    * from EXACT integer sums (Σcnt, Σcnt² as longs — counts are
    * integers), converted to double only in the final z expression, so
    * Spark's unordered distributed aggregation and a single-threaded
    * oracle produce bit-identical scores. Two linear shuffles (window
    * counts, per-type moments — the latter sketch-sized).
    */
  def countAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                     width: String = "1 hour",
                     zThreshold: Double = 2.0): DataFrame =
    anomaliesFromWindowCounts(
      events
        .groupBy(window(col(tsCol), width).as("w"), col(typeCol))
        .agg(count(lit(1)).as("cnt"))
        .select(Det.fmtTs(col("w.start")).as("window_start"), col(typeCol), col("cnt")),
      typeCol, zThreshold)

  /** The z-score rollup half of [[countAnomalies]], over an
    * already-maintained `(window_start, type, cnt)` table — the
    * state/rollup split ([[graft.streaming.StreamFunnels]] maintains the
    * window counts as streaming state and answers anomalies from here
    * without rescanning the log). Same exact-integer-moment determinism
    * contract as the fused form.
    */
  def anomaliesFromWindowCounts(w: DataFrame, typeCol: String,
                                zThreshold: Double = 2.0): DataFrame = {
    val mom = w.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
    val mu = col("s1") * lit(1.0) / col("n")
    val varS = (col("s2") - col("s1") * col("s1") * lit(1.0) / col("n")) / (col("n") - 1)
    w.join(broadcast(mom), Seq(typeCol))
      // n > 1 AND variance > 0, tested in EXACT integer arithmetic
      // (n·s2 > s1² ⟺ var > 0): a type whose every window has the same
      // count has no z-score (and would divide by zero under ANSI)
      .filter(col("n") > 1 && col("s2") * col("n") > col("s1") * col("s1"))
      .withColumn("z", round((col("cnt") - mu) / sqrt(varS), 6))
      .filter(abs(col("z")) > zThreshold)
      .select(col("window_start"), col(typeCol), col("cnt"), col("z"))
  }

  /** Cohort retention: bucket every user by the WEEK of their first
    * event (cohort), then count, for each (cohort week, week offset ≥ 0),
    * the distinct users with any activity that week. Weeks are 7-day
    * buckets of `datediff(day)` from the corpus' earliest event date —
    * deterministic, engine-mirrorable arithmetic (no ISO-week
    * dependency). Returns (cohort_week, week_offset, n_users).
    *
    * Shape: the origin is one scalar aggregate (sketch-sized collect by
    * contract); activity dedups to (user, week) pairs in one shuffle;
    * cohorts are a user-keyed min; the final rollup is keyed by
    * (cohort, offset) — all linear, the (user, week) table is the
    * largest intermediate and is |users|·|active weeks|, far smaller
    * than the event log.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val originRow = events.agg(min(to_date(col(tsCol)))).head()
    require(!originRow.isNullAt(0), "retention: events table has no timestamps")
    val origin = originRow.getDate(0)
    val week = floor(datediff(to_date(col(tsCol)), lit(origin)) / 7).cast("long")
    val userWeeks = events.select(col(userCol), week.as("w")).distinct()
    val cohorts = userWeeks.groupBy(col(userCol)).agg(min(col("w")).as("cw"))
    userWeeks.join(cohorts, Seq(userCol))
      .groupBy(col("cw").as("cohort_week"),
        (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}
