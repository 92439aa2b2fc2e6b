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

  /** n-tile bucketing per partition: rows split into `n` contiguous tiles
    * of sizes differing by at most one (earlier tiles larger) in the
    * window order — the quantile-cohort primitive. Deterministic when
    * `orderBy` is a total order; the assignment rule is the standard one
    * both engines implement identically.
    */
  def withNtile(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[SortKey],
                n: Int, outCol: String = "tile"): DataFrame = {
    require(n > 0, s"ntile n must be > 0, got $n")
    df.withColumn(outCol, ntile(n).over(spec(partitionBy, orderBy)))
  }

  /** Moving (sliding rows-frame) total of the `lookback` preceding rows
    * plus the current one — the fixed-depth trailing aggregate. Exact
    * decimal sum → double (Det.dsumOver), so the oracle replays it.
    */
  def movingSum(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[SortKey],
                valueCol: String, lookback: Int,
                outCol: String = "moving_sum"): DataFrame = {
    require(lookback >= 0, s"lookback must be >= 0, got $lookback")
    val w = spec(partitionBy, orderBy).rowsBetween(-lookback, Window.currentRow)
    df.withColumn(outCol, Det.dsumOver(col(valueCol), w))
  }

  /** Per-partition first and last value in the window order, as running
    * frames: first over (unbounded preceding → current), last over
    * (current → unbounded following) — deterministic under a total
    * order, unlike the default-frame `last_value` trap (whose frame ends
    * at the current row and so returns the current value).
    */
  def withFirstLast(df: DataFrame, partitionBy: Seq[String],
                    orderBy: Seq[SortKey], valueCol: String,
                    firstCol: String = "first_val",
                    lastCol: String = "last_val"): DataFrame = {
    val s = spec(partitionBy, orderBy)
    df.withColumn(firstCol, first(col(valueCol)).over(
        s.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(lastCol, last(col(valueCol)).over(
        s.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
  }

  /** Relative-position analytics per partition: percent_rank
    * ((rank-1)/(n-1) — the reference UI's scroll-position mapping) and
    * cume_dist (rank_with_ties/n). Both are single divisions of small
    * integers — correctly rounded, hence bit-identical cross-engine
    * without any explicit rounding.
    */
  def withPercentiles(df: DataFrame, partitionBy: Seq[String],
                      orderBy: Seq[SortKey],
                      prCol: String = "pr", cdCol: String = "cd"): DataFrame = {
    val s = spec(partitionBy, orderBy)
    df.withColumn(prCol, percent_rank().over(s))
      .withColumn(cdCol, cume_dist().over(s))
  }

  /** VALUE-range frame aggregate: count of partition rows whose single
    * numeric order key lies within [key - below, key + above] of the
    * current row's — the "neighbors within a band" primitive (RANGE,
    * not ROWS: the frame is defined by values, so ties all see the same
    * frame and no tiebreaker is needed for determinism).
    */
  def rangeCount(df: DataFrame, partitionBy: Seq[String], orderKey: String,
                 below: Long, above: Long,
                 outCol: String = "n_in_range"): DataFrame = {
    val base = if (partitionBy.isEmpty) Window.partitionBy()
               else Window.partitionBy(partitionBy.map(col).toIndexedSeq: _*)
    val w = base.orderBy(col(orderKey)).rangeBetween(-below, above)
    df.withColumn(outCol, count(lit(1)).over(w))
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

  /** Gap-filled (resampled) tumbling counts: every `width` bucket between
    * the data's first and last window gets a row, with `cnt` 0 where no
    * events fell — the time-series shape dashboards and anomaly baselines
    * need (a sparse series silently SKIPS quiet windows, which reads as
    * "no data" instead of "zero events", and shifts window-count moments).
    *
    * Scale shape: the counts aggregation is the only pass over the data;
    * the dense grid is CALENDAR-sized (span/width rows — one `sequence`
    * explode over a single min/max aggregate row, broadcast into the
    * left join), so filling costs nothing at any corpus size. Empty
    * input yields an empty frame (no bounds to span).
    */
  def resampleCounts(df: DataFrame, tsCol: String,
                     width: String = "1 hour"): DataFrame = {
    val counts = df
      .groupBy(window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("__ws"), col("cnt"))
    val grid = counts
      .agg(min(col("__ws")).as("lo"), max(col("__ws")).as("hi"))
      .filter(col("lo").isNotNull)
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL $width"))).as("__ws"))
    grid.join(counts, Seq("__ws"), "left")
      .select(Det.fmtTs(col("__ws")).as("window_start"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
