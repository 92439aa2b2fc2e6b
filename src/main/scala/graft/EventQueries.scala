package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.QueryDefs._

/** Event-time windowing over the `events` table (SURVEY.md §2.9): tumbling,
  * sliding, and session windows in batch form, plus the streaming twin of
  * the tumbling query (`graft.streaming.StreamWindows` — readStream +
  * watermark by file replay; StreamingSpec asserts stream ≡ batch for all
  * three window shapes).
  *
  * `events.ts` arrives at µs precision whatever the fixture generation
  * stored (Tables.normalizeEventsTs adapts nanos-as-long and native-micros
  * encodings); the oracle mirrors with CAST(ts AS TIMESTAMP).
  */
object EventQueries {

  // Per-process replay dirs: pid keying prevents cross-process races;
  // TmpDirs deletes ours on clean exit and sweeps siblings orphaned by
  // SIGKILLed runs, so tmp accumulation stays bounded under any exit mode.
  private def deleteDirOnExit(dir: java.nio.file.Path): Unit = {
    TmpDirs.sweepDead(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "graft_stream_dedup_")
    TmpDirs.deleteOnExit(dir)
  }

  private val tumblingOracle =
    s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
       |event_type, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val funnelOracle =
    """WITH s1 AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t
      |            FROM events WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
      |       FROM events e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
      |       FROM events e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t GROUP BY 1)
      |SELECT * FROM (
      |  SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)
      |ORDER BY step""".stripMargin

  private val retentionOracle =
    """WITH o AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
      |uw AS (SELECT DISTINCT user_id,
      |         CAST(floor(date_diff('day', o.d0, CAST(ts AS DATE)) / 7) AS BIGINT) AS w
      |       FROM events, o),
      |c AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY 1)
      |SELECT cw AS cohort_week, w - cw AS week_offset, COUNT(*) AS n_users
      |FROM uw JOIN c USING (user_id) GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // Moments from EXACT integer sums so both engines compute identical
  // doubles (distributed aggregation order cannot perturb an integer
  // sum); z rounded to 6 before the threshold compare. Shared by the
  // batch and streamed anomaly rows.
  private val anomalyOracle =
    """WITH w AS (
      |  SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
      |         event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |         CAST(SUM(cnt) AS BIGINT) AS s1, CAST(SUM(cnt * cnt) AS BIGINT) AS s2
      |  FROM w GROUP BY 1)
      |SELECT window_start, w.event_type, cnt,
      |       round((cnt - s1 * 1.0 / n) /
      |             sqrt((s2 - s1 * s1 * 1.0 / n) / (n - 1)), 6) AS z
      |FROM w JOIN m ON w.event_type = m.event_type
      |WHERE n > 1 AND s2 * n > s1 * s1
      |  AND ABS(round((cnt - s1 * 1.0 / n) /
      |            sqrt((s2 - s1 * s1 * 1.0 / n) / (n - 1)), 6)) > 2.0
      |ORDER BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- Tumbling window under Structured Streaming (same oracle as the
    // batch query: the stream must converge to the identical result) ----
    Q("events_stream_tumbling", tumblingOracle) {
      (s, d) => graft.streaming.StreamWindows.tumbling(s, d)
        .orderBy(col("window_start"), col("event_type"))
    },

    // ---- Watermarked streaming dedup: the events file replays TWICE, one
    // file per micro-batch, so every event arrives again as a cross-batch
    // duplicate; dropDuplicatesWithinWatermark's state store must restore
    // exactly the base table's per-window counts (event_id is unique) ----
    Q("events_stream_dedup",
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
        |COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) =>
        import java.nio.file.{Files, Paths, StandardCopyOption}
        // one replay dir per (process, sf dir): stable within this JVM so
        // repeat invocations (Verify once + Bench warmup/passes) reuse it,
        // keyed by pid so two concurrent harness processes on the same sf
        // dir can never race each other's running stream file listing.
        // NOTE: building this DataFrame EXECUTES the stream (two
        // micro-batches through the state store) and writes the replay
        // files — construction is execution here, so even plan-only
        // inspection (e.g. PlanGuardSpec) pays that cost.
        val dir = Paths.get(sys.props("java.io.tmpdir"),
          s"graft_stream_dedup_${ProcessHandle.current().pid()}_${Integer.toHexString(d.hashCode)}")
        Files.createDirectories(dir)
        deleteDirOnExit(dir)
        val src = Paths.get(d, "events.parquet")
        Files.copy(src, dir.resolve("replay_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
        Files.copy(src, dir.resolve("replay_b.parquet"), StandardCopyOption.REPLACE_EXISTING)
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamWindows.dedupByIdStream(s, dir.toString, schema)
          .orderBy(col("window_start"))
    },

    // ---- Tumbling 1h window (batch) ----------------------------------------
    Q("events_time_window", tumblingOracle) {
      (s, d) => TimeWindows.tumbling(t(s, d, "events"), "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value")))
        .select(col("window_start"), col("event_type"), col("cnt"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // ---- Sliding 1h/15m window (epoch-seconds start: int-exact) ------------
    Q("events_sliding_window",
      """SELECT CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))/900)*900 - k.k*900 AS BIGINT) AS ws_epoch,
        |e.event_type, COUNT(*) AS cnt
        |FROM events e CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("event_type"), col("cnt"))
        .orderBy(col("ws_epoch"), col("event_type"))
    },

    // ---- Session window, 30 min gap (gaps-and-islands oracle) --------------
    Q("events_session_window",
      """WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM t),
        |s AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f)
        |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start, COUNT(*) AS cnt
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin) {
      (s, d) => TimeWindows.session(t(s, d, "events"), "ts", "30 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("cnt")))
        .select(col("user_id"), col("session_start"), col("cnt"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // ---- Gap-filled (resampled) hourly counts ------------------------------
    // A sparse slice (purchases from a 1/7 user cohort) leaves empty
    // hours; resampleCounts fills every hour between the series' bounds
    // with an explicit zero row. The grid is one sequence explode over a
    // single min/max row — the data is scanned once for the counts.
    Q("events_resample_counts",
      """WITH c AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, COUNT(*) AS cnt
        |  FROM events WHERE event_type = 'purchase' AND user_id % 7 = 0 GROUP BY 1),
        |b AS (SELECT MIN(ws) AS lo, MAX(ws) AS hi FROM c),
        |g AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws FROM b)
        |SELECT strftime(g.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
        |FROM g LEFT JOIN c ON c.ws = g.ws ORDER BY 1""".stripMargin) {
      (s, d) => TimeWindows.resampleCounts(
          t(s, d, "events")
            .filter(col("event_type") === "purchase" && col("user_id") % 7 === 0),
          "ts")
        .orderBy(col("window_start"))
    },

    // ---- Ordered conversion funnel (view -> click -> purchase) -------------
    // Each step anchors at the user's earliest qualifying event STRICTLY
    // after the previous step's time; output is per-step reached-user
    // counts. k tiny user-keyed min-aggregations — never a per-user
    // event-list collect.
    Q("events_funnel", funnelOracle) {
      (s, d) => Funnels.funnel(t(s, d, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy(col("step"))
    },

    // ---- Streaming funnel: per-user funnel-event state maintained by one
    // stateful aggregation over the replayed stream; the anchor fold +
    // counts run over the compact state table (never rescanning the log).
    // Same oracle as the batch row — the state carries exactly the
    // funnel-type event multiset, so stream ≡ batch by construction ------
    Q("events_stream_funnel", funnelOracle) {
      (s, d) => graft.streaming.StreamFunnels.funnel(s, d,
          Seq("view", "click", "purchase"))
        .orderBy(col("step"))
    },

    // ---- Cohort retention (weekly) -----------------------------------------
    // Users bucket by first-event week; each (cohort, offset) cell counts
    // users active that week. Deterministic 7-day buckets from the
    // corpus' earliest event date (no ISO-week dependency).
    Q("events_retention", retentionOracle) {
      (s, d) => Funnels.retention(t(s, d, "events"), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // ---- Streaming retention: per-user distinct-active-day state
    // maintained by one stateful aggregation (events collapse map-side to
    // (user, day)); the cohort rollup runs over the compact state table.
    // Same oracle as the batch row — the state is exactly the distinct
    // (user, day) set the batch operator reduces the log to ---------------
    Q("events_stream_retention", retentionOracle) {
      (s, d) => graft.streaming.StreamFunnels.retention(s, d)
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // ---- Window-count anomaly detection (z-score per (hour, type)) ---------
    // Moments from EXACT integer sums so both engines compute identical
    // doubles (distributed aggregation order cannot perturb an integer
    // sum); z rounded to 6 before the threshold compare.
    Q("events_anomaly", anomalyOracle) {
      (s, d) => Funnels.countAnomalies(t(s, d, "events"), "event_type", "ts")
        .orderBy(col("window_start"), col("event_type"))
    },

    // ---- Streaming anomaly detection: hourly window counts maintained
    // as streaming state (one watermarked tumbling aggregation), the
    // z-score rollup answered from the compact state table. Same oracle
    // as the batch row — the state carries identical window counts and
    // the moments are exact integer sums, so stream ≡ batch bit-for-bit -
    Q("events_stream_anomaly", anomalyOracle) {
      (s, d) => graft.streaming.StreamFunnels.anomalies(s, d)
        .orderBy(col("window_start"), col("event_type"))
    },

    // ---- Weekly distinct-user rollup, EXACT (oracle-green twin of the
    // HLL sketch-table row below: same week buckets, COUNT(DISTINCT)
    // instead of sketch union — pins the rollup's bucket semantics
    // exactly; the HLL sibling pins the mergeable-artifact path) --------
    Q("events_distinct_rollup_exact",
      """SELECT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) => t(s, d, "events")
        // week bucket rendered as a formatted string (the strftime oracle
        // convention — no cross-engine DATE physical-type gamble)
        .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
        .groupBy("week")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("week"))
    },

    // ---- Audience overlap, EXACT (oracle twin of the theta row below) -----
    // Distinct users per unordered event-type pair — the set-ALGEBRA
    // question (A∩B) no union-only sketch can answer.
    Q("events_user_overlap_exact",
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       COUNT(*) AS n_users
        |FROM tu a JOIN tu b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, d) => {
        val tu = t(s, d, "events").select("event_type", "user_id").distinct()
        val a = tu.select(col("event_type").as("type_a"), col("user_id"))
        val b = tu.select(col("event_type").as("type_b"), col("user_id"))
        a.join(b, Seq("user_id")).filter(col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_users"))
          .orderBy(col("type_a"), col("type_b"))
      }
    },

    // ---- Audience overlap via THETA sketch table (set algebra on the
    // persisted artifact: per-type sketches built once, every pairwise
    // intersection/union answered by sketch ops — no_oracle: theta
    // estimates; SketchTablesSpec pins exact-mode equality and the
    // overlap matrix against the exact row above) -----------------------
    Q.noOracle("events_user_overlap_theta") {
      (s, d) => {
        val tbl = SketchTables.thetaTable(
          t(s, d, "events"), Seq("event_type"), "user_id")
        sortSmall(SketchTables.thetaOverlap(tbl, "event_type"),
          col("key_a"), col("key_b"))
      }
    },

    // ---- Weekly value quantiles, EXACT (oracle twin of the KLL row
    // below: same week buckets and probs, exact histogram-cut order
    // statistics vs the naive rank-window oracle) ------------------------
    Q("events_value_quantiles_exact",
      """WITH e AS (
        |  SELECT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week,
        |         value AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT week, v,
        |    row_number() OVER (PARTITION BY week ORDER BY v) AS rn,
        |    COUNT(*) OVER (PARTITION BY week) AS n
        |  FROM e)
        |SELECT week, q, v AS value
        |FROM r CROSS JOIN (SELECT UNNEST([CAST(0.5 AS DOUBLE), 0.95]) AS q) p
        |WHERE rn = GREATEST(1, CAST(CEIL(q * n) AS BIGINT))
        |ORDER BY week, q""".stripMargin) {
      (s, d) => sortSmall(
        Quantiles.exactPerGroup(
          t(s, d, "events")
            .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")),
          "week", "value", Seq(0.5, 0.95)),
        col("week"), col("q"))
    },

    // ---- Weekly value-quantile rollup via KLL sketch table -------------
    // Per-(week, day) KLL sketches of the event value, rolled up to
    // weekly p50/p95 by MERGE — the per-day build is the only base-data
    // scan (no_oracle: KLL estimates; SketchTablesSpec pins the rank
    // -error bound and merge≡direct).
    Q.noOracle("events_value_quantile_rollup") {
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("day", to_date(col("ts")))
          .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        val daily = SketchTables.kllTable(ev, Seq("week", "day"), "value")
        sortSmall(
          SketchTables.kllQuantiles(
            SketchTables.kllRollup(daily, Seq("week")), Seq(0.5, 0.95)),
          col("week"))
      }
    },

    // ---- PER-GROUP value-quantile rollup via KLL sketch table ----------
    // The same rollup-by-merge shape keyed by a CATEGORICAL group
    // (event_type): per-(type, day) sketches build in one scan, the
    // per-type summary merges them — the per-source dashboard tile a
    // pipeline publishes (quality score p50/p95 by source) where exact
    // per-group quantiles would rescan the corpus per rollup level.
    // no_oracle: KLL estimates; SketchTablesSpec pins the per-group
    // rank-error bound vs the exact twin.
    Q.noOracle("events_value_quantile_rollup_per_group") {
      (s, d) => {
        val ev = t(s, d, "events").withColumn("day", to_date(col("ts")))
        val daily = SketchTables.kllTable(ev, Seq("event_type", "day"), "value")
        sortSmall(
          SketchTables.kllQuantiles(
            SketchTables.kllRollup(daily, Seq("event_type")), Seq(0.5, 0.95)),
          col("event_type"))
      }
    },

    // ---- Per-user weekly frequency, EXACT (oracle twin of the CMS row
    // below: same week buckets and probe keys, COUNT(*) instead of
    // sketch estimates — pins the bucket/probe semantics; zero weeks
    // materialize so the row set matches the sketch row's shape) --------
    Q("events_user_freq_exact",
      """WITH wk AS (
        |  SELECT DISTINCT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week
        |  FROM events),
        |k AS (SELECT CAST(UNNEST([1, 2, 3, 4, 5]) AS BIGINT) AS user_id),
        |c AS (
        |  SELECT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week,
        |         CAST(user_id AS BIGINT) AS user_id, COUNT(*) AS n
        |  FROM events WHERE user_id IN (1, 2, 3, 4, 5) GROUP BY 1, 2)
        |SELECT wk.week, k.user_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |FROM wk CROSS JOIN k
        |LEFT JOIN c ON c.week = wk.week AND c.user_id = k.user_id
        |ORDER BY 1, 2""".stripMargin) {
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
        val counts = ev.filter(col("user_id").isin(1, 2, 3, 4, 5))
          .groupBy(col("week"), col("user_id").cast("long").as("user_id"))
          .agg(count(lit(1)).as("n"))
        // the (week × probe) grid via explode over the distinct weeks —
        // no join needed to materialize zero cells
        ev.select("week").distinct()
          .withColumn("user_id", explode(typedlit(Seq(1L, 2L, 3L, 4L, 5L))))
          .join(counts, Seq("week", "user_id"), "left")
          .select(col("week"), col("user_id"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("week"), col("user_id"))
      }
    },

    // ---- Per-user weekly frequency via COUNT-MIN sketch table ----------
    // The fourth sketch family as an artifact: per-(week, day) Count-Min
    // sketches of user activity, rolled up to weeks by EXACT counter
    // addition, probed for a fixed key list — frequency dashboards serve
    // from the compact table, never rescanning events (no_oracle: CMS
    // overcounts under collision; CmsSpec pins overestimate-only, the
    // εN bound, and merge ≡ direct bit-for-bit).
    Q.noOracle("events_user_freq_cms") {
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("day", to_date(col("ts")))
          .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
        val daily = SketchTables.cmsTable(ev, Seq("week", "day"), "user_id")
        sortSmall(
          SketchTables.cmsEstimate(
            SketchTables.cmsRollup(daily, Seq("week")), Seq(1L, 2L, 3L, 4L, 5L)),
          col("week"), col("key"))
      }
    },

    // ---- Streamed HLL sketch table: the per-day build runs as ONE
    // streaming aggregation (sketches merge in the state store), the
    // weekly rollup serves from the compact table — no_oracle (HLL
    // estimates); StreamingSpec pins stream ≡ batch exactly (the sketch
    // is deterministic on the input set) ---------------------------------
    Q.noOracle("events_stream_distinct_rollup") {
      (s, d) => sortSmall(
        graft.streaming.StreamSketches.weeklyDistinctRollup(s, d),
        col("week"))
    },

    // ---- Streamed CMS table: the frequency-sketch build live (no_oracle:
    // CMS estimates; StreamingSpec pins the streamed table BYTE-equal to
    // the batch build — exact counter addition survives the state store) -
    Q.noOracle("events_stream_user_freq_cms") {
      (s, d) => sortSmall(
        graft.streaming.StreamSketches.weeklyUserFreqRollup(s, d,
          Seq(1L, 2L, 3L, 4L, 5L)),
        col("week"), col("key"))
    },

    // ---- Mergeable HLL sketch table: weekly rollup WITHOUT rescanning ------
    // Build per-(week, day) user sketches once, answer the weekly
    // distinct-user rollup by sketch UNION — the reference's mergeable-
    // sketch model as a persistable artifact (no_oracle: HLL estimates;
    // SketchTablesSpec pins accuracy, merge≡direct, and the parquet
    // round trip).
    Q.noOracle("events_distinct_rollup") {
      (s, d) => {
        // week key = Monday of the ISO week as a DATE (not bare
        // weekofyear): distinct years must not collapse into one cohort,
        // and the ISO week-52/week-1 year straddle stays unambiguous —
        // same deterministic-bucket rule as the retention operator
        val ev = t(s, d, "events")
          .withColumn("day", to_date(col("ts")))
          .withColumn("week", date_trunc("week", col("ts")).cast("date"))
        val daily = SketchTables.hllTable(ev, Seq("week", "day"), "user_id")
        sortSmall(
          SketchTables.hllEstimate(SketchTables.hllRollup(daily, Seq("week"))),
          col("week"))
      }
    }
  )
}
