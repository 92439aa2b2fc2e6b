package graft

import org.apache.spark.sql.functions._
import graft.operators.{Det, TimeWindows}
import graft.streaming.StreamWindows

/** Streaming ≡ batch equivalence (SURVEY.md §5): every streamed event-time
  * window query replayed over the fixture parquet must produce exactly the
  * batch result — the reference's parallel≡local invariant transplanted to
  * the micro-batch axis.
  */
class StreamingSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  private lazy val events = sources.Tables.open(spark, sf, "events")

  test("streamed tumbling windows equal batch") {
    val batch = TimeWindows.tumbling(events, "ts", "1 hour", Seq("event_type"),
      Seq(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value")))
      .select("window_start", "event_type", "cnt", "sum_value")
    val stream = StreamWindows.tumbling(spark, sf)
    assert(canon(stream) == canon(batch))
  }

  test("streamed sliding windows equal batch") {
    val batch = events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("event_type"), col("cnt"))
    val stream = StreamWindows.sliding(spark, sf)
    assert(canon(stream) == canon(batch))
  }

  test("stateful mapGroupsWithState counts equal batch aggregation") {
    val batch = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"), max(col("event_id")).as("max_event_id"))
    val stream = StreamWindows.statefulUserCounts(spark, sf)
    assert(canon(stream) == canon(batch))
  }

  test("watermarked streaming dedup drops cross-batch duplicates") {
    // two copies of the events file, one per micro-batch: every event is a
    // late-arriving duplicate in batch 2 and must be dropped by the
    // watermark state store
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("copy1.parquet"))
    java.nio.file.Files.copy(src, dir.resolve("copy2.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val streamed = StreamWindows.dedupByIdStream(spark, dir.toString, schema)
    val batch = events.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(operators.Det.fmtTs(col("window.start")).as("window_start"), col("cnt"))
    assert(canon(streamed) == canon(batch))
  }

  test("streamed session windows equal batch") {
    val batch = TimeWindows.session(events, "ts", "30 minutes", Seq("user_id"),
      Seq(count(lit(1)).as("cnt")))
      .select("user_id", "session_start", "cnt")
    val stream = StreamWindows.session(spark, sf)
      .select("user_id", "session_start", "cnt")
    assert(canon(stream) == canon(batch))
  }

  test("streamed funnel equals batch funnel") {
    val steps = Seq("view", "click", "purchase")
    val batch = graft.operators.Funnels
      .funnel(events, "user_id", "event_type", "ts", steps)
    val stream = graft.streaming.StreamFunnels.funnel(spark, sf, steps)
    assert(canon(stream) == canon(batch))
    // the state layer compacts the log to funnel-type events only: its
    // exploded multiset must be exactly the filtered log
    val st = graft.streaming.StreamFunnels.userFunnelState(spark, sf, steps)
    val stateEvents = st
      .select(col("user_id"), explode(col("evts")).as("e"))
      .select(col("user_id"), col("e.ts"), col("e.event_type"))
    val logEvents = events.filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_type"))
    assert(canon(stateEvents) == canon(logEvents))
  }

  test("streamed HLL sketch table equals the batch-built table") {
    val stream = graft.streaming.StreamSketches.weeklyDistinctRollup(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val ev = events
      .withColumn("day", to_date(col("ts")))
      .withColumn("week", date_trunc("week", col("ts")).cast("date"))
    val batch = graft.operators.SketchTables.hllEstimate(
        graft.operators.SketchTables.hllRollup(
          graft.operators.SketchTables.hllTable(ev, Seq("week", "day"), "user_id"),
          Seq("week")))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // the sketch is deterministic on the input set, so the streamed
    // table's rollup must agree EXACTLY, not just within HLL error
    assert(stream == batch)
  }

  test("streamed retention equals batch retention") {
    val batch = graft.operators.Funnels.retention(events, "user_id", "ts")
    val stream = graft.streaming.StreamFunnels.retention(spark, sf)
    assert(canon(stream) == canon(batch))
    // the activity state is exactly the distinct (user, day) set of the log
    val st = graft.streaming.StreamFunnels.userActivityState(spark, sf)
    val stateDays = st.select(col("user_id"), explode(col("days")).as("day"))
    val logDays = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    assert(canon(stateDays) == canon(logDays))
  }

  test("streamed CMS table is byte-equal to the batch build") {
    val streamed = graft.streaming.StreamSketches.dailyUserFreqSketches(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getAs[Array[Byte]]("cms"))
      .toMap
    val ev = events
      .withColumn("day", to_date(col("ts")))
      .withColumn("week", date_format(date_trunc("week", col("ts")), "yyyy-MM-dd"))
    val batch = graft.operators.SketchTables.cmsTable(ev, Seq("week", "day"), "user_id")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getAs[Array[Byte]]("cms"))
      .toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, batch(k)),
        s"group $k: streamed CMS bytes differ from the batch build")
    }
  }

  test("streamed anomaly detection equals batch bit-for-bit") {
    val batch = graft.operators.Funnels
      .countAnomalies(events, "event_type", "ts")
    val stream = graft.streaming.StreamFunnels.anomalies(spark, sf)
    // counts are identical multisets and the moments are exact integer
    // sums, so even the DOUBLE z-scores must agree exactly
    assert(canon(stream) == canon(batch))
    // the state layer is exactly the batch window-count table
    val st = graft.streaming.StreamFunnels.windowCountState(spark, sf)
    val batchCounts = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(graft.operators.Det.fmtTs(col("w.start")).as("window_start"),
        col("event_type"), col("cnt"))
    assert(canon(st) == canon(batchCounts))
  }
}
