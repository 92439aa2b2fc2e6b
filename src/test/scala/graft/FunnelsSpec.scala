package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnels

/** `Funnels.funnel` / `Funnels.retention`: hand-checkable synthetic cases
  * plus structural invariants on the fixture events.
  */
class FunnelsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: strict ordering, re-anchoring, and drop-off by construction") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: purchase BEFORE click -> stops at click
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "purchase", ts("2024-01-01 09:30:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      // user 3: click before any view -> stops at view
      (3L, "click", ts("2024-01-01 08:00:00")),
      (3L, "view", ts("2024-01-01 09:00:00")),
      // user 4: never views
      (4L, "click", ts("2024-01-01 08:00:00")),
      (4L, "purchase", ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnels.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // step1: users 1,2,3 viewed; step2: 1 and 2 clicked after their view
    // (3's click precedes its view); step3: only 1 purchased after click
    assert(got == Set((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: monotone non-increasing step counts on the fixture") {
    val ev = graft.sources.Tables.open(spark, sf, "events")
    val counts = Funnels.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy(col("step")).collect().map(_.getLong(2))
    assert(counts.length == 3)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel must narrow: ${counts.mkString(",")}")
    assert(counts(0) > 0)
  }

  test("retention: synthetic cohorts land in the right cells") {
    import spark.implicits._
    val ev = Seq(
      // user 1: first week 0, active weeks 0 and 2
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-16 00:00:00")),
      // user 2: first week 1 only
      (2L, ts("2024-01-08 12:00:00")),
      // user 3: weeks 0 and 1
      (3L, ts("2024-01-02 00:00:00")),
      (3L, ts("2024-01-09 00:00:00"))
    ).toDF("user_id", "ts")
    val got = Funnels.retention(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("countAnomalies flags a planted spike and nothing else") {
    import spark.implicits._
    // 20 calm hours of 10 events + one 100-event spike for type 'a';
    // type 'b' stays flat (no row may be flagged for it)
    val calm = for (h <- 0 until 20; i <- 0 until 10)
      yield ("a", ts(f"2024-01-01 $h%02d:00:${i % 60}%02d"))
    val spike = (0 until 100).map(i => ("a", ts(f"2024-01-02 05:00:${i % 60}%02d.${i}%03d")))
    val flat = for (h <- 0 until 21; i <- 0 until 10)
      yield ("b", ts(f"2024-01-01 $h%02d:30:${i % 60}%02d"))
    val ev = (calm ++ spike ++ flat).toDF("event_type", "ts")
    val got = Funnels.countAnomalies(ev, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 1, s"expected only the planted spike: ${got.mkString}")
    assert(got.head._1 == "2024-01-02 05:00:00" && got.head._2 == "a" &&
      got.head._3 == 100L)
  }

  test("resampleCounts fills planted gaps with zero rows and spans the bounds") {
    import spark.implicits._
    // events in hours 0, 1, and 4 — hours 2 and 3 are gaps
    val ev = Seq(
      ts("2024-01-01 00:10:00"), ts("2024-01-01 00:50:00"),
      ts("2024-01-01 01:30:00"), ts("2024-01-01 04:05:00"))
      .toDF("ts")
    val got = graft.operators.TimeWindows.resampleCounts(ev, "ts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(got == Seq(
      "2024-01-01 00:00:00" -> 2L, "2024-01-01 01:00:00" -> 1L,
      "2024-01-01 02:00:00" -> 0L, "2024-01-01 03:00:00" -> 0L,
      "2024-01-01 04:00:00" -> 1L))
    // empty input: no bounds, no grid — empty frame, not a crash
    assert(graft.operators.TimeWindows
      .resampleCounts(ev.filter(lit(false)), "ts").isEmpty)
  }

  test("retention: every user appears exactly once at offset 0") {
    val ev = graft.sources.Tables.open(spark, sf, "events")
    val ret = Funnels.retention(ev, "user_id", "ts")
    val atZero = ret.filter(col("week_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val users = ev.select("user_id").distinct().count()
    assert(atZero == users)
    // offsets are never negative (cohort = each user's min week)
    assert(ret.filter(col("week_offset") < 0).count() == 0)
  }
}
