package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keyless point-in-interval join via grid bucketing: exact parity with
  * the nested-loop form (random fixtures incl. negative domains and
  * cell-boundary values), the exactly-one-cell-meeting argument (no dup
  * pairs), and the no-cartesian plan shape.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[Long], ivs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    for {
      p <- points
      (lo, hi) <- ivs
      if p >= lo && p <= hi
    } yield (p, lo, hi)

  test("parity with the nested-loop range join across widths and domains") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val points = Seq.fill(300)(rnd.nextLong() % 1000L) // negatives included
      val ivs = Seq.fill(80) {
        val lo = rnd.nextLong() % 1000L
        (lo, lo + rnd.nextInt(120))
      } ++ Seq((5L, 3L)) // empty interval: matches nothing
      val width = Seq(7L, 30L, 250L)(trial % 3)
      val got = Joins.intervalBucketed(
          points.toDF("p"), ivs.toDF("lo", "hi"), "p", "lo", "hi", width)
        .as[(Long, Long, Long)].collect().sorted.toSeq
      val want = naive(points, ivs.filter(i => i._1 <= i._2)).sorted
      assert(got == want, s"trial $trial width $width: ${got.size} vs ${want.size}")
    }
  }

  test("boundary cells: points exactly on lo/hi and on cell edges match once") {
    val points = Seq(0L, 29L, 30L, 31L, 60L, -30L, -31L, -1L)
    val ivs = Seq((0L, 30L), (30L, 30L), (-31L, -30L))
    val got = Joins.intervalBucketed(
        points.toDF("p"), ivs.toDF("lo", "hi"), "p", "lo", "hi", 30L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == naive(points, ivs).sorted)
    // no duplicates: each matched pair appears exactly once
    assert(got.distinct.size == got.size)
  }

  test("cells stay exact past the double-precision cliff (epoch-nano scale)") {
    val base = (1L << 60)
    val points = Seq(base, base + 1L, base + 29L, base + 30L, -base, -base - 1L)
    val ivs = Seq((base, base + 29L), (-base - 30L, -base))
    val got = Joins.intervalBucketed(
        points.toDF("p"), ivs.toDF("lo", "hi"), "p", "lo", "hi", 30L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == naive(points, ivs).sorted,
      "cell math must be exact at magnitudes where doubles round")
  }

  test("poison interval (Long.MaxValue span) fails loudly, not a task bomb") {
    // one malformed sentinel interval at epoch-seconds width: unguarded,
    // sequence(cell(lo), cell(hi)) would try ~2^63/60 elements and kill
    // the task; the guard must name the row before any explode runs
    val points = Seq(1700000000L).toDF("p")
    val ivs = Seq((0L, Long.MaxValue)).toDF("lo", "hi")
    val e = intercept[Exception] {
      Joins.intervalBucketed(points, ivs, "p", "lo", "hi", 60L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxCellsPerInterval")),
      s"expected the loud guard, got: $e")
  }

  test("a raised cap admits wide-but-legitimate intervals unchanged") {
    val points = Seq(5L, 500L).toDF("p")
    val ivs = Seq((0L, 2000000L)).toDF("lo", "hi") // 2M cells at width 1
    val got = Joins.intervalBucketed(points, ivs, "p", "lo", "hi", 1L,
        maxCellsPerInterval = 1L << 22)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((5L, 0L, 2000000L), (500L, 0L, 2000000L)))
  }

  test("the plan is an equi join on the grid cell, never a cartesian") {
    val plan = Joins.intervalBucketed(
        Seq(1L).toDF("p"), Seq((0L, 5L)).toDF("lo", "hi"), "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"interval join must route through the cell equi join:\n$plan")
  }
}
