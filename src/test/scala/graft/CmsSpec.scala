package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchTables

/** Count-Min sketch tables: the overestimate-only contract, the εN error
  * bound, and the family's distinguishing property — rollup-by-merge is
  * BIT-IDENTICAL to direct sketching (counter addition is exact, unlike
  * the HLL/theta estimate algebras).
  */
class CmsSpec extends SparkSpec {

  private lazy val events = graft.sources.Tables.open(spark, sf, "events")
    .withColumn("day", to_date(col("ts")))
    .withColumn("week", date_trunc("week", col("ts")).cast("date"))

  private val depth = 5
  private val width = 4096

  test("estimates are overestimate-only and within the εN bound") {
    val table = SketchTables.cmsTable(events, Seq("week"), "user_id", depth, width)
    val exact = events.groupBy(col("week"), col("user_id").cast("long").as("k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val totals = events.groupBy("week").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val probes = exact.keys.map(_._2).toSeq.distinct.sorted
    val est = SketchTables.cmsEstimate(table, probes)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    exact.foreach { case ((w, k), n) =>
      val e = est((w, k))
      assert(e >= n, s"week $w key $k: CMS under-counted ($e < $n)")
      // ε = 2/width; the ≤ εN bound holds with prob 1 - 2^-depth per
      // query — at width 4096 and fixture Ns it holds with huge margin
      assert(e - n <= math.max(1L, (2.0 * totals(w) / width).ceil.toLong * depth),
        s"week $w key $k: estimate $e vs exact $n (N=${totals(w)})")
    }
  }

  test("weekly rollup by merge is BIT-IDENTICAL to direct weekly sketching") {
    val daily = SketchTables.cmsTable(events, Seq("week", "day"), "user_id", depth, width)
    val merged = SketchTables.cmsRollup(daily, Seq("week"))
      .collect().map(r => r.getDate(0).toString -> r.getAs[Array[Byte]]("cms")).toMap
    val direct = SketchTables.cmsTable(events, Seq("week"), "user_id", depth, width)
      .collect().map(r => r.getDate(0).toString -> r.getAs[Array[Byte]]("cms")).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (w, m) =>
      assert(java.util.Arrays.equals(m, direct(w)),
        s"week $w: merged sketch bytes differ from directly-built ones")
    }
  }

  test("sketch table survives a parquet round trip (build once, serve later)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val daily = SketchTables.cmsTable(events, Seq("week", "day"), "user_id", depth, width)
    daily.write.mode("overwrite").parquet(dir)
    val servedBytes = SketchTables.cmsRollup(spark.read.parquet(dir), Seq("week"))
      .collect().map(r => r.getDate(0).toString -> r.getAs[Array[Byte]]("cms")).toMap
    val directBytes = SketchTables.cmsTable(events, Seq("week"), "user_id", depth, width)
      .collect().map(r => r.getDate(0).toString -> r.getAs[Array[Byte]]("cms")).toMap
    servedBytes.foreach { case (w, s) =>
      assert(java.util.Arrays.equals(s, directBytes(w)),
        s"week $w: served rollup differs from direct build after parquet round trip")
    }
  }

  test("null keys are skipped; an all-null group merges to a zero estimate") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1L)), ("a", Some(1L)), ("a", None),
      ("b", None), ("b", None)).toDF("g", "k")
    val table = SketchTables.cmsTable(df, Seq("g"), "k", depth, width)
    val est = SketchTables.cmsEstimate(table, Seq(1L))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est("a") == 2L, s"nulls must not count: ${est("a")}")
    // an all-null group's rollup buffer never sees a sketch: estimate 0
    val rolled = SketchTables.cmsEstimate(
        SketchTables.cmsRollup(table.filter(col("g") === "b"), Seq("g")), Seq(1L))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rolled("b") == 0L)
  }

  test("merging sketches with mismatched parameters fails loudly") {
    import spark.implicits._
    val a = SketchTables.cmsTable(Seq(("g", 1L)).toDF("g", "k"), Seq("g"), "k", depth, width)
    val b = SketchTables.cmsTable(Seq(("g", 1L)).toDF("g", "k"), Seq("g"), "k", depth, width / 2)
    val ex = intercept[Exception] {
      SketchTables.cmsRollup(a.union(b), Seq("g")).collect()
    }
    assert(ex.getMessage != null)
  }
}
