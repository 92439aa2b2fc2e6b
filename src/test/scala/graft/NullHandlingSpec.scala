package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Missing-value semantics (SURVEY.md §1.2): the reference tracks a
  * missing mask per column and every sketch counts missing separately —
  * here that is Spark null + count(col) vs count(*). These tests pin the
  * null behavior of the core sketches on a synthetic null-bearing table
  * (the fixture tables are fully populated, so this coverage can't come
  * from the oracle queries).
  */
class NullHandlingSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, null, "b"), (3L, 30.0, null),
      (4L, null, null), (5L, 50.0, "a"), (6L, 20.0, "b"))
      .toDF("id", "x", "s")
  }

  test("dsum equals the pure decimal sum across magnitudes, nulls, and non-finites") {
    import org.apache.spark.sql.types.DecimalType
    val cases = Seq(
      Seq(1.5, -2.25, 3.125),                       // ordinary values
      Seq(1e13, -9.5e12, 2.0),                      // beyond the scaled-long fast path
      Seq(Double.NaN, 1.0, Double.PositiveInfinity), // non-finites quantize to null
      Seq.empty[Double],                            // empty → null
      Seq(1e20, -1e20, 0.000001))                   // huge magnitudes, exact cancel
    cases.zipWithIndex.foreach { case (vs, i) =>
      val df = spark.createDataFrame(
        java.util.Arrays.asList(vs.map(v => org.apache.spark.sql.Row(v)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType))))
      val r = df.agg(
        operators.Det.dsum(col("x")).as("fast"),
        sum(col("x").cast(DecimalType(30, 6))).cast("double").as("ref")).head()
      val fast = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val ref = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(fast == ref, s"case $i ($vs): dsum=$fast decimal=$ref")
    }
  }

  test("dsum equals the pure decimal sum on random magnitude-spanning columns") {
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(23L)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(200)
      val vs: Seq[java.lang.Double] = Seq.fill(n) {
        rnd.nextInt(8) match {
          case 0 => null
          case 1 => Double.NaN
          case 2 => Double.box((rnd.nextDouble() - 0.5) * 1e20) // slow path
          case 3 => Double.box((rnd.nextDouble() - 0.5) * 2e13) // straddles the long cutover
          case _ => Double.box((rnd.nextDouble() - 0.5) * 1e6)  // fast path
        }
      }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(vs.map(v => org.apache.spark.sql.Row(v)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType))))
      val r = df.agg(
        operators.Det.dsum(col("x")).as("fast"),
        sum(col("x").cast(DecimalType(30, 6))).cast("double").as("ref")).head()
      val fast = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val ref = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(fast == ref, s"trial $trial diverged: dsum=$fast decimal=$ref")
    }
  }

  test("basic stats separate present and missing counts") {
    val r = Stats.basicStats(df, "x").head()
    assert(r.getAs[Long]("cnt") == 4)
    assert(r.getAs[Long]("missing_count") == 2)
    assert(r.getAs[Double]("min_val") == 10.0 && r.getAs[Double]("max_val") == 50.0)
    assert(r.getAs[Double]("avg_val") == 27.5)
  }

  test("data range ignores nulls for min/max but counts them") {
    val r = Stats.dataRange(df, "s").head()
    assert(r.getAs[Long]("present_count") == 4 && r.getAs[Long]("missing_count") == 2)
  }

  test("equality filter can match missing explicitly") {
    assert(Filters.equality(df, "s", null, matchMissing = true).count() == 2)
    assert(Filters.equality(df, "s", "a").count() == 2)
  }

  test("histogram drops out-of-domain nulls rather than miscounting them") {
    val h = Histograms.histogram1d(df, "x", 0.0, 100.0, 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h.values.sum == 4, "only present values land in buckets")
  }

  test("string-range histogram keeps null out of every bucket") {
    val h = Histograms.histogramStringRanges(df, "s", Seq("a", "b"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h.values.sum == 4)
    assert(h(0) == 2 && h(1) == 2)
  }

  test("distinct and heavy-hitter counts treat null as a real key") {
    // reference semantics: missing is a countable category in menus
    val counts = df.groupBy("s").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts(None) == 2)
    val dv = DistinctOps.distinctValues(df, "s").collect()
    assert(dv.length == 3, "null appears as its own distinct value")
  }

  test("null-text docs are absent from LM and TF-IDF scores, not zero-scored") {
    import spark.implicits._
    // tokens(null) is null → rawShingles' explode drops the row: a doc
    // with MISSING text has no terms, which must read as "absent", never
    // as a real score of 0 (DuckDB UNNEST(NULL) agrees, so the oracle
    // contract is the same — but the fixture has no null text, hence
    // this synthetic pin)
    val docs = Seq[(java.lang.Long, String)](
      (1L, "alpha beta alpha"), (2L, null), (3L, "beta gamma"))
      .toDF("doc_id", "text")
    val lm = TextOps.lmScore(docs, docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(lm == Set(1L, 3L), s"lmScore must skip the null-text doc: $lm")
    val tfidf = TextOps.tfidfTopK(docs, "doc_id", "text", 3)
    assert(tfidf.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // ...and the null doc must not have inflated document frequencies:
    // 'beta' appears in 2 of 3 docs, so its df is 2 regardless of doc 2
    val betaScore = tfidf.filter(col("term") === "beta")
      .select(col("tfidf")).head.getDouble(0)
    val expected = math.rint((math.log(4.0 / 3.0) + 1) * 1e6) / 1e6
    assert(math.abs(betaScore - expected) < 1e-9,
      s"beta tfidf $betaScore != $expected (df must count only non-null docs... " +
        "N stays the full row count by the df.count() contract)")
  }

  test("rowAtLeast matches a brute-force model on null-bearing keys") {
    // canonical order: asc → nulls first, desc → nulls last
    val rows = df.select("id", "x", "s").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.getString(2))))
    def ordKey(t: (Long, Option[Double], Option[String])) =
      (t._3.isDefined, t._3.getOrElse(""), // s asc nulls first
       t._2.isEmpty, -t._2.getOrElse(0.0), // x desc nulls last
       t._1)
    val sorted = rows.sortBy(ordKey)
    val order = Seq(SortKey("s"), SortKey("x", asc = false), SortKey("id"))
    sorted.zipWithIndex.foreach { case (start, idx) =>
      val got = df.filter(Filters.rowAtLeast(order,
        Seq(lit(start._3.orNull), lit(start._2.map(Double.box).orNull), lit(start._1))))
        .count()
      assert(got == rows.length - idx,
        s"start=$start expected ${rows.length - idx} rows, got $got")
    }
  }

  test("NextK orders null keys first and pages past them") {
    val page = NextK.page(df, Seq(SortKey("s"), SortKey("id")), None, 10).collect()
    assert(page.length == 6)
    assert(page.take(2).forall(_.isNullAt(0)), "nulls-first ordering")
  }
}
