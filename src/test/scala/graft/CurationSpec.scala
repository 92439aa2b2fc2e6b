package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Projections, Sampling, TextOps}

/** Budget / cap curation operators (`Sampling.selectByBudget`,
  * `Sampling.topKPerGroup`): exact parity with the naive window forms
  * they replace, boundary handling, and degenerate budgets.
  */
class CurationSpec extends SparkSpec {

  /** Naive greedy-prefix reference: full window cumsum per group. */
  private def naiveBudget(df: org.apache.spark.sql.DataFrame,
                          budget: Long): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    df.withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") <= budget)
      .select("doc_id", "source", "n_tokens", "score")
  }

  private lazy val scored = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    TextOps.qualityScore(docs, "doc_id", "text", passthrough = Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        round(col("stop_ratio"), 6).as("score"))
  }

  test("selectByBudget: parity with the full-window form across budgets") {
    for (budget <- Seq(0L, 37L, 400L, 100000L)) {
      val got = Sampling.selectByBudget(scored, "source", "doc_id",
        "n_tokens", "score", budget)
        .select("doc_id", "source", "n_tokens", "score")
        .collect().toSet
      val want = naiveBudget(scored, budget).collect().toSet
      assert(got == want, s"budget=$budget: ${got.size} vs ${want.size} rows")
    }
  }

  test("selectByBudget: huge budget keeps every positive-weight row") {
    val got = Sampling.selectByBudget(scored, "source", "doc_id",
      "n_tokens", "score", budget = Long.MaxValue / 4)
    assert(got.count() == scored.filter(col("n_tokens") > 0).count())
  }

  test("selectByBudget: coarse bins (many ties per bin) stay exact") {
    // binScale 0 collapses every score into bin 0 — the whole selection
    // goes through the boundary-bin window, exercising the residual-budget
    // arithmetic with maximal within-bin population
    val got = Sampling.selectByBudget(scored, "source", "doc_id",
      "n_tokens", "score", budget = 400, binScale = 0)
      .select("doc_id", "source", "n_tokens", "score").collect().toSet
    assert(got == naiveBudget(scored, 400).collect().toSet)
  }

  test("selectByBudget: null / non-positive weights and null scores are excluded") {
    import spark.implicits._
    val rows = Seq(
      (1L, "s", 10L, Some(0.9)), // selected
      (2L, "s", 0L, Some(0.8)),  // zero weight: excluded
      (3L, "s", -5L, Some(0.7)), // negative weight: excluded
      (4L, "s", 10L, None),      // null score: excluded
      (5L, "s", 10L, Some(0.5))  // selected (cum 20 <= 25)
    ).toDF("doc_id", "source", "n_tokens", "score")
    val got = Sampling.selectByBudget(rows, "source", "doc_id",
      "n_tokens", "score", budget = 25)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
  }

  test("selectByBudget: first doc overflowing leaves its group empty") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 100L, 0.9), (2L, "a", 1L, 0.1), // first doc of 'a' blows the budget
      (3L, "b", 5L, 0.9), (4L, "b", 5L, 0.8)
    ).toDF("doc_id", "source", "n_tokens", "score")
    val got = Sampling.selectByBudget(rows, "source", "doc_id",
      "n_tokens", "score", budget = 10)
      .select("doc_id").as[Long].collect().toSet
    // prefix semantics: 'a' stops at its first (overflowing) doc — doc 2
    // is AFTER the overflow position in (score desc) order, so it is out
    assert(got == Set(3L, 4L))
  }

  test("selectByBudget: partition-invariant") {
    val a = Sampling.selectByBudget(scored, "source", "doc_id",
      "n_tokens", "score", budget = 400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.selectByBudget(
      scored.repartition(13, col("doc_id")), "source", "doc_id",
      "n_tokens", "score", budget = 400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("topKPerGroup: parity with the row_number window form") {
    val k = 7
    val got = Sampling.topKPerGroup(scored, "source", "doc_id", "score", k)
      .select("doc_id", "source", "n_tokens", "score").collect().toSet
    val want = scored.withColumn("__rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("__rk") <= k)
      .select("doc_id", "source", "n_tokens", "score").collect().toSet
    assert(got == want)
    // ascending variant
    val asc = Sampling.topKPerGroup(scored, "source", "doc_id", "score", k,
      descending = false)
      .select("doc_id", "source").collect().toSet
    val wantAsc = scored.withColumn("__rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("score").asc, col("doc_id").asc)))
      .filter(col("__rk") <= k)
      .select("doc_id", "source").collect().toSet
    assert(asc == wantAsc)
  }

  test("exactPerGroup quantiles: parity with full row_number rank selection") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.99, 1.0)
    def naive(df: DataFrame): Set[(String, Double, Double)] = {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("v").asc)
      df.select(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
        .filter(col("v").isNotNull)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("l_returnflag"))))
        .crossJoin(probs.toDF("q"))
        .filter(col("rn") === greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
        .select("l_returnflag", "q", "v")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    }
    val got = operators.Quantiles
      .exactPerGroup(li, "l_returnflag", "l_quantity", probs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == naive(li))
    // every (group, prob) pair present
    assert(got.size == li.select("l_returnflag").distinct().count() * probs.size)
  }

  test("exactPerGroup quantiles: coarse single-bin grid stays exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // binScale -2: l_quantity in [1, 50] collapses into one bin — the
    // whole selection goes through the boundary window
    val coarse = operators.Quantiles
      .exactPerGroup(li, "l_returnflag", "l_quantity", Seq(0.5), binScale = -2)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val fine = operators.Quantiles
      .exactPerGroup(li, "l_returnflag", "l_quantity", Seq(0.5), binScale = 3)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(coarse == fine)
  }

  test("selectByBudget: NaN scores spend budget first, parity with the window") {
    import spark.implicits._
    // NaN sorts ABOVE every finite double in Spark's desc order, so the
    // NaN docs are the greedy prefix; the histogram cut must bin them
    // above all finite bins or it selects a different set than the window
    val rows = Seq(
      (1L, "s", 10L, Double.NaN), (2L, "s", 10L, Double.NaN),
      (3L, "s", 10L, 0.9), (4L, "s", 10L, 0.5)
    ).toDF("doc_id", "source", "n_tokens", "score")
    for (budget <- Seq(5L, 10L, 25L, 35L, 100L)) {
      val got = Sampling.selectByBudget(rows, "source", "doc_id",
        "n_tokens", "score", budget)
        .select("doc_id").as[Long].collect().toSet
      val want = naiveBudget(rows, budget)
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"budget=$budget: $got vs $want")
    }
  }

  test("exactPerGroup quantiles: a null group keeps its quantiles (null-safe join)") {
    import spark.implicits._
    val rows = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0), (None, 40.0)
    ).toDF("g", "v")
    val got = operators.Quantiles.exactPerGroup(rows, "g", "v", Seq(0.5, 1.0))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      (Some("a"), 0.5) -> 2.0, (Some("a"), 1.0) -> 3.0,
      (None, 0.5) -> 20.0, (None, 1.0) -> 40.0))
  }

  test("qualityTiers: null scores excluded from ranks, NaN ranked above all; both tier top") {
    import spark.implicits._
    // The pinned contract, identical in Spark and the DuckDB oracle:
    //  - a NULL score is excluded from the rank population (WHERE score IS
    //    NOT NULL / exactPerGroup's isNotNull filter) and tiers into the
    //    CASE else-branch (top tier);
    //  - a NaN score IS ranked — above every finite value in BOTH engines'
    //    sort order — so it shifts n and the cut ranks, and also tiers top
    //    (score <= t is false for NaN).
    // 9 finite scores 0.1..0.9 + 1 NaN → n=10, cut ranks ceil(10/3)=4 and
    // ceil(20/3)=7 → t1=0.4, t2=0.7.
    val finite = (1 to 9).map(i => (i.toLong, "s", i / 10.0))
    val rows = (finite ++ Seq((100L, "s", Double.NaN))).toDF("doc_id", "source", "score")
      .union(Seq((101L, "s")).toDF("doc_id", "source")
        .withColumn("score", lit(null).cast("double")))
    val got = Sampling.qualityTiers(rows, "source", "score", tiers = 3)
      .select("doc_id", "tier")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val wantFinite = finite.map { case (id, _, s) =>
      id -> (if (s <= 0.4) 0 else if (s <= 0.7) 1 else 2)
    }.toMap
    assert(got == wantFinite ++ Map(100L -> 2, 101L -> 2),
      s"tier drift with planted null/NaN docs: $got")
  }

  test("qualityTiers: an all-null-score group is dropped entirely") {
    import spark.implicits._
    // Pinned contract: a group with NO non-null score has no rank
    // population, exactPerGroup emits no threshold row for it, and the
    // inner threshold join drops the whole group — an unscored source
    // must not ride into the output as all-top-tier (and the oracle's
    // equi join on thresholds agrees by construction). Groups WITH
    // scores are untouched by the dropped group's presence.
    val scored = (1 to 6).map(i => (i.toLong, "scored", i / 10.0))
    val rows = scored.toDF("doc_id", "source", "score")
      .union(Seq((100L, "unscored"), (101L, "unscored")).toDF("doc_id", "source")
        .withColumn("score", lit(null).cast("double")))
    val got = Sampling.qualityTiers(rows, "source", "score", tiers = 3)
      .select("doc_id", "source", "tier")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(!got.keySet.exists(_ >= 100L),
      s"all-null-score group must be dropped, got $got")
    // n=6 → cut ranks ceil(6/3)=2, ceil(12/3)=4 → t1=0.2, t2=0.4
    val want = scored.map { case (id, _, s) =>
      id -> ("scored", if (s <= 0.2) 0 else if (s <= 0.4) 1 else 2)
    }.toMap
    assert(got == want, s"scored group drifted: $got")
  }

  test("withStructKey: multi-column cohorts through a single-groupCol operator") {
    import spark.implicits._
    // the documented composition path: qualityTiers over a packed
    // (source, lang) struct key must tier exactly as over an equivalent
    // single concatenated key (groups are isomorphic when no member is
    // null) — and a null MEMBER column forms a REAL cohort (the struct
    // itself is non-null), the documented semantic shift vs a direct
    // null group key, which qualityTiers drops
    val rnd = new scala.util.Random(61L)
    val rows = (1L to 60L).map { id =>
      (id, s"s${rnd.nextInt(3)}", s"l${rnd.nextInt(2)}", rnd.nextDouble())
    }.toDF("doc_id", "source", "lang", "score")
    val viaStruct = Sampling.qualityTiers(
        Projections.withStructKey(rows, Seq("source", "lang"), "__k"),
        "__k", "score", tiers = 3)
      .select("doc_id", "tier")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaConcat = Sampling.qualityTiers(
        rows.withColumn("__c", concat_ws(" ", col("source"), col("lang"))),
        "__c", "score", tiers = 3)
      .select("doc_id", "tier")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaStruct == viaConcat,
      s"struct-key cohorts diverged from the concat-key cohorts")
    // null member: (null, "en") survives as its own cohort
    val withNull = Seq((1L, null.asInstanceOf[String], "en", 0.1),
      (2L, null.asInstanceOf[String], "en", 0.5),
      (3L, null.asInstanceOf[String], "en", 0.9),
      (4L, "web", "en", 0.2), (5L, "web", "en", 0.6), (6L, "web", "en", 0.8))
      .toDF("doc_id", "source", "lang", "score")
    val kept = Sampling.qualityTiers(
        Projections.withStructKey(withNull, Seq("source", "lang"), "__k"),
        "__k", "score", tiers = 3)
      .select("doc_id", "tier")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"a null-member struct cohort must survive, got $kept")
    // each 3-doc cohort tiers 0/1/2 independently
    assert(kept(1L) == 0 && kept(2L) == 1 && kept(3L) == 2, kept.toString)
    assert(kept(4L) == 0 && kept(5L) == 1 && kept(6L) == 2, kept.toString)
  }

  test("topKPerGroup: groups smaller than k return whole group; payload survives") {
    import spark.implicits._
    val rows = Seq((1L, "a", 5L, 0.3), (2L, "a", 6L, 0.2), (3L, "b", 7L, 0.1))
      .toDF("doc_id", "source", "n_tokens", "score")
    val got = Sampling.topKPerGroup(rows, "source", "doc_id", "score", k = 10)
    assert(got.count() == 3)
    val payloads = got.select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(payloads == Map(1L -> 5L, 2L -> 6L, 3L -> 7L))
  }
}
