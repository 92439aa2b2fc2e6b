package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.QueryDefs._

/** Reference-parity single-table operators (SURVEY.md §2.2–§2.4, §2.6–§2.8):
  * summary/stats/range sketches, histograms (1-D/CDF/2-D/trellis), heavy
  * hitters, distinct, quantiles, NextK paging, filters, projections/
  * conversions/derived/json columns, set ops, sampling.
  */
object CoreQueries {

  /** Columns of the correlation-matrix / PCA sketches. */
  private val corrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Oracle for `correlation_matrix`: the same exact-decimal moment sums
    * and the same IEEE derivation as Stats.correlationMatrix, unpivoted to
    * one row per (col_x, col_y) pair.
    */
  private def corrMatrixSql: String = {
    val idx = corrCols.indices
    val sums = corrCols.zipWithIndex.map { case (c, i) => s"${sqlDsum(c)} AS s_$i" }
    val prods = for (i <- idx; j <- idx if i <= j)
      yield s"${sqlDsum(s"${corrCols(i)}*${corrCols(j)}")} AS sp_${i}_$j"
    val cells = for (i <- idx; j <- idx if i <= j) yield
      s"""SELECT '${corrCols(i)}' AS col_x, '${corrCols(j)}' AS col_y,
         |round((sp_${i}_$j - s_$i*s_$j/n) /
         |  (sqrt(sp_${i}_$i - s_$i*s_$i/n) * sqrt(sp_${j}_$j - s_$j*s_$j/n)), 6) AS corr_val
         |FROM m""".stripMargin
    val notNull = corrCols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    s"""WITH m AS (SELECT COUNT(*) AS n, ${(sums ++ prods).mkString(", ")}
       |FROM lineitem WHERE $notNull)
       |${cells.mkString("\nUNION ALL\n")}
       |ORDER BY col_x, col_y""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // ---- CorrMatrixSketch: full pairwise matrix, single pass ---------------
    Q("correlation_matrix", corrMatrixSql) {
      (s, d) => Stats.correlationMatrix(t(s, d, "lineitem"), corrCols)
        .select(col("col_x"), col("col_y"), round(col("corr_val"), 6).as("corr_val"))
        .orderBy(col("col_x"), col("col_y"))
    },

    // ---- LAMP projection (control points = per-category centroids on a
    // circle; per-row orthogonal Procrustes — LampSpec pins fixed-point
    // and kernel-parity invariants; not SQL-expressible → rows-only) -----
    Q.noOracle("lamp_projection") {
      (s, d) =>
        val li = t(s, d, "lineitem")
        val ctrls = Lamp.centroidControls(li, "l_returnflag",
          Seq("l_quantity", "l_extendedprice"))
        Lamp.project(
          li.filter(col("l_suppkey") <= 5)
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
          Seq("l_quantity", "l_extendedprice"), ctrls)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("lamp_x"), 6).as("lamp_x"), round(col("lamp_y"), 6).as("lamp_y"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("lamp_x"), col("lamp_y"))
    },

    // ---- PCA projection (moment sketch → driver eigen → codegen'd
    // linear projection; eigenvector signs are impl-defined → no oracle,
    // PCASpec pins the invariants) --------------------------------------
    Q.noOracle("pca_projection") {
      (s, d) => Stats.pcaProject(
        t(s, d, "lineitem").filter(col("l_suppkey") <= 5), corrCols, 2)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("pc_0"), 6).as("pc_0"), round(col("pc_1"), 6).as("pc_1"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("pc_0"), col("pc_1"))
    },

    // ---- View/session layer: open → brush child → memoized sketch ---------
    // The full interactive flow (object-id registry, lineage, job-grouped
    // memoized sketch) producing a histogram the oracle can check; the
    // sketch runs twice so the second call exercises the memo path.
    Q("view_session_flow",
      """SELECT LEAST(CAST(FLOOR((l_extendedprice - CAST(900 AS DOUBLE))/CAST(2602.5 AS DOUBLE)) AS INTEGER), 39) AS bucket,
        |COUNT(*) AS cnt FROM lineitem
        |WHERE l_returnflag = 'R' AND l_extendedprice BETWEEN 900 AND 105000
        |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) =>
        val session = new ViewSession(s)
        val root = session.open("lineitem", t(s, d, "lineitem"))
        val brushed = session.child(root, "brush")(_.filter(col("l_returnflag") === "R"))
        def run() = session.sketch(brushed, "hist:l_extendedprice:40")(
          Histograms.histogram1d(_, "l_extendedprice", 900.0, 105000.0, 40))
        run()
        run() // memo hit
    },

    // ---- SummarySketch: row count + presence -------------------------------
    Q("summary_count",
      "SELECT COUNT(*) AS row_count, COUNT(l_extendedprice) AS present_count FROM lineitem") {
      (s, d) => Stats.summary(t(s, d, "lineitem"), "l_extendedprice")
    },

    // ---- DoubleDataRangeSketch ---------------------------------------------
    Q("data_range",
      """SELECT MIN(l_extendedprice) AS min_val, MAX(l_extendedprice) AS max_val,
        |COUNT(l_extendedprice) AS present_count,
        |COUNT(*) - COUNT(l_extendedprice) AS missing_count FROM lineitem""".stripMargin) {
      (s, d) => Stats.dataRange(t(s, d, "lineitem"), "l_extendedprice")
    },

    // ---- BasicColStatSketch (exact-moment mean/stddev) ---------------------
    Q("basic_stats",
      s"""SELECT cnt, missing_count, min_val, max_val, s1/cnt AS avg_val,
         |CASE WHEN cnt > 1 THEN sqrt((s2 - s1*s1/cnt)/(cnt-1)) END AS stddev_val FROM (
         |  SELECT COUNT(l_extendedprice) AS cnt,
         |         COUNT(*) - COUNT(l_extendedprice) AS missing_count,
         |         MIN(l_extendedprice) AS min_val, MAX(l_extendedprice) AS max_val,
         |         ${sqlDsum("l_extendedprice")} AS s1,
         |         ${sqlDsum("l_extendedprice*l_extendedprice")} AS s2
         |  FROM lineitem)""".stripMargin) {
      (s, d) => Stats.basicStats(t(s, d, "lineitem"), "l_extendedprice")
    },

    // ---- HistogramSketch 1-D ----------------------------------------------
    Q("histogram_1d",
      """SELECT LEAST(CAST(FLOOR((l_extendedprice - CAST(900 AS DOUBLE))/CAST(2602.5 AS DOUBLE)) AS INTEGER), 39) AS bucket,
        |COUNT(*) AS cnt FROM lineitem
        |WHERE l_extendedprice BETWEEN 900 AND 105000
        |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) => Histograms.histogram1d(t(s, d, "lineitem"), "l_extendedprice", 900.0, 105000.0, 40)
    },

    // ---- CDF (same sketch, prefix-summed) ----------------------------------
    Q("histogram_cdf",
      """SELECT bucket, cnt,
        |CAST(SUM(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
        |FROM (
        |  SELECT LEAST(CAST(FLOOR((l_extendedprice - CAST(900 AS DOUBLE))/CAST(2602.5 AS DOUBLE)) AS INTEGER), 39) AS bucket,
        |         COUNT(*) AS cnt FROM lineitem
        |  WHERE l_extendedprice BETWEEN 900 AND 105000 GROUP BY 1)
        |ORDER BY bucket""".stripMargin) {
      (s, d) => Histograms.cdf(t(s, d, "lineitem"), "l_extendedprice", 900.0, 105000.0, 40)
    },

    // ---- Equi-DEPTH (quantile-binned) histogram ----------------------------
    // 8 buckets of ~n/8 events each over the heavy-usable value column;
    // boundaries are the discrete rank-ceil(i·n/8) order statistics
    // (i/8 is exact in double on both engines), bucket = count of
    // boundaries strictly below the value — the skew-robust sibling of
    // the equal-width histogram.
    Q("histogram_equidepth",
      """WITH v AS (
        |  SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT x, row_number() OVER (ORDER BY x) AS rn, COUNT(*) OVER () AS n
        |  FROM v),
        |t AS (
        |  SELECT r.x AS thr FROM r
        |  JOIN (SELECT UNNEST([0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q) k
        |    ON r.rn = GREATEST(1, CAST(CEIL(k.q * r.n) AS BIGINT))),
        |b AS (
        |  SELECT x, (SELECT COUNT(*) FROM t WHERE t.thr < v.x) AS bucket FROM v)
        |SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS cnt,
        |       MIN(x) AS lo, MAX(x) AS hi
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) => Histograms.equiDepth(t(s, d, "events"), "value", 8)
    },

    // ---- Per-group equi-DEPTH histogram ------------------------------------
    // The same rank-quantile binning computed independently per event
    // type in ONE pass (thresholds broadcast back, map-side bucketing) —
    // the "quartiles of the metric, per segment" product-analytics shape.
    Q("histogram_equidepth_per_group",
      """WITH v AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS x FROM events
        |  WHERE value IS NOT NULL),
        |r AS (
        |  SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
        |         COUNT(*) OVER (PARTITION BY g) AS n
        |  FROM v),
        |t AS (
        |  SELECT r.g, r.x AS thr FROM r
        |  JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS q) k
        |    ON r.rn = GREATEST(1, CAST(CEIL(k.q * r.n) AS BIGINT))),
        |b AS (
        |  SELECT v.g, v.x,
        |         (SELECT COUNT(*) FROM t WHERE t.g = v.g AND t.thr < v.x) AS bucket
        |  FROM v)
        |SELECT g AS event_type, CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS cnt,
        |       MIN(x) AS lo, MAX(x) AS hi
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, d) => Histograms.equiDepthPerGroup(t(s, d, "events"), "event_type", "value", 4)
    },

    // ---- String histogram --------------------------------------------------
    Q("histogram_string",
      """SELECT l_returnflag AS value, COUNT(*) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY 1 ASC NULLS FIRST LIMIT 1000""".stripMargin) {
      (s, d) => Histograms.histogramString(t(s, d, "lineitem"), "l_returnflag")
    },

    // ---- String histogram over boundary prefixes (StringHistogramBuckets) -
    Q("histogram_string_ranges",
      """SELECT CASE
        |  WHEN c_name >= 'Customer#000001000' THEN 2
        |  WHEN c_name >= 'Customer#000000500' THEN 1
        |  WHEN c_name >= 'Customer#000000100' THEN 0
        |  ELSE -1 END AS bucket, COUNT(*) AS cnt
        |FROM customer WHERE c_name IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) => Histograms.histogramStringRanges(t(s, d, "customer"), "c_name",
        Seq("Customer#000000100", "Customer#000000500", "Customer#000001000"))
    },

    // ---- HeatmapSketch (2-D histogram) ------------------------------------
    Q("heatmap_2d",
      """SELECT LEAST(CAST(FLOOR((l_quantity - CAST(0 AS DOUBLE))/CAST(5.0 AS DOUBLE)) AS INTEGER), 9) AS bx,
        |LEAST(CAST(FLOOR((l_discount - CAST(0 AS DOUBLE))/CAST(0.01 AS DOUBLE)) AS INTEGER), 9) AS by,
        |COUNT(*) AS cnt FROM lineitem
        |WHERE l_quantity BETWEEN 0 AND 50 AND l_discount BETWEEN 0 AND 0.1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, d) => Histograms.heatmap(t(s, d, "lineitem"),
        "l_quantity", 0.0, 50.0, 10, "l_discount", 0.0, 0.1, 10)
    },

    // ---- Histogram3DSketch (trellis) ---------------------------------------
    Q("heatmap_trellis",
      """SELECT l_returnflag AS split_val,
        |LEAST(CAST(FLOOR((l_quantity - CAST(0 AS DOUBLE))/CAST(5.0 AS DOUBLE)) AS INTEGER), 9) AS bx,
        |LEAST(CAST(FLOOR((l_discount - CAST(0 AS DOUBLE))/CAST(0.01 AS DOUBLE)) AS INTEGER), 9) AS by,
        |COUNT(*) AS cnt FROM lineitem
        |WHERE l_quantity BETWEEN 0 AND 50 AND l_discount BETWEEN 0 AND 0.1
        |GROUP BY 1, 2, 3 ORDER BY 1 ASC NULLS FIRST, 2, 3""".stripMargin) {
      (s, d) => Histograms.trellis(t(s, d, "lineitem"), "l_returnflag",
        "l_quantity", 0.0, 50.0, 10, "l_discount", 0.0, 0.1, 10)
    },

    // ---- Heavy hitters: absolute threshold ---------------------------------
    Q("heavy_hitters",
      """SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
        |HAVING COUNT(*) >= 8
        |ORDER BY cnt DESC, l_partkey ASC NULLS FIRST LIMIT 100""".stripMargin) {
      (s, d) => HeavyHitters.exact(t(s, d, "lineitem"), Seq("l_partkey"), 8L, 100)
    },

    // ---- Heavy hitters: eps*N threshold (total computed in-plan) -----------
    // eps = 0.15: the fixture's 6 (flag, status) groups are near-uniform at
    // ~1/6 of N each, so 0.15 emits all 6 rows (a 0.2 threshold sat above
    // every group's share and certified only 0 ≡ 0).
    Q("heavy_hitters_relative",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem
        |GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT COUNT(*) FROM lineitem) * 0.15
        |ORDER BY cnt DESC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        |LIMIT 100""".stripMargin) {
      (s, d) => HeavyHitters.exactRelative(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), 0.15, 100)
    },

    // ---- ExactFreqSketch: exact probe over candidates ----------------------
    Q("heavy_probe",
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE l_returnflag IN ('R', 'N') GROUP BY 1
        |ORDER BY 1 ASC NULLS FIRST""".stripMargin) {
      (s, d) => HeavyHitters.exactProbe(t(s, d, "lineitem"), "l_returnflag", Seq("R", "N"))
    },

    // ---- ExactFreqSketch over tuple candidates -----------------------------
    Q("heavy_probe_tuples",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem
        |WHERE (l_returnflag, l_linestatus) IN (('R','F'), ('N','O'))
        |GROUP BY 1, 2
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) {
      (s, d) => HeavyHitters.exactProbeTuples(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), Seq(Seq("R", "F"), Seq("N", "O")))
    },

    // ---- Composed two-phase flow: MG sketch -> exact probe -> filter-to-heavy
    // (the reference's signature interaction; k=10 > 6 distinct tuples makes
    // the chain exact, so the plain GROUP BY ... HAVING is a faithful oracle;
    // minCount=10000 keeps 5 of the fixture's 6 near-uniform groups)
    Q("heavy_hitters_twophase",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem
        |WHERE (l_returnflag, l_linestatus) IN (
        |  SELECT (l_returnflag, l_linestatus) FROM lineitem
        |  GROUP BY l_returnflag, l_linestatus HAVING COUNT(*) >= 10000)
        |GROUP BY 1, 2
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) {
      (s, d) => HeavyHitters.twoPhase(t(s, d, "lineitem"),
          Seq("l_returnflag", "l_linestatus"), k = 10, minCount = 10000L)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- GROUPING SETS (beyond cube/rollup: arbitrary group combinations) --
    Q("grouping_sets_counts",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // ---- Distinct count (exact) --------------------------------------------
    Q("distinct_count",
      "SELECT COUNT(DISTINCT l_partkey) AS n_distinct FROM lineitem") {
      (s, d) => DistinctOps.distinctCount(t(s, d, "lineitem"), "l_partkey")
    },

    // ---- HLogLogSketch (approx; no oracle — HLL impls differ) --------------
    Q.noOracle("approx_distinct") {
      (s, d) => DistinctOps.approxDistinctCount(t(s, d, "lineitem"), "l_partkey")
    },

    // ---- DistinctStringsSketch ---------------------------------------------
    Q("distinct_values",
      """SELECT DISTINCT o_orderpriority AS value FROM orders
        |ORDER BY 1 ASC NULLS FIRST LIMIT 100""".stripMargin) {
      (s, d) => DistinctOps.distinctValues(t(s, d, "orders"), "o_orderpriority")
    },

    // ---- Quantiles (exact interpolated; matches quantile_cont) -------------
    Q("quantiles",
      """SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |round(quantile_cont(l_extendedprice, 0.75), 6) AS p75 FROM lineitem""".stripMargin) {
      (s, d) => Quantiles.exact(t(s, d, "lineitem"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
    },

    // ---- Quantiles (Greenwald-Khanna sketch — the 100 TB path) -------------
    Q.noOracle("quantiles_approx") {
      (s, d) => Quantiles.approx(t(s, d, "lineitem"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
    },

    // ---- Exact per-group quantiles via the histogram cut -------------------
    // Rank-ceil(q*n) order statistics per group WITHOUT a per-group sort:
    // per-(group, bin) counts -> driver rank cuts -> only boundary-bin
    // rows windowed. The oracle is the naive full row_number() rank
    // selection, so the hash certifies the cut plan's exactness.
    Q("quantiles_per_group",
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL)
        |SELECT l_returnflag, q, v AS value
        |FROM r CROSS JOIN (SELECT UNNEST([CAST(0.25 AS DOUBLE), 0.5, 0.75, 0.99]) AS q) p
        |WHERE rn = GREATEST(1, CAST(CEIL(q * n) AS BIGINT))
        |ORDER BY l_returnflag, q""".stripMargin) {
      (s, d) => sortSmall(
        Quantiles.exactPerGroup(t(s, d, "lineitem"), "l_returnflag", "l_quantity",
          Seq(0.25, 0.5, 0.75, 0.99)),
        col("l_returnflag"), col("q"))
    },

    // ---- NextKSketch: dedup page under RecordOrder -------------------------
    Q("next_k_page",
      """SELECT strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate, l_orderkey, cnt
        |FROM (
        |  SELECT l_shipdate, l_orderkey, COUNT(*) AS cnt FROM lineitem
        |  WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |     OR (l_shipdate = TIMESTAMP '1998-06-01 00:00:00' AND l_orderkey >= 3000)
        |  GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20)
        |ORDER BY 1, 2""".stripMargin) {
      (s, d) =>
        val page = NextK.page(t(s, d, "lineitem"),
          Seq(SortKey("l_shipdate"), SortKey("l_orderkey")),
          Some(Seq(to_timestamp(lit("1998-06-01 00:00:00")), lit(3000L))), 20)
        page.select(
          operators.Det.fmtTs(col("l_shipdate")).as("l_shipdate"),
          col("l_orderkey"), col("cnt"))
    },

    // ---- Top-K page (TakeOrderedAndProject) --------------------------------
    Q("top_k_page",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC, l_linenumber ASC
        |LIMIT 20""".stripMargin) {
      (s, d) => NextK.topK(t(s, d, "lineitem"),
        Seq(SortKey("l_extendedprice", asc = false), SortKey("l_orderkey"), SortKey("l_linenumber")),
        20, Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
    },

    // ---- Filters -----------------------------------------------------------
    Q("filter_count",
      "SELECT COUNT(*) AS cnt FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25") {
      (s, d) =>
        val f = Filters.equality(t(s, d, "lineitem"), "l_returnflag", "R")
          .filter(col("l_quantity") > 25)
        f.agg(count(lit(1)).as("cnt"))
    },

    Q("filter_range2d_count",
      """SELECT COUNT(*) AS cnt FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount BETWEEN 0.02 AND 0.05""".stripMargin) {
      (s, d) => Filters.range2d(t(s, d, "lineitem"),
        "l_quantity", 10, 20, "l_discount", 0.02, 0.05).agg(count(lit(1)).as("cnt"))
    },

    Q("filter_string_count",
      "SELECT COUNT(*) AS cnt FROM orders WHERE o_orderpriority LIKE '%URGENT%'") {
      (s, d) => Filters.stringSearch(t(s, d, "orders"), "o_orderpriority", "URGENT")
        .agg(count(lit(1)).as("cnt"))
    },

    Q("filter_regex_count",
      "SELECT COUNT(*) AS cnt FROM customer WHERE regexp_matches(c_name, '[0-9]{2}$')") {
      (s, d) => Filters.stringSearch(t(s, d, "customer"), "c_name", "[0-9]{2}$",
        Filters.Regex).agg(count(lit(1)).as("cnt"))
    },

    // ---- RowComparisonFilter (spreadsheet jump, mixed asc/desc) ------------
    Q("filter_row_compare",
      """SELECT COUNT(*) AS cnt FROM lineitem
        |WHERE l_returnflag > 'N'
        |   OR (l_returnflag = 'N' AND l_quantity < 30)
        |   OR (l_returnflag = 'N' AND l_quantity = 30 AND l_orderkey >= 500)""".stripMargin) {
      (s, d) => Filters.rowComparison(t(s, d, "lineitem"),
        Seq(SortKey("l_returnflag"), SortKey("l_quantity", asc = false), SortKey("l_orderkey")),
        Seq(lit("N"), lit(30.0), lit(500L))).agg(count(lit(1)).as("cnt"))
    },

    // ---- ConvertColumnMap + projection -------------------------------------
    // ---- Project / drop / rename (the reference's column maps) -------------
    Q("project_rename",
      """SELECT n_nationkey AS nation_id, n_name AS nation_name
        |FROM nation ORDER BY nation_id""".stripMargin) {
      (s, d) =>
        val projected = Projections.project(
          Projections.dropColumns(t(s, d, "nation"), Seq("n_comment")),
          Seq("n_nationkey", "n_name"))
        Projections.rename(
          Projections.rename(projected, "n_nationkey", "nation_id"),
          "n_name", "nation_name")
          .orderBy(col("nation_id"))
    },

    Q("convert_columns",
      """SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS DOUBLE) AS ln_double,
        |CAST(l_orderkey AS VARCHAR) AS key_str,
        |strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, ship_day LIMIT 500""".stripMargin) {
      // (l_orderkey, l_linenumber) is NOT unique in the fixture — order by
      // every non-derived output column for a deterministic page.
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("double").as("ln_double"),
        col("l_orderkey").cast("string").as("key_str"),
        operators.Det.fmtDate(col("l_shipdate")).as("ship_day"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_day")).limit(500)
    },

    // ---- Derived column (Catalyst expr ≙ reference's JS UDF column) --------
    Q("derived_expr",
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice*(1-l_discount) AS revenue,
        |l_extendedprice*(1-l_discount)*(1+l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge LIMIT 500""".stripMargin) {
      (s, d) =>
        val base = t(s, d, "lineitem")
        val r1 = Projections.derive(base, "revenue", "l_extendedprice*(1-l_discount)")
        val r2 = Projections.derive(r1, "charge", "l_extendedprice*(1-l_discount)*(1+l_tax)")
        r2.select("l_orderkey", "l_linenumber", "revenue", "charge")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"), col("charge"))
          .limit(500)
    },

    // ---- JSON key extraction -----------------------------------------------
    Q("json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin) {
      (s, d) => Projections.jsonExtract(t(s, d, "events"), "props", "k", "k_raw")
        .select(col("event_id"), col("k_raw").cast("int").as("k_val"))
        .orderBy(col("event_id")).limit(1000)
    },

    // ---- SQL-text interface (registerAll + spark.sql) ----------------------
    Q("sql_interface",
      """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |WHERE o_totalprice > 100000 GROUP BY 1
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        sources.Tables.registerAll(s, d)
        s.sql(
          """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
            |WHERE o_totalprice > 100000 GROUP BY 1
            |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // ---- JSON struct parse (from_json with schema; beyond key extract) -----
    Q("json_struct_parse",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin) {
      (s, d) => t(s, d, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("event_id"), col("j.k").as("k_val"), (col("j.k") % 10).as("k_mod"))
        .orderBy(col("event_id")).limit(1000)
    },

    // ---- Date/time function family -----------------------------------------
    Q("datetime_functions",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |CAST(month(o_orderdate) AS INTEGER) AS mo,
        |CAST(isodow(o_orderdate) AS INTEGER) AS dow_iso,
        |COUNT(*) AS cnt,
        |strftime(MIN(date_trunc('month', o_orderdate)), '%Y-%m-%d %H:%M:%S') AS month_start
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) {
      (s, d) => t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          // Spark dayofweek: 1=Sunday..7=Saturday; ISO dow: 1=Monday..7=Sunday
          (pmod(dayofweek(col("o_orderdate")) + lit(5), lit(7)) + lit(1)).as("dow_iso"))
        .agg(count(lit(1)).as("cnt"),
          Det.fmtTs(min(date_trunc("month", col("o_orderdate")))).as("month_start"))
        .orderBy(col("yr"), col("mo"), col("dow_iso"))
    },

    // ---- Set operations on two selections of one table ---------------------
    Q("set_ops_counts",
      """SELECT COUNT(CASE WHEN l_quantity > 45 OR l_discount >= 0.09 THEN 1 END) AS n_union,
        |COUNT(CASE WHEN l_quantity > 45 AND l_discount >= 0.09 THEN 1 END) AS n_intersect,
        |COUNT(CASE WHEN l_quantity > 45 AND NOT (l_discount >= 0.09) THEN 1 END) AS n_minus
        |FROM lineitem""".stripMargin) {
      (s, d) =>
        val li = t(s, d, "lineitem")
        val a = col("l_quantity") > 45
        val b = col("l_discount") >= 0.09
        val u = SetOps.unionView(li, a, b).agg(count(lit(1)).as("n_union"))
        val i = SetOps.intersectView(li, a, b).agg(count(lit(1)).as("n_intersect"))
        val m = SetOps.minusView(li, a, b).agg(count(lit(1)).as("n_minus"))
        u.crossJoin(i).crossJoin(m)
    },

    // ---- RandomSamplingSketch (seeded; no SQL oracle — rows-only) ----------
    Q.noOracle("sample_rows") {
      (s, d) => Sampling.uniform(t(s, d, "lineitem"), 0.01, 42L)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(100)
    },

    // ---- Stratified sample (per-stratum fractions; seeded, rows-only) ------
    Q.noOracle("sample_stratified") {
      (s, d) => Sampling.stratified(t(s, d, "lineitem"), "l_returnflag",
          Map("A" -> 0.02, "N" -> 0.005, "R" -> 0.02), 42L)
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))
    },

    // ---- Exactly-k per-group sample (bottom-k by hash; deterministic but
    // hash-defined, so no SQL oracle — the window-parity + uniformity
    // contracts live in CoreOpsSpec) ----------------------------------------
    Q.noOracle("sample_per_group") {
      (s, d) => Sampling.uniformPerGroup(
          t(s, d, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", k = 5)
        .orderBy(col("lang"), col("doc_id"))
    },

    // ---- Temperature-scaled source mixing (seeded, rows-only) --------------
    Q.noOracle("sample_temperature") {
      (s, d) => Sampling.temperatureMix(t(s, d, "documents"), "source",
          temperature = 2.0, targetRows = 200L)
        .groupBy("source").agg(count(lit(1)).as("cnt"))
        .orderBy(col("source"))
    },

    // ---- Token-weighted temperature mixing (the budgeted form) -------------
    Q.noOracle("sample_temperature_tokens") {
      (s, d) => {
        val docs = t(s, d, "documents")
        val withTok = docs.join(
          TextOps.tokenCount(docs, "doc_id", "text"), Seq("doc_id"))
        Sampling.temperatureMixTokens(withTok, "source", "n_tokens",
            temperature = 2.0, targetTokens = 8000L)
          .groupBy("source")
          .agg(count(lit(1)).as("cnt"), sum(col("n_tokens")).as("n_tokens"))
          .orderBy(col("source"))
      }
    },

    // ---- Portable temperature mixing (keyed-md5; hash-EXACT twins) ---------
    // The oracle replays the WHOLE mix: per-lang counts, share weights
    // √n (temperature 2 — sqrt is IEEE-correctly-rounded, so the shares
    // are bit-identical cross-engine, unlike libm pow), clamped fractions,
    // round-half-up thresholds on the 2^52 hash grid, and the per-row
    // keyed-md5 inclusion. lang is the skewed stratum (en dominates);
    // targetRows = 400 of 500 drives the smallest lang's fraction past 1,
    // exercising the clamp. Aggregated per lang: count + exact char sum +
    // id extremes pin the selected set.
    Q("sample_temperature_hash",
      """WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, SQRT(CAST(n AS DOUBLE)) AS p FROM cnt WHERE n > 0),
        |z AS (SELECT CAST(SUM(p) AS DOUBLE) AS z FROM w),
        |thr AS (SELECT w.lang,
        |        CAST(FLOOR(LEAST(1.0, ((400.0 * w.p) / z.z) / CAST(w.n AS DOUBLE))
        |             * 4503599627370496.0 + 0.5) AS BIGINT) AS t
        |        FROM w, z),
        |s AS (SELECT d.lang, d.doc_id, d.n_chars
        |      FROM documents d JOIN thr ON d.lang = thr.lang
        |      WHERE CAST(('0x' || substring(md5(d.doc_id || ':42'), 1, 13)) AS BIGINT) < thr.t)
        |SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) =>
        Sampling.temperatureMixByHash(t(s, d, "documents"), "lang", "doc_id",
            temperature = 2.0, targetRows = 400L)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .orderBy(col("lang"))
    },

    // ---- Portable token-weighted temperature mixing (the budgeted form) ----
    // Same machinery with source weight = total chars (the token-budget
    // proxy already materialized on the table): shares ∝ √W, expected
    // output weight 120k of ~149k — the lightest lang clamps at keeping
    // every row, the heaviest samples at ~0.57.
    Q("sample_temperature_tokens_hash",
      """WITH wt AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS w
        |            FROM documents GROUP BY 1),
        |w AS (SELECT lang, w, SQRT(CAST(w AS DOUBLE)) AS p FROM wt WHERE w > 0),
        |z AS (SELECT CAST(SUM(p) AS DOUBLE) AS z FROM w),
        |thr AS (SELECT w.lang,
        |        CAST(FLOOR(LEAST(1.0, ((120000.0 * w.p) / z.z) / CAST(w.w AS DOUBLE))
        |             * 4503599627370496.0 + 0.5) AS BIGINT) AS t
        |        FROM w, z),
        |s AS (SELECT d.lang, d.doc_id, d.n_chars
        |      FROM documents d JOIN thr ON d.lang = thr.lang
        |      WHERE CAST(('0x' || substring(md5(d.doc_id || ':42'), 1, 13)) AS BIGINT) < thr.t)
        |SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) =>
        Sampling.temperatureMixTokensByHash(t(s, d, "documents"), "lang",
            "doc_id", "n_chars", temperature = 2.0, targetWeight = 120000L)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .orderBy(col("lang"))
    },

    // ---- DSIR importance selection toward a target domain ------------------
    // Odd-id docs play the target corpus ("distributed like Wikipedia"),
    // even-id docs the raw pool; the 50 most target-like raw docs by the
    // hashed-bigram log-likelihood ratio. Oracle-EXACT: the feature
    // buckets are the portable md5 hex-prefix key (splitByHash
    // convention), the per-bucket log ratio is rounded to 6 decimals on
    // both sides, and the per-doc sum is the exact DECIMAL(30,6)
    // accumulation (Det.dsum ≡ sqlDsum) — so DuckDB replays the entire
    // two-model pipeline bit-identically. DsirSpec additionally pins
    // driver brute-force parity, partitioning invariance, and the
    // planted-domain ordering contract.
    Q("pipeline_dsir_topk",
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, UNNEST(list_transform(range(1, len(t)),
        |    i -> list_extract(t, i) || ' ' || list_extract(t, i+1))) AS sh
        |  FROM tk),
        |bk AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substring(md5(sh), 1, 13)) AS BIGINT) % 8192 AS b
        |  FROM sh),
        |rawb AS (SELECT doc_id, b FROM bk WHERE doc_id % 2 = 0),
        |tgtb AS (SELECT doc_id, b FROM bk WHERE doc_id % 2 = 1),
        |rawc AS (SELECT b, COUNT(*) AS c FROM rawb GROUP BY b),
        |tgtc AS (SELECT b, COUNT(*) AS c FROM tgtb GROUP BY b),
        |tot AS (SELECT CAST((SELECT SUM(c) FROM rawc) AS DOUBLE) AS rt,
        |               CAST((SELECT SUM(c) FROM tgtc) AS DOUBLE) AS tt),
        |lr AS (
        |  SELECT g.b,
        |    round(ln((COALESCE(tc.c, 0) + CAST(0.01 AS DOUBLE))
        |             / (tot.tt + CAST(0.01 AS DOUBLE) * CAST(8192 AS DOUBLE)))
        |        - ln((COALESCE(rc.c, 0) + CAST(0.01 AS DOUBLE))
        |             / (tot.rt + CAST(0.01 AS DOUBLE) * CAST(8192 AS DOUBLE))), 6) AS lr
        |  FROM (SELECT UNNEST(range(0, 8192)) AS b) g
        |  CROSS JOIN tot
        |  LEFT JOIN tgtc tc ON tc.b = g.b
        |  LEFT JOIN rawc rc ON rc.b = g.b)
        |SELECT rawb.doc_id,
        |       CAST(SUM(CAST(lr.lr AS DECIMAL(30,6))) AS DOUBLE) AS log_weight
        |FROM rawb JOIN lr ON rawb.b = lr.b
        |GROUP BY rawb.doc_id
        |ORDER BY log_weight DESC, rawb.doc_id
        |LIMIT 50""".stripMargin) {
      (s, d) => {
        val docs = t(s, d, "documents")
        Sampling.dsirTopK(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", k = 50)
      }
    },

    // ---- Portable hash sampling (md5-keyed) --------------------------------
    // Oracle-EXACT siblings of the seeded sampling family: every inclusion
    // decision is a pure expression over md5(id:seed) (the splitByHash
    // convention), so the very same subset re-derives in DuckDB and the
    // rows are hash-checked, not rows-only. The aggregate output pins the
    // WHOLE selected set (count + exact decimal sum + key extremes), not
    // just a page of it.
    Q("sample_rows_hash",
      s"""WITH s AS (
        |  SELECT * FROM lineitem
        |  WHERE CAST(('0x' || substring(md5(l_orderkey || '-' || l_linenumber || ':42'), 1, 13)) AS BIGINT)
        |        < ${Sampling.hashThreshold(0.01)})
        |SELECT COUNT(*) AS n_rows,
        |       ${QueryDefs.sqlDsum("l_quantity")} AS sum_qty,
        |       MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
        |FROM s""".stripMargin) {
      (s, d) =>
        val li = t(s, d, "lineitem").withColumn("__id",
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")))
        Sampling.uniformByHash(li, "__id", 0.01)
          .agg(count(lit(1)).as("n_rows"),
            Det.dsum(col("l_quantity")).as("sum_qty"),
            min(col("l_orderkey")).as("min_key"),
            max(col("l_orderkey")).as("max_key"))
    },

    // ---- Portable stratified sample (per-stratum hash thresholds) ----------
    Q("sample_stratified_hash",
      s"""WITH s AS (
        |  SELECT l_returnflag FROM lineitem
        |  WHERE CAST(('0x' || substring(md5(l_orderkey || '-' || l_linenumber || ':42'), 1, 13)) AS BIGINT)
        |        < CASE l_returnflag WHEN 'A' THEN ${Sampling.hashThreshold(0.02)}
        |                            WHEN 'N' THEN ${Sampling.hashThreshold(0.005)}
        |                            WHEN 'R' THEN ${Sampling.hashThreshold(0.02)} END)
        |SELECT l_returnflag, COUNT(*) AS cnt
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, d) =>
        val li = t(s, d, "lineitem").withColumn("__id",
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")))
        Sampling.stratifiedByHash(li, "l_returnflag", "__id",
            Map("A" -> 0.02, "N" -> 0.005, "R" -> 0.02))
          .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"))
    },

    // ---- Portable weighted (PPS / Poisson) sample --------------------------
    // Keep probability min(1, rate·n_chars): the threshold expression uses
    // only IEEE-exact ops (multiply, min, floor, power-of-two scale), so
    // both engines derive bit-identical per-row thresholds — the clamp
    // branch is exercised (docs with n_chars ≥ 500 reach p = 1).
    Q("sample_weighted_hash",
      """WITH s AS (
        |  SELECT doc_id, n_chars FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0
        |    AND CAST(('0x' || substring(md5(doc_id || ':42'), 1, 13)) AS BIGINT)
        |        < CAST(FLOOR(LEAST(1.0, 0.002 * CAST(n_chars AS DOUBLE)) * 4503599627370496.0) AS BIGINT))
        |SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM s""".stripMargin) {
      (s, d) => Sampling.weightedByHash(t(s, d, "documents"), "doc_id",
          "n_chars", rate = 0.002)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },

    // ---- Portable exactly-k per-group sample (md5 rank order) --------------
    Q("sample_per_group_hash",
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(doc_id || ':42'), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, n_chars FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin) {
      (s, d) => Sampling.uniformPerGroupByHash(
          t(s, d, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", k = 5)
        .orderBy(col("lang"), col("doc_id"))
    },

    // ---- CorrMatrixSketch (one cell, exact moments) ------------------------
    Q("correlation",
      """SELECT n, (sxy - sx*sy/n) / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n)) AS corr_val
        |FROM (
        |  SELECT COUNT(*) AS n,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS syy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL)""".stripMargin) {
      (s, d) => Stats.correlation(t(s, d, "lineitem"), "l_quantity", "l_extendedprice")
    },

    // ---- CentroidsSketch ---------------------------------------------------
    Q("centroids",
      """SELECT l_returnflag, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) AS avg_l_quantity,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) AS avg_l_extendedprice
        |FROM lineitem GROUP BY 1 ORDER BY 1 ASC NULLS FIRST""".stripMargin) {
      (s, d) => Stats.centroids(t(s, d, "lineitem"), "l_returnflag",
        Seq("l_quantity", "l_extendedprice"))
        .orderBy(col("l_returnflag").asc_nulls_first)
    },

    // ---- LinearProjectionMap -----------------------------------------------
    Q("linear_projection",
      """SELECT l_orderkey, l_linenumber,
        |l_quantity*0.5 + l_extendedprice*0.001 + l_discount*10.0 AS proj0,
        |l_quantity*(-1.0) + l_extendedprice*0.0005 + l_discount*0.0 AS proj1
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, proj0, proj1 LIMIT 500""".stripMargin) {
      (s, d) => Projections.linearProjection(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq(Seq(0.5, 0.001, 10.0), Seq(-1.0, 0.0005, 0.0)), "proj")
        .select(col("l_orderkey"), col("l_linenumber"), col("proj0"), col("proj1"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("proj0"), col("proj1"))
        .limit(500)
    }
  )
}
