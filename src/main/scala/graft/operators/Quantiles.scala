package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Quantile sketches.
  *
  * Reference analog: `ref:P/sketches/SampleQuantileSketch.java` (paper
  * §4.2) — a uniform sample sorted at the root giving an equi-depth
  * quantile table; powers the scroll bar.
  *
  * We expose: exact interpolated percentiles (matches DuckDB
  * `quantile_cont` for the oracle), Spark's Greenwald-Khanna
  * `approx_percentile` (the sketch path — bounded memory, single pass,
  * mergeable like every sketch), and the scroll-position map
  * (`percent_rank`).
  */
object Quantiles {

  /** Exact interpolated percentiles (one row, one column per prob). */
  def exact(df: DataFrame, column: String, probs: Seq[Double]): DataFrame =
    exactNamed(df, column, probs, probs.map(p => s"p${(p * 100).round}"))

  /** Exact interpolated percentiles WITHOUT a global sort — the
    * histogram-cut pattern ([[exactPerGroup]]'s global sibling). Spark's
    * `percentile` aggregate buffers the entire column in one aggregation
    * buffer — at 100 TB that is an OOM, not a plan — and the
    * sort+zipWithIndex form this replaces range-shuffles the whole
    * column just to read back ≤ 2·|probs| order statistics. Instead:
    *  1. one agg pass for (count, finite min/max) to auto-fit a monotone
    *     bin grid of ~2¹⁶ cells across the observed range;
    *  2. one linear bin-count shuffle whose output (≤ ~10·2¹⁶ rows of
    *     (bin, count)) is driver-walked to locate, per interpolation
    *     rank, the boundary bin and residual within-bin rank;
    *  3. ONLY boundary-bin rows (≈ n/bins each) pay an exact window to
    *     yield the order statistics.
    * The grid is exactness-preserving: `floor(v·10^s)` is monotone in v
    * (IEEE multiply by a positive constant is monotone), so the bins are
    * consecutive value ranges and the within-bin window orders by the
    * EXACT value — the rank-r statistic is the same value the full sort
    * would pick (ties are value-ties; saturated/NaN bins still order
    * correctly inside their window). Semantics are unchanged from the
    * sort form and match `percentile`/`quantile_cont`: nulls dropped,
    * NaN ranks above every value, interpolation
    * `lower + (higher - lower) * frac` in IEEE double, one HALF_UP
    * round to 6. A constant or all-NaN column degenerates to a single
    * bin whose window IS the old sort — still exact. The binned column
    * is pinned across its two passes and released before returning.
    */
  private def exactNamed(df: DataFrame, column: String, probs: Seq[Double],
                         names: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(names.map(n => StructField(n, DoubleType)))
    // filter ONLY nulls — na.drop would also drop NaN, which percentile
    // and quantile_cont keep (ranked last)
    val vals = df.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = vals.agg(
        count(lit(1)).as("n"),
        min(when(!isnan(col("v")), col("v"))).as("mn"),
        max(when(!isnan(col("v")), col("v"))).as("mx")).head()
      val n = stats.getLong(0)
      val out: Row =
        if (n == 0) Row(probs.map(_ => null): _*)
        else {
          // auto grid: ~2^16 bins across the finite range; exponent
          // clamped so 10^s stays a normal double (degenerate ranges
          // collapse to one bin — correct, just unaccelerated)
          val range =
            if (stats.isNullAt(1) || stats.isNullAt(2)) 0.0
            else stats.getDouble(2) - stats.getDouble(1)
          val s10 =
            if (range > 0 && !range.isInfinite)
              math.min(18.0, math.max(-18.0, math.floor(math.log10(65536.0 / range))))
            else 0.0
          val cmul = math.pow(10, s10)
          val binned = vals.withColumn("__bin",
            when(isnan(col("v")), lit(Long.MaxValue))
              .otherwise(floor(col("v") * cmul).cast("long")))
          val hist = binned.groupBy(col("__bin")).agg(count(lit(1)).as("c"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          val ranks = probs.map { p =>
            val pos = p * (n - 1)
            val lo = math.floor(pos).toLong
            (p, lo, math.ceil(pos).toLong, pos - lo)
          }
          // per needed 0-based rank: boundary bin + 1-based within rank
          // (needed is sorted, so one cumulative walk covers all ranks)
          val needed = ranks.flatMap(r => Seq(r._2, r._3)).distinct.sorted
          var cum = 0L
          var bi = 0
          val cuts = needed.map { r =>
            val target = r + 1
            while (cum + hist(bi)._2 < target) { cum += hist(bi)._2; bi += 1 }
            Row(r, hist(bi)._1, target - cum)
          }
          val cutSchema = StructType(Seq(
            StructField("__rank", org.apache.spark.sql.types.LongType, nullable = false),
            StructField("__cbin", org.apache.spark.sql.types.LongType, nullable = false),
            StructField("__within", org.apache.spark.sql.types.LongType, nullable = false)))
          val cutDf = spark.createDataFrame(java.util.Arrays.asList(cuts: _*), cutSchema)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__cbin"), col("__rank")).orderBy(col("v").asc)
          // sketch-sized collect: one row per needed order statistic
          val picked: Map[Long, Double] = binned
            .join(broadcast(cutDf), col("__bin") === col("__cbin"))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === col("__within"))
            .select(col("__rank"), col("v"))
            .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
          Row(ranks.map { case (_, lo, hi, frac) =>
            Det.round6(picked(lo) + (picked(hi) - picked(lo)) * frac)
          }: _*)
        }
      spark.createDataFrame(java.util.Arrays.asList(out), schema)
    } finally vals.unpersist()
  }

  /** EXACT discrete quantiles PER GROUP without a per-group sort — the
    * histogram-cut pattern ([[Sampling.selectByBudget]]'s sibling):
    * the naive `row_number().over(partitionBy(group).orderBy(v))` sorts
    * every group's full value set through one task per group, which is
    * precisely what dies when a 100 TB table has 6 groups. Instead:
    *  1. per-(group, bin) counts on a coarse monotone grid (one linear
    *     shuffle; sketch-sized result, guarded);
    *  2. the driver walks each group's bins in value order to locate,
    *     for every requested quantile q, the boundary bin holding rank
    *     `max(1, ceil(q·n))` and the residual rank within it;
    *  3. ONLY boundary-bin rows (≈ 1/bins of each group) are windowed to
    *     pick the exact order statistic.
    * Binning is exactness-preserving (monotone grid ⇒ bins are
    * consecutive value ranges; the within-bin refinement orders by the
    * exact value), and the discrete rank-`ceil(q·n)` semantics are the
    * engine-portable ones (no interpolation — the value RETURNED exists
    * in the data). Ties are value-ties, so any value-consistent order
    * yields the same order statistic. Null VALUES are dropped; NaN ranks
    * above every value (Spark sort order) — mirror the oracle accordingly.
    * A null GROUP is a real group (null-safe boundary join) and gets its
    * quantiles like any other. Returns (group, q, value), one row per
    * (group, requested q).
    */
  def exactPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                    probs: Seq[Double], binScale: Int = 2,
                    maxHistRows: Int = 1 << 20,
                    scope: graft.CacheScope = graft.CacheScope.session): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = df.sparkSession
    val rows = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // NaN: floor(NaN·s) is null-ish — bin NaN explicitly ABOVE all finite
    // bins so its grid position matches its sort position
    val binExpr = when(isnan(col("v")), lit(Long.MaxValue))
      .otherwise(floor(col("v") * math.pow(10, binScale)).cast("long"))
    val binned = scope.pin(rows.withColumn("__bin", binExpr))
    val hist = binned.groupBy(col("g"), col("__bin"))
      .agg(count(lit(1)).as("c"))
      .limit(maxHistRows + 1).collect()
    require(hist.length <= maxHistRows,
      s"exactPerGroup histogram exceeds $maxHistRows (group, bin) rows — " +
        "lower binScale or raise maxHistRows")
    // driver walk: per group, ascending bins; per prob, the boundary bin
    // and within-bin residual rank
    val cuts = hist.groupBy(_.get(0)).flatMap { case (g, rs) =>
      val bins = rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val n = bins.map(_._2).sum
      probs.map { p =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        var cum = 0L
        // explicit found flag: a genuine Long.MinValue bin (values past the
        // double->long saturation point) must not read as "not found yet"
        // and let a later bin overwrite the boundary
        var found = false
        var bin = 0L
        var within = 0L
        val it = bins.iterator
        while (it.hasNext && !found) {
          val (b, c) = it.next()
          if (cum + c >= target) { found = true; bin = b; within = target - cum }
          else cum += c
        }
        assert(found, s"exactPerGroup: target rank $target unreachable in group $g ($n rows)")
        Row(g, p, bin, within)
      }
    }.toSeq
    val groupField = df.schema(df.schema.fieldIndex(groupCol))
    val cutSchema = StructType(Seq(
      groupField.copy(name = "g"),
      StructField("q", DoubleType, nullable = false),
      StructField("__bin", org.apache.spark.sql.types.LongType, nullable = false),
      StructField("__rk", org.apache.spark.sql.types.LongType, nullable = false)))
    val cutDf = spark.createDataFrame(java.util.Arrays.asList(cuts: _*), cutSchema)
    // boundary fetch: rows of the right (group, bin) fan out per requested
    // q (bins rarely coincide across probs, and the fan-out is bounded by
    // |probs|), then a window over (group, q) — boundary-bin-sized — picks
    // the exact order statistic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"), col("q")).orderBy(col("v").asc)
    // null-safe group match (<=>): a null group is a real group — its cut
    // row must reach its bin rows, matching the naive window form (which
    // partitions nulls into their own group) instead of silently dropping
    // the group's quantiles at this equi-join
    val cut = broadcast(cutDf).withColumnRenamed("g", "__cg")
      .withColumnRenamed("__bin", "__cbin")
    binned.join(cut, col("g") <=> col("__cg") && col("__bin") === col("__cbin"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("__rk"))
      .select(col("g").as(groupCol), col("q"), col("v").as("value"))
  }

  /** Approximate percentiles — GK sketch, the single-pass bounded-memory
    * path (one shared sketch for all probs).
    */
  def approx(df: DataFrame, column: String, probs: Seq[Double],
             accuracy: Int = 10000): DataFrame =
    df.agg(approx_percentile(col(column), typedlit(probs), lit(accuracy)).as("q"))
      .select(probs.zipWithIndex.map { case (p, i) =>
        element_at(col("q"), i + 1).as(s"p${(p * 100).round}")
      }: _*)

  /** Equi-depth quantile table of size q over a sort column — the
    * reference's quantile "scroll bar" table (same histogram-cut
    * machinery as `exact`; names are positional q01..q(q-1), never
    * colliding regardless of q).
    */
  def table(df: DataFrame, column: String, q: Int): DataFrame = {
    val probs = (1 until q).map(i => i.toDouble / q)
    exactNamed(df, column, probs, probs.indices.map(i => f"q${i + 1}%02d"))
  }
}
