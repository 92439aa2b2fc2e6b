package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent elements).
  *
  * Reference analogs: `ref:P/sketches/FreqKSketch.java` (Misra-Gries
  * candidates, paper §4.4) and `ref:P/sketches/ExactFreqSketch.java`
  * (second exact pass over candidates). The UI then filters rows to/from
  * the heavy set — a semi/anti-join against a literal list.
  *
  * Two implementations, cross-checked in tests:
  *  - `exact`: groupBy(keys).count().filter(cnt >= threshold) — one shuffle
  *    of (key, partialCount) pairs only (map-side combine), fine even at
  *    100 TB when key cardinality is bounded;
  *  - `graft.functions.MisraGriesAgg`: the faithful shuffle-free sketch for
  *    unbounded-cardinality keys (candidates with lower-bound counts, no
  *    false negatives above N/k).
  */
object HeavyHitters {

  /** Exact heavy hitters over a key tuple: rows with count >= minCount,
    * heaviest first (total order: cnt desc, then keys asc).
    */
  def exact(df: DataFrame, keys: Seq[String], minCount: Long,
            limit: Int = 1000): DataFrame = {
    val sort = col("cnt").desc +: keys.map(k => col(k).asc_nulls_first)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(sort.toIndexedSeq: _*)
      .limit(limit)
  }

  /** Relative-threshold variant: count >= eps * N, N computed inside the
    * plan (broadcast scalar via cross join — no driver collect).
    */
  def exactRelative(df: DataFrame, keys: Seq[String], eps: Double,
                    limit: Int = 1000): DataFrame = {
    val total = df.agg(count(lit(1)).as("total_n"))
    val sort = col("cnt").desc +: keys.map(k => col(k).asc_nulls_first)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= col("total_n") * lit(eps))
      .drop("total_n")
      .orderBy(sort.toIndexedSeq: _*)
      .limit(limit)
  }

  /** Exact second pass over a candidate list (`ExactFreqSketch`):
    * semi-join-style probe, returns exact counts for candidates only.
    */
  def exactProbe(df: DataFrame, key: String, candidates: Seq[Any]): DataFrame =
    df.filter(col(key).isin(candidates: _*))
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col(key).asc_nulls_first)

  /** Tuple-key exact probe — the reference probes multi-column row
    * candidates (`ExactFreqSketch` over a schema subset): candidates are
    * value tuples in `keys` order, matched via an in-set struct predicate
    * (codegen'd; no join, one shuffle of matching rows only).
    */
  def exactProbeTuples(df: DataFrame, keys: Seq[String],
                       candidates: Seq[Seq[Any]]): DataFrame = {
    val keyStruct = struct(keys.map(col): _*)
    val lits = candidates.map(t => struct(t.map(lit): _*))
    df.filter(keyStruct.isin(lits: _*))
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(keys.map(k => col(k).asc_nulls_first).toIndexedSeq: _*)
  }

  /** Filter the base table to (or away from) the heavy tuples — the UI's
    * "view heavy rows as table" (semi/anti join against candidates).
    */
  def filterToHeavy(df: DataFrame, keys: Seq[String], minCount: Long,
                    keep: Boolean = true): DataFrame = {
    val heavy = df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    filterToHeavy(df, keys, heavy, keep)
  }

  /** Filter the base table against an ALREADY-COMPUTED heavy set (e.g. the
    * exact-probe output of the two-phase flow) instead of recomputing the
    * groupBy — broadcast of ≤ |heavy| key tuples, no extra shuffle.
    */
  def filterToHeavy(df: DataFrame, keys: Seq[String], heavy: DataFrame,
                    keep: Boolean): DataFrame =
    df.join(broadcast(heavy.select(keys.map(col).toIndexedSeq: _*)), keys,
      if (keep) "left_semi" else "left_anti")

  /** The composed two-phase heavy-hitter flow — the reference's signature
    * sketch interaction (paper §3.3/§4.4: `ref:P/sketches/FreqKSketch.java`
    * produces candidates, `ExactFreqSketch.java` re-counts them exactly,
    * then the UI filters the table to the heavy rows):
    *
    *   phase 1  Misra-Gries sketch over the key tuple — shuffle-free
    *            partial aggregation; ≤ k candidate tuples (a sketch-sized
    *            result, within the collect contract) reach the driver;
    *   phase 2  exact probe of ONLY those candidates: one shuffle of
    *            matching (tuple, partialCount) pairs;
    *   phase 3  semi join of the base table against the candidates whose
    *            EXACT count clears `minCount` (broadcast of ≤ k tuples).
    *
    * Returns the heavy base-table rows. Guarantees: MG has no false
    * negatives above N/(k+1), and phase 2 replaces MG's lower-bound counts
    * with exact ones, so for minCount > N/(k+1) the result is exactly the
    * rows whose tuple frequency ≥ minCount; with k > |distinct tuples| the
    * chain is exact for ANY minCount. Keys must render uniquely as strings
    * (the sketch key is the `sep`-joined rendering; see
    * [[graft.functions.MisraGries.sketchTuple]] for the null/separator
    * caveats).
    */
  def twoPhase(df: DataFrame, keys: Seq[String], k: Int, minCount: Long,
               sep: String = "\u0001"): DataFrame = {
    val cands = df
      .agg(graft.functions.MisraGries.sketchTuple(keys.map(col), k, sep).as("mg"))
      .select(explode(map_keys(col("mg"))).as("cand"))
      .collect() // ≤ k candidate tuples — sketch-sized by contract
      .map(_.getString(0).split(java.util.regex.Pattern.quote(sep), -1).toSeq)
      // a NULL key part is SKIPPED by the string rendering (concat_ws), so
      // its candidate splits into FEWER parts than keys.size — such tuples
      // cannot be probed through the rendering (and could never equi-match
      // a struct literal anyway); drop them instead of building a
      // mismatched-arity struct literal that fails analysis. MORE parts
      // than keys.size means a key VALUE contains the separator — fail
      // loudly rather than silently dropping a possibly-heavy tuple
      .filter { parts =>
        require(parts.length <= keys.size,
          s"twoPhase: a sketched key value contains the separator " +
            s"(candidate splits into ${parts.length} parts for ${keys.size} " +
            s"keys) — pass a `sep` absent from the data")
        parts.length == keys.size
      }
      .toSeq
    val exact = exactProbeTuples(df, keys, cands)
    filterToHeavy(df, keys, exact.filter(col("cnt") >= minCount), keep = true)
  }
}
