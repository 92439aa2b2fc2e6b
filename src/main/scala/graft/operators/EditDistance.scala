package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) threshold self-join — the typo/variant
  * sibling of `Dedup.jaccardPairs`: all pairs within `maxDist` edits,
  * EXACT (candidates are verified with the built-in bounded
  * `levenshtein(l, r, threshold)`), but generated sub-quadratically by
  * partition-based pruning (the PassJoin scheme, Li, Deng & Feng,
  * PVLDB 5(3), 2011).
  *
  * Pruning argument: split every indexed string of length L into
  * `maxDist + 1` contiguous segments. Any string t with
  * ed(s, t) ≤ maxDist must contain at least one segment of s INTACT
  * (maxDist edits destroy at most maxDist segments — pigeonhole), as a
  * substring whose position shift q − p obeys
  * |q − p| + |Δ − (q − p)| ≤ maxDist (Δ = |t| − L: the prefix pays
  * |shift| edits and the suffix pays the rest), a window of at most
  * maxDist + 1 starts. So the probe side emits, for each target length
  * L ∈ [|t| − k, |t| + k] and segment index, exactly the substrings in
  * that window, and an equi-join on (L, segIdx, segment) is a COMPLETE
  * candidate filter — every true pair survives; false candidates are
  * discarded by the exact verify. Segments shorter than 1 char (strings
  * with fewer than maxDist + 1 chars) degrade to empty-string keys that
  * match all length-compatible short strings — harmless, those
  * verifies are O(maxDist²).
  *
  * Scale shape: both emissions are map-side array expressions
  * (whole-stage codegen'd, O(maxDist²) structs per row); the only
  * shuffles are the equi-join keyed by (length, segIdx, segment) and
  * the candidate-pair distinct. Candidate volume is governed by aligned
  * segment selectivity: natural text keys are near-unique, adversarial
  * shared-prefix corpora degrade toward the quadratic block — the same
  * contract as LSH banding. The verify is bounded: `levenshtein` with a
  * threshold runs the banded O(len·maxDist) DP, not full O(len²).
  *
  * Output: (d1, d2, dist), d1 < d2 as longs (ids cast — the
  * `ivfDupPairs` long-id contract), dist ≤ maxDist including 0 for
  * identical strings. Null strings are dropped (no distance to null).
  * Ref: the reference has no string-similarity join; this extends
  * `ref:P/table/filters/` string matching to the pair domain.
  */
object EditDistance {

  /** Even partition of a length-`L` string into `k + 1` segments: the
    * first `(k + 1) − (L mod (k + 1))` get `⌊L / (k + 1)⌋` chars, the
    * rest one more. Both sides MUST derive (start, len) from the same
    * (L, i) arithmetic or the equi-join silently loses pairs.
    */
  private def baseLen(tl: Column, k: Int): Column =
    floor(tl / (k + 1)).cast("int")
  private def firstLong(tl: Column, k: Int): Column =
    lit(k + 1) - pmod(tl, lit(k + 1))
  private def segLen(tl: Column, i: Column, k: Int): Column =
    baseLen(tl, k) + when(i >= firstLong(tl, k), lit(1)).otherwise(lit(0))
  private def segStart(tl: Column, i: Column, k: Int): Column =
    (i * baseLen(tl, k) + greatest(lit(0), i - firstLong(tl, k))).cast("int")

  /** Index-side emission: each row's own k + 1 segments, keyed by
    * (own length, segment index, segment text).
    */
  private def indexSide(base: DataFrame, k: Int): DataFrame = {
    val len = length(col("s")).cast("int")
    val segs = transform(sequence(lit(0), lit(k)), i =>
      struct(
        len.as("tl"),
        i.cast("int").as("si"),
        col("s").substr(segStart(len, i, k) + 1, segLen(len, i, k)).as("seg")))
    base.select(col("id").as("id_i"), col("s").as("s_i"), explode(segs).as("e"))
      .select(col("e.tl").as("tl"), col("e.si").as("si"), col("e.seg").as("seg"),
        col("id_i"), col("s_i"))
  }

  /** Probe-side emission: for every target length within ±k and every
    * segment index, the substrings in the shift window
    * |q − p| + |Δ − (q − p)| ≤ k (at most k + 1 starts).
    */
  private def probeSide(base: DataFrame, k: Int): DataFrame = {
    val m = length(col("s")).cast("int")
    val emits = flatten(transform(
      sequence(greatest(lit(0), m - k), m + k), tl => {
        val delta = m - tl
        val sLo = ceil((delta - lit(k)).cast("double") / 2.0).cast("int")
        val sHi = floor((delta + lit(k)).cast("double") / 2.0).cast("int")
        flatten(transform(sequence(lit(0), lit(k)), i => {
          val li = segLen(tl, i, k)
          val pi = segStart(tl, i, k)
          val qLo = greatest(lit(0), pi + sLo)
          val qHi = least(m - li, pi + sHi)
          val starts = when(qHi >= qLo, sequence(qLo, qHi))
            .otherwise(array().cast("array<int>"))
          transform(starts, q =>
            struct(tl.cast("int").as("tl"), i.cast("int").as("si"),
              col("s").substr(q + 1, li).as("seg")))
        }))
      }))
    base.select(col("id").as("id_p"), col("s").as("s_p"), explode(emits).as("e"))
      .select(col("e.tl").as("tl"), col("e.si").as("si"), col("e.seg").as("seg"),
        col("id_p"), col("s_p"))
  }

  /** Distinct candidate pairs (d1 < d2, with both strings) — the
    * complete-superset stage, exposed for the spec's selectivity pin.
    */
  private[graft] def candidates(df: DataFrame, idCol: String, strCol: String,
                                maxDist: Int): DataFrame = {
    val base = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    probeSide(base, maxDist)
      .join(indexSide(base, maxDist), Seq("tl", "si", "seg"))
      .filter(col("id_p") =!= col("id_i"))
      .select(
        least(col("id_p"), col("id_i")).as("d1"),
        greatest(col("id_p"), col("id_i")).as("d2"),
        when(col("id_p") < col("id_i"), col("s_p")).otherwise(col("s_i")).as("s1"),
        when(col("id_p") < col("id_i"), col("s_i")).otherwise(col("s_p")).as("s2"))
      .distinct()
  }

  /** All pairs with ed(s1, s2) ≤ `maxDist`: PassJoin candidates, then
    * the bounded-DP exact verify. See the object doc for contracts.
    */
  def pairs(df: DataFrame, idCol: String, strCol: String,
            maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    Dedup.requireIntegralId(df, idCol, "EditDistance.pairs")
    candidates(df, idCol, strCol, maxDist)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("d1"), col("d2"), col("dist"))
  }
}
