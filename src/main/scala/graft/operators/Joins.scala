package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Joins — beyond the reference's surface (hiero never joins two tables;
  * its `zip` pairs views of one table — SURVEY.md §2.5), but required by
  * this engine's north star. All joins are declared logically; Catalyst
  * picks broadcast-hash vs shuffled-hash vs sort-merge, and AQE can
  * re-plan at runtime (skew join splitting included).
  *
  * Scale guidance encoded here: `dim` marks a dimension table for explicit
  * broadcast (no shuffle of the fact side); fact-fact joins shuffle on the
  * join key and should share partitioning across stages when chained.
  */
object Joins {

  def equi(left: DataFrame, right: DataFrame, keys: Seq[String],
           how: String = "inner"): DataFrame =
    left.join(right, keys, how)

  /** Fact ⋈ broadcast(dim): hash join with zero shuffle on the fact side. */
  def withDim(fact: DataFrame, dim: DataFrame, keys: Seq[String],
              how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), keys, how)

  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Theta join (arbitrary condition) — BroadcastNestedLoop when one side
    * is small; keep the small side right.
    */
  def theta(left: DataFrame, right: DataFrame, cond: Column,
            how: String = "inner"): DataFrame =
    left.join(right, cond, how)

  /** Range join: equi keys + interval containment condition. */
  def range(left: DataFrame, right: DataFrame, equiKeys: Seq[String],
            rangeCond: Column): DataFrame = {
    val eq = equiKeys.map(k => left(k) === right(k)).reduceOption(_ && _)
    left.join(right, eq.map(_ && rangeCond).getOrElse(rangeCond))
  }
}
