package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The spreadsheet page sketch — `ref:P/sketches/NextKSketch.java`
  * (paper §4.2): the k smallest *distinct* rows ≥ a start row under a
  * multi-column RecordOrder, each with its occurrence count.
  *
  * Spark shape: pushable row-comparison filter → groupBy(order columns)
  * with count → orderBy + limit k. Catalyst plans the tail as
  * TakeOrderedAndProject — no global sort is materialized, matching the
  * reference's "never produce large outputs" discipline.
  */
object NextK {

  /** @param start values aligned with `order` (None = first page). */
  def page(df: DataFrame, order: Seq[SortKey], start: Option[Seq[Column]],
           k: Int): DataFrame = {
    val base = start match {
      case Some(s) => df.filter(Filters.rowAtLeast(order, s))
      case None    => df
    }
    val keyCols = order.map(o => col(o.name))
    base.groupBy(keyCols.toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(order.map(_.toCol).toIndexedSeq: _*)
      .limit(k)
  }

  /** Plain top-k page without dedup (orderBy+limit → TakeOrderedAndProject). */
  def topK(df: DataFrame, order: Seq[SortKey], k: Int,
           projectCols: Seq[String] = Nil): DataFrame = {
    val p = if (projectCols.isEmpty) df
            else df.select(projectCols.map(col).toIndexedSeq: _*)
    p.orderBy(order.map(_.toCol).toIndexedSeq: _*).limit(k)
  }
}
