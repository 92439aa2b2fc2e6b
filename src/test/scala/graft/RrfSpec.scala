package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Reciprocal Rank Fusion: single-list order preservation, the
  * consensus property (a doc in both lists outranks same-rank docs in
  * one), deterministic tie-breaking, n_lists accounting, page bound,
  * and bm25Ranked ↔ bm25TopK order agreement.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def lst(rows: (Long, Long)*) = rows.toSeq.toDF("id", "rank")

  test("fusing a single list preserves its order exactly") {
    val a = lst(10L -> 1L, 20L -> 2L, 30L -> 3L)
    val got = TextOps.rrfFuse(Seq(a), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((10L, 1L), (20L, 2L), (30L, 3L)))
  }

  test("consensus wins: a doc ranked in BOTH lists beats one-list docs") {
    val a = lst(1L -> 1L, 2L -> 2L)
    val b = lst(1L -> 1L, 3L -> 2L)
    val got = TextOps.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // doc 1: 2/61; docs 2 and 3: 1/62 each — consensus first, then the
    // exact tie broken by ascending id
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), got.mkString(", "))
    assert(got.head._3 == 2L && got(1)._3 == 1L, "n_lists must count the lists carrying the doc")
    assert(got(1)._2 == got(2)._2, "symmetric one-list ranks must tie exactly")
  }

  test("page bound holds and rk is dense from 1") {
    val a = lst((1L to 20L).map(i => i -> i): _*)
    val got = TextOps.rrfFuse(Seq(a), k = 5).collect().map(_.getLong(3)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("bm25Ranked rank column is exactly bm25TopK's page order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val page = TextOps.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), 15)
      .collect().map(_.getLong(0)).toSeq
    val ranked = TextOps.bm25Ranked(docs, "doc_id", "text", Seq("spark", "join"), 15)
      .orderBy(col("rank")).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(ranked.map(_._1) == page)
    assert(ranked.map(_._2) == (1L to page.size).toSeq)
  }
}
