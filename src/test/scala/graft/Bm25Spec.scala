package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** BM25 relevance top-k (`TextOps.bm25TopK`): exact parity with a local
  * brute-force scorer, cutoff/order determinism, and guard contracts.
  */
class Bm25Spec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  /** Local reference scorer over collected docs — the same formula and
    * constant shapes as the operator (and the DuckDB oracle). Two-addend
    * per-doc sums are IEEE-commutative, so equality is exact after
    * round-6.
    */
  private def brute(query: Seq[String], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Double)] = {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
    val n = rows.length.toLong
    val avgdl = rows.map(_._2.length.toLong).sum.toDouble / n
    val dfq = query.distinct.map { t =>
      t -> rows.count(_._2.contains(t)).toLong
    }.toMap
    rows.flatMap { case (id, toks) =>
      val score = query.distinct.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val d = dfq(t).toDouble
          val idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
          Some(idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * toks.length / avgdl)))
        }
      }
      if (score.isEmpty) None
      else Some(id -> BigDecimal(score.sum).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(k).toSeq
  }

  test("bm25TopK equals the local brute-force scorer exactly") {
    val got = TextOps.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == brute(Seq("spark", "join"), 15))
  }

  test("single-term query: rarer term outranks at equal tf, longer docs penalized") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple banana banana banana"),
      (2L, "apple apple pad pad pad pad pad pad pad pad pad pad"),
      (3L, "apple pad")).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(tiny, "doc_id", "text", Seq("apple"), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 3 (short, 1 hit) and doc 2 (2 hits but long) both beat or trail
    // per the length normalization; exact order comes from the formula —
    // assert against the local scorer rather than hand-derived ranks
    val want = {
      val rows = Seq((1L, Seq("apple", "banana", "banana", "banana")),
        (2L, Seq.fill(2)("apple") ++ Seq.fill(10)("pad")),
        (3L, Seq("apple", "pad")))
      val n = 3L
      val avgdl = rows.map(_._2.length).sum.toDouble / n
      val d = rows.count(_._2.contains("apple")).toDouble
      rows.map { case (id, toks) =>
        val tf = toks.count(_ == "apple").toLong
        val idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
        id -> BigDecimal(idf * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sortBy { case (id, s) => (-s, id) }
    }
    assert(got.toSeq == want)
  }

  test("terms absent from the corpus contribute nothing; all-absent query returns empty") {
    val got = TextOps.bm25TopK(docs, "doc_id", "text", Seq("zzz_nonexistent"), 5)
    assert(got.collect().isEmpty)
    val mixed = TextOps.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "zzz_nonexistent"), 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mixed == brute(Seq("spark"), 15))
  }

  test("guards: empty query and non-positive k fail loudly") {
    intercept[IllegalArgumentException] {
      TextOps.bm25TopK(docs, "doc_id", "text", Nil, 5)
    }
    intercept[IllegalArgumentException] {
      TextOps.bm25TopK(docs, "doc_id", "text", Seq("spark"), 0)
    }
  }
}
