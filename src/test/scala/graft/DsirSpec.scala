package graft

import org.apache.spark.sql.functions._
import graft.operators.{Det, Sampling, TextOps}

/** DSIR importance resampling: driver brute-force parity of the exact
  * decimal log-weights, partitioning invariance, the planted-domain
  * ordering contract, and the Gumbel variant's structure.
  */
class DsirSpec extends SparkSpec {

  private val buckets = 512
  private val alpha = 1e-2

  private lazy val docs = graft.sources.Tables.open(spark, sf, "documents")
  private lazy val raw = docs.filter(col("doc_id") % 2 === 0)
  private lazy val target = docs.filter(col("doc_id") % 2 === 1)

  /** (id, bucket) pairs exactly as the operator computes them — collected
    * so the models and weights can be replayed in plain Scala.
    */
  private def bucketPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    TextOps.rawShingles(df, "doc_id", "text", 2)
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("sh")), 1, 13), 16, 10).cast("long"),
          lit(buckets.toLong)).cast("int").as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq

  private lazy val expected: Map[Long, BigDecimal] = {
    def logProbs(pairs: Seq[(Long, Int)]): Array[Double] = {
      val counts = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = counts.values.sum.toDouble
      Array.tabulate(buckets)(b =>
        math.log((counts.getOrElse(b, 0L) + alpha) / (total + alpha * buckets)))
    }
    val rawPairs = bucketPairs(raw)
    val pT = logProbs(bucketPairs(target))
    val pR = logProbs(rawPairs)
    val lr = Array.tabulate(buckets)(b =>
      BigDecimal(Det.round6(pT(b) - pR(b))).setScale(6))
    rawPairs.groupBy(_._1).view
      .mapValues(_.map(p => lr(p._2)).sum).toMap
  }

  private lazy val got: Map[Long, Double] =
    Sampling.importanceWeights(raw, target, "doc_id", "text",
        n = 2, buckets = buckets, alpha = alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("weights equal the driver replay exactly (decimal-sum determinism)") {
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, w) =>
      assert(w == expected(id).toDouble,
        s"doc $id: got $w, expected ${expected(id)}")
    }
  }

  test("weights are invariant under input partitioning") {
    val reGot = Sampling.importanceWeights(
        raw.repartition(13, col("doc_id")), target, "doc_id", "text",
        n = 2, buckets = buckets, alpha = alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(reGot == got)
  }

  test("planted domains: target-like docs outrank alien docs") {
    import spark.implicits._
    val tgt = (0L until 20L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val pool = (100L until 110L).map(i => (i, "alpha beta gamma delta"))
      .union((200L until 210L).map(i => (i, "zork quux blorp frotz")))
      .toDF("doc_id", "text")
    val top = Sampling.dsirTopK(pool, tgt, "doc_id", "text", k = 10,
        buckets = buckets, alpha = alpha)
      .collect().map(_.getLong(0)).toSet
    assert(top == (100L until 110L).toSet,
      s"the target-like half must win the top-k: $top")
  }

  test("gumbel top-k is reproducible, sized k, and within the weight support") {
    val a = Sampling.dsirTopK(raw, target, "doc_id", "text", k = 20,
        buckets = buckets, alpha = alpha, gumbel = true, seed = 7L)
      .collect().map(r => r.getLong(0)).toSeq
    val b = Sampling.dsirTopK(raw, target, "doc_id", "text", k = 20,
        buckets = buckets, alpha = alpha, gumbel = true, seed = 7L)
      .collect().map(r => r.getLong(0)).toSeq
    assert(a == b, "same seed must reproduce the same draw")
    assert(a.size == 20 && a.distinct.size == 20)
    val c = Sampling.dsirTopK(raw, target, "doc_id", "text", k = 20,
        buckets = buckets, alpha = alpha, gumbel = true, seed = 8L)
      .collect().map(r => r.getLong(0)).toSeq
    assert(a != c, "a different seed should (on this fixture) draw differently")
  }
}
