package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EditDistance.pairs — PassJoin candidate completeness (the window
  * arithmetic is the risky part: a lost candidate is a silently missing
  * pair) and selectivity (the point of the operator).
  */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force truth: full cross join + the same built-in levenshtein.
    * Valid on tiny N only; the operator must reproduce it EXACTLY.
    */
  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    val df = rows.toDF("id", "s")
    val a = df.select(col("id").as("d1"), col("s").as("s1"))
    val b = df.select(col("id").as("d2"), col("s").as("s2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), k))
      .filter(col("dist") >= 0)
      .select("d1", "d2", "dist").as[(Long, Long, Int)].collect().toSet
  }

  private def got(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    EditDistance.pairs(rows.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet

  /** Seeded corpus dense in near pairs: mutated variants (substitution,
    * insertion, deletion — indels exercise the Δ ≠ 0 shift window) of a
    * few base strings over a 3-letter alphabet, plus random background.
    */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abc"
    def rs(len: Int) = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
    val bases = Seq.fill(n / 4)(rs(5 + rnd.nextInt(8)))
    val mutated = bases.flatMap { b =>
      val subst = {
        val i = rnd.nextInt(b.length)
        b.updated(i, alpha(rnd.nextInt(alpha.length)))
      }
      val ins = {
        val i = rnd.nextInt(b.length + 1)
        b.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + b.substring(i)
      }
      val del = {
        val i = rnd.nextInt(b.length)
        b.substring(0, i) + b.substring(i + 1)
      }
      Seq(b, subst, ins, del)
    }
    val background = Seq.fill(n - mutated.length max 0)(rs(4 + rnd.nextInt(10)))
    (mutated ++ background).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  test("pairs == brute force on a mutation-dense corpus, k = 0..3") {
    val rows = corpus(seed = 7, n = 80)
    for (k <- 0 to 3)
      assert(got(rows, k) == brute(rows, k), s"mismatch at k=$k")
  }

  test("pairs == brute force across seeds (indel-heavy, k = 2)") {
    for (seed <- Seq(11L, 23L, 42L)) {
      val rows = corpus(seed, n = 60)
      assert(got(rows, 2) == brute(rows, 2), s"mismatch at seed=$seed")
    }
  }

  test("short and empty strings (segments degrade to empty keys)") {
    val rows = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "b"), (5L, "abc"),
      (6L, ""), (7L, "ba"), (8L, "cab")).map { case (i, s) => (i, s) }
    for (k <- 0 to 2)
      assert(got(rows, k) == brute(rows, k), s"mismatch at k=$k")
  }

  test("null strings are dropped, not matched") {
    val rows = Seq((1L, "abc"), (2L, null), (3L, "abd")).toDF("id", "s")
    val p = EditDistance.pairs(rows, "id", "s", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(p == Set((1L, 3L, 1)))
  }

  test("fixture parity + candidate selectivity on document prefixes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("s"))
    val rows = docs.as[(Long, String)].collect().toSeq
    assert(got(rows, 2) == brute(rows, 2))
    // the candidate filter must prune: aligned-segment blocking on
    // natural text keys should discard almost all of the N²/2 block
    val n = rows.length.toLong
    val cand = EditDistance.candidates(docs, "doc_id", "s", 2).count()
    val frac = cand.toDouble / (n * (n - 1) / 2)
    assert(frac < 0.05, s"candidates $cand of ${n * (n - 1) / 2} ($frac) — segment blocking is not pruning")
  }
}
