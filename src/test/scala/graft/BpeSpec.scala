package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE tokenizer training: the Sennrich et al. reference fixture
  * (hand-verified merge sequence + the classic "lowest" segmentation),
  * exhaustion, encoding contracts, and bit-determinism across
  * partitionings.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the ACL'16 fixture: low x5, lower x2, newest x6, widest x3
  private lazy val corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("merge sequence matches the hand-computed reference") {
    val m = Bpe.trainMerges(corpus, "text", 4)
    // pair counts round 1: (e,s)=9 ties (s,t</w>)=9 -> lex; then chains
    assert(m == Seq(
      ("e", "s"), ("es", "t" + Bpe.EndMark), ("l", "o"), ("e", "w")), m.toString)
  }

  test("encoding an unseen word applies merges in rank order") {
    val m = Bpe.trainMerges(corpus, "text", 4)
    assert(Bpe.encodeWord("lowest", m) ==
      IndexedSeq("lo", "w", "est" + Bpe.EndMark))
    // untouched characters stay single symbols; the marker rides the last
    assert(Bpe.encodeWord("xyz", m) == IndexedSeq("x", "y", "z" + Bpe.EndMark))
  }

  test("training exhausts gracefully when every word fuses") {
    val tiny = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(tiny, "text", 100)
    assert(m.size < 100, "must stop before the requested merge count")
    // every word now encodes to ONE symbol under the learned merges
    for (w <- Seq("aa", "ab"))
      assert(Bpe.encodeWord(w, m).size == 1, w)
  }

  test("corpus encoding: concatenated symbols reconstruct each word") {
    val m = Bpe.trainMerges(corpus, "text", 4)
    val enc = Bpe.encode(corpus, "doc_id", "text", m).collect()
    for (r <- enc) {
      val toks = r.getSeq[String](1)
      val rebuilt = toks.mkString("").replace(Bpe.EndMark, " ").trim
      val original = corpus.filter(col("doc_id") === r.getLong(0))
        .head().getString(1)
      assert(rebuilt == original, s"doc ${r.getLong(0)}")
      assert(r.getLong(2) == toks.length)
    }
  }

  test("training is bit-deterministic across partitionings") {
    val docs = sources.Tables.open(spark, sf, "documents")
    val a = Bpe.trainMerges(docs, "text", 16)
    val b = Bpe.trainMerges(docs.repartition(7), "text", 16)
    assert(a == b)
    assert(a.size == 16)
  }

  test("jvmWords equals the SQL word stream on edge inputs") {
    // the encode path tokenizes JVM-side (TextOps.jvmWords), training
    // SQL-side (TextOps.tokens + nonempty filter); the trims differ at
    // the ends (String.trim strips tabs/newlines, SQL trim only spaces)
    // but nonempty \s+ pieces are end-trim-insensitive — pin it on the
    // inputs where a drift would show
    import graft.operators.TextOps
    val edge = Seq("", "   ", "a", " a\t b\nc ", "\tlead tab", "trail\n",
      "a b", "x  \t\n  y")
    val sql = edge.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty).toList)
      .toMap
    for ((t, i) <- edge.zipWithIndex)
      assert(TextOps.jvmWords(t).toList == sql(i.toLong), s"input ${i}: '$t'")
  }

  test("composed and end-mark merges segment in rank order (pinned-twin shape)") {
    // the two symbol shapes the hash-gated oracle replay must get right:
    // a merge whose right side is itself a fused symbol, and a merge
    // carrying the end marker
    assert(Bpe.encodeWord("part", Seq("a" -> "r", "p" -> "ar")) ==
      IndexedSeq("par", "t</w>"))
    assert(Bpe.encodeWord("win", Seq("i" -> "n</w>", "w" -> "in</w>")) ==
      IndexedSeq("win</w>"))
    // overlapping candidates fuse left-to-right, non-overlapping
    assert(Bpe.encodeWord("aaa", Seq("a" -> "a")) ==
      IndexedSeq("aa", "a</w>"))
  }

  test("encoding never exceeds character count and compresses the fixture") {
    val m = Bpe.trainMerges(corpus, "text", 4)
    val enc = Bpe.encode(corpus, "doc_id", "text", m)
      .agg(sum("n_bpe")).head().getLong(0)
    val chars = corpus.select(
      sum(length(regexp_replace(col("text"), "\\s", "")))).head().getLong(0)
    val words = 5 + 2 + 6 + 3
    assert(enc < chars, "merges must compress below character segmentation")
    assert(enc >= words, "at least one symbol per word")
  }
}
