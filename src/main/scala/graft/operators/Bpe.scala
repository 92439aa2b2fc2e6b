package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING on the corpus (Sennrich et al.
  * ACL 2016) — the step a data pipeline runs before token-budget math
  * when no pretrained tokenizer fits the domain. [[TextOps.bpeTokenCount]]
  * approximates GPT-style segmentation with a fixed regex; this learns
  * real merges from corpus statistics.
  *
  * Scale shape (the classic trainer, distributed where it counts):
  *  - the word-frequency table is ONE linear groupBy over the corpus —
  *    the only corpus-sized stage;
  *  - training operates on the top-`maxWords` (frequency, word) rows —
  *    a TakeOrderedAndProject cap making the driver model sketch-sized
  *    by contract (the k-means-sample / DSIR-model precedent): BPE
  *    statistics are dominated by frequent words, and rare-word tails
  *    contribute one count each to pairs the head already decides;
  *  - the merge loop itself is pure driver arithmetic over that capped
  *    table (numMerges × vocab adjacency scans — milliseconds);
  *  - encoding is MAP-SIDE: merges ship in the closure, each word
  *    re-segments independently (mapPartitions — no built-in expresses
  *    ordered iterative pair-merging).
  *
  * Determinism: word counts are exact integers; the argmax tie-breaks
  * (count DESC, then pair lexicographically) and the cap orders by
  * (count DESC, word ASC) — so the merge list is BIT-IDENTICAL across
  * runs, partitionings, and cluster sizes (pinned in BpeSpec).
  */
object Bpe {

  /** End-of-word marker (rides the last symbol, GPT-2 style reversed:
    * suffix marker on the final char keeps merges word-internal).
    */
  val EndMark = "</w>"

  /** Exact corpus word frequencies: (word, cnt), whitespace tokens. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` BPE merges on the corpus. Returns the ordered
    * merge list ((left, right) symbol pairs, rank = position). Fewer
    * than `numMerges` merges return when the vocabulary exhausts (every
    * word fused to one symbol).
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int = 65536): Seq[(String, String)] = {
    require(numMerges >= 1 && maxWords >= 1)
    val head = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word").asc).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // symbol sequences: chars, with the end marker fused onto the last
    var vocab: Array[(IndexedSeq[String], Long)] = head.map { case (w, c) =>
      val chars = w.map(_.toString).toIndexedSeq
      (chars.init :+ (chars.last + EndMark), c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) done = true
      else {
        // argmax by (count DESC, pair ASC) — the deterministic tie-break
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val fused = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = IndexedSeq.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Segment one word with an ordered merge list (greedy left-to-right
    * per merge, merges applied in rank order — the reference algorithm).
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): IndexedSeq[String] = {
    if (word.isEmpty) return IndexedSeq.empty
    val chars = word.map(_.toString).toIndexedSeq
    var syms = chars.init :+ (chars.last + EndMark)
    for (mg <- merges if syms.length > 1) {
      val fused = mg._1 + mg._2
      val out = IndexedSeq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == mg._1 && syms(i + 1) == mg._2) {
          out += fused; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** Map-side corpus encoding: (id, bpe_tokens array<string>, n_bpe).
    * The merge list rides the closure (sketch-sized); each partition
    * memoizes word segmentations (Zipf makes the hit rate high).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.toIndexedSeq
    val out = df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, IndexedSeq[String]]
        it.map { case (id, text) =>
          // the shared JVM twin of wordCounts' SQL tokenization — one
          // definition, so training vocabulary and encode input cannot
          // desynchronize (TextOps.jvmWords pins the parity argument)
          val toks = TextOps.jvmWords(text)
          val enc = toks.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, ms)))
          (id, enc, enc.length.toLong)
        }
      }
    out.toDF(idCol, "bpe_tokens", "n_bpe")
  }
}
