package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramSpans

/** Exact-substring (sliding n-gram span) dedup: brute-force parity on a
  * planted corpus, keep-first semantics, span merging, stats ≡ clean
  * consistency, and the short-document contract.
  */
class NgramSpansSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 1 is the first holder of the shared phrase; 2 repeats
  // it verbatim mid-document; 3 is an exact duplicate of 1 (fully covered
  // once windows chain); 4 repeats the phrase TWICE internally (overlap
  // merge); 5 is unique; 6 is shorter than any window.
  private val phrase = "alpha beta gamma delta epsilon zeta eta theta"  // 8 tokens
  private val corpus = Seq(
    (1L, s"one two $phrase three four"),
    (2L, s"aa bb cc $phrase dd ee"),
    (3L, s"one two $phrase three four"),
    (4L, s"xx $phrase yy $phrase zz"),
    (5L, "entirely unrelated words that never recur anywhere at all okay"),
    (6L, "tiny doc"))
  private lazy val df = corpus.toDF("doc_id", "text")

  /** Naive single-process reference of the whole pass at width n. */
  private def brute(rows: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = rows.map { case (id, t) => id -> t.trim.split("\\s+").toIndexedSeq }
    val occ = for {
      (id, ts) <- toks if ts.length >= n
      p <- 0 to (ts.length - n)
    } yield (id, p, ts.slice(p, p + n).mkString(" "))
    val byGram = occ.groupBy(_._3)
    val dup = occ.filter { case (id, p, g) =>
      val all = byGram(g)
      all.length > 1 && (all.minBy(o => (o._1, o._2)) != ((id, p, g)))
    }
    toks.map { case (id, ts) =>
      val mine = dup.filter(_._1 == id).map(_._2).sorted
      // merge [p, p+n) intervals
      val spans = mine.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, math.max(acc.head._2, p + n)) :: acc.tail
        case (acc, p) => (p, p + n) :: acc
      }.reverse
      val nDupToks = spans.map { case (s, e) => e - s }.sum
      id -> ((occ.count(_._1 == id).toLong, dup.count(_._1 == id).toLong,
        spans.length.toLong, nDupToks.toLong, (ts.length - nDupToks).toLong))
    }.toMap
  }

  test("stats matches the brute-force reference on the planted corpus") {
    val got = NgramSpans.stats(df, "doc_id", "text", n = 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got == brute(corpus, 8))
  }

  test("keep-first: the globally first occurrence is never cut") {
    val got = NgramSpans.stats(df, "doc_id", "text", n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got(1L) == 0L, "doc 1 holds every first occurrence")
    assert(got(3L) > 0L, "doc 3 (exact duplicate of 1) must be cut")
    assert(got(5L) == 0L && got(6L) == 0L)
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // doc 2's phrase occupies 8 tokens; its 1 duplicated window would
    // count 8 dup tokens; if doc 4's TWO phrase copies each produced
    // independent spans of window-chains, unmerged accounting would
    // double-count the chained windows
    val r = NgramSpans.stats(df, "doc_id", "text", n = 8)
      .filter(col("doc_id") === 2L).head()
    assert(r.getLong(4) == 1L, "one merged span")
    assert(r.getLong(5) == 8L, "span covers exactly the phrase")
  }

  test("clean is consistent with stats and drops fully-covered docs") {
    val st = NgramSpans.stats(df, "doc_id", "text", n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    val cl = NgramSpans.clean(df, "doc_id", "text", n = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clMap = cl.map(t => t._1 -> t._3).toMap
    // every cleaned doc's kept-token count equals the stats form's
    for ((id, k) <- clMap) assert(st(id) == k, s"doc $id")
    // docs absent from clean are exactly those with zero kept tokens
    assert(st.keySet.diff(clMap.keySet) == st.filter(_._2 == 0L).keySet)
    // a doc without duplication round-trips verbatim (token-normalized)
    val five = cl.find(_._1 == 5L).get._2
    assert(five == corpus.find(_._1 == 5L).get._2)
  }

  test("at least one copy of every duplicated window survives the clean") {
    val cleaned = NgramSpans.clean(df, "doc_id", "text", n = 8)
      .select(col("doc_id"), col("clean_text").as("text"))
    val before = NgramSpans.stats(df, "doc_id", "text", n = 8)
      .agg(sum("n_grams")).head().getLong(0)
    // re-running stats on the cleaned corpus finds NO duplicated windows
    // here: only non-first occurrences were cut, and no residual doc is
    // long enough for a cut boundary to mint a new duplicated window
    // (boundary-minted windows make idempotency corpus-dependent in
    // general — this pins the planted fixture, not a theorem)
    val after = NgramSpans.stats(cleaned, "doc_id", "text", n = 8)
      .agg(sum("n_dup_grams")).head().getLong(0)
    assert(before > 0 && after == 0L, s"residual dup windows: $after")
  }

  test("documents shorter than the window report zeros and survive clean") {
    val st = NgramSpans.stats(df, "doc_id", "text", n = 8)
      .filter(col("doc_id") === 6L).head()
    assert(st.getLong(1) == 2L && st.getLong(2) == 0L && st.getLong(6) == 2L)
    val cl = NgramSpans.clean(df, "doc_id", "text", n = 8)
      .filter(col("doc_id") === 6L).head()
    assert(cl.getString(1) == "tiny doc")
  }

  test("decontamination cuts EVERY matching span, including first occurrences") {
    val eval = Seq((100L, s"benchmark question $phrase answer")).toDF("doc_id", "text")
    val st = NgramSpans.decontamStats(df, eval, "doc_id", "text", n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    // doc 1 holds the corpus-FIRST occurrence — dedup keeps it, but
    // decontamination cuts it all the same (no keep-first)
    assert(st(1L) == ((1L, 8L)), s"doc 1: ${st(1L)}")
    assert(st(2L) == ((1L, 8L)) && st(3L) == ((1L, 8L)))
    assert(st(4L) == ((2L, 16L)), "both internal copies cut")
    assert(st(5L) == ((0L, 0L)) && st(6L) == ((0L, 0L)), "clean docs untouched")
  }

  test("decontamination clean cuts exactly the flagged tokens") {
    val eval = Seq((100L, s"benchmark question $phrase answer")).toDF("doc_id", "text")
    val cl = NgramSpans.decontamClean(df, eval, "doc_id", "text", n = 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cl(1L) == "one two three four")
    assert(cl(4L) == "xx yy zz")
    assert(cl(5L) == corpus.find(_._1 == 5L).get._2)
    // the cleaned train corpus shares no window with the eval set
    val cleaned = NgramSpans.decontamClean(df, eval, "doc_id", "text", n = 8)
      .select(col("doc_id"), col("clean_text").as("text"))
    val residual = NgramSpans.decontamStats(cleaned, eval, "doc_id", "text", n = 8)
      .agg(sum("n_hit_grams")).head().getLong(0)
    assert(residual == 0L, s"residual contaminated windows: $residual")
  }

  test("stats matches the row_number-window formulation bit-for-bit") {
    // the production path marks first occurrences via groupBy(count,
    // min(struct(id,pos))) + join-back (skew-proof); this re-derives the
    // same stats through the window form it replaced and pins parity on
    // a corpus with repeats, overlaps, and short docs
    import org.apache.spark.sql.expressions.Window
    val n = 8
    val toks = df.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
    val occ = toks.filter(col("n_tokens") >= n)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_tokens").cast("int") - lit(n))).as("__pos"),
        col("__toks"))
      .select(col("doc_id"), col("__pos"),
        md5(concat_ws(" ", slice(col("__toks"), col("__pos") + lit(1), lit(n))))
          .as("__gram"))
    val byGram = Window.partitionBy(col("__gram"))
    val windowed = occ
      .withColumn("__rk", row_number().over(byGram.orderBy(col("doc_id"), col("__pos"))))
      .withColumn("__cnt", count(lit(1)).over(byGram))
      .filter(col("__cnt") > 1 && col("__rk") > 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_grams"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = NgramSpans.stats(df, "doc_id", "text", n = n).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap.filter(_._2 > 0L)
    assert(got == windowed)
  }

  test("a planted hot gram (one phrase in most windows) stays exact") {
    // 60 documents all repeating the SAME 8-token phrase: every window of
    // every doc hashes to one gram — the boilerplate-skew shape that
    // would serialize a per-gram window partition into a single task.
    // The groupBy form must still produce the exact keep-first answer:
    // only doc 0's first window survives; each doc contributes
    // (n_tokens - 7) windows, all duplicated except that one.
    val hot = (0L until 60L).map(i => (i, s"$phrase $phrase $phrase")).toDF("doc_id", "text")
    val st = NgramSpans.stats(hot, "doc_id", "text", n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(6))).toList
    val nWin = 24 - 8 + 1  // 17 windows per doc
    // windows here are NOT all one gram (phrase×3 slides across copies),
    // but every window recurs in all 60 docs → each distinct gram has 60+
    // occurrences; the corpus-first doc (id 0) keeps the first occurrence
    // of each distinct gram, every other doc is fully duplicated
    for ((id, grams, dup, kept) <- st) {
      assert(grams == nWin.toLong, s"doc $id windows")
      if (id == 0L) assert(dup < nWin && kept > 0L, s"doc 0 keeps firsts: $dup")
      else assert(dup == nWin.toLong && kept == 0L, s"doc $id fully dup: $dup/$kept")
    }
    // and the hottest single gram (the phrase itself, aligned at 0/8/16
    // in every doc) carries 180 occurrences — ≥30% of all 1020 windows
    // collapse to very few distinct grams, the skew fixture contract
  }

  test("result is partitioning-invariant") {
    val a = NgramSpans.stats(df, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect().toSeq
    val b = NgramSpans.stats(df.repartition(7), "doc_id", "text", n = 8)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
