package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimHashAgg

/** Sketch laws for the SimHash aggregator (SURVEY.md §5: parallel ≡ local
  * for every monoid sketch): any partitioning of the token-hash stream
  * into merged partials yields the same fingerprint, merge is
  * commutative, and similar hash multisets give nearby fingerprints.
  */
class SimHashSpec extends AnyFunSuite {

  private val agg = new SimHashAgg

  private def run(xs: Seq[Long], splits: Int): Long = {
    val parts = if (splits <= 1) Seq(xs)
      else xs.grouped(math.max(1, xs.length / splits)).toSeq
    agg.finish(parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge))
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("fingerprint is invariant under partitioning (parallel ≡ local)") {
    val rnd = new scala.util.Random(5L)
    (1 to 100).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(300))(rnd.nextLong())
      val whole = run(xs, 1)
      (2 to 6).foreach(s => assert(run(xs, s) == whole, s"split=$s diverged"))
    }
  }

  test("merge is commutative") {
    val rnd = new scala.util.Random(17L)
    (1 to 100).foreach { _ =>
      def buf() = Seq.fill(50)(rnd.nextLong())
      val (a, b) = (buf(), buf())
      val m1 = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
      val m2 = agg.finish(agg.merge(
        b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)))
      assert(m1 == m2)
    }
  }

  test("small multiset edits move the fingerprint only slightly") {
    val rnd = new scala.util.Random(23L)
    val base = Seq.fill(200)(rnd.nextLong())
    val fpBase = run(base, 1)
    // replace 5% of the hashes — a near-duplicate document
    val edited = base.take(190) ++ Seq.fill(10)(rnd.nextLong())
    assert(hamming(fpBase, run(edited, 1)) <= 16,
      "near-identical multisets must stay within a small Hamming radius")
    // a disjoint multiset should be far (expected Hamming ~32)
    val other = Seq.fill(200)(rnd.nextLong())
    assert(hamming(fpBase, run(other, 1)) >= 12,
      "independent multisets should not collide tightly")
  }
}
