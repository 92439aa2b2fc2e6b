package graft.operators

import graft.SparkSpec

/** Layout proofs for the triangle-blocked pair loop: the task index is a
  * bijection over unordered bucket pairs, and allPairs meets every
  * unordered id pair exactly once (no group size divides the id range
  * evenly here, so diagonal and off-diagonal tasks both carry load).
  */
class TriangleBlocksSpec extends SparkSpec {

  test("taskOf is a bijection over unordered bucket pairs") {
    for (g <- Seq(1, 2, 3, 7, 16)) {
      val ids = for (i <- 0 until g; j <- i until g) yield TriangleBlocks.taskOf(i, j, g)
      assert(ids.toSet == (0 until TriangleBlocks.numTasks(g)).toSet, s"groups=$g")
      // order of arguments must not matter
      for (i <- 0 until g; j <- 0 until g)
        assert(TriangleBlocks.taskOf(i, j, g) == TriangleBlocks.taskOf(j, i, g))
    }
  }

  test("allPairs is exact when ids occupy a single residue class (empty peer buckets)") {
    // every id lands in bucket 0 of 16: all off-diagonal tasks {0,j} see
    // only bucket-0 rows and must emit NOTHING (a bucket-count heuristic
    // would re-emit the diagonal pairs 15 extra times)
    val n = 40
    val rows = spark.sparkContext.parallelize((0 until n).map(i => (i * 16L, i)), 4)
    val got = TriangleBlocks.allPairs(rows, 16)((d1, _, d2, _) => Some((d1, d2))).collect()
    val expected = (for {
      a <- 0 until n; b <- (a + 1) until n
    } yield (a * 16L, b * 16L)).toSet
    assert(got.length == expected.size, s"expected ${expected.size} pairs, got ${got.length}")
    assert(got.toSet == expected)
  }

  test("allPairs is exact on random sparse id sets, group counts, and negative ids") {
    val rnd = new scala.util.Random(53L)
    (1 to 10).foreach { trial =>
      val g = 1 + rnd.nextInt(20)
      val ids = Iterator.continually(rnd.nextLong() % 1000).take(40).toSet.toSeq
      val rows = spark.sparkContext.parallelize(ids.map(i => (i, ())), 3)
      val got = TriangleBlocks.allPairs(rows, g)((d1, _, d2, _) => Some((d1, d2))).collect()
      val expected = (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSet
      assert(got.length == expected.size,
        s"trial $trial g=$g: ${got.length} pairs vs ${expected.size} (dup or drop)")
      assert(got.toSet == expected, s"trial $trial g=$g")
    }
  }

  test("allPairs emits every unordered id pair exactly once") {
    val n = 101
    val rows = spark.sparkContext.parallelize((0L until n.toLong).map(i => (i, i * 10)), 5)
    for (g <- Seq(1, 3, 16)) {
      val got = TriangleBlocks.allPairs(rows, g) { (d1, p1, d2, p2) =>
        assert(d1 < d2 && p1 == d1 * 10 && p2 == d2 * 10)
        Some((d1, d2))
      }.collect()
      val expected = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      } yield (a, b)).toSet
      assert(got.length == expected.size, s"groups=$g: duplicate or dropped pairs")
      assert(got.toSet == expected, s"groups=$g")
    }
  }
}
