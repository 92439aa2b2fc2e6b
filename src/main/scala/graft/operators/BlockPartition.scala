package graft.operators

/** Identity partitioner over block ids 0..blocks-1: exactly one block per
  * task. Hash-partitioning block ids is a balls-into-bins assignment
  * (~1/e of tasks empty, 3-4 blocks stacked on the unlucky ones), which
  * defeats the point of blocking a CPU-bound pair loop; RDD-level
  * partitionBy with this partitioner also bypasses AQE's byte-based
  * coalescing entirely.
  */
private[operators] final case class BlockPartition(blocks: Int)
    extends org.apache.spark.Partitioner {
  override def numPartitions: Int = blocks
  override def getPartition(key: Any): Int = key.asInstanceOf[Int]
}

/** Triangle-blocked all-pairs layout for the exact (quadratic-by-contract)
  * pair operators.
  *
  * Ids are grouped into `groups` buckets (id mod groups); one task per
  * UNORDERED bucket pair {i, j} — groups·(groups+1)/2 tasks. A row
  * replicates only to the `groups` tasks whose pair contains its bucket,
  * so shuffle volume is N·groups and per-task residency 2N/groups; square
  * blocking (every row probes every block) costs N·tasks shuffle rows and
  * holds the full corpus in every task. For groups=16 (136 tasks) that is
  * an 8× smaller shuffle and a corpus/8 task footprint at the same
  * parallelism. Pair compute is the same irreducible N²/2 either way —
  * this layout only fixes data movement and residency.
  */
private[operators] object TriangleBlocks {

  def numTasks(groups: Int): Int = groups * (groups + 1) / 2

  /** Linear index of the unordered bucket pair {a, b} in the upper
    * triangle enumerated row-major: (0,0)..(0,G-1), (1,1)..(1,G-1), …
    */
  def taskOf(a: Int, b: Int, groups: Int): Int = {
    val i = if (a <= b) a else b
    val j = if (a <= b) b else a
    i * groups - i * (i - 1) / 2 + (j - i)
  }

  /** Every unordered id pair (d1 < d2) of `rows`, met exactly once: the
    * pair {x, y} appears only in task {bucket(x), bucket(y)}. `emit` is
    * called with d1 < d2 guaranteed and keeps a pair by returning Some.
    * The pair loop is CPU-bound on tiny bytes, so it is laid out by the
    * identity BlockPartition — one bucket pair per task, exempt from
    * AQE's byte-size coalescing.
    *
    * Each task's (i, j) identity derives from its PARTITION INDEX, never
    * from which buckets happen to arrive: an off-diagonal task whose
    * other bucket is globally empty must emit nothing — treating its
    * single observed bucket as a diagonal would re-emit that bucket's
    * within-pairs once per empty peer.
    */
  def allPairs[P, R](rows: org.apache.spark.rdd.RDD[(Long, P)], groups: Int)(
      emit: (Long, P, Long, P) => Option[R])(
      implicit pt: scala.reflect.ClassTag[P], rt: scala.reflect.ClassTag[R])
      : org.apache.spark.rdd.RDD[R] = {
    val g = groups
    // task index -> (i, j), the inverse of taskOf's row-major triangle
    val taskPair: Array[(Int, Int)] = {
      val a = new Array[(Int, Int)](numTasks(g))
      for (i <- 0 until g; j <- i until g) a(taskOf(i, j, g)) = (i, j)
      a
    }
    rows
      .flatMap { case (id, p) =>
        val own = (id % g).toInt.abs
        Iterator.range(0, g).map(h => (taskOf(own, h, g), (own, id, p)))
      }
      .partitionBy(BlockPartition(numTasks(g)))
      .values
      .mapPartitionsWithIndex { (task, it) =>
        val (bi, bj) = taskPair(task)
        val a = scala.collection.mutable.ArrayBuffer.empty[(Long, P)]
        val b = scala.collection.mutable.ArrayBuffer.empty[(Long, P)]
        it.foreach { case (bucket, id, p) =>
          if (bucket == bi) a += ((id, p)) else b += ((id, p))
        }
        if (bi == bj) // diagonal task {i, i}: within-bucket pairs
          a.iterator.flatMap { case (d1, p1) =>
            a.iterator.flatMap { case (d2, p2) =>
              if (d1 < d2) emit(d1, p1, d2, p2).iterator else Iterator.empty
            }
          }
        else // off-diagonal task {i, j}: all cross-bucket pairs
          a.iterator.flatMap { case (x, px) =>
            b.iterator.flatMap { case (y, py) =>
              (if (x < y) emit(x, px, y, py) else emit(y, py, x, px)).iterator
            }
          }
      }
  }
}
