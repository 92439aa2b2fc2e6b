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
