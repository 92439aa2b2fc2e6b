package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for
  * data-skipping scans. The reference renders histograms over whatever
  * layout the loaded files have; at 100 TB the LAYOUT is the query
  * optimization — a 2-D range filter over a corpus laid out on a
  * space-filling curve touches O(perimeter) files instead of all of
  * them, because parquet row-group min/max stats become tight boxes on
  * BOTH dimensions at once (no single-column sort can do that for two
  * filter columns).
  */
object Layout {

  /** 32-bit → even-bit spread (Morton): pure bitwise Column arithmetic —
    * five mask-shift rounds, whole-stage codegen'd, no UDF.
    */
  private def spread(x: Column): Column = {
    val m = Seq(
      0x0000FFFF0000FFFFL -> 16,
      0x00FF00FF00FF00FFL -> 8,
      0x0F0F0F0F0F0F0F0FL -> 4,
      0x3333333333333333L -> 2,
      0x5555555555555555L -> 1)
    m.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (mask, sh)) =>
      (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(mask))
    }
  }

  /** Z-order (Morton) key of two int columns as an order-preserving
    * long: each input is biased to unsigned (so negative values sort
    * before positive, matching the natural 2-D order), bits are
    * interleaved x→even / y→odd, and the 64-bit result's sign bit is
    * flipped so SIGNED long comparison equals unsigned curve order.
    */
  def zOrderKey(x: Column, y: Column): Column = {
    val xb = x.cast("long") - Int.MinValue.toLong
    val yb = y.cast("long") - Int.MinValue.toLong
    spread(xb).bitwiseOR(shiftleft(spread(yb), 1))
      .bitwiseXOR(lit(Long.MinValue))
  }

  /** Write `df` to `path` clustered on the z-order curve of `(xCol,
    * yCol)`: range-partition into `numFiles` curve intervals (a range
    * exchange — the one shuffle; its bounds job samples the key, not
    * the data), sort each interval in place, drop the key, write. Each
    * output file then covers a compact curve segment, so its parquet
    * footer min/max on BOTH columns is a tight box and a 2-D range scan
    * prunes to the files whose boxes intersect the query box — the
    * data-skipping contract the spec pins against a hash layout.
    *
    * At 100 TB pick `numFiles` for file-sized outputs (the same sizing
    * contract as `Export.shuffleShards`); the curve key is 64-bit, so
    * two full 32-bit dimensions are supported losslessly.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zOrderKey(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite the parquet at `inDir` into
    * `outDir` as ~`targetBytes`-sized files. The streaming-ingest tables
    * this library appends to (LSH/IVF index buckets, JSONL shard
    * exports, micro-batch sinks) accrete KB-sized files whose per-file
    * open/footer cost eventually dominates scans — the nightly compact
    * is the standard fix (Delta/Iceberg's OPTIMIZE bin-packing, here
    * over plain parquet directories).
    *
    * Scale shape — MAP-ONLY on purpose: the output file count comes from
    * FILE METADATA (`ceil(Σ file length / targetBytes)` — no data scan),
    * and the rewrite is `coalesce(n)`, which unions whole input
    * partitions into output tasks WITHOUT a shuffle: at 100 TB this is
    * one read+write pass, no exchange, no sort (LayoutSpec plan-asserts
    * the absence of a shuffle). Row content and schema are untouched —
    * only file boundaries move (the catalog row's oracle reads the
    * compacted copy against the source SQL).
    *
    * Count contract: coalesce merges read splits, it cannot divide them,
    * so the achievable count is `min(n, scan partitions)` — exactly that
    * many data files are written (pinned in LayoutSpec). In the
    * compaction regime (`targetBytes` ≥ the session's
    * `spark.sql.files.maxPartitionBytes`, i.e. merging small files into
    * big ones — the operation's purpose) the scan has ≥ n splits and the
    * count is exactly the metadata formula. Parquet compression makes
    * output SIZES approximate; the count is what kills the open-cost
    * problem. Ordering within files is not part of the contract — pair
    * with [[writeZOrdered]] when layout should also cluster.
    *
    * Hive-PARTITIONED input (`key=value` path segments — the IVF-PQ
    * `codes/bucket=N` table, any `partitionBy` write) is detected from
    * the file listing already in hand and compacted PER PARTITION: each
    * leaf directory is sized by its own metadata and rewritten to the
    * SAME `key=value` relative path under `outDir`, so the compacted
    * table keeps the exact layout — partition-pruned reads
    * (PartitionFilters) survive compaction (plan-asserted in
    * LayoutSpec). A flat rewrite here would silently inline the
    * partition columns into the data files and destroy pruned serving —
    * the one scan-time optimization compaction exists to protect.
    * Per-leaf rewrites are independent map-only jobs, submitted
    * concurrently (bounded pool): the leaf count is metadata-sized, and
    * each job touches only its own leaf's files.
    *
    * Returns the output DATA file count (Σ per-partition counts).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val root = path.toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(path, true)
    // per-partition-leaf byte totals, keyed by the `key=value/...` relative
    // dir ("" = unpartitioned). Non-partition subdirs (no '=') never appear
    // under a planner-written table; files inside them are grouped with the
    // root so a stray nested layout still compacts (flat), not crashes.
    val bytes = scala.collection.mutable.LinkedHashMap[String, Long]()
    while (it.hasNext) {
      val f = it.next()
      // only data files: planners write _SUCCESS markers and checksums
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = f.getPath.getParent.toUri.getPath.stripSuffix("/")
          .stripPrefix(root).stripPrefix("/")
        val part = if (rel.split("/").forall(s => s.isEmpty || s.contains("=")))
          rel else ""
        bytes(part) = bytes.getOrElse(part, 0L) + f.getLen
      }
    }
    def rewriteLeaf(rel: String, total: Long): Int = {
      val in = if (rel.isEmpty) inDir else s"$inDir/$rel"
      val out = if (rel.isEmpty) outDir else s"$outDir/$rel"
      val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
      // a leaf read has no `key=value` segments BELOW it, so no partition
      // columns are inferred: the rewritten files carry exactly the
      // original file columns and the relative path carries the partition
      val df = spark.read.parquet(in)
      // partition planning only — no job; bounds the achievable count
      val nOut = math.max(1, math.min(n, df.rdd.getNumPartitions))
      df.coalesce(nOut).write.mode("overwrite").parquet(out)
      nOut
    }
    if (bytes.isEmpty) return rewriteLeaf("", 0L) // empty table: 1 empty file
    if (bytes.size == 1) rewriteLeaf(bytes.head._1, bytes.head._2)
    else {
      // independent leaf jobs — submit concurrently so a many-partition
      // table compacts at cluster width, not one leaf at a time
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, bytes.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(
        Future.sequence(bytes.toSeq.map { case (rel, b) =>
          Future(rewriteLeaf(rel, b))
        }), Duration.Inf).sum
      finally pool.shutdown()
    }
  }
}
