package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout.zOrderKey bit-exactness (vs a straightforward Scala Morton
  * reference) and the data-skipping contract: a 2-D box over the
  * z-ordered layout touches few files, over a hash layout all of them.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Int, y: Int): Long = {
    def sp(v: Long): Long = {
      var r = 0L; var i = 0
      while (i < 32) { r |= ((v >> i) & 1L) << (2 * i); i += 1 }
      r
    }
    val xb = x.toLong - Int.MinValue.toLong
    val yb = y.toLong - Int.MinValue.toLong
    (sp(xb) | (sp(yb) << 1)) ^ Long.MinValue
  }

  test("zOrderKey matches the Scala Morton reference incl. negatives") {
    val rnd = new scala.util.Random(5)
    val pts = Seq((0, 0), (1, 0), (0, 1), (-1, -1), (Int.MaxValue, Int.MinValue),
      (Int.MinValue, Int.MaxValue)) ++
      Seq.fill(500)((rnd.nextInt(), rnd.nextInt()))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zOrderKey(col("x"), col("y")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"($x, $y)")
    }
  }

  test("curve order: quadrant blocks are contiguous key ranges") {
    // within [0, 2^31): the top interleaved bits are the quadrant — every
    // key in the (lo, lo) quadrant sorts before any key in (hi, hi)
    val loQ = for (x <- 0 until 8; y <- 0 until 8) yield mortonRef(x, y)
    val hiQ = for (x <- 8 until 16; y <- 8 until 16) yield mortonRef(x, y)
    assert(loQ.max < hiQ.min)
  }

  test("2-D box scan over z-order layout skips files; hash layout cannot") {
    val n = 1 << 14
    val grid = spark.range(n).select(
      (col("id") % 128).cast("int").as("x"),
      (col("id") / 128).cast("int").as("y"))
    val zDir = QueryDefsScratch.dir("layout_z")
    val hDir = QueryDefsScratch.dir("layout_h")
    Layout.writeZOrdered(grid, "x", "y", zDir, numFiles = 16)
    grid.repartition(16).write.mode("overwrite").parquet(hDir)
    val box = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("x").between(10, 40) && col("y").between(10, 40))
    val zFiles = box(spark.read.parquet(zDir))
      .select(input_file_name()).distinct().count()
    val hFiles = box(spark.read.parquet(hDir))
      .select(input_file_name()).distinct().count()
    // the box is ~6% of the area: on the curve it lives in a few
    // contiguous segments; hash spreads it over every file
    assert(zFiles <= 4, s"z layout touched $zFiles of 16 files")
    assert(hFiles >= 14, s"hash layout touched only $hFiles of 16 files")
    // the layout must not change the answer
    val za = box(spark.read.parquet(zDir)).agg(count(lit(1)), sum("x"), sum("y")).head()
    val ha = box(spark.read.parquet(hDir)).agg(count(lit(1)), sum("x"), sum("y")).head()
    assert(za == ha)
  }

  private def dataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".parquet"))

  test("compact: exact file count from metadata sizing; content untouched") {
    val frag = QueryDefsScratch.dir("compact_in")
    val out = QueryDefsScratch.dir("compact_out")
    val df = spark.range(1 << 14).select(col("id"),
      (col("id") * 37 % 1000).as("v"))
    df.repartition(64).write.mode("overwrite").parquet(frag)
    val inFiles = dataFiles(frag)
    assert(inFiles.size == 64)
    val total = inFiles.map(_.length).sum
    val target = total / 4 // expect ~4-5 output files
    val n = Layout.compact(spark, frag, out, target)
    val formula = ((total + target - 1) / target).toInt
    val scanParts = spark.read.parquet(frag).rdd.getNumPartitions
    assert(n == math.min(formula, scanParts),
      s"returned $n, formula $formula, scan splits $scanParts")
    assert(dataFiles(out).size == n, "output file count must equal the returned count")
    assert(n < 64 && n >= 2)
    // byte-identical content (as a multiset of rows)
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compact is map-only: the rewrite plan has no shuffle exchange") {
    val frag = QueryDefsScratch.dir("compact_plan")
    spark.range(100).repartition(8).write.mode("overwrite").parquet(frag)
    // the exact plan compact() executes: read + coalesce
    val plan = spark.read.parquet(frag).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
  }

  test("compact preserves a Hive-partitioned layout and its pruning") {
    // bucket-partitioned fixture in the IVF-PQ codes/bucket=N shape
    // (Pq.buildIvfPqIndex) — the table whose partition-pruned serve a
    // flat rewrite would silently destroy
    val frag = QueryDefsScratch.dir("compact_part_in")
    val out = QueryDefsScratch.dir("compact_part_out")
    val df = spark.range(1 << 14).select(col("id").as("n_id"),
      (col("id") % 4).cast("int").as("bucket"),
      (col("id") * 37 % 1000).as("v"))
    df.repartition(8).write.mode("overwrite").partitionBy("bucket").parquet(frag)
    def leafFiles(root: String, b: Int) = dataFiles(s"$root/bucket=$b")
    (0 until 4).foreach(b => assert(leafFiles(frag, b).size == 8))
    // per-leaf target of ~half a leaf's bytes → 2 files per leaf
    val leafBytes = leafFiles(frag, 0).map(_.length).sum
    val n = Layout.compact(spark, frag, out, (leafBytes + 1) / 2)
    // layout preserved: same bucket=N dirs, each compacted independently
    (0 until 4).foreach { b =>
      val c = leafFiles(out, b).size
      assert(c >= 1 && c <= 3, s"bucket=$b compacted to $c files")
    }
    assert(n == (0 until 4).map(leafFiles(out, _).size).sum,
      "returned count must equal total data files written")
    // answer preservation incl. the partition column
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // partition pruning survives compaction (the whole point)
    val filtered = spark.read.parquet(out).filter(col("bucket") === 2)
    val plan = filtered.queryExecution.executedPlan.toString
    val pruned = plan.linesIterator
      .filter(l => l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []"))
    assert(pruned.exists(_.contains("bucket")),
      s"compacted table lost partition pruning:\n$plan")
    assert(filtered.count() == a.filter(col("bucket") === 2).count())
  }

  test("compact on an oversized target collapses to one file") {
    val frag = QueryDefsScratch.dir("compact_one")
    val out = QueryDefsScratch.dir("compact_one_out")
    spark.range(1000).repartition(16).write.mode("overwrite").parquet(frag)
    val n = Layout.compact(spark, frag, out, Long.MaxValue)
    assert(n == 1 && dataFiles(out).size == 1)
    assert(spark.read.parquet(out).count() == 1000)
  }
}

/** Test scratch dirs under the suite's tmp space. */
private object QueryDefsScratch {
  def dir(leaf: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$leaf")
    p.toFile.deleteOnExit()
    p.toString
  }
}
