package graft

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque handle naming one view in a session — the analog of the
  * reference's remote object id (`ref:W/RpcObjectManager.java`): the UI
  * never holds data, only ids whose lineage lives in the server.
  */
final case class ViewId(value: String)

/** One registered view: the DataFrame plus its lineage edge. */
final case class ViewNode(id: ViewId, df: DataFrame, parent: Option[ViewId], op: String)

/** The interactive session layer (SURVEY.md §7.1 layer 3) — hiero's
  * object-id model rebuilt on Spark:
  *
  *  - every operation (`open`, `child`) registers a new immutable view id
  *    whose lineage chain is queryable (`lineage`) — filters/zooms share
  *    the parent's lazy plan, so a chain of brushes is zero-copy exactly
  *    like the reference's membership-set views;
  *  - `sketch` runs a small-result aggregation under the view's own Spark
  *    job group and memoizes the collected result by (viewId, canonical
  *    op key) — repeated UI gestures are instant, as in the reference's
  *    `MemoizedResults`;
  *  - `cancel(viewId)` aborts every running job of that view
  *    (`sc.cancelJobGroup`, interrupt-on-cancel) — the unsubscribe path
  *    of paper §3.2;
  *  - `progressive` re-creates streamed `PartialResult`s
  *    (`ref:P/dataset/api/PartialResult.java`): the sketch runs per
  *    partition batch and a caller-supplied monoid merge folds partials
  *    into a refining result with monotone progress;
  *  - `samplingRate` is the paper's resolution-aware approximation rule
  *    (§4.1): sampled histograms are indistinguishable at pixel
  *    resolution once rate ≈ pixelHeight²·buckets/rowCount.
  *
  * Sketch results are small by contract (polylog in data size — paper
  * §3), so memoizing collected rows on the driver is the same discipline
  * as the reference's root node; bulk data never leaves the cluster.
  */
final class ViewSession(spark: SparkSession) {

  private val views = TrieMap.empty[ViewId, ViewNode]
  private val memo = TrieMap.empty[(ViewId, String), (org.apache.spark.sql.types.StructType, Array[Row])]
  private val seq = new AtomicLong(0)
  private val memoHitCount = new AtomicLong(0)

  private def nextId(name: String): ViewId = ViewId(s"$name-${seq.incrementAndGet()}")
  private def jobGroup(id: ViewId): String = s"graft-view-${id.value}"

  /** Register a root view (a loaded table). */
  def open(name: String, df: DataFrame): ViewId = {
    val id = nextId(name)
    views.put(id, ViewNode(id, df, None, "open"))
    id
  }

  /** Derive a child view (filter/zoom/set-op/projection). Lazy: shares the
    * parent's plan, no data movement.
    */
  def child(parent: ViewId, opName: String)(op: DataFrame => DataFrame): ViewId = {
    val p = views(parent)
    val id = nextId(opName)
    views.put(id, ViewNode(id, op(p.df), Some(parent), opName))
    id
  }

  def apply(id: ViewId): ViewNode = views(id)

  /** Root-to-leaf lineage chain of a view. */
  def lineage(id: ViewId): List[ViewId] = {
    @annotation.tailrec
    def up(cur: ViewId, acc: List[ViewId]): List[ViewId] =
      views(cur).parent match {
        case Some(p) => up(p, cur :: acc)
        case None    => cur :: acc
      }
    up(id, Nil)
  }

  /** Drop a view (and its memoized sketches) — the reference's `manage`
    * purge. Child views keep working: they captured the parent's plan.
    */
  def purge(id: ViewId): Unit = {
    views.remove(id)
    memo.keys.filter(_._1 == id).foreach(memo.remove)
  }

  /** Number of memoized sketch results served without recompute. */
  def memoHits: Long = memoHitCount.get()

  /** Run a sketch (small-result aggregation) for a view, memoized by
    * `opKey`, under the view's job group so `cancel(id)` aborts it.
    */
  def sketch(id: ViewId, opKey: String)(op: DataFrame => DataFrame): DataFrame = {
    memo.get((id, opKey)) match {
      case Some((schema, rows)) =>
        memoHitCount.incrementAndGet()
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      case None =>
        val sc = spark.sparkContext
        sc.setJobGroup(jobGroup(id), s"view=${id.value} op=$opKey", interruptOnCancel = true)
        try {
          val result = op(views(id).df)
          val rows = result.collect()
          memo.put((id, opKey), (result.schema, rows))
          spark.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
        } finally sc.clearJobGroup()
    }
  }

  /** Abort every running job of this view (paper §3.2 unsubscribe). */
  def cancel(id: ViewId): Unit =
    spark.sparkContext.cancelJobGroup(jobGroup(id))

  /** Progressive partial results: run `sketchOp` on each of `batches`
    * disjoint partition slices, folding partials with the monoid `merge`
    * — each step yields (progress, refined result), the reference's
    * `Observable[PartialResult]` as an iterator. Each partial is
    * materialized (sketch results are small by contract), so the running
    * merge never re-executes earlier slices; each step does scan the
    * source and keep its 1/batches share — the partition-id filter bounds
    * per-step WORK, not I/O (per-file batch enumeration would bound both,
    * at the cost of bypassing the view's logical plan).
    */
  def progressive(id: ViewId, batches: Int,
                  sketchOp: DataFrame => DataFrame,
                  merge: (DataFrame, DataFrame) => DataFrame): Iterator[(Double, DataFrame)] = {
    require(batches > 0)
    val tagged = views(id).df.withColumn("__batch", pmod(spark_partition_id(), lit(batches)))
    var acc: Option[DataFrame] = None
    (0 until batches).iterator.map { i =>
      val sliceResult = sketchOp(tagged.filter(col("__batch") === i).drop("__batch"))
      val rows = sliceResult.collect()
      val slice = spark.createDataFrame(java.util.Arrays.asList(rows: _*), sliceResult.schema)
      acc = Some(acc.fold(slice)(a => merge(a, slice)))
      ((i + 1).toDouble / batches, acc.get)
    }
  }

  /** Resolution-aware sampling rate (paper §4.1): a histogram rendered at
    * `pixelHeight` pixels over `buckets` buckets is visually exact once
    * each bucket sees ~pixelHeight² samples (Chernoff argument).
    */
  def samplingRate(rowCount: Long, pixelHeight: Int, buckets: Int,
                   c: Double = 1.0): Double =
    math.min(1.0, c * pixelHeight.toDouble * pixelHeight * buckets /
      math.max(1L, rowCount).toDouble)
}
