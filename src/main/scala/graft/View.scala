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
final class ViewSession(spark: SparkSession, memoCap: Int = 256) {

  private type MemoKey = (ViewId, String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private val views = TrieMap.empty[ViewId, ViewNode]
  // LRU with a hard cap: sketch results are small by contract, but a
  // long-lived session accumulates one entry per UI gesture — bound it
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[MemoKey, (org.apache.spark.sql.types.StructType, Array[Row])](
      16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[MemoKey, (org.apache.spark.sql.types.StructType, Array[Row])]): Boolean =
        size() > memoCap
    })
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

  /** All registered view ids (ordered by id string). */
  def allViews: Seq[ViewId] = views.keys.toSeq.sortBy(_.value)

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
    memo.synchronized {
      memo.keySet.removeIf(_._1 == id)
    }
  }

  /** Number of memoized sketch results served without recompute. */
  def memoHits: Long = memoHitCount.get()

  /** Number of memoized sketch results currently held. */
  def memoSize: Int = memo.size()

  /** Run a sketch (small-result aggregation) for a view, under the view's
    * job group so `cancel(id)` aborts it. Memoized by (view, opKey, the
    * CANONICALIZED PLAN of op(view)) — full structural plan equality, not
    * a hash that could collide: `op` is always applied (plan building is
    * milliseconds; no data moves), so reusing an opKey with a different
    * op can never serve a stale result — the plan key diverges and both
    * entries coexist. Entries are LRU-evicted past `memoCap` (the
    * driver-resident memo cannot grow without bound in a long session).
    */
  def sketch(id: ViewId, opKey: String)(op: DataFrame => DataFrame): DataFrame = {
    val result = op(views(id).df)
    val key = (id, opKey, result.queryExecution.analyzed.canonicalized)
    Option(memo.get(key)) match {
      case Some((schema, rows)) =>
        memoHitCount.incrementAndGet()
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      case None =>
        val sc = spark.sparkContext
        sc.setJobGroup(jobGroup(id), s"view=${id.value} op=$opKey", interruptOnCancel = true)
        try {
          val rows = result.collect()
          memo.put(key, (result.schema, rows))
          spark.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
        } finally sc.clearJobGroup()
    }
  }

  /** Abort every running job of this view (paper §3.2 unsubscribe). */
  def cancel(id: ViewId): Unit =
    spark.sparkContext.cancelJobGroup(jobGroup(id))

  /** Progressive partial results: the view's largest file-backed scan is
    * enumerated into `batches` disjoint FILE slices (deterministic: sorted
    * file list, round-robin — see FileSlices); `sketchOp` runs per slice
    * and the monoid `merge` folds partials into a refining result — each
    * step yields (progress, refined result), the reference's
    * `Observable[PartialResult]` as an iterator. A sliced plan LISTS only
    * its own files, so each step bounds both work and I/O at ~1/batches
    * of the source (`ref:P/dataset/ParallelDataSet.java` streams partials
    * from per-leaf work the same way). File membership is stable across
    * steps by construction, unlike partition-id slicing, which can
    * migrate rows between re-executions when the plan contains a
    * round-robin repartition, a sample, or an AQE-replanned shuffle.
    * Partials are materialized (sketch results are small by contract), so
    * the running merge never re-executes earlier slices. Views with no
    * file-backed scan are rejected.
    */
  def progressive(id: ViewId, batches: Int,
                  sketchOp: DataFrame => DataFrame,
                  merge: (DataFrame, DataFrame) => DataFrame): Iterator[(Double, DataFrame)] = {
    val slices = graft.plans.FileSlices.slices(views(id).df, batches)
    var acc: Option[DataFrame] = None
    slices.iterator.zipWithIndex.map { case (sliceDf, i) =>
      val sliceResult = sketchOp(sliceDf)
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
