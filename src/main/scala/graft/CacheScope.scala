package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lifecycle tracker for DataFrames pinned by multi-pass operators
  * (Dedup.jaccardPairs / minHashLSH, the cleaning pipeline): operators
  * `pin` the subtrees they evaluate more than once; the caller that
  * eventually materializes the lazy result calls `release()` when done.
  *
  * Two usage modes:
  *  - batch harnesses (Verify/Bench) pass the shared [[CacheScope.session]]
  *    scope and run `spark.catalog.clearCache()` between queries — the pins
  *    live exactly one query;
  *  - long-lived sessions (tests, the REPL) use [[CacheScope.scoped]] or an
  *    explicit instance so pins are released deterministically without
  *    nuking unrelated cached tables.
  */
final class CacheScope private[graft] (track: Boolean = true) {
  private val pinned = mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist (MEMORY_AND_DISK — at 100 TB a hot subtree must degrade to
    * disk, not OOM) and track for release. A frame that is ALREADY
    * persisted is not tracked: `storageLevel` resolves through Spark's
    * CacheManager by canonicalized plan, so it can reflect another
    * scope's pin of an identical plan — release() must only unpersist
    * what this scope itself persisted, never a pin it doesn't own.
    */
  def pin[T](ds: Dataset[T]): Dataset[T] = synchronized {
    if (ds.storageLevel == StorageLevel.NONE) {
      ds.persist(StorageLevel.MEMORY_AND_DISK)
      if (track) pinned += ds
    }
    ds
  }

  /** Unpersist every pinned frame (idempotent). */
  def release(): Unit = synchronized {
    pinned.foreach(_.unpersist())
    pinned.clear()
  }
}

object CacheScope {
  /** Session-lifetime scope: pins are released by the batch harnesses'
    * `clearCache()` between queries, never individually — so this scope
    * keeps no references (track = false) and cannot grow driver memory
    * over a long session.
    */
  val session: CacheScope = new CacheScope(track = false)

  /** Run `f` with a fresh scope, releasing every pin afterwards. `f` must
    * materialize anything it wants to keep (lazy results lose their pins).
    */
  def scoped[T](f: CacheScope => T): T = {
    val s = new CacheScope
    try f(s) finally s.release()
  }
}
