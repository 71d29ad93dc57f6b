package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames the engine persists on the caller's session.
  *
  * Several operators persist a shared intermediate (LSH signatures,
  * pruned edge lists, BM25 postings) because the result plan references
  * it more than once and Spark inlines multiply-referenced CTEs. The
  * returned DataFrame is lazy, so the operator itself can never
  * unpersist — the cache must outlive the call and be dropped only
  * after the CALLER materializes the result. This object is that
  * contract: every engine persist routes through [[persisted]], and a
  * caller (bench harness, test suite, library user) reclaims all engine
  * cache in one call with [[releaseAll]] once it has consumed the
  * results it needs. Entries are weakly held, so frames the caller
  * drops without releasing are still GC-reclaimable.
  */
object EngineCache {
  private val tracked = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[Dataset[_], java.lang.Boolean]())

  /** Persist `ds` at MEMORY_AND_DISK and track it for [[releaseAll]]. */
  def persisted[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(ds)
    ds
  }

  /** Unpersist every frame the engine persisted since the last release.
    * Call after materializing operator results; dropped frames
    * recompute (correctly, without the cache) if re-consumed later. */
  def releaseAll(): Unit = synchronized {
    tracked.forEach(d => d.unpersist(blocking = false))
    tracked.clear()
  }
}
