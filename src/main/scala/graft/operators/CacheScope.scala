package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-session registry of the intermediates graft operators persist
  * (banded minhash signatures, simhash frames, shingle indexes, IVF
  * centroids, set-op inputs, …), so callers get a per-job release
  * handle instead of the session-wide `spark.catalog.clearCache()`.
  *
  * Operators call [[persist]]; a pipeline driver calls [[release]]
  * after the consuming action (Verify/Bench do, per query). A caller
  * that never releases gets the old behavior: caches live until the
  * session ends.
  */
object CacheScope {
  private val tracked =
    new java.util.HashMap[SparkSession, java.util.ArrayList[DataFrame]]()

  /** Persist MEMORY_AND_DISK and track for later [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.synchronized {
      tracked.computeIfAbsent(df.sparkSession,
        _ => new java.util.ArrayList[DataFrame]()).add(p)
    }
    p
  }

  /** Unpersist (non-blocking) everything tracked on this session since
    * the last release. Safe to call at any time: frames still needed by
    * an in-flight plan recompute instead of failing. */
  def release(spark: SparkSession): Unit = {
    val list = tracked.synchronized(tracked.remove(spark))
    if (list != null) list.forEach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
