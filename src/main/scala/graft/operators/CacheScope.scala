package graft.operators

import java.lang.ref.WeakReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-session registry of the intermediates graft operators persist
  * (banded minhash signatures, simhash frames, shingle indexes, IVF
  * centroids, set-op inputs, …), so callers get a per-job release
  * handle instead of the session-wide `spark.catalog.clearCache()`.
  *
  * Operators call [[persist]]; a pipeline driver calls [[release]]
  * after the consuming action (Verify/Bench do, per query).
  *
  * Reference discipline: the registry must never be the thing keeping
  * a session (or its cached frames) alive. Sessions are WEAK keys and
  * frames are WEAK values — a caller that drops every reference to a
  * session/frame without releasing lets the GC reclaim them (the
  * session's cached blocks die with its CacheManager); a caller that
  * keeps them is the one pinning them, not this map.
  */
object CacheScope {
  private val tracked =
    new java.util.WeakHashMap[SparkSession,
      java.util.ArrayList[WeakReference[DataFrame]]]()

  /** Persist MEMORY_AND_DISK and track for later [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.synchronized {
      val list = tracked.computeIfAbsent(df.sparkSession,
        _ => new java.util.ArrayList[WeakReference[DataFrame]]())
      list.removeIf(_.get() == null) // purge entries whose frame was GC'd
      list.add(new WeakReference(p))
    }
    p
  }

  /** Number of sessions currently tracked (test observability). */
  private[graft] def trackedSessions: Int =
    tracked.synchronized(tracked.size())

  /** Number of still-reachable frames tracked on a session (test
    * observability — counts live WeakReferences only). */
  private[graft] def trackedFrames(spark: SparkSession): Int =
    tracked.synchronized {
      val list = tracked.get(spark)
      if (list == null) 0
      else {
        var n = 0
        list.forEach(r => if (r.get() != null) n += 1)
        n
      }
    }

  /** Unpersist (non-blocking) everything tracked on this session since
    * the last release. Safe to call at any time: frames still needed by
    * an in-flight plan recompute instead of failing. */
  def release(spark: SparkSession): Unit = {
    val list = tracked.synchronized(tracked.remove(spark))
    if (list != null) list.forEach { ref =>
      val df = ref.get()
      if (df != null)
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
