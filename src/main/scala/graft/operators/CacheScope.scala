package graft.operators

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
  * Reference discipline: frames are held STRONGLY between persist and
  * release — deliberately. GC'ing the Dataset wrapper does NOT free
  * its cached blocks (the CacheManager lives in SharedState for the
  * SparkContext lifetime and holds the cached plan itself), so a weak
  * reference here would only lose the unpersist handle: after any GC,
  * release() would silently no-op and the MEMORY_AND_DISK blocks would
  * stay pinned forever — worst exactly under memory pressure, which is
  * what triggers GC.
  *
  * The map is therefore a PLAIN HashMap, keyed by session: a tracked
  * DataFrame strongly references its session (`df.sparkSession`), so a
  * WeakHashMap entry would pin its own key anyway and provide no
  * protection — the previous weak keying was decorative, not
  * functional. The contract is explicit instead: a caller that
  * persists and never calls release() pins its session AND its cached
  * blocks, exactly as if it had called `.persist` directly; release()
  * is the only exit.
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

  /** Number of sessions currently tracked (test observability). */
  private[graft] def trackedSessions: Int =
    tracked.synchronized(tracked.size())

  /** Number of frames tracked on a session (test observability). */
  private[graft] def trackedFrames(spark: SparkSession): Int =
    tracked.synchronized {
      val list = tracked.get(spark)
      if (list == null) 0 else list.size()
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
