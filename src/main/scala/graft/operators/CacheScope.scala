package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Per-session registry of the intermediates graft operators persist
  * (banded minhash signatures, simhash frames, shingle indexes, IVF
  * centroids, set-op inputs, …) OR checkpoint (the per-round frames of
  * the iterative graph operators), so callers get a per-job release
  * handle instead of the session-wide `spark.catalog.clearCache()`.
  *
  * Operators call [[persist]] / [[checkpoint]]; a pipeline driver calls
  * [[release]] after the consuming action (Verify/Bench do, per query).
  *
  * Checkpoints need their own tracking because `Dataset.unpersist` only
  * covers CacheManager entries: a `localCheckpoint` pins its blocks at
  * the RDD level (the `LogicalRDD` the checkpointed Dataset wraps), so
  * a registry of Datasets alone leaks every iterative operator's
  * per-round blocks past release() — measured in the r8 bench as a
  * regression of every query that RAN AFTER the LPA pair while their
  * plans were unchanged. [[release]] therefore runs arbitrary
  * release thunks, and [[checkpoint]] registers one that unpersists the
  * checkpoint's underlying RDD.
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
  /** A tracked release thunk. `checkpointed` marks entries whose frame
    * DIES at release (no lineage to recompute from) — [[releasePersisted]]
    * skips them, so a caller can shed recomputable cache pressure
    * mid-pipeline without killing live iterative-operator results. */
  private final case class Entry(thunk: () => Unit, checkpointed: Boolean)

  private val tracked =
    new java.util.HashMap[SparkSession, java.util.ArrayList[Entry]]()

  private def track(spark: SparkSession, thunk: () => Unit,
      checkpointed: Boolean = false): Unit =
    tracked.synchronized {
      tracked.computeIfAbsent(spark,
        _ => new java.util.ArrayList[Entry]()).add(Entry(thunk, checkpointed))
    }

  /** Persist MEMORY_AND_DISK and track for later [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    track(df.sparkSession, () => p.unpersist(blocking = false))
    p
  }

  /** Persist MEMORY_AND_DISK_SER (compact serialized in-memory image)
    * and track for later [[release]] — for CORPUS-PROPORTIONAL
    * intermediates (labeled edge lists, banded signatures): the
    * deserialized default's row objects are what evict into GC storms
    * under co-located memory pressure (the r9 driver-bench pollution
    * window); the serialized image trades a decode per read for a
    * several-fold smaller, GC-inert footprint. Node-/community-sized
    * frames keep the deserialized [[persist]]. */
  private[graft] def persistSer(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    track(df.sparkSession, () => p.unpersist(blocking = false))
    p
  }

  /** Checkpoint (reliable when the context has a checkpoint dir, local
    * otherwise — the same dispatch every iterative operator used
    * inline) and track the checkpoint's RDD blocks for [[release]].
    * Iterative loops additionally call [[unpersistCheckpoint]] on each
    * SUPERSEDED round as soon as its successor materializes, so
    * in-flight state is two node-frames, not rounds × node-frame; the
    * registry entry then makes the double-unpersist a no-op and covers
    * the FINAL round the loop itself never supersedes. */
  private[graft] def checkpoint(df: DataFrame, eager: Boolean): DataFrame = {
    val cp =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager)
      else df.localCheckpoint(eager)
    track(df.sparkSession, () => unpersistCheckpoint(cp), checkpointed = true)
    cp
  }

  /** The block-holding RDD of a checkpointed Dataset: its plan is the
    * `LogicalRDD` leaf Spark's checkpoint wraps around the materialized
    * rows. (For a RELIABLE checkpoint the RDD was never persisted —
    * unpersist is then a no-op and the files age out with the context.) */
  private def checkpointRdd(cp: DataFrame): Option[RDD[_]] =
    cp.queryExecution.logical match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Free a checkpointed Dataset's blocks (non-blocking, idempotent).
    * Callers must only free checkpoints whose successor has already
    * MATERIALIZED — an un-materialized dependent plan would recompute
    * from a truncated lineage and fail. */
  private[graft] def unpersistCheckpoint(cp: DataFrame): Unit =
    checkpointRdd(cp).foreach { r =>
      try r.unpersist(blocking = false) catch { case _: Throwable => () }
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
    * the last release — persisted frames AND checkpoint blocks. For
    * PERSISTED frames this is safe at any time (a later action
    * recomputes from lineage). CHECKPOINTED frames have no lineage to
    * recompute from — release() is the END OF THEIR LIFE: a read after
    * release fails with a missing-block error instead of recomputing.
    * Callers therefore release only after the consuming action (the
    * Verify/Bench per-query discipline); a caller that must shed cache
    * pressure while an iterative-operator result still has readers uses
    * [[releasePersisted]] instead. */
  def release(spark: SparkSession): Unit = {
    val list = tracked.synchronized(tracked.remove(spark))
    if (list != null) list.forEach { e =>
      try e.thunk() catch { case _: Throwable => () }
    }
  }

  /** Unpersist only the RECOMPUTABLE frames (persist entries); leave
    * checkpointed frames — whose blocks are their only copy — tracked
    * and alive for a later [[release]]. Safe at any time. */
  def releasePersisted(spark: SparkSession): Unit = {
    val toRun = new java.util.ArrayList[Entry]()
    tracked.synchronized {
      val list = tracked.remove(spark)
      if (list != null) {
        val keep = new java.util.ArrayList[Entry]()
        list.forEach { e => if (e.checkpointed) keep.add(e) else toRun.add(e) }
        if (!keep.isEmpty) tracked.put(spark, keep)
      }
    }
    toRun.forEach { e => try e.thunk() catch { case _: Throwable => () } }
  }
}
