package graft

import graft.operators.CacheScope
import org.apache.spark.sql.{functions => F}

/** CacheScope registry hygiene: per-job release that works even after
  * GC (frames are held strongly until release — a weak handle would
  * silently no-op the unpersist while the CacheManager kept the blocks
  * pinned). The registry is a plain strong map: release() is the only
  * exit, and an unreleased session stays pinned by contract. */
class CacheScopeSpec extends SparkSpec {

  test("release unpersists and drops the session entry") {
    val base = CacheScope.trackedSessions
    val df = CacheScope.persist(spark.range(100).toDF("id"))
    assert(df.count() == 100)
    assert(CacheScope.trackedFrames(spark) >= 1)
    CacheScope.release(spark)
    assert(CacheScope.trackedFrames(spark) == 0)
    assert(CacheScope.trackedSessions <= base)
  }

  test("release is safe to call twice / with nothing tracked") {
    CacheScope.release(spark)
    CacheScope.release(spark)
  }

  test("release still unpersists after the caller dropped its reference + GC") {
    // the regression scenario: the operator's local Dataset variable is
    // the only strong reference; a GC mid-job must NOT cost us the
    // unpersist handle (the CacheManager pins the blocks regardless)
    var df = CacheScope.persist(
      spark.range(50).select(F.col("id"), (F.col("id") * 2).as("v")))
    assert(df.count() == 50)
    assert(CacheScope.trackedFrames(spark) >= 1)
    df = null // drop the only caller-side strong reference
    System.gc()
    Thread.sleep(100)
    assert(CacheScope.trackedFrames(spark) >= 1,
      "registry must keep the unpersist handle alive until release")
    CacheScope.release(spark)
    assert(CacheScope.trackedFrames(spark) == 0)
  }

  test("iterative checkpoint blocks are freed — superseded mid-loop, rest at release") {
    // the r8 leak: localCheckpoint pins RDD-level blocks that
    // Dataset.unpersist / the old frame registry never touched, so every
    // query running AFTER an iterative graph op inherited its blocks.
    // localCheckpoint registers its RDD in sc.getPersistentRDDs, which
    // makes both halves of the fix observable.
    val sc = spark.sparkContext
    CacheScope.release(spark)
    val before = sc.getPersistentRDDs.keySet
    val pairs = spark.range(40).selectExpr("id AS a", "(id + 1) % 40 AS b")
    val labels = graft.operators.Graph.labelPropagation(pairs, "a", "b", 4)
    assert(labels.count() == 40)
    val during = sc.getPersistentRDDs.keySet -- before
    // 4 rounds ran, but superseded rounds are freed as soon as their
    // successor materializes: only the FINAL round's checkpoint plus the
    // persisted edge frame's cache-buffer RDD may remain registered —
    // without the mid-loop free this set holds every round (5 entries)
    assert(during.size <= 2,
      s"expected at most edges + the final round's checkpoint, got $during")
    CacheScope.release(spark)
    val after = sc.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"release() must clear checkpoint RDD registrations, got $after")
  }

  test("releasePersisted frees recomputable frames but keeps checkpoints alive") {
    CacheScope.release(spark)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val p = CacheScope.persist(spark.range(30).toDF("id"))
    assert(p.count() == 30)
    val cp = CacheScope.checkpoint(
      spark.range(10).toDF("x"), eager = true)
    assert(CacheScope.trackedFrames(spark) == 2)
    CacheScope.releasePersisted(spark)
    // the checkpoint entry survives — its blocks are its only copy
    assert(CacheScope.trackedFrames(spark) == 1)
    assert(cp.count() == 10, "checkpointed frame must still be readable")
    // the persisted frame is gone from the cache but recomputes fine
    assert(p.count() == 30)
    CacheScope.release(spark)
    assert(CacheScope.trackedFrames(spark) == 0)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("a derived session's caches release independently") {
    val s2 = spark.newSession()
    val d1 = CacheScope.persist(spark.range(10).toDF("a"))
    val d2 = CacheScope.persist(s2.range(20).toDF("b"))
    assert(d1.count() == 10 && d2.count() == 20)
    CacheScope.release(s2)
    assert(CacheScope.trackedFrames(s2) == 0)
    assert(CacheScope.trackedFrames(spark) >= 1, "sibling session untouched")
    CacheScope.release(spark)
  }
}
