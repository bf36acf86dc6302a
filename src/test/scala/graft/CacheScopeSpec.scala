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
