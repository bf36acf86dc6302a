package graft

import graft.operators.CacheScope
import org.apache.spark.sql.{functions => F}

/** CacheScope registry hygiene: per-job release, and the weak-reference
  * discipline — the registry must never be what keeps a session or a
  * frame alive. */
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

  test("frames are weakly held: a dropped frame is purged after GC") {
    var df = CacheScope.persist(
      spark.range(50).select(F.col("id"), (F.col("id") * 2).as("v")))
    assert(df.count() == 50)
    assert(CacheScope.trackedFrames(spark) >= 1)
    df = null // drop the only strong reference
    // weak refs clear on GC; bounded retry since GC timing is advisory
    var tries = 0
    while (CacheScope.trackedFrames(spark) > 0 && tries < 50) {
      System.gc()
      Thread.sleep(50)
      tries += 1
    }
    assert(CacheScope.trackedFrames(spark) == 0,
      "registry must not be the thing pinning a dropped frame")
    CacheScope.release(spark) // leftover entry cleanup
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
