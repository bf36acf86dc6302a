package graft

import graft.operators.{Hashing, Reconcile, Sketch}
import org.apache.spark.sql.{functions => F}

/** Table-reconciliation and KMV set-algebra properties. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def rowHash = Hashing.hash60(F.concat_ws("|",
    F.col("id").cast("string"), F.col("v").cast("string")))

  test("diffRows finds drops, edits and inserts; clean buckets rescan nothing") {
    val a = (1L to 1000L).map(i => (i, i * 7 % 101)).toDF("id", "v")
    val b = (1L to 1000L).filter(_ % 97 != 0) // drop 10
      .map(i => (i, if (i % 89 == 0) -1L else i * 7 % 101)) // edit 11
      .toDF("id", "v")
      .union(Seq((2000L, 1L)).toDF("id", "v")) // insert 1
    val diff = Reconcile.diffRows(a, b, Seq("id"), rowHash, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(diff.size == 10 + 11 + 1)
    assert((1L to 1000L).filter(_ % 97 == 0).forall(diff(_) == "missing_in_b"))
    assert((1L to 1000L).filter(i => i % 89 == 0 && i % 97 != 0)
      .forall(diff(_) == "changed"))
    assert(diff(2000L) == "missing_in_a")
  }

  test("diffRows of identical tables is empty") {
    val a = (1L to 500L).map(i => (i, i % 13)).toDF("id", "v")
    assert(Reconcile.diffRows(a, a, Seq("id"), rowHash, buckets = 32)
      .count() == 0)
  }

  test("kmvSetOps is exact below k and consistent (inter <= min, union >= max)") {
    // cohort 0: {0..299}, cohort 1: {200..499} -> |A|=300 |B|=300
    // |A∩B|=100 |A∪B|=500
    val df = ((0 until 300).map(i => (0, s"x$i")) ++
      (200 until 500).map(i => (1, s"x$i"))).toDF("c", "t")
    // k large enough to be exact
    val exact = Sketch.kmvSetOps(df, F.col("c"), "t", k = 1024)
      .select("est_a", "est_b", "est_union", "est_intersection", "jaccard")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(exact == ((300.0, 300.0, 500.0, 100.0, 0.2)))
    // k=64: real estimation; sanity-band the estimates (KMV rel-err
    // ~1/sqrt(k-2) ~ 12.7%; allow 4 sigma)
    val est = Sketch.kmvSetOps(df, F.col("c"), "t", k = 64)
      .select("est_a", "est_b", "est_union", "est_intersection")
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(est._1 - 300) < 150 && math.abs(est._2 - 300) < 150)
    assert(math.abs(est._3 - 500) < 250)
    assert(est._4 >= 0 && est._4 < 500)
  }

  test("kmvSetOps disjoint cohorts estimate ~zero intersection") {
    val df = ((0 until 400).map(i => (0, s"a$i")) ++
      (0 until 400).map(i => (1, s"b$i"))).toDF("c", "t")
    val r = Sketch.kmvSetOps(df, F.col("c"), "t", k = 64)
      .select("n_shared", "jaccard").as[(Long, Double)].head()
    // shared hashes between disjoint random 60-bit sets: overwhelmingly 0
    assert(r._1 == 0 && r._2 == 0.0)
  }
}
