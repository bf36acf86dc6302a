package graft

import graft.operators.{Layout, Sketch}
import org.apache.spark.sql.{functions => F}

/** Z-order layout + count-min sketch + Bloom-prune properties. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ z-value
  test("zValue interleaves bits: hand-computed cases") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("a", "b")
    val got = df.select(Layout.zValue(F.col("a"), F.col("b"), 10).as("z"))
      .as[Long].collect().toSeq
    // interleave(3=0b011, 5=0b101): a bits at even positions -> 0b010101
    // = 1+4+16? a=3 -> bits 0,1 -> z bits 0,2 -> 5; b=5 -> bits 0,2 ->
    // z bits 1,5 -> 34; total 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 20) - 1))
  }

  test("zValue locality: contiguous z-ranges bound BOTH dims") {
    // full 32x32 grid (bits=5): each of the 16 buckets of 64 contiguous
    // z-values is an 8x8 rectangle -> per-bucket extent 7 in each dim,
    // vs 31 globally.
    val grid = (0 until 32).flatMap(a => (0 until 32).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val ext = grid
      .select(F.col("a"), F.col("b"),
        F.shiftright(Layout.zValue(F.col("a"), F.col("b"), 5), 6).as("bucket"))
      .groupBy("bucket")
      .agg((F.max("a") - F.min("a")).as("ea"), (F.max("b") - F.min("b")).as("eb"))
      .agg(F.max("ea"), F.max("eb")).as[(Long, Long)].head()
    assert(ext == ((7L, 7L)))
  }

  test("zOrderBy shrinks per-partition extents vs unordered layout") {
    val n = 4096
    // deterministic pseudo-random points over a 256x256 grid
    val pts = (0 until n).map { i =>
      (graft.operators.Hashing.hash60(s"x$i") % 256,
        graft.operators.Hashing.hash60(s"y$i") % 256)
    }.toDF("a", "b")
    def meanExtent(df: org.apache.spark.sql.DataFrame): (Double, Double) =
      df.groupBy(F.spark_partition_id().as("p"))
        .agg((F.max("a") - F.min("a")).as("ea"), (F.max("b") - F.min("b")).as("eb"))
        .agg(F.avg("ea"), F.avg("eb")).as[(Double, Double)].head()
    val (ua, ub) = meanExtent(pts.repartition(16))
    val (za, zb) = meanExtent(
      Layout.zOrderBy(pts, F.col("a"), F.col("b"), 8, 16))
    // hash-shuffled partitions see the full range; z-ordered ones see
    // small rectangles in BOTH dims
    assert(ua > 200 && ub > 200, s"unordered baseline degenerate: $ua $ub")
    assert(za < ua / 2 && zb < ub / 2, s"z-order extents not tighter: $za $zb")
  }

  // ---------------------------------------------------------------- cms
  test("cms estimate never underestimates and is exact in a sparse sketch") {
    val tc = Seq(("a", 100L), ("b", 40L), ("c", 7L)).toDF("term", "cnt")
    val sk = Sketch.cmsSketch(tc, "term", "cnt", depth = 4, width = 64)
    assert(sk.agg(F.sum("total")).as[Long].head() == 4 * 147)
    val est = Sketch.cmsEstimate(sk, tc, "term", depth = 4, width = 64)
      .join(tc, "term").select(F.col("term"), F.col("est_cnt"), F.col("cnt"))
      .as[(String, Long, Long)].collect()
    est.foreach { case (t, e, c) => assert(e >= c, s"$t underestimated") }
    // 3 terms in 4x64 cells: overwhelmingly likely collision-free
    assert(est.forall { case (_, e, c) => e == c })
  }

  test("cms out-of-corpus probe estimates 0 when it hits an empty cell") {
    // 1 term in a wide sketch: an unrelated probe almost surely misses
    // every one of the term's 4 cells in at least one row -> min = 0
    val tc = Seq(("only-term", 100L)).toDF("term", "cnt")
    val sk = Sketch.cmsSketch(tc, "term", "cnt", depth = 4, width = 4096)
    val est = Sketch.cmsEstimate(sk,
      Seq(("definitely-not-in-corpus", 0L)).toDF("term", "cnt"),
      "term", depth = 4, width = 4096)
      .select(F.col("est_cnt")).as[Long].head()
    assert(est == 0L)
  }

  test("cms overestimates under forced collisions, bounded by total mass") {
    // width=1: every term collides into one cell per row -> est = N
    val tc = Seq(("a", 10L), ("b", 5L), ("c", 1L)).toDF("term", "cnt")
    val sk = Sketch.cmsSketch(tc, "term", "cnt", depth = 2, width = 1)
    val est = Sketch.cmsEstimate(sk, tc, "term", depth = 2, width = 1)
    assert(est.select(F.col("est_cnt")).as[Long].collect().forall(_ == 16L))
  }

  // -------------------------------------------------------------- bloom
  test("bloom positions: members always hit (no false negatives)") {
    // the query-side invariant, checked directly on the hash family
    val m = 65536L
    def pos(key: String, i: Int): Long =
      graft.operators.Hashing.hash60(s"bf$i:" + key) % m
    val members = (0 until 500).map(k => k.toString)
    val bits = members.flatMap(k => (0 until 3).map(i => pos(k, i))).toSet
    assert(members.forall(k => (0 until 3).forall(i => bits(pos(k, i)))))
  }
}
