package graft

import graft.operators.{Graph, Pq}
import org.apache.spark.sql.{functions => F}

/** Product quantization (SURVEY §2 D14) and fixed-point PageRank (D15)
  * on constructed inputs with hand-checkable answers. */
class PqGraphSpec extends SparkSpec {

  // two well-separated clusters in 8 dims (m=2 subspaces of 4)
  private def vec(base: Float, jitter: Float): Seq[Float] =
    Seq(base + jitter, base, base - jitter, base,
      -base, -base - jitter, -base, -base + jitter)

  private lazy val corpus = {
    import spark.implicits._
    ((1L to 4L).map(i => (i, vec(10f, i * 0.1f))) ++
      (5L to 8L).map(i => (i, vec(-10f, i * 0.1f))))
      .toDF("vec_id", "embedding")
      .select(F.col("vec_id"), F.col("embedding").cast("array<float>"))
  }

  test("pq: identical-cluster vectors share codes; clusters get distinct codes") {
    val cb = Pq.codebooks(corpus, "vec_id", "embedding",
      m = 2, subDim = 4, k = 2, iters = 2)
    assert(cb.count() == 4) // 2 subs × k=2
    val codes = Pq.encode(corpus, cb, "vec_id", "embedding", m = 2, subDim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes.values.forall(_.length == 2))
    assert(codes.values.flatten.forall(c => c >= 0 && c < 2))
    // within-cluster: all four share the same code word
    assert((1L to 4L).map(codes).distinct.size == 1)
    assert((5L to 8L).map(codes).distinct.size == 1)
    // across clusters the code words differ
    assert(codes(1L) != codes(5L))
  }

  test("pq adc: query retrieves its own cluster above the other") {
    import spark.implicits._
    val cb = Pq.codebooks(corpus, "vec_id", "embedding",
      m = 2, subDim = 4, k = 2, iters = 2)
    val codes = Pq.encode(corpus, cb, "vec_id", "embedding", m = 2, subDim = 4)
    val q = Seq((1L, vec(10f, 0.05f)))
      .toDF("vec_id", "embedding")
      .select(F.col("vec_id"), F.col("embedding").cast("array<float>"))
    val top = Pq.adcTopK(codes, cb, q, "vec_id", "embedding",
      k = 3, m = 2, subDim = 4).orderBy("rank").collect()
    assert(top.length == 3)
    // cluster A members (2,3,4 — 1 is the self-excluded query id) win
    assert(top.forall(_.getAs[Long]("match_id") <= 4L))
    assert(top.forall(_.getAs[Long]("score_micro") > 0L))
  }

  test("pagerank: a regular graph stays exactly at SCALE every round") {
    import spark.implicits._
    // triangle: deg 2 everywhere → contrib sum = rank → fixed point is
    // exact in integer arithmetic (85 * 1e9 divides evenly by 100)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val r = Graph.pageRank(tri, "a", "b", iters = 3).collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("rank_fp") == Graph.SCALE))
    assert(r.forall(_.getAs[Double]("rank") == 1.0))
  }

  test("pagerank: star center outranks leaves; mass ordering is stable") {
    import spark.implicits._
    val star = (2L to 6L).map(l => (1L, l)).toDF("a", "b")
    val r = Graph.pageRank(star, "a", "b", iters = 5)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("rank_fp"))
      .toMap
    assert(r(1L) > r(2L))
    assert((2L to 6L).map(r).distinct.size == 1) // leaves symmetric
  }

  test("pagerank: bit-identical across runs (integer fixed-point)") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val a = Graph.pageRank(g, "a", "b", iters = 5)
      .orderBy("doc_id").collect().toSeq
    val b = Graph.pageRank(g, "a", "b", iters = 5)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("triangleCount: hand cases (clique, path, square+diagonal)") {
    import spark.implicits._
    // K4: C(4,3) = 4 triangles
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("a", "b")
    assert(Graph.triangleCount(k4, "a", "b")
      .select("n_triangles").as[Long].head() == 4L)
    // path: none
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangleCount(path, "a", "b")
      .select("n_triangles").as[Long].head() == 0L)
    // square + one diagonal: 2
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    assert(Graph.triangleCount(sq, "a", "b")
      .select("n_triangles").as[Long].head() == 2L)
  }

  test("pq_incremental distortion equals a driver-side integer replay") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val standing = emb.where(F.expr("vec_id % 10 != 7"))
    val batch = emb.where(F.expr("vec_id % 10 = 7"))
    val cb = Pq.codebooks(standing, "vec_id", "embedding",
      m = 4, subDim = 16, k = 8, iters = 2)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val codes = Pq.encode(batch, cb, "vec_id", "embedding", 4, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val vecs = batch.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val agg = collection.mutable.Map[(Long, Long), (Long, BigInt)]()
      .withDefaultValue((0L, BigInt(0)))
    codes.foreach { case (vid, cs) =>
      cs.zipWithIndex.foreach { case (ck, sub) =>
        val sv = vecs(vid).slice(sub * 16, sub * 16 + 16)
        val cent = cbMap((sub, ck.toInt))
        val dist = sv.zip(cent).map { case (x, c) =>
          val dd = math.floor(x.toDouble * 1e6).toLong -
            math.floor(c.toDouble * 1e6).toLong
          BigInt(dd) * dd
        }.sum
        val (n0, s0) = agg((sub.toLong, ck))
        agg((sub.toLong, ck)) = (n0 + 1, s0 + dist)
      }
    }
    val rows = SparkEntry.queries("pq_incremental")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_batch"))).sum ==
      codes.length * 4L) // every batch vector encodes in all 4 subspaces
    rows.foreach { r =>
      val (n, sd) = agg((r.getLong(0), r.getLong(1)))
      assert(r.getLong(r.fieldIndex("n_batch")) == n)
      assert(r.getLong(r.fieldIndex("avg_dist_micro2")) == (sd / n).toLong)
    }
  }

  test("triangleCount matches brute force on deterministic random graphs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val n = 25
      // deterministic pseudo-random edge set (~25% density)
      val edges = (for (i <- 0L until n; j <- (i + 1) until n
        if graft.operators.Hashing.hash60(s"g$seed:$i:$j") % 4 == 0)
        yield (i, j)).toSeq
      val adj = edges.toSet
      val brute = (for (i <- 0L until n; j <- (i + 1) until n;
        l <- (j + 1) until n
        if adj((i, j)) && adj((j, l)) && adj((i, l))) yield 1).size.toLong
      val got = Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
        .select("n_triangles").as[Long].head()
      assert(got == brute, s"seed $seed: $got != $brute")
    }
  }
}
