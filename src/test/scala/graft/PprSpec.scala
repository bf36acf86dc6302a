package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** First-principles replay for D79's operator
  * (`Graph.personalizedPageRank`): on random small graphs the
  * distributed integer fixed-point must equal a plain-Scala map
  * recursion — same floor divisions, same teleport placement — and the
  * restart semantics must hold (zero everywhere without seeds; mass
  * concentrated near the seeds with them). */
class PprSpec extends SparkSpec {

  private val SCALE = graft.operators.Graph.SCALE

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toSeq
  }

  private def genEdges(seed: Long): Seq[(Long, Long)] = {
    val n = 60
    val as = samples(Gen.chooseNum(0L, 29L), n, seed)
    val bs = samples(Gen.chooseNum(0L, 29L), n, seed + 7)
    as.zip(bs).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
  }

  private def replay(pairs: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val nodes = deg.keySet
    val teleport = 15L * SCALE / 100L
    var rank: Map[Long, Long] = nodes.map(v =>
      v -> (if (seeds(v)) SCALE else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / deg(u) }.sum }
      rank = nodes.map { v =>
        v -> ((if (seeds(v)) teleport else 0L) +
          85L * in.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    rank
  }

  test("personalizedPageRank matches a plain-Scala integer replay on " +
    "random graphs") {
    import spark.implicits._
    for (seed <- 1L to 4L) {
      val pairs = genEdges(seed * 13)
      val seeds = Set(0L, 7L, 14L)
      val pdf = pairs.toDF("pa", "pb")
      val sdf = seeds.toSeq.toDF("v")
      val got = graft.operators.Graph
        .personalizedPageRank(pdf, "pa", "pb", sdf, iters = 3)
        .collect().map(r => r.getAs[Long]("v") ->
          ((r.getAs[Long]("is_seed"), r.getAs[Long]("rank_fp")))).toMap
      val want = replay(pairs, seeds, 3)
      assert(got.keySet == want.keySet)
      for ((v, (isSeed, fp)) <- got) {
        assert(isSeed == (if (seeds(v)) 1L else 0L), s"seed flag $v")
        assert(fp == want(v), s"seed $seed node $v: $fp vs ${want(v)}")
      }
      graft.operators.CacheScope.release(spark)
    }
  }

  test("no seeds means zero mass everywhere; with seeds the total mass " +
    "is seed-bounded") {
    import spark.implicits._
    val pairs = genEdges(99L)
    val none = graft.operators.Graph.personalizedPageRank(
      pairs.toDF("pa", "pb"), "pa", "pb",
      Seq.empty[Long].toDF("v"), iters = 2)
    assert(none.agg(org.apache.spark.sql.functions.sum("rank_fp"))
      .collect().head.getLong(0) == 0L)
    val some = graft.operators.Graph.personalizedPageRank(
      pairs.toDF("pa", "pb"), "pa", "pb", Seq(0L).toDF("v"), iters = 2)
      .collect()
    // total mass cannot exceed the one seed's emitted mass
    assert(some.map(_.getAs[Long]("rank_fp")).sum <= 2L * SCALE)
    assert(some.filter(_.getAs[Long]("is_seed") == 1L).length == 1)
    graft.operators.CacheScope.release(spark)
  }
}
