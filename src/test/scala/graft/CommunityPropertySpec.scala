package graft

import graft.operators.Graph
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Louvain local-move round: on ANY small random
  * graph with ANY random starting partition, the distributed operator
  * must agree node-for-node with a driver-side brute-force replay of
  * the exact integer gain argmax (same tie-breaks), and the gain model
  * itself must match the DEFINITION — for the single node whose move
  * realizes the gain, recomputed whole-partition modularity must change
  * by exactly gain/(2m²). */
class CommunityPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toSeq
  }

  /** Random canonical edge list over ≤10 vertices (each candidate pair
    * kept with p≈1/2, at least one edge). */
  private def genGraph(seed: Long): Seq[(Long, Long)] = {
    val nV = 4 + (seed % 7).toInt
    val pairs = for (a <- 1L to nV; b <- (a + 1) to nV) yield (a, b)
    val keep = samples(Gen.oneOf(true, false), pairs.size, seed)
    val kept = pairs.zip(keep).collect { case (p, true) => p }
    if (kept.nonEmpty) kept else pairs.take(1)
  }

  private def genLabels(vs: Seq[Long], seed: Long): Map[Long, Long] = {
    val ls = samples(Gen.chooseNum(100L, 103L), vs.size, seed)
    vs.zip(ls).toMap
  }

  /** Driver-side brute-force replay of one synchronized move round:
    * per node, the best strictly-positive gain over neighbor
    * communities, gain·2m² = 2m(k_vc − k_va) − k_v(d_c − d_a + k_v),
    * ties (−gain, c) ascending. */
  private def replay(edges: Seq[(Long, Long)],
      lbl: Map[Long, Long]): Map[Long, Long] = {
    val dir = edges ++ edges.map { case (a, b) => (b, a) }
    val adj = dir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    // .keys.toSeq, NOT .keys: a Set's .map(deg) collapses equal degrees
    // before the sum (the Map.map footgun's Set sibling)
    val dTot = lbl.keys.toSeq.groupBy(lbl).view
      .mapValues(_.map(deg).sum).toMap
    val m = edges.size.toLong
    lbl.map { case (v, a) =>
      val kvc = adj(v).groupBy(lbl).view.mapValues(_.size.toLong).toMap
      val kva = kvc.getOrElse(a, 0L)
      val cands = kvc.keys.filter(_ != a).map { c =>
        val gain = BigInt(2) * m * (kvc(c) - kva) -
          BigInt(deg(v)) * (dTot(c) - dTot(a) + deg(v))
        (gain, c)
      }.toSeq
      if (cands.isEmpty) v -> a
      else {
        val (g, c) = cands.minBy { case (g2, c2) => (-g2, c2) }
        v -> (if (g > 0) c else a)
      }
    }
  }

  /** Whole-partition modularity numerator Σ_c (4m·e_in − d_c²) —
    * q = num / 4m². */
  private def qNum(edges: Seq[(Long, Long)], lbl: Map[Long, Long]): BigInt = {
    val m = edges.size.toLong
    val cs = lbl.values.toSet
    cs.toSeq.map { c =>
      val ein = edges.count { case (a, b) => lbl(a) == c && lbl(b) == c }
      val d = edges.flatMap { case (a, b) => Seq(a, b) }
        .count(v => lbl(v) == c).toLong
      BigInt(4) * m * ein - BigInt(d) * d
    }.sum
  }

  test("louvainMoveRound equals the brute-force gain argmax on random graphs") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val edges = genGraph(seed)
      val vs = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val lbl = genLabels(vs, seed * 31 + 7)
      val df = edges.toDF("pa", "pb")
      val ldf = lbl.toSeq.toDF("v", "community")
      val got = Graph.louvainMoveRound(df, "pa", "pb", ldf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = replay(edges, lbl)
      assert(got == want,
        s"seed=$seed edges=$edges lbl=$lbl\n got=$got\nwant=$want")
      graft.operators.CacheScope.release(spark)
    }
  }

  test("the gain model matches the modularity definition for single moves") {
    // apply each node's chosen move ALONE (sequential semantics — the
    // regime the gain formula is exact in) and check 4m²·Δq == 2·gain·
    // (qNum scales by 4m², the gain comparison by 2m²)
    for (seed <- 11L to 14L) {
      val edges = genGraph(seed)
      val vs = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val lbl = genLabels(vs, seed * 17 + 3)
      val m = edges.size.toLong
      val dir = edges ++ edges.map { case (a, b) => (b, a) }
      val adj = dir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val deg = adj.view.mapValues(_.size.toLong).toMap
      val dTot = lbl.keys.toSeq.groupBy(lbl).view
        .mapValues(_.map(deg).sum).toMap // .toSeq: Set.map collapses
      val before = qNum(edges, lbl)
      vs.foreach { v =>
        val a = lbl(v)
        val kvc = adj(v).groupBy(lbl).view.mapValues(_.size.toLong).toMap
        val kva = kvc.getOrElse(a, 0L)
        kvc.keys.filter(_ != a).foreach { c =>
          val gain = BigInt(2) * m * (kvc(c) - kva) -
            BigInt(deg(v)) * (dTot(c) - dTot(a) + deg(v))
          val after = qNum(edges, lbl.updated(v, c))
          assert(after - before == 2 * gain,
            s"seed=$seed v=$v a=$a c=$c: Δnum=${after - before} gain=$gain")
        }
      }
    }
  }
}
