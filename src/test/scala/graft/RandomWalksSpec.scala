package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Hashing}

/** Properties of the D80 deterministic walk-corpus generator:
  * every transition is a real edge, every walk runs full length
  * (undirected adjacency has no dead ends), and the neighbor choice
  * is exactly the hash-rank rule — re-derived INDEPENDENTLY here from
  * the raw edge list with driver-side md5, not the operator's code. */
class RandomWalksSpec extends SparkSpec {

  private lazy val edges = {
    import spark.implicits._
    // a small deterministic graph with skewed degrees
    (for (i <- 1L to 40L; j <- (i + 1) to math.min(40L, i + 1 + i % 5))
      yield (i, j)).toDF("pa", "pb")
  }

  private lazy val starts = {
    import spark.implicits._
    Seq(1L, 7L, 20L, 40L).toDF("node")
  }

  private lazy val out =
    Graph.randomWalks(edges, "pa", "pb", starts, "node", steps = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("every walk is full length and starts at its walk_id") {
    val byWalk = out.groupBy(_._1)
    assert(byWalk.keySet == Set(1L, 7L, 20L, 40L))
    byWalk.foreach { case (w, rows) =>
      assert(rows.length == 6, s"walk $w truncated")
      assert(rows.head == ((w, 0L, w)))
      assert(rows.map(_._2).toSeq == (0L to 5L))
    }
  }

  test("every transition is an edge and matches the independently " +
    "re-derived hash-rank choice") {
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, IndexedSeq[Long]] =
      (e ++ e.map(_.swap)).groupBy(_._1)
        .map { case (u, vs) => u -> vs.map(_._2).sorted.toIndexedSeq }
    out.groupBy(_._1).foreach { case (w, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      for (t <- 1 until path.length) {
        val u = path(t - 1)
        val nbrs = adj(u)
        assert(nbrs.contains(path(t)), s"walk $w step $t: not an edge")
        val idx = (Hashing.hash60(s"$w|$t|$u") % nbrs.length).toInt
        assert(path(t) == nbrs(idx),
          s"walk $w step $t: expected rank-$idx neighbor ${nbrs(idx)}")
      }
    }
  }

  test("the registered query's walks transition only along co-purchase " +
    "edges") {
    val res = SparkEntry.queries("graph_random_walks")(spark, sf)
    val und = graft.queries.Staged.coPurchaseEdges(spark, sf)
      .select(col("pa").as("u"), col("pb").as("v"))
    val trans = res.select(col("walk_id"), col("step"), col("node"))
      .withColumn("prev", lag("node", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("walk_id").orderBy("step")))
      .where(col("prev").isNotNull)
      .select(least(col("prev"), col("node")).as("u"),
        greatest(col("prev"), col("node")).as("v"))
    assert(trans.join(und, Seq("u", "v"), "left_anti").count() == 0,
      "a walk transition is not a co-purchase edge")
    assert(res.count() > 0)
  }
}
