package graft.tools

import org.apache.spark.sql.{functions => F}

/** A/B profile for graph_reach's edge-build: distinct edges (extra
  * shuffle of the largest intermediate, smaller join fan-in) vs raw
  * multi-edges (no shuffle, frontier-level dedup absorbs multiplicity).
  * BFS min-hops are invariant to edge multiplicity, so both are
  * correct; this measures which is faster at sf0.1. */
object ReachProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$c")
      graft.operators.CacheScope.release(spark)
    }
    def bfs(dedupEdges: Boolean): Long = {
      val li = spark.read.parquet(s"$d/lineitem.parquet").select(
        F.col("l_orderkey").as("ok"), F.col("l_partkey").as("pk"))
      val a = li.select(F.col("ok"), F.col("pk").as("pa"))
      val b = li.select(F.col("ok"), F.col("pk").as("pb"))
      val pairs0 = a.join(b, "ok").where(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
      val pairs = if (dedupEdges) pairs0.distinct() else pairs0
      val edges = graft.operators.CacheScope.persist(
        pairs.select(F.col("pa").as("u"), F.col("pb").as("v"))
          .unionAll(pairs.select(F.col("pb").as("u"), F.col("pa").as("v"))))
      val seeds = spark.read.parquet(s"$d/part.parquet")
        .where(F.expr("p_partkey % 97 = 0"))
        .select(F.col("p_partkey").cast("long").as("node"))
      var reached = seeds.withColumn("hop", F.lit(0L))
      for (h <- 1 to 2) {
        val frontier = reached.where(F.col("hop") === (h - 1))
        val next = frontier.join(edges, frontier("node") === edges("u"))
          .select(F.col("v").as("node")).distinct()
          .join(reached.select("node"), Seq("node"), "left_anti")
          .withColumn("hop", F.lit(h.toLong))
        reached = reached.unionAll(next)
      }
      reached.count()
    }
    time("warmup")(bfs(dedupEdges = true))
    time("bfs_distinct_edges")(bfs(dedupEdges = true))
    time("bfs_distinct_edges_2")(bfs(dedupEdges = true))
    time("bfs_raw_multiedges")(bfs(dedupEdges = false))
    time("bfs_raw_multiedges_2")(bfs(dedupEdges = false))
    spark.stop()
  }
}
