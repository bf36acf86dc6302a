package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.storage.StorageLevel

/** Phase timing for D53's move-round pipeline at sf0.1 (r10): where do
  * the ~5 s go — labeled-edge build, move-round materialization,
  * after-score, n_moved? Run: `sbt "runMain graft.tools.CommunityProf"`. */
object CommunityProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHED_AQE", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.queries.Staged
    import graft.operators.{CacheScope, Graph}

    def ms[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
      r
    }

    // warm staging outside phases
    val edges = Staged.coPurchaseEdges(spark, d)
    val before = Staged.communityLabels(spark, d)
    Staged.communityQ(spark, d).count()
    println(s"edges=${edges.count()} nodes=${before.count()} " +
      s"communities=${before.select("community").distinct().count()}")
    if (args.contains("sizes")) {
      val lblB = Graph.labelEdges(edges, "pa", "pb", before)
      val dirNbr = lblB.select(F.explode(F.array(
          F.struct(F.col("pa").as("v"), F.col("cb").as("c")),
          F.struct(F.col("pb").as("v"), F.col("ca").as("c")))).as("x"))
        .select(F.col("x.v").as("v"), F.col("x.c").as("c"))
      val kvc = dirNbr.groupBy("v", "c").agg(F.count(F.lit(1)).as("kv"))
      println(s"kvc=${kvc.count()}")
      for (r <- 1 to 3) {
        ms("  move plain count") {
          Graph.louvainMoveRoundLabeled(
            Graph.labelEdges(edges, "pa", "pb", before), before).count()
        }
        ms("  move persist+count") {
          CacheScope.persist(Graph.louvainMoveRoundLabeled(
            Graph.labelEdges(edges, "pa", "pb", before), before)).count()
        }
        ms("  move write parquet") {
          Graph.louvainMoveRoundLabeled(
            Graph.labelEdges(edges, "pa", "pb", before), before)
            .write.mode("overwrite")
            .parquet(s"/tmp/graft_prof_after_$r")
        }
        CacheScope.release(spark)
      }
      spark.stop(); return
    }

    if (args.contains("explain")) {
      val lblB = Graph.labelEdges(edges, "pa", "pb", before)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      Graph.louvainMoveRoundLabeled(lblB, before).explain("formatted")
      spark.stop(); return
    }

    for (round <- 1 to 5) {
      println(s"--- round $round")
      val t0 = System.nanoTime()
      val df = ms("fn (move+persist barrier)") {
        graft.SparkEntry.queries("community_refine")(spark, d)
      }
      ms("final action")(df.count())
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
      CacheScope.release(spark)
    }
    spark.stop()
  }
}
