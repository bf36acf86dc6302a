package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.queries.{Staged, Harness}
import graft.operators.Graph

/** Phase timing for D55 community_ladder at sf0.1 (r10). */
object LadderProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // stage everything first (untimed in bench run 1)
    t("stage all") {
      Staged.coPurchaseEdges(spark, d); Staged.communityLabels(spark, d)
      Staged.communityQ(spark, d); Staged.communityMoved(spark, d)
      Staged.communityMovedQ(spark, d)
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val edges = Staged.coPurchaseEdges(spark, d)
      val l0 = Staged.communityLabels(spark, d)
      val l1 = Staged.communityMoved(spark, d)
      val dir = s"/tmp/graft_ladderprof_${Harness.runId}/$round"
      t("move l0 plain + write") {
        Graph.louvainMoveRoundLabeled(
          Graph.labelEdges(edges, "pa", "pb", l0), l0)
          .write.mode("overwrite").parquet(dir + "_l0")
      }
      t("move l0 scratch + write") {
        Graph.louvainMoveRoundLabeled(
          Graph.labelEdges(edges, "pa", "pb", l0), l0,
          kvcScratch = Some(dir + "_l0k"))
          .write.mode("overwrite").parquet(dir + "_l0s")
      }
      t("move l1 plain + write") {
        Graph.louvainMoveRoundLabeled(
          Graph.labelEdges(edges, "pa", "pb", l1), l1)
          .write.mode("overwrite").parquet(dir)
      }
      t("move l1 scratch + write") {
        Graph.louvainMoveRoundLabeled(
          Graph.labelEdges(edges, "pa", "pb", l1), l1,
          kvcScratch = Some(dir + "_l1k"))
          .write.mode("overwrite").parquet(dir + "_l1s")
      }
      val l2 = spark.read.parquet(dir)
      val q2 = graft.queries.CommunityQueries.modularityCoreLabeled(
        Graph.labelEdges(edges, "pa", "pb", l2))
      t("q2 alone")(q2.write.format("noop").mode("overwrite").save())
      graft.operators.CacheScope.release(spark)
      def moved(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame) =
        a.select(F.col("v"), F.col("community").as("_x"))
          .join(b.select(F.col("v"), F.col("community").as("_y")), "v")
          .agg(F.sum(F.when(F.col("_x") =!= F.col("_y"), 1L)
            .otherwise(0L)).as("n_moved"))
      t("moved(l0,l1)")(moved(l0, l1).write.format("noop")
        .mode("overwrite").save())
      t("moved(l1,l2)")(moved(l1, l2).write.format("noop")
        .mode("overwrite").save())
      t("full query") {
        graft.SparkEntry.queries("community_ladder")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.CacheScope.release(spark)
    }
    spark.stop()
  }
}
