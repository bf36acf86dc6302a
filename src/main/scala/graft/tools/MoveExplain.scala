package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Staged
import graft.operators.Graph

/** Dump the round-2 move plan to count edge scans / reused exchanges. */
object MoveExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val edges = Staged.coPurchaseEdges(spark, d)
    val l1 = Staged.communityMoved(spark, d)
    val plan = Graph.louvainMoveRoundLabeled(
      Graph.labelEdges(edges, "pa", "pb", l1), l1)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    val smj = "SortMergeJoin".r.findAllIn(plan).length
    println(s"SCANS=$scans REUSED=$reused BHJ=$bhj SMJ=$smj")
    println(plan.take(8000))
    spark.stop()
  }
}
