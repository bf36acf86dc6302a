package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan red-flag audit: for every inventory query, count the physical
  * operators that hurt at scale — CartesianProduct /
  * BroadcastNestedLoopJoin (quadratic or driver-bound) and Exchange
  * (shuffles). Streaming queries are skipped (they materialize sinks).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.allQueries.filterNot(_.name.startsWith("stream_")).foreach { q =>
      try {
        val plan = q.fn(spark, d).queryExecution.executedPlan.toString
        def c(s: String) = plan.sliding(s.length).count(_ == s)
        val cart = c("CartesianProduct")
        val bnl = c("BroadcastNestedLoopJoin")
        val exch = c("Exchange ") + c("Exchange\n")
        val flags = (if (cart > 0) s" CARTESIAN=$cart" else "") +
          (if (bnl > 0) s" BNLJ=$bnl" else "")
        println(f"${q.name}%-22s exchanges=$exch%-3d$flags")
      } catch { case e: Throwable =>
        println(f"${q.name}%-22s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
