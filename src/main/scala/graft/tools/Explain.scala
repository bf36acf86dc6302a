import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("validate_filter", "agg_q1", "join_pricing", "dedup_minhash",
        "embed_cosine_topk", "partitioned_prune", "bucketed_join", "set_ops",
        "agg_stats", "window_ntile")
    for (n <- names) {
      println(s"========== $n")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
  }
}
