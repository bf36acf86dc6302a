import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (n <- Seq("validate_filter", "agg_q1", "join_pricing", "dedup_minhash", "embed_cosine_topk")) {
      println(s"========== $n")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
  }
}
