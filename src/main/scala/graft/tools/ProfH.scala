package graft.tools
object ProfH {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s   rows=$c")
    }
    time("warmup")(spark.read.parquet(s"$d/orders.parquet").count())
    val qs = graft.SparkEntry.queries
    for (n <- Seq("bucketed_join", "partitioned_prune", "bucketed_join", "partitioned_prune"))
      time(n)(qs(n)(spark, d).count())
    spark.stop()
  }
}
