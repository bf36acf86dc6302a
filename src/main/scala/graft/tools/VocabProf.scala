package graft

/** Scratch profiler for vocab_overlap's stages (r6). */
object VocabProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$c")
    }
    time("warmup")(docs.count())
    val sv0 = docs.select(col("source"),
      explode(graft.operators.TextOps.shingles(col("text"), 3)).as("gram"))
    time("explode only")(sv0.count())
    val sv = sv0.distinct()
    time("distinct")(sv.count())
    val svp = graft.operators.CacheScope.persist(sv)
    time("persist materialize")(svp.count())
    val inter = svp.select(col("source").as("sa"), col("gram"))
      .join(svp.select(col("source").as("sb"), col("gram")), "gram")
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_common"))
    time("pair join")(inter.count())
    time("pair join again")(inter.count())
    time("full query")(graft.SparkEntry.queries("vocab_overlap")(spark, d).count())
    graft.operators.CacheScope.release(spark)
    time("full query cold")(graft.SparkEntry.queries("vocab_overlap")(spark, d).count())
    spark.stop()
  }
}
