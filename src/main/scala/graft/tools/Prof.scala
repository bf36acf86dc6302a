object Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s   rows=$c")
    }
    time("warmup count")(docs.count())
    val sh = graft.operators.TextOps.shingleDocs(docs, "doc_id", "text", 3)
    time("shingleDocs count")(sh.count())
    time("shingleDocs count2")(sh.count())
    val sig = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    time("minhashSignatures")(sig.count())
    val pairs = graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    time("minhashCandidatePairs")(pairs.count())
    val jac = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    time("ngramJaccard")(jac.count())
  }
}
