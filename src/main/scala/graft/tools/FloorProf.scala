package graft.tools

import org.apache.spark.sql.SparkSession

/** r15: quantify the per-query fixed overhead of the bench harness —
  * noop-sink writes of a trivial frame, a bare scan, and agg_q1 — so
  * optimization effort targets real plan cost, not the floor. */
object FloorProf {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-32s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup
    spark.range(1000000).selectExpr("sum(id)").count()
    noop(spark.read.parquet(s"$d/lineitem.parquet").limit(10))
    time("range(1) noop")(noop(spark.range(1).toDF()))
    time("range(1M) sum noop")(noop(spark.range(1000000)
      .selectExpr("sum(id)")))
    time("lineitem scan noop")(noop(spark.read.parquet(s"$d/lineitem.parquet")))
    time("lineitem scan noop (cached rel)") {
      noop(spark.read.parquet(s"$d/lineitem.parquet"))
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    time("lineitem scan noop (reused df)")(noop(li))
    time("agg_q1 noop")(noop(graft.SparkEntry.queries("agg_q1")(spark, d)))
    time("agg_q1 noop again")(noop(graft.SparkEntry.queries("agg_q1")(spark, d)))
    spark.stop()
  }
}
