package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for G-suite conf levers (r10): runs a fixed set of
  * streaming queries under named conf variants and prints per-query
  * medians, to attribute the per-drain floor before changing the
  * harness defaults. Run: `sbt "runMain graft.tools.StreamSuiteProf"`. */
object StreamSuiteProf {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.StreamingQueries.prewarm(spark, d)
    val names = Seq("stream_join", "stream_upsert", "stream_tumbling",
      "stream_pii", "stream_balance", "stream_funnel_window",
      "stream_anomaly", "stream_transitions")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"ERR $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.CacheScope.release(spark)
      dt
    }
    // warmup pass
    names.foreach(run)
    val variants: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map.empty,
      "noval" -> Map(
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false"),
      "base2" -> Map.empty,
      "noval2" -> Map(
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false"))
    variants.foreach { case (label, confs) =>
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val med = names.map { n =>
        n -> (1 to 3).map(_ => run(n)).sorted.apply(1)
      }
      prev.foreach { case (k, vo) =>
        vo match { case Some(v) => spark.conf.set(k, v)
                   case None => spark.conf.unset(k) } }
      val total = med.map(_._2).sum
      println(f"== $label%-8s total=$total%6.2f  " +
        med.map { case (n, v) => f"$n=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
