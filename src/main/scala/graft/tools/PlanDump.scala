package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the r15
  * optimization round's before/after plan evidence
  * (plans/r15/<query>_<tag>.txt). Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <query...>
  * Bench-matching session confs (local[32], 32 shuffle partitions) so
  * the dumped plan is the one the bench executes (modulo AQE's runtime
  * re-optimization, which explain-before-execution cannot show). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt =
        try df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), txt)
      graft.operators.CacheScope.release(spark)
      println(s"dumped $n -> $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
