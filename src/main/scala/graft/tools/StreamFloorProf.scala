package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger

/** Decompose the per-drain floor under SUITE-identical conditions
  * (tmpfs checkpoint, 4 state partitions, 8-file staged input, the
  * drain hygiene confs): wall phases + Spark's per-batch durationMs.
  * Run: `sbt "runMain graft.tools.StreamFloorProf"`. */
object StreamFloorProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = s"/tmp/graft_floor_${graft.queries.Harness.runId}/events"
    graft.queries.Tables.t(spark, d, "events")
      .repartition(8).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val ckptRoot = s"/dev/shm/graft_floor_${graft.queries.Harness.runId}"
    var ctr = 0

    def probe(label: String, mk: DataFrame => DataFrame, mode: String): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        if (mode == "complete") "false" else "true")
      try {
        ctr += 1
        val t0 = System.nanoTime()
        val src = spark.readStream.schema(schema).parquet(dir)
        val df = mk(src)
        val t1 = System.nanoTime()
        val q = df.writeStream.format("memory").queryName(s"floor$ctr")
          .option("checkpointLocation", s"$ckptRoot/floor$ctr")
          .outputMode(mode).trigger(Trigger.AvailableNow()).start()
        val t2 = System.nanoTime()
        q.awaitTermination()
        val t3 = System.nanoTime()
        spark.table(s"floor$ctr").write.format("noop")
          .mode("overwrite").save()
        val t4 = System.nanoTime()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"$label%-18s construct=${ms(t0, t1)}%5.0f start=${ms(t1, t2)}%5.0f drain=${ms(t2, t3)}%6.0f read=${ms(t3, t4)}%5.0f")
        q.recentProgress.foreach { p =>
          println(s"    batch ${p.batchId}: " + p.durationMs.entrySet()
            .toArray.map(_.toString).sorted.mkString(" "))
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      probe("stateless", s => s.where(F.col("value") > 0), "append")
      probe("windowed_complete", s => s.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n")), "complete")
      probe("windowed_append", s => s.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n")), "append")
      probe("dedup_append", s => s.withWatermark("ts", "1 hour")
        .dropDuplicates(Seq("user_id", "event_type", "ts")), "append")
    }
    spark.stop()
  }
}
