package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger

/** One-off probe: stream-stream join cost vs state partition count. */
object StreamJoinProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val dir = s"/tmp/sjprof_${System.nanoTime()}"
    graft.queries.Tables.t(spark, d, "events")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def run(parts: Int, provider: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val clicks = spark.readStream.schema(schema).parquet(dir)
        .where(F.col("event_type") === "click")
        .select(F.col("event_id").as("click_id"), F.col("user_id"),
          F.col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = spark.readStream.schema(schema).parquet(dir)
        .where(F.col("event_type") === "purchase")
        .select(F.col("event_id").as("purchase_id"),
          F.col("user_id").as("_p_user"), F.col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      val joined = clicks.join(purchases,
        F.col("user_id") === F.col("_p_user") &&
          F.col("purchase_ts") >= F.col("click_ts") &&
          F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("memory")
        .queryName(s"sj_${parts}_${provider.hashCode.abs}")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val n = spark.table(s"sj_${parts}_${provider.hashCode.abs}").count()
      println(f"parts=$parts%-3d provider=${provider.split('.').last}%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val hdfs = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    run(32, hdfs); run(8, hdfs); run(32, hdfs) // repeat to see warmup
    try run(32, rocks) catch { case e: Throwable => println(s"rocksdb: ${e.getMessage.take(80)}") }

    // Does AvailableNow emit stream-stream LEFT OUTER null rows for
    // rows whose eviction point precedes the final watermark?
    {
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      val clicks = spark.readStream.schema(schema).parquet(dir)
        .where(F.col("event_type") === "click")
        .select(F.col("event_id").as("click_id"), F.col("user_id"),
          F.col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = spark.readStream.schema(schema).parquet(dir)
        .where(F.col("event_type") === "purchase")
        .select(F.col("event_id").as("purchase_id"),
          F.col("user_id").as("_p_user"), F.col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      val joined = clicks.join(purchases,
        F.col("user_id") === F.col("_p_user") &&
          F.col("purchase_ts") >= F.col("click_ts") &&
          F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"),
        "left_outer")
      val q = joined.writeStream.format("memory").queryName("sj_outer")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val t = spark.table("sj_outer")
      println(s"outer rows=${t.count()} nullRows=${t.where(F.col("purchase_id").isNull).count()}")
    }
    spark.stop()
  }
}
