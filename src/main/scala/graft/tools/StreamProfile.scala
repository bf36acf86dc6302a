package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger

/** Profiling harness for the per-query streaming floor (r7 verdict #4:
  * 30 G-queries ≈ 41 s of the bench, nearly all ~1.4–2.3 s per-query
  * overhead). Isolates the components: stream START cost (stateless),
  * state-store count (shuffle partitions), input file count, and
  * checkpoint-dir placement. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val ev = graft.queries.Tables.t(spark, d, "events")

    def stageAs(n: Int): String = {
      val dir = s"/tmp/graft_sprof/events_$n"
      ev.coalesce(n).write.mode("overwrite").parquet(dir)
      dir
    }
    val dir32 = stageAs(32); val dir4 = stageAs(4)

    var ctr = 0
    def drain(df: DataFrame, mode: String): Long = {
      ctr += 1
      val q = df.writeStream.format("memory").queryName(s"p$ctr")
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(s"p$ctr").count()
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$c")
    }
    def stream(dir: String) =
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    def statefulAgg(dir: String) =
      stream(dir).withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n"))
    def withParts(n: Int)(body: => Unit): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // warmup
    drain(stream(dir32).select(F.col("event_id")), "append")

    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("stateless_32files")(
        drain(stream(dir32).where(F.col("value") > 0), "append"))
      time("stateless_4files")(
        drain(stream(dir4).where(F.col("value") > 0), "append"))
      time("stateful_32parts_32files")(drain(statefulAgg(dir32), "complete"))
      withParts(8) {
        time("stateful_8parts_32files")(drain(statefulAgg(dir32), "complete"))
      }
      withParts(4) {
        time("stateful_4parts_4files")(drain(statefulAgg(dir4), "complete"))
      }
      withParts(8) {
        val prev = System.getProperty("java.io.tmpdir")
        System.setProperty("java.io.tmpdir", "/dev/shm")
        time("stateful_8parts_shm_ckpt")(drain(statefulAgg(dir32), "complete"))
        System.setProperty("java.io.tmpdir", prev)
      }
    }
    spark.stop()
  }
}
