package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger

/** Per-phase breakdown of the streaming per-query floor (r9): wall time
  * around construction / start / drain / sink-read, plus Spark's own
  * per-micro-batch durationMs map, for three representative shapes
  * (stateless map, stateful windowed agg, stream-stream join). Run:
  * `sbt "runMain graft.tools.StreamProbe"`. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // runId-suffixed like every staging path: a fixed dir would let two
    // concurrent probes (or a stale dir from another dataset) cross-read
    val dir = s"/tmp/graft_probe_${graft.queries.Harness.runId}/events"
    graft.queries.Tables.t(spark, d, "events")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    var ctr = 0

    def probe(label: String, mk: DataFrame => DataFrame, mode: String,
        parts: Int): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        ctr += 1
        val t0 = System.nanoTime()
        val src = spark.readStream.schema(schema).parquet(dir)
        val df = mk(src)
        val t1 = System.nanoTime()
        val q = df.writeStream.format("memory").queryName(s"probe$ctr")
          .outputMode(mode).trigger(Trigger.AvailableNow()).start()
        val t2 = System.nanoTime()
        q.awaitTermination()
        val t3 = System.nanoTime()
        val n = spark.table(s"probe$ctr").count()
        val t4 = System.nanoTime()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"$label%-24s construct=${ms(t0, t1)}%6.0f start=${ms(t1, t2)}%6.0f drain=${ms(t2, t3)}%6.0f read=${ms(t3, t4)}%6.0f rows=$n")
        q.recentProgress.foreach { p =>
          val dm = p.durationMs
          println(s"    batch ${p.batchId}: " +
            dm.entrySet().toArray.map(_.toString).sorted.mkString(" "))
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    for (round <- 1 to 3) {
      println(s"--- round $round")
      probe("stateless", s => s.where(F.col("value") > 0), "append", 8)
      probe("stateful_agg", s => s.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n")), "complete", 8)
      probe("stream_join", s => {
        val clicks = s.where(F.col("event_type") === "click")
          .select(F.col("user_id").as("cu"), F.col("ts").as("cts"),
            F.col("event_id").as("cid"))
        val views = spark.readStream.schema(schema).parquet(dir)
          .where(F.col("event_type") === "view")
          .select(F.col("user_id").as("vu"), F.col("ts").as("vts"))
        clicks.withWatermark("cts", "1 hour")
          .join(views.withWatermark("vts", "1 hour"),
            F.col("cu") === F.col("vu") && F.col("vts") <= F.col("cts")
              && F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 HOUR"))
      }, "append", 8)
    }
    spark.stop()
  }
}
