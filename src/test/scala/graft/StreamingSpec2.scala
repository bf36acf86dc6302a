package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}

/** Checkpointed recovery: a stopped stream restarted against the same
  * checkpoint must account for every input exactly once — old files are
  * not reprocessed, new files are not missed. */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed aggregation resumes exactly-once across restart") {
    val src = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val sink = "graft_recovery_sink"

    def appendBatch(rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").repartition(1).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema).parquet(src)
        .groupBy("v").agg(F.count(F.lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    appendBatch(Seq(1L -> "a", 2L -> "b", 3L -> "a"))
    runOnce()
    val first = spark.table(sink).as[(String, Long)].collect().toMap
    assert(first == Map("a" -> 2L, "b" -> 1L))

    appendBatch(Seq(4L -> "a", 5L -> "c"))
    runOnce() // restart from the same checkpoint
    val second = spark.table(sink).as[(String, Long)].collect().toMap
    assert(second == Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      "restart must process ONLY the new files on top of recovered state")
  }
}
