package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger

/** One-off probe: does the file source split into micro-batches under
  * Trigger.AvailableNow with maxFilesPerTrigger? */
object UpsertProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/upsert_prof_${System.nanoTime()}"
    graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "events")
      .repartition(12).write.mode("overwrite").parquet(dir)
    println("files=" + new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")))
    for (mft <- Seq("3", "8")) {
      val ids = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", mft).parquet(dir)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            ids += id; val _ = b.count()
        }.trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      println(s"maxFilesPerTrigger=$mft batches=${ids.size} ids=${ids.toList}")
    }
    spark.stop()
  }
}
