package graft

import graft.queries.Schemas
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

/** SURVEY §2 G1–G3: streaming validation, watermarked windows, stateful
  * dedup — driven synchronously through MemoryStream + memory sink. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events = Seq(
    Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0, "{}"),
    Ev(2L, ts("2024-01-01 00:05:00"), 1L, "view", 2.0, "{}"),
    Ev(2L, ts("2024-01-01 00:05:00"), 1L, "view", 2.0, "{}"), // dup
    Ev(3L, ts("2024-01-01 01:30:00"), 2L, "click", -1.0, "{}"),
    Ev(4L, ts("2024-01-01 01:45:00"), 2L, "", 3.0, "{}")) // invalid type

  test("G1: streaming schema validation filters invalid rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val validated = StreamOps.validateStream(
      mem.toDF(), Schemas.events.copy(fields =
        Schemas.events.fields.filterNot(_.name == "schema_version")))
    val q = validated.writeStream.format("memory").queryName("g1")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable(); q.stop()
    val ids = spark.table("g1").select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L)) // event 4 dropped: empty event_type
  }

  test("G2: watermarked tumbling window counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamOps.tumblingCounts(mem.toDF(), "ts", "1 hour", "2 hours", "event_type")
    val q = agg.writeStream.format("memory").queryName("g2")
      .outputMode("complete").start()
    mem.addData(events: _*)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("g2")
      .select(F.date_format(F.col("win_start"), "HH:mm").as("w"), F.col("event_type"), F.col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("00:00", "view", 2L)))
    assert(rows.contains(("01:00", "click", 1L)))
  }

  test("G3: stateful streaming dedup drops exact duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = StreamOps.dedupStream(mem.toDF(), "ts", "1 hour", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("g3")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable(); q.stop()
    assert(spark.table("g3").count() == 4) // 5 in, 1 dup dropped
  }
}
