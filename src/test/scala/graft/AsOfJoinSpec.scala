package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{functions => F}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("attaches most recent right row at or before left ts, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:30:00")),
      (2L, 10L, ts("2024-01-01 02:00:00")),
      (3L, 20L, ts("2024-01-01 01:00:00")),
      (4L, 30L, ts("2024-01-01 01:00:00"))) // key with no right rows
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a"),
      (10L, ts("2024-01-01 01:00:00"), "b"),
      (20L, ts("2024-01-01 01:00:00"), "c"), // exactly equal ts → matches
      (20L, ts("2024-01-01 03:00:00"), "d")) // in the future → never matches
      .toDF("k", "ts", "tag")

    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("tag"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> null))
  }

  test("forward direction attaches earliest right row at or after left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:30:00")),
      (2L, 10L, ts("2024-01-01 02:00:00")), // nothing after → null
      (3L, 20L, ts("2024-01-01 01:00:00"))) // exactly equal ts → matches
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "past"),
      (10L, ts("2024-01-01 01:00:00"), "next"),
      (20L, ts("2024-01-01 01:00:00"), "eq"))
      .toDF("k", "ts", "tag")

    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("tag"), direction = "forward")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "next", 2L -> null, 3L -> "eq"))
  }

  test("left row count preserved (left-join semantics)") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
    val errors = ev.filter(F.col("event_type") === "error").select("event_id", "user_id", "ts")
    val clicks = ev.filter(F.col("event_type") === "click")
      .select(F.col("user_id"), F.col("ts"), F.col("event_id").as("click_id"))
    val out = AsOfJoin.asOf(errors, clicks, "user_id", "ts", Seq("click_id"))
    assert(out.count() == errors.count())
  }
}
