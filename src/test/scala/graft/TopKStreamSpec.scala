package graft

import graft.functions.TopKFunctions
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

/** Custom TypedImperativeAggregate top_k + flatMapGroupsWithState
  * streaming sessionization. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("top_k aggregate equals the window row_number form") {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
    val expected = orders.withColumn("rn", F.row_number().over(win))
      .filter(F.col("rn") <= 4)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val sortStruct = F.struct(F.col("o_totalprice"),
      (-F.col("o_orderkey")).as("_negkey"), F.col("o_orderkey"))
    val got = orders.groupBy("o_orderpriority")
      .agg(TopKFunctions.topK(sortStruct, 4).as("top"))
      .select(F.col("o_orderpriority"), F.explode(F.col("top")).as("s"))
      .select(F.col("o_orderpriority"), F.col("s.o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("top_k output is ordered descending within each group") {
    val sortStruct = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    val rows = orders.groupBy("o_orderpriority")
      .agg(TopKFunctions.topK(sortStruct, 5).as("top"))
      .select(F.col("top.o_totalprice").as("prices"))
      .collect()
    rows.foreach { r =>
      val prices = r.getSeq[Double](0)
      assert(prices == prices.sorted.reverse)
    }
  }

  test("top_k usable from SQL and survives partial aggregation") {
    orders.createOrReplaceTempView("tk_orders")
    val out = spark.sql(
      """SELECT o_orderpriority,
                top_k(struct(o_totalprice, o_orderkey), 2) AS top
         FROM tk_orders GROUP BY o_orderpriority""")
    assert(out.count() == 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k")) // map-side combine happened
  }

  test("streaming sessionization with custom state emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[StreamOps.SessionInput]
    val q = StreamOps.sessionizeStream(mem.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // burst for user 1, then a later event past the gap
      mem.addData(
        StreamOps.SessionInput(1L, ts("2024-01-01 00:00:00")),
        StreamOps.SessionInput(1L, ts("2024-01-01 00:10:00")),
        StreamOps.SessionInput(2L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      mem.addData(StreamOps.SessionInput(1L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      mem.addData(StreamOps.SessionInput(2L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      val closed = spark.table("sess").as[StreamOps.SessionOut].collect()
        .sortBy(s => (s.userId, s.sessionStart.getTime))
      // user 1: first session closed by the 02:00 event (gap exceeded),
      // second closed by the watermark from the 05:00 event;
      // user 2: 00:05 session closed by watermark-driven timeout
      assert(closed.map(_.userId).toSeq == Seq(1L, 1L, 2L))
      assert(closed(0).nEvents == 2L && closed(0).sessionEnd == ts("2024-01-01 00:10:00"))
      assert(closed(1).nEvents == 1L && closed(1).sessionStart == ts("2024-01-01 02:00:00"))
      assert(closed(2).nEvents == 1L)
    } finally q.stop()
  }
}
