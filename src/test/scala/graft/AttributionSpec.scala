package graft

import org.apache.spark.sql.{functions => F}

/** Wave-50: U-shaped attribution re-derived driver-side and the
  * streaming as-of enrichment against a batch replay. */
class AttributionSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("attribution_position equals a driver-side U-shape replay") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("us"),
        F.col("event_id"), F.col("event_type"),
        F.expr("CAST(floor(value * 1e6) AS BIGINT)").as("vmicro"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val touchTypes = Set("click", "view", "signup")
    val convs = ev.filter(_._4 == "purchase")
    val touches = ev.filter(e => touchTypes(e._4))
    val byChannel = collection.mutable.Map[String, (Long, Set[Long], Long)]()
      .withDefaultValue((0L, Set.empty, 0L))
    var unattributed = 0L
    var unattrN = 0L
    convs.foreach { c =>
      val inWin = touches.filter(t => t._1 == c._1 &&
        t._2 <= c._2 && t._2 > c._2 - 24L * 3600L * 1000000L)
        .sortBy(t => (t._2, t._3))
      val n = inWin.length
      if (n == 0) { unattributed += c._5; unattrN += 1 }
      else inWin.zipWithIndex.foreach { case (t, i) =>
        val share =
          if (n == 1) c._5
          else if (n == 2) c._5 / 2
          else if (i == 0 || i == n - 1) c._5 * 2 / 5
          else c._5 / 5 / (n - 2)
        val (nt, pids, s0) = byChannel(t._4)
        byChannel(t._4) = (nt + 1, pids + c._3, s0 + share)
      }
    }
    val rows = q("attribution_position").collect()
    rows.foreach { r =>
      val ch = r.getString(r.fieldIndex("channel"))
      if (ch == "(none)") {
        assert(r.getLong(r.fieldIndex("n_conversions")) == unattrN)
        assert(r.getLong(r.fieldIndex("attr_micro")) == unattributed)
      } else {
        val (nt, pids, s0) = byChannel(ch)
        assert(r.getLong(r.fieldIndex("n_touches")) == nt)
        assert(r.getLong(r.fieldIndex("n_conversions")) == pids.size)
        assert(r.getLong(r.fieldIndex("attr_micro")) == s0, s"ch=$ch")
      }
    }
    // reconciliation: attributed never exceeds total conversion value
    val totalAttr = rows.map(_.getLong(rows.head.fieldIndex("attr_micro"))).sum
    assert(totalAttr <= convs.map(_._5).sum)
  }

  test("stream_asof equals the batch point-in-time join") {
    val batch = graft.queries.Tables.t(spark, sf, "events")
    val dim = graft.operators.Warehouse.scd2Build(
      batch, "user_id", "ts", "event_id", "event_type")
      .select(F.col("user_id").as("du"), F.col("attr"),
        F.col("valid_from"), F.col("valid_to"), F.col("version"))
    val expect = batch.where(F.expr("event_type = 'purchase'"))
      .select("event_id", "user_id", "ts")
      .join(dim, F.expr("user_id = du AND ts >= valid_from AND " +
        "(valid_to IS NULL OR ts < valid_to)"))
      .select("event_id", "user_id", "attr", "version")
      .orderBy("event_id")
      .collect().map(_.toString).toSeq
    val got = q("stream_asof").collect().map(_.toString).toSeq
    assert(got == expect)
    // every purchase is enriched exactly once
    val nPurch = batch.where(F.expr("event_type = 'purchase'")).count()
    assert(got.length == nPurch)
  }
}
