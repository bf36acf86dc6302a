package graft

import org.apache.spark.sql.{functions => F}

/** Wave-45 behavioral/causal queries re-derived driver-side. */
class BehaviorSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("bot_score equals a driver-side gap replay (exact cv2 arithmetic)") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("us"),
        F.col("event_id"), F.col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val rows = q("bot_score").collect()
    assert(rows.length == ev.map(_._1).distinct.length)
    rows.foreach { r =>
      val uid = r.getLong(r.fieldIndex("user_id"))
      val es = ev.filter(_._1 == uid).sortBy(e => (e._2, e._3))
      val gaps = es.sliding(2).collect {
        case Array(a, b) => b._2 - a._2
      }.toSeq
      val m = gaps.length.toLong
      val sg = gaps.sum
      val sg2 = gaps.map(g => BigInt(g) * g).sum
      assert(r.getLong(r.fieldIndex("n_events")) == es.length)
      assert(r.getLong(r.fieldIndex("n_types")) ==
        es.map(_._4).distinct.length)
      assert(r.getLong(r.fieldIndex("mean_gap_us")) ==
        (if (m > 0) sg / m else 0L))
      val cv2 = if (m > 1 && sg > 0)
        ((BigInt(m) * sg2 - BigInt(sg) * sg) * 1000000 /
          (BigInt(sg) * sg)).toLong
      else 0L
      assert(r.getLong(r.fieldIndex("cv2_ppm")) == cv2)
      assert(cv2 >= 0L) // Cauchy–Schwarz
      assert(r.getBoolean(r.fieldIndex("is_bot")) ==
        (es.length >= 60 && cv2 < 250000L))
    }
  }

  test("diff_in_diff equals a driver-side 2x2 cell replay") {
    val o = graft.queries.Tables.t(spark, sf, "orders")
      .join(graft.queries.Tables.t(spark, sf, "customer"),
        F.col("o_custkey") === F.col("c_custkey"))
      .select(F.expr("c_mktsegment = 'BUILDING'"),
        F.expr("to_date(o_orderdate) >= DATE '1998-06-01'"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2)))
    def cell(tr: Boolean, po: Boolean) = {
      val c = o.filter(x => x._1 == tr && x._2 == po)
      (c.length.toLong, c.map(_._3).sum)
    }
    val (nt0, st0) = cell(tr = true, po = false)
    val (nt1, st1) = cell(tr = true, po = true)
    val (nc0, sc0) = cell(tr = false, po = false)
    val (nc1, sc1) = cell(tr = false, po = true)
    def mean(s: Long, n: Long) = (BigInt(s) * 1000000 / n).toLong
    val r = q("diff_in_diff").collect().head
    assert(r.getLong(r.fieldIndex("n_t0")) == nt0)
    assert(r.getLong(r.fieldIndex("n_t1")) == nt1)
    assert(r.getLong(r.fieldIndex("n_c0")) == nc0)
    assert(r.getLong(r.fieldIndex("n_c1")) == nc1)
    assert(r.getLong(r.fieldIndex("m_t0_micro")) == mean(st0, nt0))
    assert(r.getLong(r.fieldIndex("m_t1_micro")) == mean(st1, nt1))
    assert(r.getLong(r.fieldIndex("m_c0_micro")) == mean(sc0, nc0))
    assert(r.getLong(r.fieldIndex("m_c1_micro")) == mean(sc1, nc1))
    assert(r.getLong(r.fieldIndex("did_micro")) ==
      (mean(st1, nt1) - mean(st0, nt0)) -
        (mean(sc1, nc1) - mean(sc0, nc0)))
  }

  test("user_entropy equals a driver-side replay with micro-rounded terms") {
    val ev = graft.queries.Tables.t(spark, sf, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val rows = q("user_entropy").collect()
    assert(rows.length == ev.map(_._1).distinct.length)
    rows.foreach { r =>
      val uid = r.getLong(r.fieldIndex("user_id"))
      val cnts = ev.filter(_._1 == uid).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val n = cnts.values.sum
      val s = cnts.values
        .map(c => math.round(c * log2(c.toDouble) * 1e6)).sum
      assert(r.getLong(r.fieldIndex("n")) == n)
      assert(r.getLong(r.fieldIndex("n_types")) == cnts.size)
      assert(r.getLong(r.fieldIndex("entropy_micro")) ==
        math.round(log2(n.toDouble) * 1e6) - s / n)
      // dominant type: max count, then max type name
      val top = cnts.toSeq.maxBy(p => (p._2, p._1))
      assert(r.getString(r.fieldIndex("top_type")) == top._1)
      assert(r.getLong(r.fieldIndex("top_share_ppm")) ==
        top._2 * 1000000L / n)
      // entropy of a <=5-symbol alphabet is bounded by log2(5)
      assert(r.getLong(r.fieldIndex("entropy_micro")) >= 0L)
      assert(r.getLong(r.fieldIndex("entropy_micro")) <= 2321929L)
    }
  }

  test("ab_cuped equals a driver-side exact-sums replay") {
    val per = graft.queries.Tables.t(spark, sf, "orders")
      .join(graft.queries.Tables.t(spark, sf, "customer"),
        F.col("o_custkey") === F.col("c_custkey"))
      .select(F.col("o_custkey"),
        F.expr("c_mktsegment = 'BUILDING'"),
        F.expr("year(to_date(o_orderdate))"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getLong(3)))
      .groupBy(e => (e._1, e._2)).toSeq
      .map { case ((_, tr), es) =>
        (tr, es.filter(_._3 == 1996).map(_._4).sum,
          es.filter(_._3 == 1997).map(_._4).sum,
          es.count(_._3 == 1996))
      }
      .filter(_._4 > 0)
    val n = per.length.toLong
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxy = per.map(p => BigInt(p._2) * p._3).sum
    val sxx = per.map(p => BigInt(p._2) * p._2).sum
    val syy = per.map(p => BigInt(p._3) * p._3).sum
    val num = (BigInt(n) * sxy - BigInt(sx) * sy).toString.toDouble
    val dx = (BigInt(n) * sxx - BigInt(sx) * sx).toString.toDouble
    val dy = (BigInt(n) * syy - BigInt(sy) * sy).toString.toDouble
    val rows = q("ab_cuped").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val tr = r.getBoolean(r.fieldIndex("treated"))
      val g = per.filter(_._1 == tr)
      val ng = g.length.toLong
      val sxg = g.map(_._2).sum; val syg = g.map(_._3).sum
      assert(r.getLong(r.fieldIndex("n_g")) == ng)
      assert(r.getLong(r.fieldIndex("mean_x_micro")) ==
        (BigInt(sxg) * 1000000 / ng).toLong)
      assert(r.getLong(r.fieldIndex("mean_y_micro")) ==
        (BigInt(syg) * 1000000 / ng).toLong)
      assert(r.getDouble(r.fieldIndex("theta")) ==
        BigDecimal(num / dx).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      val adj = syg.toDouble / ng - (num / dx) *
        (sxg.toDouble / ng - sx.toDouble / n)
      assert(math.abs(r.getDouble(r.fieldIndex("adj_mean_y_cents")) -
        adj) < 1e-4)
      assert(r.getDouble(r.fieldIndex("rho2")) >= 0.0 &&
        r.getDouble(r.fieldIndex("rho2")) <= 1.0)
      // rho2 equals the replay
      assert(math.abs(r.getDouble(r.fieldIndex("rho2")) -
        (num / dx) * (num / dy)) < 1e-4)
    }
  }

  test("event_heatmap cells partition the corpus; shares floor-sum") {
    val rows = q("event_heatmap").collect()
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum
    val ev = graft.queries.Tables.t(spark, sf, "events").count()
    assert(total == ev)
    rows.foreach { r =>
      val dow = r.getLong(r.fieldIndex("dow"))
      val hr = r.getLong(r.fieldIndex("hr"))
      assert(dow >= 1L && dow <= 7L && hr >= 0L && hr <= 23L)
      assert(r.getLong(r.fieldIndex("n_users")) <=
        r.getLong(r.fieldIndex("n_events")))
      assert(r.getLong(r.fieldIndex("share_ppm")) ==
        r.getLong(r.fieldIndex("n_events")) * 1000000L / total)
    }
  }
}
