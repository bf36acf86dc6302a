package graft

import org.apache.spark.sql.{functions => F}

/** Wave-18 invariants: equi-width binning, term trends, integer EWMA,
  * sweep-line timeline, degree distribution — re-derived brute-force
  * on the small SF. */
class TrendSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("histogram_equiwidth bins partition the population exactly") {
    val rows = q("histogram_equiwidth").collect()
    val cents = graft.queries.Tables.t(spark, sf, "customer")
      .select(F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val (mn, mx) = (cents.min, cents.max)
    val expect = cents.groupBy(c => (c - mn) * 20 / (mx - mn + 1))
    assert(rows.map(_.getLong(1)).sum == cents.length)
    rows.foreach { r =>
      val bin = r.getLong(0)
      assert(bin >= 0 && bin < 20)
      val grp = expect(bin)
      assert(r.getLong(1) == grp.length)
      assert(r.getLong(2) == grp.min && r.getLong(3) == grp.max)
      assert(r.getLong(4) == grp.sum)
    }
  }

  test("term_trends ranks smoothed cohort ratios over real-mass terms") {
    val rows = q("term_trends").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (c0, c1) = (r.getLong(1), r.getLong(2))
      assert(c0 + c1 >= 10)
      assert(r.getLong(3) == (c1 + 1) * 1000000L / (c0 + 1))
    }
    val ratios = rows.map(_.getLong(3))
    assert(ratios.sameElements(ratios.sortBy(-_)), "descending by ratio")
  }

  test("ewma_smooth replays the rational recursion sequentially") {
    val rows = q("ewma_smooth").collect()
    val dc = graft.queries.Tables.t(spark, sf, "events")
      .groupBy(F.col("event_type"), F.to_date(F.col("ts")).as("day"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (typ, out) =>
      val days = dc(typ).map(x => (x.getDate(1), x.getLong(2)))
        .sortBy(_._1.getTime)
      var sm = days.head._2
      val expect = days.zipWithIndex.map { case ((day, cnt), i) =>
        if (i > 0) sm = (3 * sm + cnt) / 4
        (day, cnt, sm)
      }
      val got = out.sortBy(_.getDate(1).getTime)
        .map(r => (r.getDate(1), r.getLong(2), r.getLong(3)))
      assert(got.sameElements(expect), typ)
    }
  }

  test("open_pipeline_timeline conserves mass and never dips negative") {
    val rows = q("open_pipeline_timeline").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == 0L, "every +1 has its -1")
    rows.foreach(r => assert(r.getLong(2) >= 0L, s"negative open on ${r.get(0)}"))
    assert(rows.last.getLong(2) == 0L, "pipeline drains by the last day")
    // running sum really is the prefix sum of net
    var acc = 0L
    rows.foreach { r => acc += r.getLong(1); assert(acc == r.getLong(2)) }
  }

  test("degree_dist counts every pair endpoint exactly twice") {
    val rows = q("degree_dist").collect()
    val li = graft.queries.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (x <- ps; y <- ps if x < y) yield (x, y)
    }.toSet
    val degs = (pairs.toSeq.map(_._1) ++ pairs.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val expect = degs.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == 2L * pairs.size)
  }
}
