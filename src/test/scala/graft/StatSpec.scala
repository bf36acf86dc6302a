package graft

import org.apache.spark.sql.{functions => F}

/** Wave-17 invariants: HLL sketch accuracy, weighted-median exactness,
  * CUSUM recursion, Pareto domination, ordered listagg, BFS hops —
  * each re-derived brute-force on the small SF and compared. */
class StatSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("hll_distinct estimate lands near the exact distinct in range") {
    // sf0.01: ~2000 distinct parts per flag — inside the raw
    // estimator's sweet spot (n > 2.5m = 640), so the 256-register
    // sketch must land within ~4 standard errors (1.04/sqrt(256) ≈ 6.5%)
    val rows = SparkEntry.queries("hll_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact"))
      val est = r.getLong(r.fieldIndex("est_hll"))
      assert(exact > 640, s"spec precondition: n_exact=$exact in LC zone")
      assert(math.abs(est - exact).toDouble / exact < 0.26,
        s"est=$est vs exact=$exact drifts beyond 4 sigma")
      val err = r.getLong(r.fieldIndex("err_micros"))
      assert(err == (est - exact) * 1000000L / exact ||
        err == Math.floorDiv((est - exact) * 1000000L, exact))
    }
  }

  test("weighted_median equals the brute-force weighted median") {
    val rows = q("weighted_median").collect()
    val li = graft.queries.Tables.t(spark, sf, "lineitem")
      .select(F.col("l_returnflag"), F.col("l_linestatus"),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"),
        F.expr("CAST(floor(l_quantity) AS BIGINT)").as("wq"))
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val grp = li(key).map(x => (x.getLong(2), x.getLong(3))).sortBy(_._1)
      val tot = grp.map(_._2).sum
      var cum = 0L
      val expect = grp.collectFirst {
        case (c, w) if { cum += w; 2 * cum >= tot } => c
      }.get
      assert(r.getLong(r.fieldIndex("median_cents")) == expect, s"$key")
      assert(r.getLong(r.fieldIndex("tot_w")) == tot)
    }
  }

  test("cusum_drift replays the recursion sequentially") {
    val rows = q("cusum_drift").collect()
    val dc = graft.queries.Tables.t(spark, sf, "events")
      .groupBy(F.col("event_type"), F.to_date(F.col("ts")).as("day"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val days = dc(r.getString(0))
        .map(x => (x.getDate(1), x.getLong(2)))
        .sortBy(_._1.getTime)
      val k = days.map(_._2).sum / days.length
      var s = 0L; var smax = 0L
      var bday: java.sql.Date = null
      days.foreach { case (day, cnt) =>
        val s2 = math.max(0L, s + cnt - k)
        if (s2 > smax) { smax = s2; bday = day }
        s = s2
      }
      assert(r.getLong(r.fieldIndex("k_ref")) == k)
      assert(r.getLong(r.fieldIndex("max_cusum")) == smax)
      assert(r.getAs[java.sql.Date]("peak_day") == bday)
      assert(r.getLong(r.fieldIndex("alarm")) == (if (smax > k) 1L else 0L))
    }
  }

  test("pareto_front equals the brute-force domination check") {
    val out = q("pareto_front").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val parts = graft.queries.Tables.t(spark, sf, "part")
      .select(F.col("p_brand"), F.col("p_partkey"),
        F.expr("CAST(floor(p_retailprice * 100) AS BIGINT)"),
        F.col("p_size").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = parts.filter { case (brand, _, c, sz) =>
      !parts.exists { case (b2, _, c2, sz2) =>
        b2 == brand && c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz)
      }
    }.map(p => (p._1, p._2)).toSet
    assert(out == expect)
    assert(out.nonEmpty)
  }

  test("listagg_ordered emits sorted comma rosters matching the count") {
    val rows = q("listagg_ordered").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val parts = r.getString(r.fieldIndex("nations")).split(",")
      assert(parts.length == r.getLong(r.fieldIndex("n_nations")))
      assert(parts.sorted.sameElements(parts))
    }
  }

  test("graph_reach hops are BFS-minimal within the budget") {
    val out = q("graph_reach").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.queries.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct)
    val adj = new scala.collection.mutable.HashMap[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    byOrder.foreach { ps =>
      for (x <- ps; y <- ps if x != y) adj(x) = adj(x) + y
    }
    val seeds = graft.queries.Tables.t(spark, sf, "part")
      .where(F.expr("p_partkey % 97 = 0"))
      .collect().map(_.getLong(0)).toSet
    var hops = seeds.map(_ -> 0L).toMap
    for (h <- 1 to 2) {
      val frontier = hops.filter(_._2 == h - 1).keySet
      val next = frontier.flatMap(adj) -- hops.keySet
      hops = hops ++ next.map(_ -> h.toLong)
    }
    assert(out == hops)
    assert(out.values.exists(_ == 2L), "budget hop reached")
  }
}
