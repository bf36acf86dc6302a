package graft

import org.apache.spark.sql.{functions => F}

/** Wave-22 invariants: decay-weight exactness and conservation,
  * log2-bucket integer boundaries, gap-audit equivalence to a global
  * sort, BOM ancestor-arithmetic consistency, and the streaming PSI
  * twin's share conservation. */
class OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("attribution_decay weights are exact half-life ppm and conserve value") {
    val rows = q("attribution_decay").collect()
    assert(rows.nonEmpty)
    // every attributed conversion's vmicro splits across channels with
    // integer-division loss only: total attributed <= total converted
    val totalConv = graft.queries.Tables.t(spark, sf, "events")
      .where(F.col("event_type") === "purchase")
      .agg(F.expr("sum(CAST(floor(value * 1e6) AS BIGINT))"))
      .collect()(0).getLong(0)
    val attributed = rows.map(_.getLong(3)).sum
    assert(attributed <= totalConv)
    // div loss: at most (ntouch-1) micros per conversion — tiny
    assert(attributed > totalConv * 99 / 100)
    // channels are the three touch types + (none)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("click", "view", "signup", "(none)")))
  }

  test("histogram_log2 buckets are the integer bit length") {
    val rows = q("histogram_log2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getLong(r.fieldIndex("bucket"))
      val mn = r.getLong(r.fieldIndex("min_cents"))
      val mx = r.getLong(r.fieldIndex("max_cents"))
      // bucket b holds exactly the cents in [2^(b-1), 2^b)
      assert(mn >= (1L << (b - 1).toInt) && mx < (1L << b.toInt),
        s"bucket $b range [$mn,$mx] outside [2^${b - 1}, 2^$b)")
    }
  }

  test("id_gaps equals the driver-side global-sort gap scan") {
    val rows = q("id_gaps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keys = graft.queries.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey").distinct().collect().map(_.getLong(0)).sorted
    val want = keys.zip(keys.tail).collect {
      case (a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }
    assert(rows.toSeq == want.toSeq,
      s"distributed gaps ${rows.length} != global-sort gaps ${want.length}")
    assert(rows.nonEmpty) // testdata has orders with no line items
  }

  test("bom_explode rolls up exactly the div-10 descendants") {
    val rows = q("bom_explode").collect()
    assert(rows.nonEmpty)
    val parts = graft.queries.Tables.t(spark, sf, "part")
      .select(F.col("p_partkey"),
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val pkSet = parts.map(_._1).toSet
    // driver-side re-derivation
    val expect = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    for ((pk, cents) <- parts; h <- 1 to 3) {
      val anc = pk / math.pow(10, h).toLong
      if (anc >= 1 && pkSet(anc)) {
        val k = (anc, h.toLong)
        val (n, c) = expect.getOrElse(k, (0L, 0L))
        expect(k) = (n + 1, c + cents)
      }
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(expect(k) == ((r.getLong(2), r.getLong(3))), s"mismatch at $k")
    }
  }

  test("stream_psi shares sum to ~1e6 and terms exist only for populated bins") {
    val rows = q("stream_psi").collect()
    assert(rows.length == 10)
    val sr = rows.map(_.getLong(rows.head.fieldIndex("share_ref_micro"))).sum
    val sl = rows.map(_.getLong(rows.head.fieldIndex("share_live_micro"))).sum
    // integer-division loss < 10 micros across 10 bins
    assert(sr > 999990 && sr <= 1000000, s"ref shares sum $sr")
    assert(sl > 999990 && sl <= 1000000, s"live shares sum $sl")
    rows.foreach { r =>
      val term = r.get(r.fieldIndex("psi_term"))
      val nr = r.getLong(r.fieldIndex("n_ref"))
      val nl = r.getLong(r.fieldIndex("n_live"))
      assert((term == null) == (nr == 0 || nl == 0))
    }
  }
}
