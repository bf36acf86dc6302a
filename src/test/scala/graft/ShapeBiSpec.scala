package graft

import org.apache.spark.sql.{functions => F}

/** Wave-27/28/29 invariants: share conservation, YoY re-derivation,
  * drawdown non-negativity, boxplot ordering, Pareto bounds with a
  * driver-side exact re-check, fertility lower bound, sweep
  * monotonicity, and the continuity audit's conservation. */
class ShapeBiSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("share_of_total conserves ppm within segments") {
    val rows = q("share_of_total").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val total = rs.map(_.getLong(rs.head.fieldIndex("share_ppm"))).sum
      // integer-division loss < nations per segment
      assert(total > 1000000L - rs.length && total <= 1000000L)
      val ranks = rs.map(_.getLong(rs.head.fieldIndex("rank_in_segment")))
      assert(ranks.sorted.toSeq == (1L to rs.length))
    }
  }

  test("yoy_growth matches a driver-side recomputation") {
    val rows = q("yoy_growth").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cur = r.getLong(r.fieldIndex("cents"))
      val prev = r.getLong(r.fieldIndex("prev_cents"))
      val want = Math.floorDiv((cur - prev) * 1000000L, prev)
      assert(r.getLong(r.fieldIndex("yoy_ppm")) == want)
    }
  }

  test("max_drawdown is non-negative with a valid day") {
    val rows = q("max_drawdown").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("max_drawdown_cents")) >= 0)
      val day = r.getLong(r.fieldIndex("worst_day"))
      assert(day >= 0 && day < 365)
    }
  }

  test("boxplot quartiles are ordered and fences bracket them") {
    val rows = q("boxplot_stats").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val q1 = r.getLong(r.fieldIndex("q1"))
      val me = r.getLong(r.fieldIndex("median"))
      val q3 = r.getLong(r.fieldIndex("q3"))
      assert(q1 <= me && me <= q3)
      assert(r.getLong(r.fieldIndex("iqr")) == q3 - q1)
      // outliers are a small minority under any sane distribution
      val n = r.getLong(r.fieldIndex("n"))
      val out = r.getLong(r.fieldIndex("n_low_outliers")) +
        r.getLong(r.fieldIndex("n_high_outliers"))
      assert(out < n / 4)
    }
  }

  test("pareto_8020 equals the exact greedy concentration point") {
    val rows = q("pareto_8020").collect()
    val cust = graft.queries.Tables.t(spark, sf, "orders")
      .join(graft.queries.Tables.t(spark, sf, "customer"),
        F.col("o_custkey") === F.col("c_custkey"))
      .groupBy(F.col("c_mktsegment"), F.col("o_custkey"))
      .agg(F.expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
        .as("cents"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val seg = r.getString(0)
      val spends = cust(seg).map(_.getLong(2)).sortBy(-_)
      val tot = spends.map(BigInt(_)).sum
      var cum = BigInt(0); var k = 0
      while (cum * 5 < tot * 4) { cum += spends(k); k += 1 }
      assert(r.getLong(r.fieldIndex("n_top")) == k.toLong,
        s"$seg: n_top ${r.getLong(r.fieldIndex("n_top"))} != greedy $k")
      assert(r.getLong(r.fieldIndex("n_customers")) == spends.length.toLong)
    }
  }

  test("tokenizer_fertility is at least 1e6 ppm (a token has >= 1 char)") {
    val rows = q("tokenizer_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("fertility_ppm")) >= 1000000L)
    }
  }

  test("length_filter_sweep retention is monotone non-increasing") {
    val rows = q("length_filter_sweep").collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val kept = rows.map(_.getLong(rows.head.fieldIndex("docs_kept")))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getLong(rows.head.fieldIndex("doc_share_ppm")) ==
      1000000L) // threshold 0 keeps everything
  }

  test("dedup_threshold_sweep is monotone in the band threshold") {
    val rows = q("dedup_threshold_sweep").collect().sortBy(_.getLong(0))
    val pairs = rows.map(_.getLong(rows.head.fieldIndex("n_pairs")))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
  }

  test("linenumber_audit conserves the lineitem row count") {
    val rows = q("linenumber_audit").collect()
    val total = graft.queries.Tables.t(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_lines"))).sum
      == total)
  }
}
