package graft

import org.apache.spark.sql.{functions => F}

/** Wave-26 invariants: the binseg argmax beats every other split
  * (re-derived driver-side), seasonal-naive errors reconcile with the
  * daily series, rolling correlation stays in [−1, 1] with full
  * windows only, and l-diversity groups partition the order count. */
class SeriesSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def daily1995(): Map[String, Seq[(Long, Long)]] =
    graft.queries.Tables.t(spark, sf, "orders")
      .join(graft.queries.Tables.t(spark, sf, "customer"),
        F.col("o_custkey") === F.col("c_custkey"))
      .where(F.year(F.col("o_orderdate")) === 1995)
      .groupBy(F.col("c_mktsegment").as("seg"),
        F.datediff(F.to_date(F.col("o_orderdate")), F.lit("1995-01-01"))
          .cast("long").as("x"))
      .agg(F.expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
        .as("cents"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq).toMap

  test("binseg_split picks the max |mean diff| split") {
    val rows = q("binseg_split").collect()
    val daily = daily1995()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getString(0)
      val series = daily(seg)
      val n = series.length.toLong
      val best = (10L to (n - 10)).map { rn =>
        val cs = series.take(rn.toInt).map(_._2).sum
        val tot = series.map(_._2).sum
        val delta = math.abs(cs * 1000000L / rn -
          (tot - cs) * 1000000L / (n - rn))
        (delta, series(rn.toInt - 1)._1)
      }.maxBy(t => (t._1, -t._2))
      assert(r.getLong(r.fieldIndex("delta_micro")) == best._1,
        s"$seg: delta ${r.getLong(r.fieldIndex("delta_micro"))} != ${best._1}")
      assert(r.getLong(r.fieldIndex("x")) == best._2)
    }
  }

  test("forecast_backtest reconciles with the daily series") {
    val rows = q("forecast_backtest").collect()
    val daily = daily1995()
    rows.foreach { r =>
      val seg = r.getString(0)
      val byX = daily(seg).toMap
      val pairs = byX.keys.toSeq.flatMap(x =>
        byX.get(x - 7).map(prev => (byX(x), prev)))
      assert(r.getLong(r.fieldIndex("n_days")) == pairs.length.toLong)
      val mae = pairs.map { case (a, p) => math.abs(a - p) }.sum *
        1000000L / pairs.length
      assert(r.getLong(r.fieldIndex("mae_micro")) == mae)
    }
  }

  test("rolling_corr is bounded and full-window only") {
    val rows = q("rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(r.fieldIndex("corr12"))
      assert(c >= -1.0000001 && c <= 1.0000001, s"corr $c out of range")
    }
    // months only appear once a full 12-month history exists
    val n = graft.queries.Tables.t(spark, sf, "orders").agg(
      F.countDistinct(F.expr(
        "(year(o_orderdate) - 1992) * 12 + month(o_orderdate)")))
      .collect()(0).getLong(0)
    assert(rows.length <= n - 11)
  }

  test("seasonal_decompose matches a brute-force moving-average replay") {
    val rows = q("seasonal_decompose").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val daily = graft.queries.Tables.t(spark, sf, "orders")
      .groupBy(F.col("o_orderdate").as("day"))
      .agg(F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4))" +
        " * 10000 AS DECIMAL(38,0))")).cast("string").as("m"))
      .orderBy("day")
      .collect().map { r =>
        val ld = r.get(0) match { // the driver's date encoding varies
          case d: java.sql.Date => d.toLocalDate
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case t: java.time.LocalDateTime => t.toLocalDate
          case t: java.time.LocalDate => t
        }
        (ld, BigInt(r.getString(1)))
      }
    // centered 7-observed-day trend; detrended per dow (truncating div)
    val agg = scala.collection.mutable.Map
      .empty[Long, (Long, BigInt, BigInt)]
    for (i <- 3 until daily.length - 3) {
      val (day, m) = daily(i)
      val s7 = (i - 3 to i + 3).map(daily(_)._2).sum
      val trend = (s7 - s7 % 7) / 7
      val det = m - trend
      val iso = day.getDayOfWeek.getValue // Mon=1..Sun=7
      val dow = ((iso % 7) + 1).toLong // Spark dayofweek: Sun=1..Sat=7
      val (n, sd, sm) = agg.getOrElse(dow, (0L, BigInt(0), BigInt(0)))
      agg(dow) = (n + 1, sd + det, sm + m)
    }
    assert(rows.keySet == agg.keySet)
    agg.foreach { case (dow, (n, sd, sm)) =>
      val (gn, gs, gm) = rows(dow)
      assert(gn == n, s"dow $dow n_days")
      assert(gs == ((sd - sd % n) / n).toLong,
        s"dow $dow seasonal: $gs vs ${(sd - sd % n) / n}")
      assert(gm == ((sm - sm % n) / n).toLong, s"dow $dow mean")
    }
    // seasonal components of a detrended series must roughly cancel
    val total = agg.values.map { case (n, sd, _) => sd }.sum
    val days = agg.values.map(_._1).sum
    assert((total / days).abs < BigInt(10000000L),
      "per-day seasonal mean should be small relative to daily revenue")
  }

  test("l_diversity groups partition the joined order count") {
    val rows = q("l_diversity").collect()
    val total = graft.queries.Tables.t(spark, sf, "orders")
      .join(graft.queries.Tables.t(spark, sf, "customer"),
        F.col("o_custkey") === F.col("c_custkey")).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n"))).sum == total)
    rows.foreach { r =>
      val l = r.getLong(r.fieldIndex("l_distinct"))
      assert(l >= 1 && l <= 5) // 5 order priorities exist
      assert(r.getLong(r.fieldIndex("diverse")) ==
        (if (l >= 3) 1L else 0L))
    }
  }
}
