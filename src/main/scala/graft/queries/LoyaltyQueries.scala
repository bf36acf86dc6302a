package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-31 inventory (r6): loyalty/concentration closers — the repeat
  * purchase interval distribution (the retention clock behind every
  * "when do they come back" decision) and the Herfindahl–Hirschman
  * concentration index (the antitrust-style market-structure number
  * beside C77's 80/20 point and M5's Gini). Intervals come from a lag
  * window PARTITIONED BY customer (frames bounded by per-customer
  * order counts); percentiles via the C56 value-grouped cumulative
  * pick; HHI in exact ppm via DECIMAL(38,0)/HUGEINT squares.
  */
object LoyaltyQueries {

  // ---------------------------------------------------------------- C80
  /** Repeat-purchase interval distribution per segment: days between a
    * customer's consecutive orders (same-day repeats count as 0),
    * PERCENTILE_DISC p25/p50/p75 over the value-grouped interval frame
    * (bounded by the calendar — an interval is ≤ the date span), plus
    * the repeat-order count. */
  private val repeatInterval = QueryDef(
    "repeat_interval",
    (s, d) => {
      val o = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.col("o_custkey").as("ck"),
          F.datediff(F.to_date(F.col("o_orderdate")), F.lit("1992-01-01"))
            .cast("long").as("day"),
          F.col("o_orderkey").as("ok"))
      val w = Window.partitionBy("ck").orderBy("day", "ok")
      val gaps = o
        .withColumn("prev", F.lag("day", 1).over(w))
        .where(F.col("prev").isNotNull)
        .select(F.col("segment"), F.expr("day - prev").as("gap"))
      val g = gaps.groupBy("segment", "gap").agg(F.count(F.lit(1)).as("c"))
      val cum = g
        .withColumn("cum", F.sum("c").over(
          Window.partitionBy("segment").orderBy("gap")))
        .withColumn("n", F.sum("c").over(Window.partitionBy("segment")))
      cum.groupBy("segment").agg(
        F.max("n").as("n_repeats"),
        F.min(F.when(F.expr("4 * cum >= n"), F.col("gap"))).as("p25_days"),
        F.min(F.when(F.expr("2 * cum >= n"), F.col("gap"))).as("p50_days"),
        F.min(F.when(F.expr("4 * cum >= 3 * n"), F.col("gap"))).as("p75_days"))
        .orderBy("segment")
    },
    Some("""
      WITH o AS (
        SELECT c_mktsegment AS segment, o_custkey AS ck,
               CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
               o_orderkey AS ok
        FROM orders JOIN customer ON o_custkey = c_custkey),
      gp AS (
        SELECT segment,
               day - lag(day) OVER (PARTITION BY ck ORDER BY day, ok)
                 AS gap
        FROM o),
      g AS (SELECT segment, gap, CAST(count(*) AS BIGINT) AS c
            FROM gp WHERE gap IS NOT NULL GROUP BY 1, 2),
      cu AS (
        SELECT segment, gap, c,
               sum(c) OVER (PARTITION BY segment ORDER BY gap
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY segment) AS n
        FROM g)
      SELECT segment, CAST(max(n) AS BIGINT) AS n_repeats,
             CAST(min(CASE WHEN 4 * cum >= n THEN gap END) AS BIGINT)
               AS p25_days,
             CAST(min(CASE WHEN 2 * cum >= n THEN gap END) AS BIGINT)
               AS p50_days,
             CAST(min(CASE WHEN 4 * cum >= 3 * n THEN gap END) AS BIGINT)
               AS p75_days
      FROM cu GROUP BY segment ORDER BY segment"""))

  // ---------------------------------------------------------------- C81
  /** Herfindahl–Hirschman concentration of segment revenue across
    * nations: HHI ppm = Σ shareᵢ² · 10⁶ = Σ centsᵢ² · 10⁶ div tot² —
    * squares and the scaled division in exact DECIMAL(38,0)/HUGEINT
    * (centsᵢ² overflows int64 from ~$30M). 10⁶/n_nations ≤ HHI ≤ 10⁶;
    * the market-structure number beside C77's 80/20 count. */
  private val hhiConcentration = QueryDef(
    "hhi_concentration",
    (s, d) => {
      val byNation = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .join(F.broadcast(t(s, d, "nation")),
          F.col("c_nationkey") === F.col("n_nationkey"))
        .groupBy(F.col("c_mktsegment").as("segment"),
          F.col("n_name").as("nation"))
        .agg(F.expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
          .as("cents"))
      byNation.groupBy("segment")
        .agg(F.count(F.lit(1)).as("n_nations"),
          F.expr("CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) " +
            "* 1000000 div (CAST(sum(cents) AS DECIMAL(38,0)) " +
            "* sum(cents)) AS BIGINT)").as("hhi_ppm"))
        .orderBy("segment")
    },
    Some("""
      WITH a AS (
        SELECT c_mktsegment AS segment, n_name AS nation,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT segment, CAST(count(*) AS BIGINT) AS n_nations,
             CAST(sum(CAST(cents AS HUGEINT) * cents) * 1000000 //
                  (CAST(sum(cents) AS HUGEINT) * sum(cents)) AS BIGINT)
               AS hhi_ppm
      FROM a GROUP BY segment ORDER BY segment"""))

  val all: Seq[QueryDef] = Seq(repeatInterval, hhiConcentration)
}
