package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-29 inventory (r6): distribution-shape reports and an integrity
  * completion — Tukey boxplot statistics (the five-number summary +
  * fence outlier counts every profiling UI draws), the Pareto 80/20
  * concentration point (the "how few customers carry 80% of revenue"
  * number beside M5's Gini), and line-number continuity (the
  * within-group sequence audit beside H12's cross-corpus gap scan).
  * House discipline: discrete percentiles via the C56 cumulative-count
  * pick over VALUE-GROUPED frames, integer fences, no row-level sorts.
  */
object ShapeQueries {

  // ---------------------------------------------------------------- C76
  /** Tukey boxplot per segment: q1/median/q3 as PERCENTILE_DISC picks
    * from the value-grouped cumulative frame, IQR fences at 1.5·IQR
    * (exact integer cents — 3·IQR/2 computed as (3·(q3−q1)) div 2),
    * plus counts OUTSIDE the fences in the same pass. */
  private val boxplotStats = QueryDef(
    "boxplot_stats",
    (s, d) => {
      val o = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val g = o.groupBy("segment", "cents").agg(F.count(F.lit(1)).as("c"))
      val cum = g
        .withColumn("cum", F.sum("c").over(
          Window.partitionBy("segment").orderBy("cents")))
        .withColumn("n", F.sum("c").over(Window.partitionBy("segment")))
      val quarts = cum.groupBy("segment").agg(
        F.max("n").as("n"),
        F.min(F.when(F.expr("4 * cum >= n"), F.col("cents"))).as("q1"),
        F.min(F.when(F.expr("2 * cum >= n"), F.col("cents"))).as("median"),
        F.min(F.when(F.expr("4 * cum >= 3 * n"), F.col("cents"))).as("q3"))
        .withColumn("iqr", F.expr("q3 - q1"))
        .withColumn("lo_fence", F.expr("q1 - (3 * (q3 - q1)) div 2"))
        .withColumn("hi_fence", F.expr("q3 + (3 * (q3 - q1)) div 2"))
      o.join(F.broadcast(quarts), "segment")
        .groupBy("segment")
        .agg(F.max("n").as("n"), F.max("q1").as("q1"),
          F.max("median").as("median"), F.max("q3").as("q3"),
          F.max("iqr").as("iqr"),
          F.sum(F.when(F.expr("cents < lo_fence"), 1L).otherwise(0L))
            .as("n_low_outliers"),
          F.sum(F.when(F.expr("cents > hi_fence"), 1L).otherwise(0L))
            .as("n_high_outliers"))
        .orderBy("segment")
    },
    Some("""
      WITH o AS (
        SELECT c_mktsegment AS segment,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, cents, CAST(count(*) AS BIGINT) AS c
            FROM o GROUP BY 1, 2),
      cu AS (
        SELECT segment, cents, c,
               sum(c) OVER (PARTITION BY segment ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY segment) AS n
        FROM g),
      qt AS (
        SELECT segment, CAST(max(n) AS BIGINT) AS n,
               CAST(min(CASE WHEN 4 * cum >= n THEN cents END)
                    AS BIGINT) AS q1,
               CAST(min(CASE WHEN 2 * cum >= n THEN cents END)
                    AS BIGINT) AS median,
               CAST(min(CASE WHEN 4 * cum >= 3 * n THEN cents END)
                    AS BIGINT) AS q3
        FROM cu GROUP BY segment),
      f AS (
        SELECT *, q3 - q1 AS iqr,
               q1 - (3 * (q3 - q1)) // 2 AS lo_fence,
               q3 + (3 * (q3 - q1)) // 2 AS hi_fence
        FROM qt)
      SELECT o.segment AS segment, max(n) AS n, max(q1) AS q1,
             max(median) AS median,
             max(q3) AS q3, CAST(max(iqr) AS BIGINT) AS iqr,
             CAST(sum(CASE WHEN cents < lo_fence THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_low_outliers,
             CAST(sum(CASE WHEN cents > hi_fence THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_high_outliers
      FROM o JOIN f ON o.segment = f.segment
      GROUP BY o.segment ORDER BY o.segment"""))

  // ---------------------------------------------------------------- C77
  /** Pareto 80/20 concentration point per segment: the smallest number
    * of TOP customers whose cumulative revenue reaches 80% — computed
    * on the per-customer-cents VALUE-GROUPED frame (distinct spend
    * levels, descending cumulative; ties resolved by taking the partial
    * count inside the boundary level, exact integer arithmetic) —
    * never a per-customer global sort. Published with the customer
    * share in ppm; the concentration view beside M5's Gini. */
  private val pareto8020 = QueryDef(
    "pareto_8020",
    (s, d) => {
      val cust = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").as("segment"),
          F.col("o_custkey").as("ck"))
        .agg(F.expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
          .as("cents"))
      val lvl = cust.groupBy("segment", "cents")
        .agg(F.count(F.lit(1)).as("nc"))
      val cum = lvl
        .withColumn("cumc", F.expr(
          "sum(CAST(nc AS DECIMAL(38,0)) * cents) OVER " +
            "(PARTITION BY segment ORDER BY cents DESC " +
            "ROWS UNBOUNDED PRECEDING)"))
        .withColumn("cumn", F.expr(
          "sum(nc) OVER (PARTITION BY segment ORDER BY cents DESC " +
            "ROWS UNBOUNDED PRECEDING)"))
        .withColumn("tot", F.expr(
          "sum(CAST(nc AS DECIMAL(38,0)) * cents) OVER " +
            "(PARTITION BY segment)"))
        .withColumn("totn", F.expr("sum(nc) OVER (PARTITION BY segment)"))
      // boundary level: first (descending) level where cum reaches 80%;
      // within it, the partial customer count needed (ceil division)
      cum.where(F.expr("5 * cumc >= 4 * tot AND " +
          "5 * (cumc - CAST(nc AS DECIMAL(38,0)) * cents) < 4 * tot"))
        .select(F.col("segment"),
          F.expr("CAST(cumn - nc + " +
            "CAST((4 * tot - 5 * (cumc - CAST(nc AS DECIMAL(38,0)) " +
            "* cents) + 5 * cents - 1) div (5 * cents) AS BIGINT) " +
            "AS BIGINT)").as("n_top"),
          F.expr("CAST(totn AS BIGINT)").as("n_customers"))
        .withColumn("top_share_ppm",
          F.expr("n_top * 1000000L div n_customers"))
        .orderBy("segment")
    },
    Some("""
      WITH cust AS (
        SELECT c_mktsegment AS segment, o_custkey AS ck,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      lvl AS (SELECT segment, cents, CAST(count(*) AS BIGINT) AS nc
              FROM cust GROUP BY 1, 2),
      cu AS (
        SELECT segment, cents, nc,
               sum(CAST(nc AS HUGEINT) * cents) OVER
                 (PARTITION BY segment ORDER BY cents DESC
                  ROWS UNBOUNDED PRECEDING) AS cumc,
               sum(nc) OVER (PARTITION BY segment ORDER BY cents DESC
                             ROWS UNBOUNDED PRECEDING) AS cumn,
               sum(CAST(nc AS HUGEINT) * cents) OVER
                 (PARTITION BY segment) AS tot,
               sum(nc) OVER (PARTITION BY segment) AS totn
        FROM lvl)
      SELECT segment,
             CAST(cumn - nc +
                  CAST((4 * tot - 5 * (cumc - CAST(nc AS HUGEINT) * cents)
                        + 5 * cents - 1) // (5 * cents) AS BIGINT)
                  AS BIGINT) AS n_top,
             CAST(totn AS BIGINT) AS n_customers,
             CAST((cumn - nc +
                   CAST((4 * tot - 5 * (cumc - CAST(nc AS HUGEINT) * cents)
                         + 5 * cents - 1) // (5 * cents) AS BIGINT))
                  * 1000000 // totn AS BIGINT) AS top_share_ppm
      FROM cu
      WHERE 5 * cumc >= 4 * tot
        AND 5 * (cumc - CAST(nc AS HUGEINT) * cents) < 4 * tot
      ORDER BY segment"""))

  // ---------------------------------------------------------------- H16
  /** Line-number continuity audit: within each order, l_linenumber
    * must be exactly 1..count(*) — verified WITHOUT a sort by the
    * sum/min/max identity (Σ = k(k+1)/2, min = 1, max = k, distinct =
    * k); the within-group sequence integrity check beside H12's
    * cross-corpus gap scan. Output: order/line counts per pass/fail
    * status (one all-pass row expected on the driver data — the
    * negative control). */
  private val linenumberAudit = QueryDef(
    "linenumber_audit",
    (s, d) => {
      val per = t(s, d, "lineitem")
        .groupBy(F.col("l_orderkey").as("ok"))
        .agg(F.count(F.lit(1)).as("k"),
          F.sum("l_linenumber").as("sm"),
          F.min("l_linenumber").as("mn"),
          F.max("l_linenumber").as("mx"),
          F.countDistinct("l_linenumber").as("nd"))
        .withColumn("ok_seq", F.expr(
          "CAST(CASE WHEN sm = k * (k + 1) div 2 AND mn = 1 AND mx = k " +
            "AND nd = k THEN 1 ELSE 0 END AS BIGINT)"))
      per.groupBy("ok_seq")
        .agg(F.count(F.lit(1)).as("n_orders"),
          F.sum("k").as("n_lines"))
        .orderBy("ok_seq")
    },
    Some("""
      WITH per AS (
        SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS k,
               CAST(sum(l_linenumber) AS BIGINT) AS sm,
               CAST(min(l_linenumber) AS BIGINT) AS mn,
               CAST(max(l_linenumber) AS BIGINT) AS mx,
               CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd
        FROM lineitem GROUP BY 1),
      f AS (
        SELECT *, CAST(CASE WHEN sm = k * (k + 1) // 2 AND mn = 1
                       AND mx = k AND nd = k THEN 1 ELSE 0 END
                  AS BIGINT) AS ok_seq
        FROM per)
      SELECT ok_seq, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(k) AS BIGINT) AS n_lines
      FROM f GROUP BY ok_seq ORDER BY ok_seq"""))

  val all: Seq[QueryDef] = Seq(boxplotStats, pareto8020, linenumberAudit)
}
