package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-30 inventory (r6): growth-accounting reports — the customer
  * spend decile table (the marketing tier report; value-based, the
  * complement of M3's model-score deciles) and the new-vs-returning
  * revenue split (the canonical growth decomposition). Deciles use
  * M3's group-END assignment over the VALUE-GROUPED cumulative frame
  * (deterministic under ties where NTILE is not); first-purchase
  * attribution is one min-aggregate joined back broadcast-free on the
  * customer key.
  */
object GrowthQueries {

  // ---------------------------------------------------------------- C78
  /** Customer spend deciles per segment: every customer lands in the
    * decile of their TOTAL spend (group-end assignment ((cum−1)·10 div
    * n) on the per-customer-cents value-grouped frame); per decile:
    * customers, exact cents, share of segment revenue in ppm. */
  private val decileReport = QueryDef(
    "decile_report",
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
        .withColumn("cum", F.expr(
          "sum(nc) OVER (PARTITION BY segment ORDER BY cents " +
            "ROWS UNBOUNDED PRECEDING)"))
        .withColumn("n", F.expr("sum(nc) OVER (PARTITION BY segment)"))
        .withColumn("decile", F.expr("(cum - 1) * 10 div n"))
      cum.groupBy("segment", "decile")
        .agg(F.expr("CAST(sum(nc) AS BIGINT)").as("n_customers"),
          F.expr("CAST(sum(CAST(nc AS DECIMAL(38,0)) * cents) AS BIGINT)")
            .as("cents"))
        .withColumn("share_ppm", F.expr(
          "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div " +
            "sum(cents) OVER (PARTITION BY segment) AS BIGINT)"))
        .orderBy("segment", "decile")
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
               sum(nc) OVER (PARTITION BY segment ORDER BY cents
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(nc) OVER (PARTITION BY segment) AS n
        FROM lvl),
      dc AS (
        SELECT segment, cents, nc, (cum - 1) * 10 // n AS decile
        FROM cu),
      ag AS (
        SELECT segment, decile, CAST(sum(nc) AS BIGINT) AS n_customers,
               CAST(sum(CAST(nc AS HUGEINT) * cents) AS BIGINT) AS cents
        FROM dc GROUP BY 1, 2)
      SELECT segment, CAST(decile AS BIGINT) AS decile, n_customers,
             cents,
             CAST(CAST(cents AS HUGEINT) * 1000000 //
                  sum(cents) OVER (PARTITION BY segment) AS BIGINT)
               AS share_ppm
      FROM ag ORDER BY segment, decile"""))

  // ---------------------------------------------------------------- C79
  /** New-vs-returning revenue split per month: a customer is NEW in
    * their first-purchase month (one min-aggregate over orders),
    * RETURNING afterwards; per month the canonical growth decomposition
    * — new/returning customer counts and exact revenue cents. The
    * first-purchase frame is customer-count-sized; the split join is
    * co-partitioned on the customer key. */
  private val newVsReturning = QueryDef(
    "new_vs_returning",
    (s, d) => {
      val o = t(s, d, "orders")
        .select(F.col("o_custkey").as("ck"),
          F.expr("CAST((year(o_orderdate) - 1992) * 12 + " +
            "month(o_orderdate) - 1 AS BIGINT)").as("m"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val first = o.groupBy("ck").agg(F.min("m").as("fm"))
      o.join(first, "ck")
        .withColumn("is_new", F.expr("m = fm"))
        .groupBy("m")
        .agg(
          F.expr("CAST(count(DISTINCT CASE WHEN is_new THEN ck END) " +
            "AS BIGINT)").as("new_customers"),
          F.expr("CAST(count(DISTINCT CASE WHEN NOT is_new THEN ck END) " +
            "AS BIGINT)").as("returning_customers"),
          F.expr("sum(CASE WHEN is_new THEN cents ELSE 0L END)")
            .as("new_cents"),
          F.expr("sum(CASE WHEN is_new THEN 0L ELSE cents END)")
            .as("returning_cents"))
        .orderBy("m")
    },
    Some("""
      WITH o AS (
        SELECT o_custkey AS ck,
               CAST((year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
                    month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      f AS (SELECT ck, min(m) AS fm FROM o GROUP BY ck)
      SELECT m,
             CAST(count(DISTINCT CASE WHEN m = fm THEN o.ck END)
                  AS BIGINT) AS new_customers,
             CAST(count(DISTINCT CASE WHEN m != fm THEN o.ck END)
                  AS BIGINT) AS returning_customers,
             CAST(sum(CASE WHEN m = fm THEN cents ELSE 0 END)
                  AS BIGINT) AS new_cents,
             CAST(sum(CASE WHEN m != fm THEN cents ELSE 0 END)
                  AS BIGINT) AS returning_cents
      FROM o JOIN f ON o.ck = f.ck
      GROUP BY m ORDER BY m"""))

  val all: Seq[QueryDef] = Seq(decileReport, newVsReturning)
}
