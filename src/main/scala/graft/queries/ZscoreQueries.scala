package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-38 inventory (r6): trailing-window z-score anomaly flags —
  * the dashboard alarm complement of C37's MAD outliers (global robust
  * fences) and G14's streaming anomaly: each day scored against its
  * OWN trailing 28-day baseline. Window sums are exact integers
  * (products through DECIMAL(38,0)/HUGEINT); the z closing formula is
  * one double expression at 6dp; every window runs on the calendar
  * frame. */
object ZscoreQueries {

  // ---------------------------------------------------------------- C85
  /** Trailing z-score per (segment, day): z = (x − μ₂₈)/σ₂₈ over the
    * 28 days ENDING THE DAY BEFORE (1 PRECEDING — the baseline must
    * not contain the scored day), published with the |z| ≥ 3 flag;
    * full windows only. */
  private val windowZscore = QueryDef(
    "window_zscore",
    (s, d) => {
      val daily = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .where(F.year(F.col("o_orderdate")) === 1995)
        .groupBy(F.col("c_mktsegment").as("segment"),
          F.datediff(F.to_date(F.col("o_orderdate")), F.lit("1995-01-01"))
            .cast("long").as("x"))
        .agg(F.expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
          .as("cents"))
      val w = Window.partitionBy("segment").orderBy("x")
        .rowsBetween(-28, -1)
      val scored = daily.select(F.col("segment"), F.col("x"),
        F.col("cents"),
        F.count(F.lit(1)).over(w).as("n"),
        F.sum("cents").over(w).as("sx"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).over(w)
          .as("sxx"))
      scored.where(F.col("n") === 28)
        .select(F.col("segment"), F.col("x"), F.col("cents"),
          F.expr("round((CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) " +
            "/ 28) / sqrt((28.0 * CAST(CAST(sxx AS STRING) AS DOUBLE) " +
            "- CAST(sx AS DOUBLE) * sx) / (28.0 * 27.0)), 6)").as("z"))
        .withColumn("is_anomaly",
          F.expr("CAST(CASE WHEN abs(z) >= 3.0 THEN 1 ELSE 0 END " +
            "AS BIGINT)"))
        .orderBy("segment", "x")
    },
    Some("""
      WITH daily AS (
        SELECT c_mktsegment AS segment,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE year(CAST(o_orderdate AS DATE)) = 1995
        GROUP BY 1, 2),
      sc AS (
        SELECT segment, x, cents,
               count(*) OVER win AS n,
               sum(cents) OVER win AS sx,
               sum(CAST(cents AS HUGEINT) * cents) OVER win AS sxx
        FROM daily
        WINDOW win AS (PARTITION BY segment ORDER BY x
                       ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))
      SELECT segment, x, cents,
             round((CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) / 28) /
                   sqrt((28.0 * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
                         CAST(sx AS DOUBLE) * sx) / (28.0 * 27.0)), 6)
               AS z,
             CAST(CASE WHEN abs(round((CAST(cents AS DOUBLE) -
                    CAST(sx AS DOUBLE) / 28) /
                   sqrt((28.0 * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
                         CAST(sx AS DOUBLE) * sx) / (28.0 * 27.0)), 6))
                    >= 3.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      FROM sc WHERE n = 28 ORDER BY segment, x"""))

  val all: Seq[QueryDef] = Seq(windowZscore)
}
