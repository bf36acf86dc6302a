package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-35 inventory (r6): lifecycle closers — the first-repeat
  * survival curve (the discrete Kaplan–Meier read on "how long until
  * the second order", the retention planner's primary curve) and the
  * longest rising-revenue streak per segment (gaps-and-islands over
  * the calendar frame — the C31 technique applied to a comparison
  * flag). */
object SurvivalQueries {

  // ---------------------------------------------------------------- C83
  /** First-repeat survival: among customers with ≥2 orders, the share
    * (ppm) whose first-repeat gap is ≥ k days, published on a fixed
    * k-ladder (7/14/30/60/90/180 days — the ladder explodes over the
    * VALUE-GROUPED gap frame, calendar-bounded). All-integer: gap from
    * date arithmetic, survival by cumulative counts from the top. */
  private val survivalCurve = QueryDef(
    "survival_curve",
    (s, d) => {
      val o = t(s, d, "orders")
        .select(F.col("o_custkey").as("ck"),
          F.datediff(F.to_date(F.col("o_orderdate")), F.lit("1992-01-01"))
            .cast("long").as("day"),
          F.col("o_orderkey").as("ok"))
      val w = Window.partitionBy("ck").orderBy("day", "ok")
      val firstGap = o
        .withColumn("rn", F.row_number().over(w))
        .withColumn("prev", F.lag("day", 1).over(w))
        .where(F.col("rn") === 2)
        .select(F.expr("day - prev").as("gap"))
      val g = firstGap.groupBy("gap").agg(F.count(F.lit(1)).as("c"))
      val tot = g.agg(F.sum("c").as("n"))
      g.crossJoin(F.broadcast(tot))
        .select(F.col("gap"), F.col("c"), F.col("n"),
          F.explode(F.expr("array(7L, 14L, 30L, 60L, 90L, 180L)"))
            .as("k"))
        .where(F.col("gap") >= F.col("k"))
        .groupBy("k")
        .agg(F.expr("CAST(sum(c) AS BIGINT)").as("n_surviving"),
          F.expr("CAST(max(n) AS BIGINT)").as("n_repeaters"),
          F.expr("sum(c) * 1000000 div max(n)").as("survival_ppm"))
        .orderBy("k")
    },
    Some("""
      WITH o AS (
        SELECT o_custkey AS ck,
               CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
                 AS day,
               o_orderkey AS ok
        FROM orders),
      r AS (
        SELECT ck, day,
               row_number() OVER (PARTITION BY ck ORDER BY day, ok) AS rn,
               lag(day) OVER (PARTITION BY ck ORDER BY day, ok) AS prev
        FROM o),
      fg AS (SELECT day - prev AS gap FROM r WHERE rn = 2),
      g AS (SELECT gap, CAST(count(*) AS BIGINT) AS c FROM fg GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g)
      SELECT CAST(k AS BIGINT) AS k,
             CAST(sum(c) AS BIGINT) AS n_surviving,
             CAST(max(n) AS BIGINT) AS n_repeaters,
             CAST(sum(c) * 1000000 // max(n) AS BIGINT) AS survival_ppm
      FROM g, tot, unnest([7, 14, 30, 60, 90, 180]) AS u(k)
      WHERE gap >= k GROUP BY k ORDER BY k"""))

  // ---------------------------------------------------------------- C84
  /** Longest rising-revenue streak per segment: day-over-day rising
    * flag on the calendar frame, islands via the rn−rn₂ trick (C31's
    * gaps-and-islands on a comparison flag), longest island length +
    * its start day with deterministic tie-break. Every window is over
    * the ≤-calendar daily frame. */
  private val longestStreak = QueryDef(
    "longest_streak",
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
      val flagged = daily
        .withColumn("prev", F.lag("cents", 1).over(w))
        .withColumn("rising",
          F.expr("CASE WHEN prev IS NOT NULL AND cents > prev " +
            "THEN 1 ELSE 0 END"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
      val isl = flagged.where(F.col("rising") === 1)
        .withColumn("rn2", F.row_number().over(
          Window.partitionBy("segment").orderBy("x")).cast("long"))
        .withColumn("grp", F.expr("rn - rn2"))
        .groupBy("segment", "grp")
        .agg(F.count(F.lit(1)).as("len"), F.min("x").as("start_x"))
      isl
        .withColumn("pick", F.row_number().over(Window
          .partitionBy("segment")
          .orderBy(F.col("len").desc, F.col("start_x"))))
        .where(F.col("pick") === 1)
        .select(F.col("segment"), F.col("len").as("longest_streak"),
          F.col("start_x").as("streak_start_day"))
        .orderBy("segment")
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
      fl AS (
        SELECT segment, x, cents,
               CASE WHEN lag(cents) OVER
                      (PARTITION BY segment ORDER BY x) IS NOT NULL
                     AND cents > lag(cents) OVER
                      (PARTITION BY segment ORDER BY x)
                    THEN 1 ELSE 0 END AS rising,
               row_number() OVER (PARTITION BY segment ORDER BY x) AS rn
        FROM daily),
      ri AS (
        SELECT segment, x, rn,
               row_number() OVER (PARTITION BY segment ORDER BY x) AS rn2
        FROM fl WHERE rising = 1),
      isl AS (
        SELECT segment, rn - rn2 AS grp,
               CAST(count(*) AS BIGINT) AS len,
               CAST(min(x) AS BIGINT) AS start_x
        FROM ri GROUP BY 1, 2),
      pk AS (
        SELECT segment, len, start_x,
               row_number() OVER (PARTITION BY segment
                 ORDER BY len DESC, start_x) AS pick
        FROM isl)
      SELECT segment, len AS longest_streak,
             start_x AS streak_start_day
      FROM pk WHERE pick = 1 ORDER BY segment"""))

  val all: Seq[QueryDef] = Seq(survivalCurve, longestStreak)
}
