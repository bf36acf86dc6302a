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

  // ---------------------------------------------------------------- C85
  /** Nelson-Aalen cumulative hazard of the first repeat order — the
    * CENSORING-AWARE companion to C83's survival curve (C83 reads only
    * customers who DID repeat; one-order customers carry information
    * too — they survived event-free until the corpus horizon, and
    * dropping them biases hazard upward). Subjects: every customer;
    * time = gap to the second order (event) or to the corpus max date
    * (right-censored, standard convention: censored at t stays in the
    * risk set for events at t). Exact integers end to end: per distinct
    * event time the increment d_t·10⁶ div n_t with the risk set
    * n_t = N − #{time < t} from ONE DistRank cumsum over the
    * calendar-bounded time domain, published as H(k) on the C83 day
    * ladder (7/14/30/60/90/180) with missing-ladder rows completed to
    * zero. Σ of integer-div terms — order-independent, hash-portable.
    *
    * Scale shape: one per-customer window (customer-keyed), one
    * map-side-combined aggregate to the gap domain, one range cumsum,
    * a 6-row ladder finish. */
  private val hazardNa = QueryDef(
    "hazard_na",
    (s, d) => {
      val o = t(s, d, "orders")
        .select(F.col("o_custkey").as("ck"),
          F.datediff(F.to_date(F.col("o_orderdate")), F.lit("1992-01-01"))
            .cast("long").as("day"),
          F.col("o_orderkey").as("ok"))
      val maxd = o.agg(F.max("day").as("maxd"))
      val w = Window.partitionBy("ck").orderBy("day", "ok")
      val subj = o
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nxt", F.lead("day", 1).over(w))
        .where(F.col("rn") === 1)
        .crossJoin(F.broadcast(maxd))
        .select(
          F.expr("CASE WHEN nxt IS NOT NULL THEN nxt - day " +
            "ELSE maxd - day END").as("time"),
          F.expr("CASE WHEN nxt IS NOT NULL THEN 1L ELSE 0L END").as("ev"))
      val dom = subj.groupBy("time")
        .agg(F.sum("ev").as("d"), F.count(F.lit(1)).as("cnt"))
      val cum = graft.operators.DistRank.globalCumSum(
        dom, "cnt", "cumt", F.col("time").asc)
      val nAll = dom.agg(F.sum("cnt").as("n_all"))
      val terms = cum.crossJoin(F.broadcast(nAll))
        .where(F.col("d") > 0)
        .select(F.col("time"), F.col("d"),
          F.expr("d * 1000000 div (n_all - (cumt - cnt))").as("term_ppm"))
      val ladder = s.range(1)
        .select(F.explode(F.expr("array(7L, 14L, 30L, 60L, 90L, 180L)"))
          .as("k"))
      val agg = terms
        .select(F.col("time"), F.col("d"), F.col("term_ppm"),
          F.explode(F.expr("array(7L, 14L, 30L, 60L, 90L, 180L)"))
            .as("k"))
        .where(F.col("time") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("d").as("n_events"), F.sum("term_ppm").as("h_ppm"))
      ladder.join(agg, Seq("k"), "left")
        .na.fill(0L, Seq("n_events", "h_ppm"))
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
      mx AS (SELECT CAST(max(day) AS BIGINT) AS maxd FROM o),
      r AS (
        SELECT ck, day,
               row_number() OVER (PARTITION BY ck ORDER BY day, ok) AS rn,
               lead(day) OVER (PARTITION BY ck ORDER BY day, ok) AS nxt
        FROM o),
      subj AS (
        SELECT CASE WHEN nxt IS NOT NULL THEN nxt - day
                    ELSE maxd - day END AS time,
               CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM r, mx WHERE rn = 1),
      dom AS (SELECT time, CAST(sum(ev) AS BIGINT) AS d,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM subj GROUP BY 1),
      c AS (SELECT time, d, cnt,
                   CAST(sum(cnt) OVER (ORDER BY time) AS BIGINT) AS cumt
            FROM dom),
      na AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM dom),
      terms AS (
        SELECT time, d,
               CAST(d * 1000000 // (n_all - (cumt - cnt)) AS BIGINT)
                 AS term_ppm
        FROM c, na WHERE d > 0),
      agg AS (
        SELECT CAST(k AS BIGINT) AS k,
               CAST(sum(d) AS BIGINT) AS n_events,
               CAST(sum(term_ppm) AS BIGINT) AS h_ppm
        FROM terms, unnest([7, 14, 30, 60, 90, 180]) AS u(k)
        WHERE time <= k GROUP BY 1)
      SELECT CAST(l.k AS BIGINT) AS k,
             coalesce(a.n_events, 0) AS n_events,
             coalesce(a.h_ppm, 0) AS h_ppm
      FROM unnest([7, 14, 30, 60, 90, 180]) AS l(k)
      LEFT JOIN agg a ON a.k = l.k
      ORDER BY k"""))

  val all: Seq[QueryDef] = Seq(survivalCurve, longestStreak, hazardNa)
}
