package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-27 inventory (r6): the classic BI window/report shapes a
  * dashboard layer asks of the engine — share-of-total, year-over-year
  * growth, maximum drawdown, and 2-D histograms. None are novel; all
  * are exact-integer (micros / ppm) and every window runs over a
  * metadata-sized frame (nation×segment aggregate, month grid,
  * calendar days, bucket grid), never the fact table.
  */
object BiQueries {

  // ---------------------------------------------------------------- C72
  /** Share-of-total: each nation's revenue share within its segment in
    * exact ppm, plus its rank — one fact-table aggregate, then windows
    * over the (segment × nation)-bounded frame. */
  private val shareOfTotal = QueryDef(
    "share_of_total",
    (s, d) => {
      val agg = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .join(F.broadcast(t(s, d, "nation")),
          F.col("c_nationkey") === F.col("n_nationkey"))
        .groupBy(F.col("c_mktsegment").as("segment"),
          F.col("n_name").as("nation"))
        .agg(F.expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
          .as("cents"))
      agg
        .withColumn("seg_total",
          F.sum("cents").over(Window.partitionBy("segment")))
        .select(F.col("segment"), F.col("nation"), F.col("cents"),
          F.expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div seg_total")
            .cast("long").as("share_ppm"),
          F.row_number().over(Window.partitionBy("segment")
            .orderBy(F.col("cents").desc, F.col("nation")))
            .cast("long").as("rank_in_segment"))
        .orderBy("segment", "rank_in_segment")
    },
    Some("""
      WITH a AS (
        SELECT c_mktsegment AS segment, n_name AS nation,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT segment, nation, cents,
             CAST(CAST(cents AS HUGEINT) * 1000000 //
                  sum(cents) OVER (PARTITION BY segment) AS BIGINT)
               AS share_ppm,
             CAST(row_number() OVER (PARTITION BY segment
                    ORDER BY cents DESC, nation) AS BIGINT)
               AS rank_in_segment
      FROM a ORDER BY segment, rank_in_segment"""))

  // ---------------------------------------------------------------- C73
  /** Year-over-year growth: monthly revenue vs the same month last
    * year, growth in ppm via exact integer cross-multiplication
    * ((cur−prev)·10⁶ div prev — C64's portable floor-division, growth
    * can be negative); lag pairing by month arithmetic on the
    * calendar-bounded month grid. The ·10⁶ product routes through
    * DECIMAL(38,0)/HUGEINT (SURVEY §5 wide-product rule): monthly cents
    * reach ~3e13 at SF100, so the int64 product would overflow at the
    * design scale even though every verified SF fits. */
  private val yoyGrowth = QueryDef(
    "yoy_growth",
    (s, d) => {
      val monthly = t(s, d, "orders")
        .groupBy(F.expr("CAST((year(o_orderdate) - 1992) * 12 + " +
          "month(o_orderdate) - 1 AS BIGINT)").as("m"))
        .agg(F.expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
          .as("cents"))
      monthly.as("a")
        .join(monthly.as("b"), F.expr("a.m = b.m + 12"))
        .select(F.col("a.m").as("m"), F.col("a.cents").as("cents"),
          F.col("b.cents").as("prev_cents"),
          F.expr("CAST((CAST(a.cents - b.cents AS DECIMAL(38,0)) " +
            "* 1000000 - " +
            "(((CAST(a.cents - b.cents AS DECIMAL(38,0)) * 1000000 " +
            "% b.cents) + b.cents) % b.cents)) div b.cents AS BIGINT)")
            .as("yoy_ppm"))
        .orderBy("m")
    },
    Some("""
      WITH mo AS (
        SELECT CAST((year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
                    month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT a.m, a.cents, b.cents AS prev_cents,
             CAST((CAST(a.cents - b.cents AS HUGEINT) * 1000000 -
                   (((CAST(a.cents - b.cents AS HUGEINT) * 1000000
                      % b.cents) + b.cents)
                   % b.cents)) // b.cents AS BIGINT) AS yoy_ppm
      FROM mo a JOIN mo b ON a.m = b.m + 12
      ORDER BY a.m"""))

  // ---------------------------------------------------------------- C74
  /** Maximum drawdown of the cumulative daily revenue-minus-trend
    * series per segment: cum(t) = Σ(cents − daily mean so far is NOT
    * used — the drawdown runs on the plain cumulative net-vs-average
    * series cum(t) = Σ(centsᵢ − c̄) where c̄ is the segment's full-period
    * daily mean in floor micros, making the series mean-reverting so a
    * drawdown exists); drawdown(t) = runningMax(cum) − cum, the report
    * is each segment's worst day. All windows over the ≤-calendar
    * frame; c̄ enters as an exact integer so both engines subtract the
    * same constant. */
  private val maxDrawdown = QueryDef(
    "max_drawdown",
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
      val withMean = daily
        .withColumn("avg_cents", F.expr(
          "sum(cents) OVER (PARTITION BY segment) div " +
            "count(*) OVER (PARTITION BY segment)"))
      val w = Window.partitionBy("segment").orderBy("x")
      val series = withMean
        .withColumn("cum", F.sum(F.expr("cents - avg_cents")).over(w))
        .withColumn("peak", F.max("cum").over(w))
        .withColumn("dd", F.expr("peak - cum"))
      series
        .withColumn("pick", F.row_number().over(Window
          .partitionBy("segment").orderBy(F.col("dd").desc, F.col("x"))))
        .where(F.col("pick") === 1)
        .select(F.col("segment"), F.col("x").as("worst_day"),
          F.col("dd").as("max_drawdown_cents"))
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
      m AS (
        SELECT segment, x, cents,
               sum(cents) OVER (PARTITION BY segment) //
                 count(*) OVER (PARTITION BY segment) AS avg_cents
        FROM daily),
      s AS (
        SELECT segment, x,
               sum(cents - avg_cents) OVER
                 (PARTITION BY segment ORDER BY x
                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM m),
      p AS (
        SELECT segment, x, cum,
               max(cum) OVER (PARTITION BY segment ORDER BY x
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM s),
      pk AS (
        SELECT segment, x, CAST(peak - cum AS BIGINT) AS dd,
               row_number() OVER (PARTITION BY segment
                 ORDER BY peak - cum DESC, x) AS pick
        FROM p)
      SELECT segment, x AS worst_day, dd AS max_drawdown_cents
      FROM pk WHERE pick = 1 ORDER BY segment"""))

  // ---------------------------------------------------------------- C75
  /** 2-D histogram (price decile-bucket × quantity) over lineitem —
    * the heatmap grid behind every density plot: integer bucket
    * arithmetic only (price div 10000, quantity floor), one map-side-
    * combined groupBy, output bounded by the bucket grid. */
  private val histogram2d = QueryDef(
    "histogram2d",
    (s, d) => {
      t(s, d, "lineitem")
        .select(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) " +
          "div 1000000").as("price_bucket"),
          F.expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"))
        .groupBy("price_bucket", "qty")
        .agg(F.count(F.lit(1)).as("n"))
        .orderBy("price_bucket", "qty")
    },
    Some("""
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 1000000
               AS price_bucket,
             CAST(floor(l_quantity) AS BIGINT) AS qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2 ORDER BY price_bucket, qty"""))

  // ---------------------------------------------------------------- C86
  /** Leaderboard turnover: how much of each year's top-100 parts (by
    * exact revenue) survives into the next year's top-100 — the
    * RANKED-set drift read beside D74's raw edge drift and the PSI/KS
    * value drifts (dashboards live off leaderboards; this measures how
    * fast they churn). Per year the top-100 by (revenue cents DESC,
    * partkey) — the row_number ≤ k pattern the C12b TopKRewrite turns
    * into a bounded-heap aggregate, so no per-year full sort of the
    * catalog at scale — then adjacent years compare as sets: common
    * count, overlap in ppm of k. Exact integers throughout. */
  private val leaderboardTurnover = QueryDef(
    "leaderboard_turnover",
    (s, d) => {
      val rev = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          F.col("l_orderkey") === F.col("o_orderkey"))
        .groupBy(F.year(F.col("o_orderdate")).cast("long").as("yr"),
          F.col("l_partkey").as("pk"))
        .agg(F.expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))" +
          " * 100 AS BIGINT)").as("cents"))
      val w = Window.partitionBy("yr")
        .orderBy(F.col("cents").desc, F.col("pk"))
      val top = rev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 100).select("yr", "pk")
      val pairsOfYears = s.range(6)
        .select((F.col("id") + 1995).as("year_a"))
      F.broadcast(pairsOfYears)
        .join(top.select(F.col("yr").as("year_a"), F.col("pk")), "year_a")
        .join(top.select((F.col("yr") - 1).as("_ya"),
          F.col("pk").as("_pk2")),
          F.col("year_a") === F.col("_ya") &&
            F.col("pk") === F.col("_pk2"), "left")
        .groupBy("year_a")
        .agg(F.sum(F.when(F.col("_pk2").isNotNull, 1L).otherwise(0L))
          .as("n_common"),
          // realized year_a list size — can be < k at small SFs or for
          // sparse years, so the overlap is published relative to the
          // ACTUAL ranked set, not the k=100 budget (r12 advice)
          F.count(F.lit(1)).as("n_top"))
        .select(F.col("year_a"), F.expr("year_a + 1").as("year_b"),
          F.col("n_common"), F.col("n_top"),
          F.expr("n_common * 10000 div n_top").as("overlap_bp"))
        .orderBy("year_a")
    },
    Some("""
      WITH rev AS (
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
               l_partkey AS pk,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      top AS (
        SELECT yr, pk FROM (
          SELECT yr, pk, row_number() OVER (PARTITION BY yr
            ORDER BY cents DESC, pk) AS rn
          FROM rev) WHERE rn <= 100)
      SELECT CAST(y.year_a AS BIGINT) AS year_a,
             CAST(max(y.year_a) + 1 AS BIGINT) AS year_b,
             CAST(sum(CASE WHEN b.pk IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_common,
             CAST(count(*) AS BIGINT) AS n_top,
             CAST(sum(CASE WHEN b.pk IS NOT NULL THEN 1 ELSE 0 END)
                  * 10000 // count(*) AS BIGINT) AS overlap_bp
      FROM generate_series(1995, 2000) AS y(year_a)
      JOIN top a ON a.yr = y.year_a
      LEFT JOIN top b ON b.yr = y.year_a + 1 AND b.pk = a.pk
      GROUP BY y.year_a ORDER BY 1"""))

  // ---------------------------------------------------------------- M61
  /** Rank-biased overlap between adjacent years' top-100 revenue
    * leaderboards (r13) [Webber-Moffat-Zobel 2010] — the RANK-WEIGHTED
    * companion to M52's flat set overlap (turnover counts survivors;
    * RBO weights agreement at the TOP, where a dashboard's eyes live):
    * truncated RBO@100 with p = 0.9, rbo = (1−p)/p·Σ_{d=1..100}
    * p^d·X_d/d, where X_d = |A_d ∩ B_d| counts common parts whose
    * max(rank_a, rank_b) ≤ d.
    *
    * Determinism discipline: the p^d weights are quantized ONCE at
    * compile time to integer picos (floor(0.9^d·10¹²) — the ab_sprt
    * literal trick: no runtime pow() whose last ULP could differ
    * cross-engine), each depth term w_d·X_d div d is an exact integer,
    * the sum is order-independent, and ONE closing double division by
    * 9·10¹² lands rbo at 6dp. Frames: the M52 rev/top CTEs (one corpus
    * aggregate, per-year top-100 via the TopKRewrite heap shape), the
    * common-pair join and the 100-depth grid are ≤ 600-row metadata. */
  private val leaderboardRbo = QueryDef(
    "leaderboard_rbo",
    (s, d) => {
      val wLits = (1 to 100)
        .map(dd => math.floor(math.pow(0.9, dd) * 1e12).toLong)
      val wArr = wLits.mkString("array(", "L, ", "L)")
      val rev = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          F.col("l_orderkey") === F.col("o_orderkey"))
        .groupBy(F.year(F.col("o_orderdate")).cast("long").as("yr"),
          F.col("l_partkey").as("pk"))
        .agg(F.expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))" +
          " * 100 AS BIGINT)").as("cents"))
      val w = Window.partitionBy("yr")
        .orderBy(F.col("cents").desc, F.col("pk"))
      val top = rev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 100).select("yr", "pk", "rn")
      val years = s.range(6).select((F.col("id") + 1995).as("year_a"))
      val common = top.select(F.col("yr").as("year_a"), F.col("pk"),
          F.col("rn").as("ra"))
        .join(top.select((F.col("yr") - 1).as("year_a"),
          F.col("pk"), F.col("rn").as("rb")), Seq("year_a", "pk"))
        .select(F.col("year_a"), F.expr("greatest(ra, rb)").as("m"))
      val depths = s.range(1, 101).select(F.col("id").as("dep"))
      val terms = F.broadcast(common)
        .join(F.broadcast(depths), F.col("m") <= F.col("dep"))
        .groupBy("year_a", "dep")
        .agg(F.count(F.lit(1)).as("x_d"))
        .select(F.col("year_a"),
          F.expr(s"element_at($wArr, CAST(dep AS INT)) * x_d div dep")
            .as("term"))
        .groupBy("year_a")
        .agg(F.sum("term").as("_s"))
      F.broadcast(years)
        .join(terms, Seq("year_a"), "left")
        .select(F.col("year_a"), F.expr("year_a + 1").as("year_b"),
          F.expr("""round(CAST(coalesce(_s, 0L) AS DOUBLE)
            |/ 9000000000000.0, 6)""".stripMargin).as("rbo"))
        .orderBy("year_a")
    },
    Some {
      val wRows = (1 to 100)
        .map(dd => s"($dd, ${math.floor(math.pow(0.9, dd) * 1e12).toLong})")
        .mkString(", ")
      s"""WITH rev AS (
         |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         |         l_partkey AS pk,
         |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 100
         |              AS BIGINT) AS cents
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT yr, pk, rn FROM (
         |    SELECT yr, pk, row_number() OVER (PARTITION BY yr
         |      ORDER BY cents DESC, pk) AS rn
         |    FROM rev) WHERE rn <= 100),
         |wt(dep, w) AS (VALUES $wRows),
         |com AS (
         |  SELECT a.yr AS year_a, greatest(a.rn, b.rn) AS m
         |  FROM top a JOIN top b ON b.yr = a.yr + 1 AND b.pk = a.pk),
         |tm AS (
         |  SELECT year_a, CAST(sum(w * x_d // dep) AS BIGINT) AS s
         |  FROM (SELECT c.year_a, t.dep, t.w,
         |               CAST(count(*) AS BIGINT) AS x_d
         |        FROM com c JOIN wt t ON c.m <= t.dep
         |        GROUP BY 1, 2, 3)
         |  GROUP BY 1)
         |SELECT CAST(y.year_a AS BIGINT) AS year_a,
         |       CAST(y.year_a + 1 AS BIGINT) AS year_b,
         |       round(CAST(coalesce(s, 0) AS DOUBLE)
         |             / 9000000000000.0, 6) AS rbo
         |FROM generate_series(1995, 2000) AS y(year_a)
         |LEFT JOIN tm ON tm.year_a = y.year_a
         |ORDER BY 1""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(shareOfTotal, yoyGrowth, maxDrawdown,
    histogram2d, leaderboardTurnover, leaderboardRbo)
}
