package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-26 inventory (r6): time-series diagnostics and a privacy
  * completion — binary-segmentation changepoint location (the argmax
  * complement of C45's CUSUM detector), seasonal-naive forecast
  * backtesting (the capacity-planning baseline every pipeline runs
  * before reaching for a model), rolling 12-month correlation between
  * segment revenue series, and l-diversity (the sensitive-attribute
  * audit beside E40's k-anonymity).
  *
  * Every windowed computation here runs over the CALENDAR frame
  * (metadata-sized at any corpus scale) — period cents are exact
  * decimal sums taken map-side first; cross-products route through
  * DECIMAL(38,0)/HUGEINT; closing ratios are single double ops at 6dp
  * per SURVEY §5.
  */
object SeriesQueries {

  // ---------------------------------------------------------------- M11
  /** Binary-segmentation changepoint per segment: the 1995 daily
    * revenue series is split at every candidate day (min segment 10
    * days); the split maximizing |mean_left − mean_right| (exact
    * integer micros, deterministic smallest-day tie-break) is the
    * reported changepoint — the location complement of C45's CUSUM
    * "did it drift" alarm. One cumsum window over the ≤365-row daily
    * frame per segment, argmax inside the same bounded frame. */
  private val binsegSplit = QueryDef(
    "binseg_split",
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
      val cum = daily
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("cs", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("segment")))
        .withColumn("tot", F.sum("cents").over(Window.partitionBy("segment")))
      val scored = cum
        .where(F.expr("rn >= 10 AND rn <= n - 10"))
        .select(F.col("segment"), F.col("x"),
          F.expr("CAST(CAST(cs AS DECIMAL(38,0)) * 1000000 div rn " +
            "AS BIGINT)").as("mean_l_micro"),
          F.expr("CAST(CAST(tot - cs AS DECIMAL(38,0)) * 1000000 div " +
            "(n - rn) AS BIGINT)").as("mean_r_micro"))
        .withColumn("delta_micro",
          F.expr("abs(mean_l_micro - mean_r_micro)"))
      scored
        .withColumn("pick", F.row_number().over(Window
          .partitionBy("segment")
          .orderBy(F.col("delta_micro").desc, F.col("x"))))
        .where(F.col("pick") === 1)
        .select("segment", "x", "mean_l_micro", "mean_r_micro",
          "delta_micro")
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
      cu AS (
        SELECT segment, x, cents,
               row_number() OVER (PARTITION BY segment ORDER BY x) AS rn,
               sum(cents) OVER (PARTITION BY segment ORDER BY x
                                ROWS UNBOUNDED PRECEDING) AS cs,
               count(*) OVER (PARTITION BY segment) AS n,
               sum(cents) OVER (PARTITION BY segment) AS tot
        FROM daily),
      sc AS (
        SELECT segment, x,
               CAST(CAST(cs AS HUGEINT) * 1000000 // rn AS BIGINT) AS mean_l_micro,
               CAST(CAST(tot - cs AS HUGEINT) * 1000000 // (n - rn)
                    AS BIGINT) AS mean_r_micro,
               CAST(abs(CAST(cs AS HUGEINT) * 1000000 // rn -
                        CAST(tot - cs AS HUGEINT) * 1000000 // (n - rn))
                    AS BIGINT) AS delta_micro
        FROM cu WHERE rn >= 10 AND rn <= n - 10),
      pk AS (
        SELECT *, row_number() OVER (PARTITION BY segment
                    ORDER BY delta_micro DESC, x) AS pick
        FROM sc)
      SELECT segment, x, mean_l_micro, mean_r_micro, delta_micro
      FROM pk WHERE pick = 1 ORDER BY segment"""))

  // ---------------------------------------------------------------- M12
  /** Seasonal-naive forecast backtest per segment: forecast(t) =
    * actual(t−7), scored over every 1995 day with a lag available —
    * MAE and bias in exact cents-micros, MAPE from per-day integer
    * ratios (each |err|·10⁶ div actual BEFORE the average, so the
    * aggregate is order-independent). The baseline every capacity
    * forecast must beat; lag pairing by date arithmetic on the daily
    * frame, M6/M7 discipline. */
  private val forecastBacktest = QueryDef(
    "forecast_backtest",
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
      val paired = daily.as("a")
        .join(daily.as("b"),
          F.expr("a.segment = b.segment AND a.x = b.x + 7"))
        .select(F.col("a.segment").as("segment"),
          F.expr("a.cents - b.cents").as("err"),
          F.expr("abs(a.cents - b.cents)").as("aerr"),
          F.expr("CAST(CAST(abs(a.cents - b.cents) AS DECIMAL(38,0)) " +
            "* 1000000 div a.cents AS BIGINT)").as("ape_micro"))
      paired.groupBy("segment")
        .agg(F.count(F.lit(1)).as("n_days"),
          F.expr("CAST(CAST(sum(aerr) AS DECIMAL(38,0)) * 1000000 " +
            "div count(*) AS BIGINT)").as("mae_micro"),
          // bias can be negative: explicit floor-division (C64's portable
          // form) — pins true floor semantics regardless of either
          // engine's truncation choice (both natives truncate to zero)
          F.expr("CAST((CAST(sum(err) AS DECIMAL(38,0)) * 1000000 - " +
            "((CAST(sum(err) AS DECIMAL(38,0)) * 1000000 % " +
            "count(*)) + count(*)) % count(*)) div count(*) AS BIGINT)")
            .as("bias_micro"),
          F.expr("CAST(sum(ape_micro) div count(*) AS BIGINT)")
            .as("mape_micro"))
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
      p AS (
        SELECT a.segment, a.cents - b.cents AS err,
               abs(a.cents - b.cents) AS aerr,
               CAST(abs(a.cents - b.cents) AS HUGEINT) * 1000000
                 // a.cents AS ape_micro
        FROM daily a JOIN daily b
          ON a.segment = b.segment AND a.x = b.x + 7)
      SELECT segment, CAST(count(*) AS BIGINT) AS n_days,
             CAST(CAST(sum(aerr) AS HUGEINT) * 1000000 // count(*)
                  AS BIGINT) AS mae_micro,
             CAST((CAST(sum(err) AS HUGEINT) * 1000000
                   - ((CAST(sum(err) AS HUGEINT) * 1000000 % count(*))
                      + count(*)) % count(*)) // count(*) AS BIGINT)
               AS bias_micro,
             CAST(sum(ape_micro) // count(*) AS BIGINT) AS mape_micro
      FROM p GROUP BY segment ORDER BY segment"""))

  // ---------------------------------------------------------------- C71
  /** Rolling 12-month Pearson correlation between two segment revenue
    * series (BUILDING vs MACHINERY): monthly cents pivot to an aligned
    * calendar frame (months are dense at every SF where days are not),
    * window sums of x/y/xy/x²/y² (products through
    * DECIMAL(38,0)/HUGEINT) over ROWS 11 PRECEDING, one closing double
    * formula at 6dp — published only for full windows. The co-movement
    * diagnostic behind "do these two businesses share demand shocks";
    * every window runs on the month grid, never the fact table. */
  private val rollingCorr = QueryDef(
    "rolling_corr",
    (s, d) => {
      val daily = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(
          F.expr("CAST((year(o_orderdate) - 1992) * 12 + " +
            "month(o_orderdate) - 1 AS BIGINT)").as("x"),
          F.col("c_mktsegment").as("segment"))
        .agg(F.expr(
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
          .as("cents"))
      val wide = daily.groupBy("x").agg(
        F.max(F.when(F.col("segment") === "BUILDING", F.col("cents")))
          .as("cx"),
        F.max(F.when(F.col("segment") === "MACHINERY", F.col("cents")))
          .as("cy"))
        .where(F.col("cx").isNotNull && F.col("cy").isNotNull)
      val w = Window.orderBy("x").rowsBetween(-11, 0)
      val sums = wide.select(F.col("x"), F.col("cx"), F.col("cy"),
        F.count(F.lit(1)).over(w).as("n"),
        F.sum("cx").over(w).as("sx"),
        F.sum("cy").over(w).as("sy"),
        F.sum(F.expr("CAST(cx AS DECIMAL(38,0)) * cy")).over(w).as("sxy"),
        F.sum(F.expr("CAST(cx AS DECIMAL(38,0)) * cx")).over(w).as("sxx"),
        F.sum(F.expr("CAST(cy AS DECIMAL(38,0)) * cy")).over(w).as("syy"))
      sums.where(F.col("n") === 12)
        .select(F.col("x"), F.col("sx"), F.col("sy"),
          F.expr("round((12.0 * CAST(CAST(sxy AS STRING) AS DOUBLE) - " +
            "CAST(sx AS DOUBLE) * sy) / " +
            "(sqrt(12.0 * CAST(CAST(sxx AS STRING) AS DOUBLE) - " +
            "CAST(sx AS DOUBLE) * sx) * " +
            "sqrt(12.0 * CAST(CAST(syy AS STRING) AS DOUBLE) - " +
            "CAST(sy AS DOUBLE) * sy)), 6)").as("corr12"))
        .orderBy("x")
    },
    Some("""
      WITH daily AS (
        SELECT CAST((year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
                    month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS x,
               c_mktsegment AS segment,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1, 2),
      wide AS (
        SELECT x,
               max(CASE WHEN segment = 'BUILDING' THEN cents END) AS cx,
               max(CASE WHEN segment = 'MACHINERY' THEN cents END) AS cy
        FROM daily GROUP BY x
        HAVING max(CASE WHEN segment = 'BUILDING' THEN cents END)
                 IS NOT NULL
           AND max(CASE WHEN segment = 'MACHINERY' THEN cents END)
                 IS NOT NULL),
      s AS (
        SELECT x, cx, cy,
               count(*) OVER win AS n,
               sum(cx) OVER win AS sx,
               sum(cy) OVER win AS sy,
               sum(CAST(cx AS HUGEINT) * cy) OVER win AS sxy,
               sum(CAST(cx AS HUGEINT) * cx) OVER win AS sxx,
               sum(CAST(cy AS HUGEINT) * cy) OVER win AS syy
        FROM wide
        WINDOW win AS (ORDER BY x ROWS BETWEEN 11 PRECEDING
                       AND CURRENT ROW))
      SELECT x, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
             round((12.0 * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) -
                    CAST(sx AS DOUBLE) * sy) /
                   (sqrt(12.0 * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
                         CAST(sx AS DOUBLE) * sx) *
                    sqrt(12.0 * CAST(CAST(syy AS VARCHAR) AS DOUBLE) -
                         CAST(sy AS DOUBLE) * sy)), 6) AS corr12
      FROM s WHERE n = 12 ORDER BY x"""))

  // ---------------------------------------------------------------- E58
  /** l-diversity audit beside E40's k-anonymity: for each
    * quasi-identifier group (segment × order year), the count of
    * DISTINCT sensitive values (order priority) — groups with l < 3
    * are re-identification risks even when k-anonymous (homogeneity
    * attack). One grouped count-distinct over the QI frame (bounded by
    * segments × years); output every group with its l and the flag. */
  private val lDiversity = QueryDef(
    "l_diversity",
    (s, d) => {
      t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").as("segment"),
          F.year(F.col("o_orderdate")).cast("long").as("yr"))
        .agg(F.count(F.lit(1)).as("n"),
          F.countDistinct("o_orderpriority").as("l_distinct"))
        .withColumn("diverse",
          F.expr("CAST(CASE WHEN l_distinct >= 3 THEN 1 ELSE 0 END " +
            "AS BIGINT)"))
        .orderBy("segment", "yr")
    },
    Some("""
      SELECT c_mktsegment AS segment,
             CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
             CAST(CASE WHEN count(DISTINCT o_orderpriority) >= 3
                  THEN 1 ELSE 0 END AS BIGINT) AS diverse
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2 ORDER BY segment, yr"""))

  // ---------------------------------------------------------------- C90
  /** Classical trend/seasonal decomposition of daily revenue — the
    * moving-average decomposition underlying STL, restricted to the
    * exact-arithmetic part: trend = centered 7-observed-day mean of
    * daily myriacents (a ROWS window over the calendar-day frame —
    * deterministic over the observed day sequence even with calendar
    * gaps), detrended = value − trend (exact, trend by the positive
    * floor form), seasonal = per-day-of-week mean of the detrended
    * series. Detrended sums can be NEGATIVE, so the per-dow means use
    * the truncating form (a − a%b)/b, which both engines compute
    * identically (both % are dividend-signed, and the cleared
    * numerator divides exactly). Complements M6's seasonality_dow
    * (raw dow means): here the weekly signal is read AFTER the trend
    * is removed, which is what makes it a seasonal component rather
    * than a level artifact.
    *
    * Scale shape: one corpus aggregate to the calendar-day frame
    * (≤ date-range days at any SF — WindowAuditSpec-allowlisted), one
    * 7-row-frame window, a 7-row finish. */
  private val seasonalDecompose = QueryDef(
    "seasonal_decompose",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.col("o_orderdate").as("day"))
        .agg(F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4))" +
          " * 10000 AS DECIMAL(38,0))")).as("myria"))
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      val det = daily
        .withColumn("_n7", F.count(F.lit(1)).over(w))
        .withColumn("_s7", F.sum("myria").over(w))
        .where(F.col("_n7") === 7)
        .withColumn("_det",
          F.expr("myria - CAST((_s7 - _s7 % 7) / 7 AS DECIMAL(38,0))"))
      det.groupBy(F.dayofweek(F.col("day")).cast("long").as("dow"))
        .agg(F.count(F.lit(1)).as("n_days"),
          F.sum("_det").as("_sd"), F.sum("myria").as("_sm"))
        .select(F.col("dow"), F.col("n_days"),
          F.expr("CAST((_sd - _sd % n_days) / n_days AS BIGINT)")
            .as("seasonal_myria"),
          F.expr("CAST((_sm - _sm % n_days) / n_days AS BIGINT)")
            .as("mean_myria"))
        .orderBy("dow")
    },
    Some("""
      WITH daily AS (
        SELECT o_orderdate AS day,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                        AS HUGEINT)) AS myria
        FROM orders GROUP BY 1),
      tr AS (SELECT day, myria,
                    count(*) OVER w AS n7,
                    sum(myria) OVER w AS s7
             FROM daily
             WINDOW w AS (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      det AS (SELECT day, myria,
                     myria - (s7 - s7 % 7) // 7 AS det
              FROM tr WHERE n7 = 7),
      g AS (SELECT dayofweek(day) + 1 AS dow,
                   CAST(count(*) AS BIGINT) AS n_days,
                   sum(det) AS sd, sum(myria) AS sm
            FROM det GROUP BY 1)
      SELECT CAST(dow AS BIGINT) AS dow, n_days,
             CAST((sd - sd % n_days) // n_days AS BIGINT)
               AS seasonal_myria,
             CAST((sm - sm % n_days) // n_days AS BIGINT) AS mean_myria
      FROM g ORDER BY dow"""))

  // ---------------------------------------------------------- M63 tables
  /** Quantized DFT basis for [[periodogram]]: for each candidate
    * period p, COS_P(p)(r) = round(10⁶·cos(2πr/p)) and SIN_P(p)(r) =
    * round(10⁶·sin(2πr/p)) for r = 0..p−1 — compile-time literals,
    * never a runtime cos/sin (the BH_THR / DCT_T discipline). The
    * modular trick is what makes a DFT tabulable at all: the basis at
    * integer period p only takes p distinct values over ANY horizon,
    * so a Σ_t x_t·cos(2πt/p) over years of days indexes a p-entry
    * table by t mod p. */
  private val PERIODS = 2 to 14
  private val COS_P: Map[Int, Seq[Long]] = PERIODS.map(p =>
    p -> (0 until p).map(r =>
      math.round(1e6 * math.cos(2 * math.Pi * r / p)))).toMap
  private val SIN_P: Map[Int, Seq[Long]] = PERIODS.map(p =>
    p -> (0 until p).map(r =>
      math.round(1e6 * math.sin(2 * math.Pi * r / p)))).toMap

  private def basisAt(tbl: Seq[Long], tExpr: String, p: Int,
      spark: Boolean): String =
    if (spark)
      s"element_at(array(${tbl.mkString(", ")}), " +
        s"CAST(($tExpr) % $p AS INT) + 1)"
    else
      s"([${tbl.mkString(",")}])[(($tExpr) % $p) + 1]"

  // ---------------------------------------------------------------- M63
  /** Periodogram over the daily revenue series — "what cycle does this
    * series actually have": the squared DFT magnitude at every integer
    * period p = 2..14 days, computed EXACTLY up to the one closing
    * double per axis. Deviations are pre-scaled to stay integer
    * (dev_t = n·x_t − Σx, so no mean division), each axis is one
    * table-lookup dot product C_p = Σ dev_t·COS_P(p)(t mod p) in
    * DECIMAL(38,0)/HUGEINT, and the power P_p = C_p² + S_p² squares
    * AFTER the §5 string→double route (C_p ~ 10²² would overflow any
    * integer width squared; two identical doubles square
    * bit-identically). Published per period: the power share of the
    * whole scanned band (one double division, 6dp) and the peak flag
    * (max share, smallest-period tie-break) — the read that says
    * "weekly" without anyone eyeballing a chart.
    *
    * Scale shape: one map-side-combined fact rollup to calendar days;
    * the 13×2 dot products ride ONE aggregate pass over the ≤2.5k-day
    * frame; everything after is a 13-row metadata frame. */
  private val periodogram = QueryDef(
    "periodogram",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val glob = daily.agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).as("sx"),
        F.min("day").as("d0"))
      val dev = daily.crossJoin(F.broadcast(glob))
        .select(F.expr("CAST(datediff(day, d0) AS BIGINT)").as("tt"),
          F.expr("n * CAST(cents AS DECIMAL(38,0)) - sx").as("dev"))
      val sums = PERIODS.flatMap { p =>
        Seq(
          F.sum(F.expr(s"dev * ${basisAt(COS_P(p), "tt", p, spark = true)}"))
            .as(s"_c$p"),
          F.sum(F.expr(s"dev * ${basisAt(SIN_P(p), "tt", p, spark = true)}"))
            .as(s"_s$p"))
      }
      var one = dev.agg(sums.head, sums.tail: _*)
      // pow() is libm-routed (1-ULP divergence risk, SURVEY section 5);
      // square the string-routed doubles with plain multiplication
      for (p <- PERIODS) one = one
        .withColumn(s"_dc$p", F.expr(
          s"CAST(CAST(coalesce(_c$p, CAST(0 AS DECIMAL(38,0)))" +
            s" AS STRING) AS DOUBLE)"))
        .withColumn(s"_ds$p", F.expr(
          s"CAST(CAST(coalesce(_s$p, CAST(0 AS DECIMAL(38,0)))" +
            s" AS STRING) AS DOUBLE)"))
        .withColumn(s"_pw$p",
          F.expr(s"_dc$p * _dc$p + _ds$p * _ds$p"))
      one = one.withColumn("_tot",
        F.expr(PERIODS.map(p => s"_pw$p").mkString(" + ")))
      val rows = PERIODS.map(p =>
        s"named_struct('period', CAST($p AS BIGINT), 'share', " +
          s"CASE WHEN _tot = CAST(0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)" +
          s" ELSE round(_pw$p / _tot, 6) END)")
      val sh = one
        .select(F.explode(F.expr(rows.mkString("array(", ", ", ")")))
          .as("r"))
        .select(F.col("r.period").as("period"),
          F.col("r.share").as("share"))
      val pk = sh.agg(F.max("share").as("_mx"))
        .join(sh.withColumnRenamed("share", "_sh2"),
          F.col("_sh2") === F.col("_mx"))
        .agg(F.min("period").as("_pkp"))
      sh.crossJoin(F.broadcast(pk))
        .select(F.col("period"), F.col("share"),
          F.expr("CASE WHEN period = _pkp THEN 1L ELSE 0L END")
            .as("peak"))
        .orderBy("period")
    },
    Some {
      val axes = PERIODS.map { p =>
        s"""sum(dev * ${basisAt(COS_P(p), "tt", p, spark = false)}) AS c$p,
           |sum(dev * ${basisAt(SIN_P(p), "tt", p, spark = false)}) AS s$p"""
          .stripMargin
      }.mkString(",\n")
      val pws = PERIODS.map(p =>
        s"""CAST(CAST(coalesce(c$p, 0) AS VARCHAR) AS DOUBLE)
           | * CAST(CAST(coalesce(c$p, 0) AS VARCHAR) AS DOUBLE)
           | + CAST(CAST(coalesce(s$p, 0) AS VARCHAR) AS DOUBLE)
           | * CAST(CAST(coalesce(s$p, 0) AS VARCHAR) AS DOUBLE)
           | AS pw$p""".stripMargin).mkString(",\n")
      val shares = PERIODS.map(p =>
        s"SELECT CAST($p AS BIGINT) AS period, CASE WHEN tot = " +
          s"CAST(0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE) ELSE " +
          s"round(pw$p / tot, 6) END AS share FROM pw")
        .mkString("\nUNION ALL\n")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
         |              AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             sum(CAST(cents AS HUGEINT)) AS sx,
         |             min(day) AS d0 FROM daily),
         |dev AS (SELECT CAST(datediff('day', d0, day) AS BIGINT) AS tt,
         |               n * CAST(cents AS HUGEINT) - sx AS dev
         |        FROM daily, g),
         |ax AS (SELECT
         |$axes
         |FROM dev),
         |pw0 AS (SELECT
         |$pws
         |FROM ax),
         |pw AS (SELECT *, ${PERIODS.map(p => s"pw$p").mkString(" + ")}
         |         AS tot FROM pw0),
         |sh AS MATERIALIZED ($shares),
         |mx AS (SELECT max(share) AS mx FROM sh),
         |pk AS (SELECT min(period) AS pkp FROM sh, mx
         |       WHERE share = mx)
         |SELECT period, share,
         |       CAST(CASE WHEN period = pkp THEN 1 ELSE 0 END AS BIGINT)
         |         AS peak
         |FROM sh, pk ORDER BY period""".stripMargin
    })

  // ---------------------------------------------------------------- M64
  /** Additive Holt-Winters smoothing of the daily revenue series
    * ([[graft.operators.SeriesOps.holtWintersFold]], r14): level +
    * trend + 7-observation season, all-INTEGER recursions (α = 1/4,
    * β = γ = 1/8 via the portable truncating division (a − a%k)/k —
    * identical on signed deseasonalized terms in both engines), so the
    * full state series is hash-portable where float Holt-Winters
    * drifts an ULP per step. Publishes every day with its one-step-
    * ahead fitted value, the residual, and the level/trend/seasonal
    * decomposition — the capacity-forecast companion to M12's
    * seasonal-naive backtest (this is the model that backtest is the
    * baseline FOR). Seasonal lag is by observation index; TPC-H dates
    * are gapless daily so observation-7 = calendar-7 here.
    *
    * Scale shape: one map-side corpus collapse to the ≤2.5k-day grid,
    * one calendar-bounded array fold (the E51 ewmaFold shape), then an
    * explode back to rows; the oracle runs the SAME integer recursion
    * as a depth-n recursive CTE (the E51 precedent). */
  private val holtWinters = QueryDef(
    "holt_winters",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      graft.operators.SeriesOps.holtWintersFold(daily, "day", "cents")
        .orderBy("day")
    },
    Some(hwOracleSql))

  /** Shared M64/G32 oracle (a def — the ab_sprt forward-reference
    * lesson): the integer Holt-Winters recursion as a depth-n
    * recursive CTE. The streaming twin drains the SAME day grid from a
    * watermarked windowed aggregation and folds identically, so both
    * engines and both execution modes hash-match one text. */
  private[queries] def hwOracleSql: String = {
      def td(a: String, k: Int) = s"(($a) - ($a) % $k) // $k"
      val x = "s.cents"
      val s7 = "r.seas[1]"
      val lnew = s"${td(s"$x - $s7", 4)} + ${td("3 * (r.lvl + r.tr)", 4)}"
      val tnew = s"${td(s"($lnew) - r.lvl", 8)} + ${td("7 * r.tr", 8)}"
      val snew = s"${td(s"$x - ($lnew)", 8)} + ${td(s"7 * ($s7)", 8)}"
      s"""WITH RECURSIVE daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
         |              AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |seq AS MATERIALIZED (
         |  SELECT day, cents,
         |         row_number() OVER (ORDER BY day) AS rn FROM daily),
         |r AS (
         |  SELECT rn, day, cents, cents AS lvl,
         |         CAST(0 AS BIGINT) AS tr,
         |         [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS seas,
         |         cents AS fitted, CAST(0 AS BIGINT) AS err,
         |         CAST(0 AS BIGINT) AS seasonal
         |  FROM seq WHERE rn = 1
         |  UNION ALL
         |  SELECT s.rn, s.day, s.cents,
         |         CAST($lnew AS BIGINT),
         |         CAST($tnew AS BIGINT),
         |         list_append(r.seas[2:7], CAST($snew AS BIGINT)),
         |         CAST(r.lvl + r.tr + $s7 AS BIGINT),
         |         CAST($x - (r.lvl + r.tr + $s7) AS BIGINT),
         |         CAST($snew AS BIGINT)
         |  FROM r JOIN seq s ON s.rn = r.rn + 1)
         |SELECT day, cents, fitted, err, lvl AS level, tr AS trend,
         |       seasonal
         |FROM r ORDER BY day""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(binsegSplit, forecastBacktest, rollingCorr,
    lDiversity, seasonalDecompose, periodogram, holtWinters)
}
