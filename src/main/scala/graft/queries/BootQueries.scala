package graft.queries

import graft.operators.Hashing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-24 inventory (r6): uncertainty quantification and ANSI frame
  * completions — the deterministic Poisson bootstrap (how production
  * systems bootstrap at cluster scale: per-(row, resample) weights
  * drawn from a hash, one pass, no resampled copies of the data — see
  * Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
  * Google 2012), Welch's t statistic from exact sums, and the
  * first/last/nth_value window frame semantics engines most often get
  * wrong.
  *
  * Determinism: bootstrap weights come from the portable 60-bit md5
  * hash compared against FIXED integer thresholds (the Poisson(1)
  * inverse CDF scaled to 2⁶⁰, identical literals on both engines), so
  * every "random" draw is bit-reproducible everywhere.
  */
object BootQueries {

  /** P(X ≤ k) for X ~ Poisson(1), k = 0..5, scaled to 2^60 — weights
    * above 6 are truncated (P ≈ 1e-4 at the cap, negligible for CI
    * purposes and identically truncated on both engines). */
  private val poisT = Seq(424136118829305344L, 848272237658610688L,
    1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
    1152236456152946176L)

  // ---------------------------------------------------------------- C68
  /** Deterministic Poisson bootstrap CI for mean order value per
    * segment: 32 resamples, each row's weight in resample r = the
    * Poisson(1) draw decoded from hash(segment, ORDERKEY, r) against
    * the fixed thresholds — keyed on ROW IDENTITY, so two orders with
    * the same price draw independent weights (a value-keyed draw would
    * correlate their resamples and bias the CI) — ONE explode(0..31) pass + one map-side-combined
    * (segment, r) aggregate; the 32 resample means sort inside a
    * 32-row window frame per segment. CI = 2nd / 31st order statistic
    * (the ~94% interval). No data copies, no rand(): the resample
    * plan is a pure function of the data. */
  private val bootstrapCi = QueryDef(
    "bootstrap_ci",
    (s, d) => {
      // codegen-friendly Poisson weight: w = |{t : h ≥ t}| as a SUM OF
      // IFs over the 6 constant thresholds — the previous
      // size(filter(array(...), t -> h >= t)) is a higher-order
      // function Spark evaluates INTERPRETED per row (no whole-stage
      // codegen), which the r10 noop-write bench exposed as ~26 s of
      // the suite (count() had pruned the whole bootstrap under the old
      // action, timing it at 0.57 s)
      val wSum = poisT.map(t => s"IF(h >= ${t}L, 1, 0)").mkString(" + ")
      val o = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.col("o_orderkey").as("ok"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val weighted = o
        .select(F.col("segment"), F.col("ok"), F.col("cents"),
          F.explode(F.expr("sequence(0, 31)")).as("r"))
        .withColumn("h", Hashing.hash60(
          F.concat_ws(":", F.col("segment"), F.col("ok"),
            F.col("r").cast("string"))))
        .withColumn("w", F.expr(wSum))
      val means = weighted.groupBy("segment", "r")
        .agg(F.expr("sum(w * cents)").as("wc"),
          F.expr("sum(CAST(w AS BIGINT))").as("nw"))
        .select(F.col("segment"), F.col("r"),
          F.expr("CAST(CAST(wc AS DECIMAL(38,0)) * 1000000 div nw " +
            "AS BIGINT)").as("mean_micro"))
      val ranked = means.withColumn("rk", F.row_number().over(
        Window.partitionBy("segment").orderBy("mean_micro", "r")))
      val full = o.groupBy("segment")
        .agg(F.expr("CAST(sum(CAST(cents AS DECIMAL(38,0))) " +
          "* 1000000 div count(*) AS BIGINT)").as("mean_full_micro"))
      full.join(
        ranked.groupBy("segment").agg(
          F.max(F.when(F.col("rk") === 2, F.col("mean_micro")))
            .as("ci_lo_micro"),
          F.max(F.when(F.col("rk") === 31, F.col("mean_micro")))
            .as("ci_hi_micro")), "segment")
        .orderBy("segment")
    },
    Some(s"""
      WITH o AS (
        SELECT c_mktsegment AS segment, o_orderkey AS ok,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey),
      w AS (
        SELECT segment, cents, r,
               len(list_filter([${poisT.mkString(",")}], t ->
                 ${Hashing.hash60Sql(
                   "segment || ':' || CAST(ok AS VARCHAR) || ':' || CAST(r AS VARCHAR)")}
                 >= t)) AS w
        FROM o, unnest(generate_series(0, 31)) AS u(r)),
      m AS (
        SELECT segment, r,
               CAST(CAST(sum(w * cents) AS HUGEINT) * 1000000
                    // sum(w) AS BIGINT) AS mean_micro
        FROM w GROUP BY 1, 2),
      rk AS (
        SELECT segment, mean_micro,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY mean_micro, r) AS rk
        FROM m),
      f AS (
        SELECT segment,
               CAST(CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT)
                    * 1000000 // count(*) AS BIGINT) AS mean_full_micro
        FROM o GROUP BY 1)
      SELECT f.segment, mean_full_micro,
             CAST(max(CASE WHEN rk = 2 THEN mean_micro END) AS BIGINT)
               AS ci_lo_micro,
             CAST(max(CASE WHEN rk = 31 THEN mean_micro END) AS BIGINT)
               AS ci_hi_micro
      FROM f JOIN rk ON f.segment = rk.segment
      GROUP BY f.segment, mean_full_micro ORDER BY f.segment"""))

  // ----------------------------------------------------------------- M9
  /** Welch's two-sample t statistic (unequal variances) between two
    * deterministic cohorts (even vs odd order keys) per segment, from
    * EXACT integer sums — n/Σx/Σx² per cohort in one grouped pass,
    * then one closing double formula identical on both engines
    * (SURVEY §5 ratio discipline, round 6dp). The A/B significance
    * check beside C63's Wilson bounds. */
  private val ttestWelch = QueryDef(
    "ttest_welch",
    (s, d) => {
      val o = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.expr("o_orderkey % 2 = 0").as("is_a"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val sums = o.groupBy("segment").agg(
        F.expr("sum(CASE WHEN is_a THEN 1L ELSE 0L END)").as("na"),
        F.expr("sum(CASE WHEN is_a THEN cents ELSE 0L END)").as("sa"),
        F.expr("sum(CASE WHEN is_a THEN CAST(cents AS DECIMAL(38,0)) " +
          "* cents ELSE CAST(0 AS DECIMAL(38,0)) END)").as("qa"),
        F.expr("sum(CASE WHEN is_a THEN 0L ELSE 1L END)").as("nb"),
        F.expr("sum(CASE WHEN is_a THEN 0L ELSE cents END)").as("sb"),
        F.expr("sum(CASE WHEN is_a THEN CAST(0 AS DECIMAL(38,0)) " +
          "ELSE CAST(cents AS DECIMAL(38,0)) * cents END)").as("qb"))
      sums.select(F.col("segment"), F.col("na"), F.col("nb"),
        // sum×10⁶ through DECIMAL(38,0): per-segment cents sums are
        // unbounded int64 at design scale (§5 wide-product rule)
        F.expr("CAST(CAST(sa AS DECIMAL(38,0)) * 1000000 div na " +
          "AS BIGINT)").as("mean_a_micro"),
        F.expr("CAST(CAST(sb AS DECIMAL(38,0)) * 1000000 div nb " +
          "AS BIGINT)").as("mean_b_micro"),
        F.expr(
          "round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / " +
            "sqrt((CAST(CAST(na * qa - CAST(sa AS DECIMAL(38,0)) * sa " +
            "AS STRING) AS DOUBLE)) / (CAST(na AS DOUBLE) * na * (na - 1)) + " +
            "(CAST(CAST(nb * qb - CAST(sb AS DECIMAL(38,0)) * sb " +
            "AS STRING) AS DOUBLE)) / (CAST(nb AS DOUBLE) * nb * (nb - 1))), 6)")
          .as("t_stat"))
        .orderBy("segment")
    },
    Some("""
      WITH o AS (
        SELECT c_mktsegment AS segment, o_orderkey % 2 = 0 AS is_a,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey),
      s AS (
        SELECT segment,
               CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(sum(CASE WHEN is_a THEN cents ELSE 0 END) AS BIGINT) AS sa,
               sum(CASE WHEN is_a THEN CAST(cents AS HUGEINT) * cents
                        ELSE CAST(0 AS HUGEINT) END) AS qa,
               CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
               CAST(sum(CASE WHEN is_a THEN 0 ELSE cents END) AS BIGINT) AS sb,
               sum(CASE WHEN is_a THEN CAST(0 AS HUGEINT)
                        ELSE CAST(cents AS HUGEINT) * cents END) AS qb
        FROM o GROUP BY 1)
      SELECT segment, na, nb,
             CAST(CAST(sa AS HUGEINT) * 1000000 // na AS BIGINT)
               AS mean_a_micro,
             CAST(CAST(sb AS HUGEINT) * 1000000 // nb AS BIGINT)
               AS mean_b_micro,
             round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
                   sqrt((CAST(CAST(na * qa - CAST(sa AS HUGEINT) * sa
                          AS VARCHAR) AS DOUBLE)) /
                          (CAST(na AS DOUBLE) * na * (na - 1)) +
                        (CAST(CAST(nb * qb - CAST(sb AS HUGEINT) * sb
                          AS VARCHAR) AS DOUBLE)) /
                          (CAST(nb AS DOUBLE) * nb * (nb - 1))), 6)
               AS t_stat
      FROM s ORDER BY segment"""))

  // ---------------------------------------------------------------- C69
  /** ANSI first_value / last_value / nth_value with EXPLICIT frames —
    * the semantics engines and users most often get wrong: last_value
    * over the default frame (RANGE … CURRENT ROW) is the CURRENT row's
    * value, and only an explicit UNBOUNDED FOLLOWING frame yields the
    * partition's true last. Both variants published side by side, per
    * customer over their order history. */
  private val windowFirstLast = QueryDef(
    "window_first_last",
    (s, d) => {
      val o = t(s, d, "orders")
        .select(F.col("o_custkey").as("ck"), F.col("o_orderkey").as("ok"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val w = Window.partitionBy("ck").orderBy("ok")
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      o.select(F.col("ck"), F.col("ok"), F.col("cents"),
        F.first("cents").over(w).as("first_cents"),
        F.last("cents").over(w).as("last_default"),
        F.last("cents").over(wFull).as("last_full"),
        F.nth_value(F.col("cents"), 2).over(wFull).as("second_cents"))
        .where(F.col("ok") % 100 === 0) // bounded output, window still full
        .orderBy("ck", "ok")
    },
    Some("""
      WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
      wv AS (
        SELECT ck, ok, cents,
               first_value(cents) OVER
                 (PARTITION BY ck ORDER BY ok) AS first_cents,
               last_value(cents) OVER
                 (PARTITION BY ck ORDER BY ok) AS last_default,
               last_value(cents) OVER
                 (PARTITION BY ck ORDER BY ok
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS last_full,
               nth_value(cents, 2) OVER
                 (PARTITION BY ck ORDER BY ok
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS second_cents
        FROM o)
      SELECT * FROM wv WHERE ok % 100 = 0 ORDER BY ck, ok"""))

  // ---------------------------------------------------------------- C70
  /** 5%-trimmed mean of order value per segment — the robust location
    * estimate between the mean (0% breakdown) and median (50%): ranks
    * come from the VALUE-GROUPED cumulative count (C56's formulation,
    * frame bounded by distinct values), and each distinct value
    * contributes its rank-interval overlap with (5%n, 95%n] — pure
    * integer interval arithmetic, no row-level sort, exact micros. */
  private val trimmedMean = QueryDef(
    "trimmed_mean",
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
      cum
        .withColumn("kept", F.expr(
          "greatest(0L, least(cum, (n * 95) div 100) - " +
            "greatest(cum - c, (n * 5) div 100))"))
        .groupBy("segment")
        .agg(F.max("n").as("n"),
          F.expr("CAST(sum(kept) AS BIGINT)").as("n_kept"),
          F.expr("CAST(sum(CAST(kept AS DECIMAL(38,0)) * cents) " +
            "* 1000000 div sum(kept) AS BIGINT)").as("trimmed_mean_micro"),
          F.expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * cents) " +
            "* 1000000 div max(n) AS BIGINT)").as("mean_micro"))
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
      k AS (
        SELECT segment, cents, c, n,
               greatest(0, least(cum, (n * 95) // 100) -
                           greatest(cum - c, (n * 5) // 100)) AS kept
        FROM cu)
      SELECT segment, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(kept) AS BIGINT) AS n_kept,
             CAST(sum(CAST(kept AS HUGEINT) * cents) * 1000000
                  // sum(kept) AS BIGINT) AS trimmed_mean_micro,
             CAST(sum(CAST(c AS HUGEINT) * cents) * 1000000
                  // max(n) AS BIGINT) AS mean_micro
      FROM k GROUP BY segment ORDER BY segment"""))

  // ---------------------------------------------------------------- M10
  /** Post-stratified estimator: a systematic sample (o_orderkey ≡ 0
    * mod 7) re-weighted to the POPULATION's segment shares — the
    * standard correction when a sample's stratum mix drifted from the
    * frame it is meant to represent. Per-stratum means in exact
    * micros, the post-stratified total by integer cross-multiplication
    * N_h · mean_h through DECIMAL(38,0)/HUGEINT, published beside the
    * naive sample mean so the correction itself is visible. */
  private val postStratified = QueryDef(
    "post_stratified",
    (s, d) => {
      val o = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.col("o_orderkey").as("ok"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val strata = o.groupBy("segment").agg(
        F.count(F.lit(1)).as("n_pop"),
        F.expr("sum(CASE WHEN ok % 7 = 0 THEN 1L ELSE 0L END)")
          .as("n_samp"),
        F.expr("sum(CASE WHEN ok % 7 = 0 THEN cents ELSE 0L END)")
          .as("s_samp"))
      strata.agg(
        F.expr("CAST(sum(n_pop) AS BIGINT)").as("n_pop"),
        F.expr("CAST(sum(n_samp) AS BIGINT)").as("n_samp"),
        // cents sums × 10⁶ routed through DECIMAL(38,0) — unbounded
        // int64 sums at design scale (§5 wide-product rule)
        F.expr("CAST(CAST(sum(s_samp) AS DECIMAL(38,0)) * 1000000 " +
          "div sum(n_samp) AS BIGINT)").as("mean_naive_micro"),
        F.expr("CAST(sum(CAST(n_pop AS DECIMAL(38,0)) * " +
          "(CAST(s_samp AS DECIMAL(38,0)) * 1000000 div n_samp)) " +
          "div sum(n_pop) AS BIGINT)").as("mean_ps_micro"))
    },
    Some("""
      WITH o AS (
        SELECT c_mktsegment AS segment, o_orderkey AS ok,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey),
      st AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n_pop,
               CAST(sum(CASE WHEN ok % 7 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_samp,
               CAST(sum(CASE WHEN ok % 7 = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS s_samp
        FROM o GROUP BY 1)
      SELECT CAST(sum(n_pop) AS BIGINT) AS n_pop,
             CAST(sum(n_samp) AS BIGINT) AS n_samp,
             CAST(CAST(sum(s_samp) AS HUGEINT) * 1000000
                  // sum(n_samp) AS BIGINT) AS mean_naive_micro,
             CAST(sum(CAST(n_pop AS HUGEINT) *
                      (CAST(s_samp AS HUGEINT) * 1000000 // n_samp))
                  // sum(n_pop) AS BIGINT) AS mean_ps_micro
      FROM st"""))

  val all: Seq[QueryDef] = Seq(bootstrapCi, ttestWelch, windowFirstLast,
    trimmedMean, postStratified)
}
