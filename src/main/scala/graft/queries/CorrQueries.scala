package graft.queries

import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-46 inventory (r9): rank-correlation audits — the two standard
  * nonparametric association reads a distribution auditor runs next to
  * Pearson (C43 `corr_matrix`): Spearman's ρ over per-entity ranks and
  * Kendall's τ over group-level orderings. Both are exact-integer until
  * one closing double division (SURVEY §5 ratio rule).
  *
  * Reference scope: flycatcher validates schemas/columns (fields.py);
  * rank statistics are part of the analytics surface this engine adds
  * on top, same as the rest of the M suite. */
object CorrQueries {

  // ---------------------------------------------------------------- M31
  /** Per-nation Spearman rank correlation between customer order COUNT
    * and customer total SPEND. Ranks are row_number with custkey
    * tie-break (deterministic on both engines; spend is near-unique so
    * the tie-broken estimator matches textbook Spearman to the audit's
    * purpose), ρ = 1 − 6Σd²/(n(n²−1)).
    *
    * Scale shape — the r9 rfm pattern: BOTH per-nation rankings ride
    * ONE range shuffle. Each customer explodes into (dim, sort-value)
    * rows — dim 0 orders by count, dim 1 by spend — and the single
    * range partition on (dim, nationkey, sv, custkey) totals both
    * orders; per-(dim, nation) rank = global_rownumber − dim·N −
    * cum_before(nation), with the 25-row nation offsets built by a
    * broadcast self-join (no 25-row global window, keeping
    * WindowAuditSpec clean). No per-nation window means no nation-sized
    * partition skew at 100 TB. Σd² is widened through DECIMAL(38,0)/
    * HUGEINT (≤ n³ blows int64 at design scale) and surfaced via the
    * §5 string→double route. */
  private val spearmanCorr = QueryDef(
    "spearman_corr",
    (s, d) => {
      val per = t(s, d, "orders").groupBy(F.col("o_custkey").as("custkey"))
        .agg(F.count(F.lit(1)).as("f"),
          F.expr("CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE)")
            .as("m"))
      val base = per.join(
        t(s, d, "customer")
          .select(F.col("c_custkey").as("custkey"),
            F.col("c_nationkey").as("nationkey")),
        Seq("custkey"))
      val nTot = base.agg(F.count(F.lit(1)).as("n_tot"))
      val ncnt = base.groupBy("nationkey").agg(F.count(F.lit(1)).as("n_c"))
      // 25-row offset table: customers in nations with a smaller key.
      val offs = ncnt.toDF("nationkey", "n_c")
        .join(F.broadcast(ncnt.toDF("nk_b", "n_b")),
          F.col("nk_b") < F.col("nationkey"), "left")
        .groupBy("nationkey")
        .agg(F.coalesce(F.sum("n_b"), F.lit(0L)).as("cum_before"))
      val exploded = base
        .join(F.broadcast(offs), Seq("nationkey"))
        .crossJoin(F.broadcast(nTot))
        .select(F.col("custkey"), F.col("nationkey"), F.col("cum_before"),
          F.col("n_tot"),
          F.explode(F.array(
            F.struct(F.lit(0L).as("dim"), F.col("f").cast("double").as("sv")),
            F.struct(F.lit(1L).as("dim"), F.col("m").as("sv")))).as("t"))
        .select(F.col("custkey"), F.col("nationkey"), F.col("cum_before"),
          F.col("n_tot"), F.col("t.dim").as("dim"), F.col("t.sv").as("sv"))
      val ranked = graft.operators.DistRank.globalRowNumber(exploded,
        "_grn", F.col("dim").asc, F.col("nationkey").asc,
        F.col("sv").asc, F.col("custkey").asc)
        .withColumn("_rn", F.expr("_grn - dim * n_tot - cum_before"))
      ranked.groupBy("custkey", "nationkey")
        .agg(F.max(F.when(F.col("dim") === 0L, F.col("_rn"))).as("rf"),
          F.max(F.when(F.col("dim") === 1L, F.col("_rn"))).as("rm"))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).as("n_customers"),
          F.sum(F.expr("CAST((rf - rm) * (rf - rm) AS DECIMAL(38,0))"))
            .as("_sd2"))
        .select(F.col("nationkey"), F.col("n_customers"),
          F.expr("CAST(CAST(_sd2 AS STRING) AS DOUBLE)").as("sum_d2"),
          F.expr("""CASE WHEN n_customers < 2 THEN CAST(0.0 AS DOUBLE)
            ELSE round(
              CAST(CAST(CAST(n_customers AS DECIMAL(38,0)) * n_customers
                        * n_customers - n_customers - 6 * _sd2
                   AS STRING) AS DOUBLE)
              / CAST(CAST(CAST(n_customers AS DECIMAL(38,0)) * n_customers
                          * n_customers - n_customers
                     AS STRING) AS DOUBLE), 6) END""").as("rho"))
        .orderBy("nationkey")
    },
    Some("""
      WITH per AS (
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS f,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS m
        FROM orders GROUP BY 1),
      b AS (SELECT c.c_nationkey AS nationkey, p.custkey, p.f, p.m
            FROM per p JOIN customer c ON c.c_custkey = p.custkey),
      r AS (SELECT nationkey, custkey,
                   row_number() OVER (PARTITION BY nationkey
                     ORDER BY f, custkey) AS rf,
                   row_number() OVER (PARTITION BY nationkey
                     ORDER BY m, custkey) AS rm
            FROM b),
      agg AS (SELECT nationkey, CAST(count(*) AS BIGINT) AS n_customers,
                     sum(CAST((rf - rm) * (rf - rm) AS HUGEINT)) AS sd2
              FROM r GROUP BY 1)
      SELECT nationkey, n_customers,
             CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) AS sum_d2,
             CASE WHEN n_customers < 2 THEN CAST(0.0 AS DOUBLE)
                  ELSE round(
                    CAST(CAST(CAST(n_customers AS HUGEINT) * n_customers
                              * n_customers - n_customers - 6 * sd2
                         AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(CAST(n_customers AS HUGEINT) * n_customers
                                * n_customers - n_customers
                           AS VARCHAR) AS DOUBLE), 6) END AS rho
      FROM agg ORDER BY nationkey"""))

  // ---------------------------------------------------------------- M32
  /** Kendall's τ-a between two NATION-level orderings — total customer
    * spend vs order count. Pairwise concordance over the 25-row nation
    * aggregate: concordant when both orderings agree on a pair,
    * discordant when they invert, ties contribute 0 (τ-a). The
    * quadratic step is 25·24/2 pairs of a GROUP-level frame — bounded
    * by the grouping domain, never corpus rows, and the pair join
    * broadcasts one side (BroadcastNestedLoopJoin, PlanAuditSpec
    * clean). Spend stays DECIMAL(18,4) through the comparisons — exact
    * on both engines — and never reaches the output. */
  private val kendallTau = QueryDef(
    "kendall_tau",
    (s, d) => {
      val nat = t(s, d, "orders")
        .join(t(s, d, "customer")
          .select(F.col("c_custkey").as("custkey"),
            F.col("c_nationkey").as("nationkey")),
          F.col("o_custkey") === F.col("custkey"))
        .groupBy("nationkey")
        .agg(F.expr("sum(CAST(o_totalprice AS DECIMAL(18,4)))").as("x"),
          F.count(F.lit(1)).as("y"))
      val pairs = nat.toDF("na", "xa", "ya")
        .join(F.broadcast(nat.toDF("nb", "xb", "yb")),
          F.col("na") < F.col("nb"))
      val g = nat.agg(F.count(F.lit(1)).as("n_groups"))
      pairs.agg(
        F.coalesce(F.sum(F.when(
          (F.col("xa") > F.col("xb") && F.col("ya") > F.col("yb")) ||
            (F.col("xa") < F.col("xb") && F.col("ya") < F.col("yb")),
          1L).otherwise(0L)), F.lit(0L)).as("n_conc"),
        F.coalesce(F.sum(F.when(
          (F.col("xa") > F.col("xb") && F.col("ya") < F.col("yb")) ||
            (F.col("xa") < F.col("xb") && F.col("ya") > F.col("yb")),
          1L).otherwise(0L)), F.lit(0L)).as("n_disc"),
        F.count(F.lit(1)).as("n_pairs"))
        .crossJoin(F.broadcast(g))
        .select(F.col("n_groups"), F.col("n_pairs"),
          F.col("n_conc"), F.col("n_disc"),
          F.expr("""CASE WHEN n_pairs = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE round((n_conc - n_disc) / CAST(n_pairs AS DOUBLE), 6)
            END""").as("tau"))
        .orderBy("n_groups")
    },
    Some("""
      WITH nat AS (
        SELECT c.c_nationkey AS nationkey,
               sum(CAST(o_totalprice AS DECIMAL(18,4))) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1),
      p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
            FROM nat a JOIN nat b ON a.nationkey < b.nationkey),
      agg AS (SELECT
        CAST(coalesce(sum(CASE WHEN (xa > xb AND ya > yb)
                                 OR (xa < xb AND ya < yb)
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_conc,
        CAST(coalesce(sum(CASE WHEN (xa > xb AND ya < yb)
                                 OR (xa < xb AND ya > yb)
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_disc,
        CAST(count(*) AS BIGINT) AS n_pairs
        FROM p),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_groups FROM nat)
      SELECT n_groups, n_pairs, n_conc, n_disc,
             CASE WHEN n_pairs = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE round((n_conc - n_disc) / CAST(n_pairs AS DOUBLE), 6)
                  END AS tau
      FROM agg, g ORDER BY n_groups"""))

  // ---------------------------------------------------------------- M47
  /** Lead-lag cross-correlation between the urgent and high daily
    * revenue series over the full 1995 calendar grid (days without an
    * arm's orders count 0 — the deterministic zero-fill any aligned
    * series needs): Pearson r(x_t, y_{t+ℓ}) for lags −7..+7, the "does
    * one series LEAD the other" read beside C43's same-time Pearson
    * and the M31/M32 rank correlations. Exact integer moments per lag
    * (n, Σx, Σy, Σxy, Σx², Σy² over DECIMAL(38,0)/HUGEINT — daily-cent
    * squares overflow int64 at design scale), numerator and BOTH
    * variance terms string-routed to exact doubles, one closing
    * division; zero-variance lags guard to 0.
    *
    * Scale shape: one corpus aggregate to the 365-row calendar frame;
    * the ±7-lag self-join and all moments are calendar-bounded
    * metadata. */
  private val crossCorrelation = QueryDef(
    "cross_correlation",
    (s, d) => {
      val daily = t(s, d, "orders")
        .where(F.year(F.col("o_orderdate")) === 1995 &&
          F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(F.datediff(F.to_date(F.col("o_orderdate")),
          F.lit("1995-01-01")).cast("long").as("t"))
        .agg(
          F.expr("CAST(coalesce(sum(CASE WHEN o_orderpriority = " +
            "'1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,4)) END)" +
            " * 100, 0) AS BIGINT)").as("x"),
          F.expr("CAST(coalesce(sum(CASE WHEN o_orderpriority = " +
            "'2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,4)) END)" +
            " * 100, 0) AS BIGINT)").as("y"))
      val grid = s.range(365).select(F.col("id").as("t"))
        .join(daily, Seq("t"), "left").na.fill(0L, Seq("x", "y"))
      val lags = s.range(15).select((F.col("id") - 7).as("lag"))
      val paired = F.broadcast(lags)
        .join(grid.select(F.col("t"), F.col("x")),
          F.lit(true))
        .join(grid.select(F.col("t").as("_t2"), F.col("y")),
          F.expr("_t2 = t + lag"))
      paired.groupBy("lag")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("x").cast("decimal(38,0)")).as("_sx"),
          F.sum(F.col("y").cast("decimal(38,0)")).as("_sy"),
          F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).as("_sxy"),
          F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).as("_sxx"),
          F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).as("_syy"))
        .select(F.col("lag"), F.col("n"),
          F.expr("""CASE WHEN n * _sxx - _sx * _sx <= 0
            |         OR n * _syy - _sy * _sy <= 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round(
            |  CAST(CAST(n * _sxy - _sx * _sy AS STRING) AS DOUBLE)
            |  / sqrt(CAST(CAST(n * _sxx - _sx * _sx AS STRING) AS DOUBLE)
            |         * CAST(CAST(n * _syy - _sy * _sy AS STRING)
            |                AS DOUBLE)), 6) END""".stripMargin).as("r"))
        .orderBy("lag")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) * 100, 0)
                 AS BIGINT) AS x,
               CAST(coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH'
                 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) * 100, 0)
                 AS BIGINT) AS y
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1995
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY 1),
      grid AS (
        SELECT CAST(g.t AS BIGINT) AS t, coalesce(d.x, 0) AS x,
               coalesce(d.y, 0) AS y
        FROM generate_series(0, 364) AS g(t)
        LEFT JOIN daily d ON d.t = g.t),
      paired AS (
        SELECT CAST(l.lag AS BIGINT) AS lag, a.x, b.y
        FROM generate_series(-7, 7) AS l(lag)
        JOIN grid a ON true
        JOIN grid b ON b.t = a.t + l.lag),
      m AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM paired GROUP BY 1)
      SELECT lag, n,
             CASE WHEN n * sxx - sx * sx <= 0
                    OR n * syy - sy * sy <= 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(
                 CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                 / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(n * syy - sy * sy AS VARCHAR)
                               AS DOUBLE)), 6) END AS r
      FROM m ORDER BY lag"""))

  def all: Seq[QueryDef] = Seq(spearmanCorr, kendallTau, crossCorrelation)
}
