package graft.queries

import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-47 inventory (r10): the nonparametric / classical test-statistic
  * trio a distribution auditor runs beside the rank correlations (M31/
  * M32) — Mann-Whitney U between two treatment arms, one-way ANOVA F
  * across groups, and Cramér's V between two categoricals. All three
  * follow the §5 exactness discipline: integer/decimal arithmetic end
  * to end, ONE closing double division (via the string→double route),
  * and — where a statistic needs an intermediate per-group division —
  * the deterministic FLOOR form `(a - a % b) / b` that both engines
  * compute identically (Spark decimal division of an exactly-divisible
  * value is exact; DuckDB `//` is the same floor).
  *
  * Reference scope: flycatcher validates schemas/columns (fields.py);
  * test statistics are part of the analytics surface this engine adds
  * on top, same as the rest of the M suite. */
object NonparamQueries {

  // ---------------------------------------------------------------- M33
  /** Mann-Whitney U (Wilcoxon rank-sum) between returned ('R') and
    * pending ('N') line items on quantity — the standard two-sample
    * location test when normality is off the table. Ranks are exact
    * tie-corrected MIDRANKS (quantity has 50 distinct values over 400 k
    * rows — the tie correction is the whole game here), computed
    * DISTRIBUTIVELY: group by distinct value (map-side combined), one
    * [[graft.operators.DistRank.globalCumSum]] range shuffle for the
    * cumulative count below each value, midrank = cum_before +
    * (cnt+1)/2. Everything rides ×2 so midranks stay integral
    * (midrank2 = 2·cum − cnt + 1); rank sums and the tie term Σ(t³−t)
    * widen through DECIMAL(38,0)/HUGEINT. Published: U₁, the
    * rank-biserial effect size 1 − 2U₁/(n₁n₂), and the tie-corrected
    * normal approximation z = (U₁ − n₁n₂/2)/σ with
    * σ² = n₁n₂[(n³−n) − Σ(t³−t)]/(12n(n−1)).
    *
    * Scale shape: the distinct-value frame is |value domain| rows (50
    * here, could be millions for continuous values — the cumsum is the
    * scale-safe replacement for a global ORDER BY window); the corpus
    * pass is one map-side-combined aggregate. */
  private val mannWhitney = QueryDef(
    "mann_whitney",
    (s, d) => {
      val vals = t(s, d, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(F.col("l_quantity").cast("long").as("q"),
          F.when(F.col("l_returnflag") === "R", 1L).otherwise(0L).as("i1"))
        .groupBy("q")
        .agg(F.sum("i1").as("n1v"),
          F.sum(F.expr("1 - i1")).as("n2v"),
          F.count(F.lit(1)).as("cnt"))
      val cum = graft.operators.DistRank.globalCumSum(
        vals, "cnt", "cum", F.col("q").asc)
      cum.agg(
        F.sum("n1v").cast("long").as("n1"),
          F.sum("n2v").cast("long").as("n2"),
          F.sum(F.expr("CAST(n1v AS DECIMAL(38,0)) * (2 * cum - cnt + 1)"))
            .as("_r1_2x"),
          F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt"))
            .as("_tie"))
        .withColumn("_n", F.expr("n1 + n2"))
        .withColumn("_u1_2x",
          F.expr("_r1_2x - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)"))
        .withColumn("_va", F.expr(
          """CAST(n1 AS DECIMAL(38,0)) * n2 *
            |(CAST(_n AS DECIMAL(38,0)) * _n * _n - _n - _tie)""".stripMargin))
        .select(F.col("n1"), F.col("n2"),
          F.expr("CAST(CAST(_u1_2x AS STRING) AS DOUBLE) / 2").as("u1"),
          F.expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(n1 AS DOUBLE) * n2
            |         - CAST(CAST(_u1_2x AS STRING) AS DOUBLE))
            |        / (CAST(n1 AS DOUBLE) * n2), 6) END""".stripMargin)
            .as("rank_biserial"),
          F.expr("""CASE WHEN _va <= 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(CAST(_u1_2x AS STRING) AS DOUBLE)
            |        - CAST(n1 AS DOUBLE) * n2)
            |      / (2 * sqrt(CAST(CAST(_va AS STRING) AS DOUBLE)
            |                  / (12.0 * _n * (_n - 1)))), 6) END""".stripMargin)
            .as("z"))
        .orderBy("n1")
    },
    Some("""
      WITH v AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1v,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      c AS (SELECT q, n1v, n2v, cnt,
                   CAST(sum(cnt) OVER (ORDER BY q) AS BIGINT) AS cum
            FROM v),
      a AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
                   CAST(sum(n2v) AS BIGINT) AS n2,
                   sum(CAST(n1v AS HUGEINT) * (2 * cum - cnt + 1)) AS r1_2x,
                   sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
            FROM c),
      b AS (SELECT n1, n2, n1 + n2 AS n,
                   r1_2x - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1_2x,
                   CAST(n1 AS HUGEINT) * n2 *
                     (CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2)
                      - (n1 + n2) - tie_t) AS va
            FROM a)
      SELECT n1, n2,
             CAST(CAST(u1_2x AS VARCHAR) AS DOUBLE) / 2 AS u1,
             CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(n1 AS DOUBLE) * n2
                       - CAST(CAST(u1_2x AS VARCHAR) AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) * n2), 6) END AS rank_biserial,
             CASE WHEN va <= 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(CAST(u1_2x AS VARCHAR) AS DOUBLE)
                       - CAST(n1 AS DOUBLE) * n2)
                     / (2 * sqrt(CAST(CAST(va AS VARCHAR) AS DOUBLE)
                                 / (12.0 * n * (n - 1)))), 6) END AS z
      FROM b ORDER BY n1"""))

  // ---------------------------------------------------------------- M34
  /** One-way ANOVA F across order priorities on order value — the "is
    * any group's mean different" gate run before pairwise tests. Values
    * go to integer MYRIACENTS (DECIMAL(18,4) × 10⁴ — the engines' one
    * proven double→decimal agreement point), so Σx, Σx² per group are
    * exact integers; the per-group S_g²/n_g terms use the deterministic
    * floor form (error ≤ 1 myriacent² per group, identical on both
    * engines), and SSB/SSW stay exact DECIMAL(38,0) integers until the
    * closing F division. One map-side-combined aggregate over the fact
    * table; the k-row group frame carries everything else. */
  private val anovaF = QueryDef(
    "anova_f",
    (s, d) => {
      val g = t(s, d, "orders")
        .select(F.col("o_orderpriority").as("grp"),
          F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000" +
            " AS DECIMAL(19,0))").as("x"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).as("n_g"),
          F.sum(F.col("x").cast("decimal(38,0)")).as("s_g"),
          F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).as("q_g"))
        .withColumn("_s2", F.expr("s_g * s_g"))
        .withColumn("_bg",
          F.expr("CAST((_s2 - _s2 % n_g) / n_g AS DECIMAL(38,0))"))
      g.agg(F.count(F.lit(1)).as("k_groups"),
          F.sum("n_g").cast("long").as("n_rows"),
          F.sum("s_g").as("_s"), F.sum("q_g").as("_q"), F.sum("_bg").as("_b"))
        .withColumn("_s2t", F.expr("_s * _s"))
        .withColumn("_ssb",
          F.expr("_b - CAST((_s2t - _s2t % n_rows) / n_rows" +
            " AS DECIMAL(38,0))"))
        .withColumn("_ssw", F.expr("_q - _b"))
        .select(F.col("k_groups"), F.col("n_rows"),
          // no round(): at ~1e14 dollar² both engines' round-to-6
          // multiplies past the 53-bit mantissa and diverges by an ulp;
          // the raw IEEE division of identical inputs is deterministic
          F.expr("CAST(CAST(_ssb AS STRING) AS DOUBLE) / 1e8").as("ssb"),
          F.expr("CAST(CAST(_ssw AS STRING) AS DOUBLE) / 1e8").as("ssw"),
          F.expr("""CASE WHEN _ssw <= 0 OR k_groups < 2 OR n_rows <= k_groups
            |THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(CAST(_ssb AS STRING) AS DOUBLE) * (n_rows - k_groups))
            |      / (CAST(CAST(_ssw AS STRING) AS DOUBLE) * (k_groups - 1)),
            |      6) END""".stripMargin).as("f_stat"),
          // η² = SSB/SST — the variance-explained EFFECT SIZE the F's
          // significance answers for (r13, the r12 verdict's "how big"
          // theme): exact integer ratio in ppm, one integral division
          F.expr("""CASE WHEN _ssb + _ssw <= 0 THEN 0L ELSE
            |CAST(_ssb * 1000000 div (_ssb + _ssw) AS BIGINT) END"""
            .stripMargin).as("eta_sq_ppm"))
        .orderBy("k_groups")
    },
    Some("""
      WITH g AS (
        SELECT o_orderpriority AS grp,
               CAST(count(*) AS BIGINT) AS n_g,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                        AS HUGEINT)) AS s_g,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                        AS HUGEINT)
                   * CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                          AS HUGEINT)) AS q_g
        FROM orders GROUP BY 1),
      b AS (SELECT grp, n_g, s_g, q_g, (s_g * s_g) // n_g AS b_g FROM g),
      a AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
                   CAST(sum(n_g) AS BIGINT) AS n_rows,
                   sum(s_g) AS s_tot, sum(q_g) AS q_tot, sum(b_g) AS b_tot
            FROM b),
      f AS (SELECT k_groups, n_rows,
                   b_tot - (s_tot * s_tot) // n_rows AS ssb_x,
                   q_tot - b_tot AS ssw_x
            FROM a)
      SELECT k_groups, n_rows,
             CAST(CAST(ssb_x AS VARCHAR) AS DOUBLE) / 1e8 AS ssb,
             CAST(CAST(ssw_x AS VARCHAR) AS DOUBLE) / 1e8 AS ssw,
             CASE WHEN ssw_x <= 0 OR k_groups < 2 OR n_rows <= k_groups
               THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(CAST(ssb_x AS VARCHAR) AS DOUBLE)
                       * (n_rows - k_groups))
                     / (CAST(CAST(ssw_x AS VARCHAR) AS DOUBLE)
                        * (k_groups - 1)), 6) END AS f_stat,
             CASE WHEN ssb_x + ssw_x <= 0 THEN 0 ELSE
               CAST(ssb_x * 1000000 // (ssb_x + ssw_x) AS BIGINT)
             END AS eta_sq_ppm
      FROM f ORDER BY k_groups"""))

  // ---------------------------------------------------------------- M35
  /** Cramér's V between order priority and customer market segment —
    * the [0,1] normalization of χ² that makes categorical association
    * comparable across tables (C47 publishes the per-cell terms; this
    * is the one-number summary a datacard carries). χ² itself is summed
    * as exact INTEGER MICROS: per cell, (obs·N − nr·nc)²·10⁶ floor-
    * divided by (N·nr·nc) — all DECIMAL(38,0)/HUGEINT, no cross-cell
    * double summation whose order could differ between engines. Margins
    * broadcast (|priorities| × |segments| cells is metadata); the fact
    * table aggregates once, map-side combined. The scoring frame is the
    * FULL row×column grid (margin cross join, left join to observed
    * cells): a zero-observed cell still contributes its expected count
    * (0·N − nr·nc)²/(N·nr·nc) to χ² — summing only populated cells
    * understates the statistic whenever any cell is empty. */
  private val cramersV = QueryDef(
    "cramers_v",
    (s, d) => {
      val cells = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("o_orderpriority").as("priority"),
          F.col("c_mktsegment").as("segment"))
        .agg(F.count(F.lit(1)).as("n"))
      val rows = cells.groupBy("priority")
        .agg(F.sum("n").cast("long").as("nr"))
      val colsT = cells.groupBy("segment")
        .agg(F.sum("n").cast("long").as("nc"))
      val total = cells.agg(F.sum("n").cast("long").as("nt"))
      val rcnt = rows.agg(F.count(F.lit(1)).as("r_levels"))
      val ccnt = colsT.agg(F.count(F.lit(1)).as("c_levels"))
      rows.crossJoin(F.broadcast(colsT)) // margin frames: metadata-sized
        .join(cells, Seq("priority", "segment"), "left")
        .na.fill(0L, Seq("n"))
        .crossJoin(F.broadcast(total))
        .withColumn("_dev",
          F.expr("CAST(n AS DECIMAL(38,0)) * nt" +
            " - CAST(nr AS DECIMAL(38,0)) * nc"))
        .withColumn("_num", F.expr("_dev * _dev * 1000000"))
        .withColumn("_den", F.expr("CAST(nt AS DECIMAL(38,0)) * nr * nc"))
        .withColumn("_term",
          F.expr("CAST((_num - _num % _den) / _den AS DECIMAL(38,0))"))
        .groupBy("nt")
        .agg(F.sum("_term").as("_chi2_micro"))
        .crossJoin(F.broadcast(rcnt))
        .crossJoin(F.broadcast(ccnt))
        .select(F.col("nt").as("n_rows"), F.col("r_levels"),
          F.col("c_levels"),
          F.expr("round(CAST(CAST(_chi2_micro AS STRING) AS DOUBLE) / 1e6, 6)")
            .as("chi2"),
          F.expr("""CASE WHEN least(r_levels, c_levels) < 2
            |THEN CAST(0.0 AS DOUBLE) ELSE
            |round(sqrt((CAST(CAST(_chi2_micro AS STRING) AS DOUBLE) / 1e6)
            |           / (CAST(nt AS DOUBLE)
            |              * (least(r_levels, c_levels) - 1))), 6)
            |END""".stripMargin).as("cramers_v"))
        .orderBy("n_rows")
    },
    Some("""
      WITH cells AS (
        SELECT o_orderpriority AS priority, c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      r AS (SELECT priority, CAST(sum(n) AS BIGINT) AS nr
            FROM cells GROUP BY 1),
      c AS (SELECT segment, CAST(sum(n) AS BIGINT) AS nc
            FROM cells GROUP BY 1),
      tt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
      grid AS (SELECT priority, segment, nr, nc,
                      CAST(coalesce(cells.n, 0) AS BIGINT) AS n
               FROM r CROSS JOIN c
               LEFT JOIN cells USING (priority, segment)),
      term AS (SELECT
          ((CAST(n AS HUGEINT) * nt - CAST(nr AS HUGEINT) * nc)
           * (CAST(n AS HUGEINT) * nt - CAST(nr AS HUGEINT) * nc)
           * 1000000) // (CAST(nt AS HUGEINT) * nr * nc) AS t_micro
        FROM grid, tt),
      s AS (SELECT sum(t_micro) AS chi2_micro FROM term),
      lv AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS r_levels,
                    (SELECT CAST(count(*) AS BIGINT) FROM c) AS c_levels)
      SELECT nt AS n_rows, r_levels, c_levels,
             round(CAST(CAST(chi2_micro AS VARCHAR) AS DOUBLE) / 1e6, 6)
               AS chi2,
             CASE WHEN least(r_levels, c_levels) < 2
               THEN CAST(0.0 AS DOUBLE) ELSE
               round(sqrt((CAST(CAST(chi2_micro AS VARCHAR) AS DOUBLE) / 1e6)
                          / (CAST(nt AS DOUBLE)
                             * (least(r_levels, c_levels) - 1))), 6)
             END AS cramers_v
      FROM s, tt, lv ORDER BY n_rows"""))

  // ---------------------------------------------------------------- M36
  /** Exact two-sample Kolmogorov-Smirnov between the same two arms as
    * M33 (returned vs pending quantities) — the distribution-shape
    * complement to Mann-Whitney's location test (M4's ks_drift tracks
    * the statistic over time windows; this is the one-shot two-sample
    * form with the exact sup location). ENTIRELY integer until the
    * closing divisions: over the value domain, the sup distance
    * numerator is max_v |cum1(v)·n₂ − cum2(v)·n₁| — cumulative counts
    * from the same DistRank.globalCumSum range-shuffle pattern as M33
    * (two domain-frame cumsums, never a global row window), the argmax
    * location tie-broken to the smallest value via min(struct). D and
    * the asymptotic z = D·√(n₁n₂/(n₁+n₂)) are each one closing double. */
  private val ks2Sample = QueryDef(
    "ks_2sample",
    (s, d) => {
      val vals = t(s, d, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(F.col("l_quantity").cast("long").as("q"),
          F.when(F.col("l_returnflag") === "R", 1L).otherwise(0L).as("i1"))
        .groupBy("q")
        .agg(F.sum("i1").as("n1v"),
          F.sum(F.expr("1 - i1")).as("n2v"),
          F.count(F.lit(1)).as("cnt"))
      val tot = vals.agg(F.sum("n1v").cast("long").as("n1"),
        F.sum("n2v").cast("long").as("n2"))
      // fused DistRank pass (r15, §2.4): both cumulative counts in ONE
      // range shuffle + sort instead of two chained passes
      val cum = graft.operators.DistRank.globalCumSumsRowNumber(
        vals, Seq("n1v" -> "cum1", "cnt" -> "cumt"), None, F.col("q").asc)
      // cum1·n2 scales as n²: widen through DECIMAL(38,0) (Spark wraps
      // int64 silently; DuckDB raises — the engines would diverge) and
      // surface via the §5 string→double route; guard the n1·n2
      // denominators against an empty arm like mann_whitney's z
      cum.crossJoin(F.broadcast(tot))
        .withColumn("_dn",
          F.expr("abs(CAST(cum1 AS DECIMAL(38,0)) * n2" +
            " - (CAST(cumt AS DECIMAL(38,0)) - cum1) * n1)"))
        .groupBy("n1", "n2")
        .agg(F.min(F.struct(F.negate(F.col("_dn")).as("nd"), F.col("q")))
          .as("_b"))
        .select(F.col("n1"), F.col("n2"),
          F.expr("_b.q").as("ks_at"),
          F.expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round(CAST(CAST(-_b.nd AS STRING) AS DOUBLE)
            |      / (CAST(n1 AS DOUBLE) * n2), 6) END""".stripMargin)
            .as("ks_d"),
          F.expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round(CAST(CAST(-_b.nd AS STRING) AS DOUBLE)
            |      / (CAST(n1 AS DOUBLE) * n2)
            |      * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6) END"""
            .stripMargin).as("ks_z"))
        .orderBy("n1")
    },
    Some("""
      WITH v AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1v,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      tot AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
                     CAST(sum(n2v) AS BIGINT) AS n2 FROM v),
      c AS (SELECT q,
                   CAST(sum(n1v) OVER (ORDER BY q) AS BIGINT) AS cum1,
                   CAST(sum(cnt) OVER (ORDER BY q) AS BIGINT) AS cumt
            FROM v),
      dn AS (SELECT q,
                    abs(CAST(cum1 AS HUGEINT) * n2
                        - (CAST(cumt AS HUGEINT) - cum1) * n1) AS d,
                    n1, n2
             FROM c, tot),
      best AS (SELECT n1, n2, q, d FROM (
                 SELECT n1, n2, q, d,
                        row_number() OVER (ORDER BY d DESC, q) AS rn
                 FROM dn) WHERE rn = 1)
      SELECT n1, n2, q AS ks_at,
             CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round(CAST(CAST(d AS VARCHAR) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * n2), 6) END AS ks_d,
             CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round(CAST(CAST(d AS VARCHAR) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * n2)
                     * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6)
             END AS ks_z
      FROM best ORDER BY n1"""))

  // ---------------------------------------------------------------- M37
  /** Brown-Forsythe (median-centered Levene) variance-homogeneity test
    * across all three return flags on extended price — the gate run
    * BEFORE trusting M34's equal-variance assumption. Two corpus
    * passes: (1) per-flag discrete lower median via a flag-partitioned
    * cumulative window over the (flag, cents)-DOMAIN frame (domain
    * rows through the 3-partition window, never raw rows — the
    * C56/C51 median discipline); (2) absolute deviations
    * z = |cents − med_flag| are exact integers, and the one-way F on
    * them reuses M34's machinery verbatim — Σz/Σz² exact, S_g²/n_g by
    * the deterministic floor form, SSB/SSW exact DECIMAL(38,0),
    * unrounded ssb/ssw, one closing F division. */
  private val leveneBf = QueryDef(
    "levene_bf",
    (s, d) => {
      val li = t(s, d, "lineitem").select(
        F.col("l_returnflag").as("flag"),
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val dom = li.groupBy("flag", "cents").agg(F.count(F.lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("cents")
      val med = dom
        .withColumn("_cum", F.sum("c").over(w))
        .withColumn("_tot",
          F.sum("c").over(org.apache.spark.sql.expressions.Window
            .partitionBy("flag")))
        .groupBy("flag")
        .agg(F.min(F.when(F.expr("2 * _cum >= _tot"), F.col("cents")))
          .as("med"))
      val g = li.join(F.broadcast(med), "flag")
        .select(F.col("flag"), F.expr("abs(cents - med)").as("z"))
        .groupBy("flag")
        .agg(F.count(F.lit(1)).as("n_g"),
          F.sum(F.col("z").cast("decimal(38,0)")).as("s_g"),
          F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z")).as("q_g"))
        .withColumn("_s2", F.expr("s_g * s_g"))
        .withColumn("_bg",
          F.expr("CAST((_s2 - _s2 % n_g) / n_g AS DECIMAL(38,0))"))
      g.agg(F.count(F.lit(1)).as("k_groups"),
          F.sum("n_g").cast("long").as("n_rows"),
          F.sum("s_g").as("_s"), F.sum("q_g").as("_q"), F.sum("_bg").as("_b"))
        .withColumn("_s2t", F.expr("_s * _s"))
        .withColumn("_ssb",
          F.expr("_b - CAST((_s2t - _s2t % n_rows) / n_rows" +
            " AS DECIMAL(38,0))"))
        .withColumn("_ssw", F.expr("_q - _b"))
        .select(F.col("k_groups"), F.col("n_rows"),
          F.expr("CAST(CAST(_ssb AS STRING) AS DOUBLE) / 1e4").as("ssb"),
          F.expr("CAST(CAST(_ssw AS STRING) AS DOUBLE) / 1e4").as("ssw"),
          F.expr("""CASE WHEN _ssw <= 0 OR k_groups < 2 OR n_rows <= k_groups
            |THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(CAST(_ssb AS STRING) AS DOUBLE) * (n_rows - k_groups))
            |      / (CAST(CAST(_ssw AS STRING) AS DOUBLE) * (k_groups - 1)),
            |      6) END""".stripMargin).as("f_stat"))
        .orderBy("k_groups")
    },
    Some("""
      WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
      dom AS (SELECT flag, cents, CAST(count(*) AS BIGINT) AS c
              FROM li GROUP BY 1, 2),
      cw AS (SELECT flag, cents,
                    CAST(sum(c) OVER (PARTITION BY flag ORDER BY cents)
                         AS BIGINT) AS cum,
                    CAST(sum(c) OVER (PARTITION BY flag) AS BIGINT) AS tot
             FROM dom),
      med AS (SELECT flag,
                     min(CASE WHEN 2 * cum >= tot THEN cents END) AS med
              FROM cw GROUP BY 1),
      g AS (SELECT li.flag,
                   CAST(count(*) AS BIGINT) AS n_g,
                   sum(CAST(abs(cents - med) AS HUGEINT)) AS s_g,
                   sum(CAST(abs(cents - med) AS HUGEINT)
                       * abs(cents - med)) AS q_g
            FROM li JOIN med ON li.flag = med.flag GROUP BY 1),
      b AS (SELECT flag, n_g, s_g, q_g, (s_g * s_g) // n_g AS b_g FROM g),
      a AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
                   CAST(sum(n_g) AS BIGINT) AS n_rows,
                   sum(s_g) AS s_tot, sum(q_g) AS q_tot, sum(b_g) AS b_tot
            FROM b),
      f AS (SELECT k_groups, n_rows,
                   b_tot - (s_tot * s_tot) // n_rows AS ssb_x,
                   q_tot - b_tot AS ssw_x
            FROM a)
      SELECT k_groups, n_rows,
             CAST(CAST(ssb_x AS VARCHAR) AS DOUBLE) / 1e4 AS ssb,
             CAST(CAST(ssw_x AS VARCHAR) AS DOUBLE) / 1e4 AS ssw,
             CASE WHEN ssw_x <= 0 OR k_groups < 2 OR n_rows <= k_groups
               THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(CAST(ssb_x AS VARCHAR) AS DOUBLE)
                       * (n_rows - k_groups))
                     / (CAST(CAST(ssw_x AS VARCHAR) AS DOUBLE)
                        * (k_groups - 1)), 6) END AS f_stat
      FROM f ORDER BY k_groups"""))

  // ---------------------------------------------------------------- M38
  /** Kruskal-Wallis H across all order priorities on order value — the
    * k-sample rank analog of M34's ANOVA F (the test to reach for when
    * M37's variance gate or plain non-normality rules the F out), and
    * the k-group generalization of M33's machinery: the SAME exact
    * tie-corrected midranks from ONE DistRank.globalCumSum range
    * shuffle over the value DOMAIN, midranks carried ×2 so they stay
    * integral. Values go to integer myriacents (DECIMAL(18,4) × 10⁴ —
    * the engines' one proven double→decimal agreement point, M34's
    * discipline). Per group, the rank-sum term R_g²/n_g = R2_g²/(4n_g)
    * splits into the exact integer quotient (deterministic floor form
    * on DECIMAL(38,0)/HUGEINT — R2² ~ N⁴, int64 is gone by sf0.1) PLUS
    * the remainder floor-divided at micro precision: a bare floor
    * drops up to 1 per group, visible at small N (the property test
    * caught it); the micro correction bounds the bias at k·10⁻⁶ with
    * no overflow (remainder < 4N). H = 12·ΣR_g²/n_g/(N(N+1)) − 3(N+1)
    * and the tie correction 1 − Σ(t³−t)/(N³−N) are each closing doubles
    * from string-routed exact integers.
    *
    * Scale shape: one map-side-combined pass to the (group, value)
    * frame, one domain-sized cumsum, k-row finish — never a global
    * row-level rank window. */
  private val kruskalWallis = QueryDef(
    "kruskal_wallis",
    (s, d) => {
      val vals = t(s, d, "orders")
        .select(F.col("o_orderpriority").as("grp"),
          F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000" +
            " AS BIGINT)").as("v"))
        .groupBy("grp", "v").agg(F.count(F.lit(1)).as("n_gv"))
      val dom = vals.groupBy("v").agg(F.sum("n_gv").cast("long").as("cnt"))
      val cum = graft.operators.DistRank.globalCumSum(
        dom, "cnt", "cum", F.col("v").asc)
      val ties = cum.agg(
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt"))
          .as("_tie"))
      val g = vals.join(cum, "v")
        .groupBy("grp")
        .agg(F.sum("n_gv").cast("long").as("n_g"),
          F.sum(F.expr("CAST(n_gv AS DECIMAL(38,0)) * (2 * cum - cnt + 1)"))
            .as("_r2"))
        .withColumn("_r2sq", F.expr("_r2 * _r2"))
        .withColumn("_den4", F.expr("4 * n_g"))
        .withColumn("_sg", F.expr(
          "CAST((_r2sq - _r2sq % _den4) / _den4 AS DECIMAL(38,0))"))
        .withColumn("_rm", F.expr(
          "CAST(_r2sq % _den4 AS DECIMAL(38,0)) * 1000000"))
        .withColumn("_cg", F.expr(
          "CAST((_rm - _rm % _den4) / _den4 AS BIGINT)"))
      g.agg(F.count(F.lit(1)).as("k_groups"),
          F.sum("n_g").cast("long").as("n_rows"),
          F.sum("_sg").as("_s"),
          F.sum("_cg").cast("long").as("_cc"))
        .crossJoin(F.broadcast(ties))
        .withColumn("_h", F.expr(
          """(CAST(CAST(_s AS STRING) AS DOUBLE) * 12
            | + CAST(_cc AS DOUBLE) * 12 / 1000000)
            |/ (CAST(n_rows AS DOUBLE) * (n_rows + 1)) - 3 * (n_rows + 1)"""
            .stripMargin))
        .withColumn("_c", F.expr(
          """1 - CAST(CAST(_tie AS STRING) AS DOUBLE)
            |/ (CAST(n_rows AS DOUBLE) * n_rows * n_rows - n_rows)"""
            .stripMargin))
        .select(F.col("k_groups"), F.col("n_rows"),
          F.expr("""CASE WHEN k_groups < 2 OR n_rows <= k_groups
            |THEN CAST(0.0 AS DOUBLE) ELSE round(_h, 6) END""".stripMargin)
            .as("h_stat"),
          F.expr("""CASE WHEN k_groups < 2 OR n_rows <= k_groups OR _c <= 0
            |THEN CAST(0.0 AS DOUBLE) ELSE round(_h / _c, 6) END"""
            .stripMargin).as("h_corrected"))
        .orderBy("k_groups")
    },
    Some("""
      WITH v AS (
        SELECT o_orderpriority AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                 AS v,
               CAST(count(*) AS BIGINT) AS n_gv
        FROM orders GROUP BY 1, 2),
      dom AS (SELECT v, CAST(sum(n_gv) AS BIGINT) AS cnt FROM v GROUP BY 1),
      c AS (SELECT v, cnt,
                   CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
            FROM dom),
      tie AS (SELECT sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_t
              FROM dom),
      g AS (SELECT grp, CAST(sum(n_gv) AS BIGINT) AS n_g,
                   sum(CAST(n_gv AS HUGEINT) * (2 * cum - cnt + 1)) AS r2
            FROM v JOIN c USING (v) GROUP BY 1),
      sg AS (SELECT grp, n_g, (r2 * r2) // (4 * n_g) AS s_g,
                    ((r2 * r2) % (4 * n_g)) * 1000000 // (4 * n_g) AS c_g
             FROM g),
      a AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
                   CAST(sum(n_g) AS BIGINT) AS n_rows,
                   sum(s_g) AS s,
                   CAST(sum(c_g) AS BIGINT) AS cc FROM sg),
      h AS (SELECT k_groups, n_rows,
                   (CAST(CAST(s AS VARCHAR) AS DOUBLE) * 12
                     + CAST(cc AS DOUBLE) * 12 / 1000000)
                     / (CAST(n_rows AS DOUBLE) * (n_rows + 1))
                     - 3 * (n_rows + 1) AS h_raw,
                   1 - CAST(CAST(tie_t AS VARCHAR) AS DOUBLE)
                     / (CAST(n_rows AS DOUBLE) * n_rows * n_rows - n_rows)
                     AS corr
            FROM a, tie)
      SELECT k_groups, n_rows,
             CASE WHEN k_groups < 2 OR n_rows <= k_groups
               THEN CAST(0.0 AS DOUBLE) ELSE round(h_raw, 6) END AS h_stat,
             CASE WHEN k_groups < 2 OR n_rows <= k_groups OR corr <= 0
               THEN CAST(0.0 AS DOUBLE) ELSE round(h_raw / corr, 6)
             END AS h_corrected
      FROM h ORDER BY k_groups"""))

  // ---------------------------------------------------------------- M39
  /** Friedman test across order priorities BLOCKED BY MONTH — the
    * repeated-measures rank ANOVA (k treatments measured once per
    * block; here: each month's revenue under each priority), the
    * nonparametric ladder's answer when blocks absorb a common trend
    * that would drown M38's unblocked ranks. Cell value = exact
    * myriacent revenue sum per (month, priority); only COMPLETE blocks
    * (all k priorities present) enter, per the test's definition.
    * Ranks are within-block midranks carried ×2 (midrank2 = 2·rank +
    * ties − 1 over the k-row block partition — a k-row window, never a
    * global one); Σ_j R_j² = Σ R2_j²/4 stays exact DECIMAL(38,0)/
    * HUGEINT; χ²_F = 3S/(nk(k+1)) − 3n(k+1) and the tie correction
    * 1 − Σ_b Σ(t³−t)/(nk(k²−1)) are closing doubles from string-routed
    * integers.
    *
    * Scale shape: one corpus aggregate to the calendar-bounded
    * (month × priority) cell frame; everything after is metadata. */
  /** Shared Friedman machinery: one row carrying (n_blocks, k, _chi =
    * uncorrected χ²_F, _c = tie correction) — closed differently by
    * M39 (the test statistic) and M40's Kendall's W (the [0,1] effect
    * size W = χ²_corr/(n(k−1))). */
  private def friedmanCore(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cell = t(s, d, "orders")
      .groupBy(F.date_trunc("month", F.col("o_orderdate")).as("blk"),
        F.col("o_orderpriority").as("trt"))
      .agg(F.sum(F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4))" +
        " * 10000 AS DECIMAL(38,0))")).as("val"))
    val kk = cell.agg(F.countDistinct("trt").as("k"))
    val fullBlocks = cell.groupBy("blk").agg(F.count(F.lit(1)).as("_c"))
      .crossJoin(F.broadcast(kk))
      .where(F.col("_c") === F.col("k")).select("blk")
    val cf = cell.join(fullBlocks, "blk")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("blk").orderBy("val")
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy("blk", "val")
    val rk = cf.withColumn("_mr2",
      F.expr("2") * F.rank().over(wb) + F.count(F.lit(1)).over(wt) - 1)
    val rj = rk.groupBy("trt")
      .agg(F.sum(F.col("_mr2").cast("decimal(38,0)")).as("_r2"))
    val sTot = rj.agg(F.sum(F.expr("_r2 * _r2")).as("_s"))
    val ties = cf.groupBy("blk", "val").agg(F.count(F.lit(1)).as("_t"))
      .agg(F.sum(F.expr("CAST(_t AS DECIMAL(38,0)) * _t * _t - _t"))
        .as("_tie"))
    val nb = fullBlocks.agg(F.count(F.lit(1)).as("n_blocks"))
    nb.crossJoin(F.broadcast(kk))
      .crossJoin(F.broadcast(sTot))
      .crossJoin(F.broadcast(ties))
      .withColumn("_chi", F.expr(
        """CAST(CAST(_s AS STRING) AS DOUBLE) * 3
          |/ (CAST(n_blocks AS DOUBLE) * k * (k + 1))
          |- 3 * n_blocks * (k + 1)""".stripMargin))
      .withColumn("_c", F.expr(
        """1 - CAST(CAST(coalesce(_tie, 0) AS STRING) AS DOUBLE)
          |/ (CAST(n_blocks AS DOUBLE) * k * (k * k - 1))""".stripMargin))
  }

  /** Friedman oracle CTE chain shared with M40 — emits `h` carrying
    * (n_blocks, k, chi_raw, corr). */
  private val friedmanCtesSql: String = """
      cell AS (
        SELECT date_trunc('month', o_orderdate) AS blk,
               o_orderpriority AS trt,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                        AS HUGEINT)) AS val
        FROM orders GROUP BY 1, 2),
      kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM cell),
      fb AS (SELECT blk FROM cell GROUP BY 1
             HAVING count(*) = (SELECT k FROM kk)),
      cf AS (SELECT c.* FROM cell c JOIN fb USING (blk)),
      rk AS (SELECT blk, trt,
                    2 * rank() OVER (PARTITION BY blk ORDER BY val)
                    + count(*) OVER (PARTITION BY blk, val) - 1 AS mr2
             FROM cf),
      rj AS (SELECT trt, CAST(sum(mr2) AS HUGEINT) AS r2
             FROM rk GROUP BY 1),
      st AS (SELECT sum(r2 * r2) AS s FROM rj),
      tie AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie_t
              FROM (SELECT CAST(count(*) AS BIGINT) AS t
                    FROM cf GROUP BY blk, val)),
      nb AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM fb),
      h AS (SELECT n_blocks, k,
                   CAST(CAST(s AS VARCHAR) AS DOUBLE) * 3
                     / (CAST(n_blocks AS DOUBLE) * k * (k + 1))
                     - 3 * n_blocks * (k + 1) AS chi_raw,
                   1 - CAST(CAST(coalesce(tie_t, 0) AS VARCHAR) AS DOUBLE)
                     / (CAST(n_blocks AS DOUBLE) * k * (k * k - 1)) AS corr
            FROM nb, kk, st, tie)"""

  private val friedman = QueryDef(
    "friedman",
    (s, d) => friedmanCore(s, d)
        .select(F.col("n_blocks"), F.col("k").as("k_treatments"),
          F.expr("""CASE WHEN k < 2 OR n_blocks = 0
            |THEN CAST(0.0 AS DOUBLE) ELSE round(_chi, 6) END"""
            .stripMargin).as("chi2_f"),
          F.expr("""CASE WHEN k < 2 OR n_blocks = 0 OR _c <= 0
            |THEN CAST(0.0 AS DOUBLE) ELSE round(_chi / _c, 6) END"""
            .stripMargin).as("chi2_f_corrected"))
        .orderBy("n_blocks"),
    Some(s"""
      WITH $friedmanCtesSql
      SELECT n_blocks, k AS k_treatments,
             CASE WHEN k < 2 OR n_blocks = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(chi_raw, 6) END AS chi2_f,
             CASE WHEN k < 2 OR n_blocks = 0 OR corr <= 0
               THEN CAST(0.0 AS DOUBLE)
               ELSE round(chi_raw / corr, 6) END AS chi2_f_corrected
      FROM h ORDER BY n_blocks"""))

  // ---------------------------------------------------------------- M40
  /** Kendall's coefficient of concordance W across the same month-
    * blocked priority ranks — the [0,1] EFFECT SIZE companion to M39's
    * test statistic (χ²_F says "the priority revenue rankings are not
    * random"; W says HOW consistently the months agree on the ranking:
    * tie-corrected W = χ²_F,corr / (n(k−1))). Shares M39's machinery
    * verbatim; one extra closing division. */
  private val kendallW = QueryDef(
    "kendall_w",
    (s, d) => friedmanCore(s, d)
      .select(F.col("n_blocks"), F.col("k").as("k_treatments"),
        F.expr("""CASE WHEN k < 2 OR n_blocks = 0 OR _c <= 0
          |THEN CAST(0.0 AS DOUBLE)
          |ELSE round(_chi / _c / (CAST(n_blocks AS DOUBLE) * (k - 1)), 6)
          |END""".stripMargin).as("w"))
      .orderBy("n_blocks"),
    Some(s"""
      WITH $friedmanCtesSql
      SELECT n_blocks, k AS k_treatments,
             CASE WHEN k < 2 OR n_blocks = 0 OR corr <= 0
               THEN CAST(0.0 AS DOUBLE)
               ELSE round(chi_raw / corr
                          / (CAST(n_blocks AS DOUBLE) * (k - 1)), 6)
             END AS w
      FROM h ORDER BY n_blocks"""))

  // ---------------------------------------------------------------- M41
  /** McNemar's test between two PAIRED keep/drop rules on the documents
    * corpus — rule A: n_chars ≥ 200, rule B: ≥ 40 regex words (E3's
    * word counter) — the paired-binary "did swapping the filter change
    * decisions SYSTEMATICALLY" test a curation pipeline runs before
    * replacing a quality rule: only the discordant cells b (A-only
    * keep) and c (B-only keep) matter, χ² with continuity correction
    * = (max(|b−c|−1, 0))²/(b+c). Exact integer cell counts from one
    * map-side-combined corpus pass, one closing double. */
  private val mcnemar = QueryDef(
    "mcnemar",
    (s, d) => {
      t(s, d, "documents")
        .select(
          F.expr("CASE WHEN n_chars >= 200 THEN 1L ELSE 0L END").as("a"),
          F.expr("CASE WHEN regexp_count(text, '[a-z0-9]+') >= 40" +
            " THEN 1L ELSE 0L END").as("b"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1L ELSE 0L END"))
            .as("b_cnt"),
          F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1L ELSE 0L END"))
            .as("c_cnt"),
          F.sum(F.expr("CASE WHEN a = b THEN 1L ELSE 0L END"))
            .as("concordant"))
        .select(F.col("n_docs"), F.col("b_cnt"), F.col("c_cnt"),
          F.col("concordant"),
          F.expr("""CASE WHEN b_cnt + c_cnt = 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round(greatest(abs(CAST(b_cnt AS DOUBLE) - c_cnt) - 1,
            |                    CAST(0 AS DOUBLE))
            |           * greatest(abs(CAST(b_cnt AS DOUBLE) - c_cnt) - 1,
            |                      CAST(0 AS DOUBLE))
            |           / (CAST(b_cnt AS DOUBLE) + c_cnt), 6) END"""
            .stripMargin).as("chi2_cc"))
        .orderBy("n_docs")
    },
    Some("""
      WITH p AS (
        SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= 40
                    THEN 1 ELSE 0 END AS b
        FROM documents),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS b_cnt,
                     CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS c_cnt,
                     CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END)
                          AS BIGINT) AS concordant
              FROM p)
      SELECT n_docs, b_cnt, c_cnt, concordant,
             CASE WHEN b_cnt + c_cnt = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(greatest(abs(CAST(b_cnt AS DOUBLE) - c_cnt) - 1,
                                   CAST(0 AS DOUBLE))
                          * greatest(abs(CAST(b_cnt AS DOUBLE) - c_cnt) - 1,
                                     CAST(0 AS DOUBLE))
                          / (CAST(b_cnt AS DOUBLE) + c_cnt), 6)
             END AS chi2_cc
      FROM agg ORDER BY n_docs"""))

  // ---------------------------------------------------------------- M42
  /** Cochran's Q across THREE paired keep/drop rules on the documents
    * corpus — M41's k-treatment generalization (rule A: n_chars ≥ 200,
    * rule B: ≥ 40 regex words, rule C: ≥ 3 sentence terminators): "do
    * the k filters keep systematically different fractions of the same
    * corpus". Exact integers end to end: column totals C_j, row-sum
    * moments ΣR_i and ΣR_i² (R_i ∈ 0..k) from ONE map-side-combined
    * corpus pass, Q = (k−1)·Σ_j(k·C_j − N)² / (k·(k·ΣR_i − ΣR_i²)) —
    * the k² clearing keeps the numerator integral — one closing
    * double, degenerate guard when every row is all-keep/all-drop. */
  private val cochranQ = QueryDef(
    "cochran_q",
    (s, d) => {
      t(s, d, "documents")
        .select(
          F.expr("CASE WHEN n_chars >= 200 THEN 1L ELSE 0L END").as("a"),
          F.expr("CASE WHEN regexp_count(text, '[a-z0-9]+') >= 40" +
            " THEN 1L ELSE 0L END").as("b"),
          F.expr("CASE WHEN regexp_count(text, '[.!?]') >= 3" +
            " THEN 1L ELSE 0L END").as("c"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("a").as("c1"), F.sum("b").as("c2"), F.sum("c").as("c3"),
          F.sum(F.expr("a + b + c")).as("_sr"),
          F.sum(F.expr("(a + b + c) * (a + b + c)")).as("_sr2"))
        .withColumn("_k", F.lit(3L))
        .withColumn("_n", F.expr("c1 + c2 + c3"))
        .withColumn("_num", F.expr(
          """(_k - 1) * ((_k * c1 - _n) * (_k * c1 - _n)
            |           + (_k * c2 - _n) * (_k * c2 - _n)
            |           + (_k * c3 - _n) * (_k * c3 - _n))""".stripMargin))
        .withColumn("_den", F.expr("_k * (_k * _sr - _sr2)"))
        .select(F.col("n_docs"), F.col("c1"), F.col("c2"), F.col("c3"),
          F.expr("""CASE WHEN _den <= 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round(CAST(_num AS DOUBLE) / _den, 6) END"""
            .stripMargin).as("q_stat"))
        .orderBy("n_docs")
    },
    Some("""
      WITH p AS (
        SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= 40
                    THEN 1 ELSE 0 END AS b,
               CASE WHEN len(regexp_extract_all(text, '[.!?]')) >= 3
                    THEN 1 ELSE 0 END AS c
        FROM documents),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(a) AS BIGINT) AS c1,
                     CAST(sum(b) AS BIGINT) AS c2,
                     CAST(sum(c) AS BIGINT) AS c3,
                     CAST(sum(a + b + c) AS BIGINT) AS sr,
                     CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sr2
              FROM p),
      q AS (SELECT n_docs, c1, c2, c3,
                   2 * ((3 * c1 - (c1 + c2 + c3)) * (3 * c1 - (c1 + c2 + c3))
                        + (3 * c2 - (c1 + c2 + c3)) * (3 * c2 - (c1 + c2 + c3))
                        + (3 * c3 - (c1 + c2 + c3)) * (3 * c3 - (c1 + c2 + c3)))
                     AS num,
                   3 * (3 * sr - sr2) AS den
            FROM agg)
      SELECT n_docs, c1, c2, c3,
             CASE WHEN den <= 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(CAST(num AS DOUBLE) / den, 6) END AS q_stat
      FROM q ORDER BY n_docs"""))

  // ---------------------------------------------------------------- M43
  /** Wilcoxon signed-rank test — the paired CONTINUOUS rung the ladder
    * lacked between mcnemar (paired binary) and mann_whitney (unpaired
    * continuous): per order DATE, exact urgent-priority vs high-priority
    * revenue cents form one pair (days carrying both arms — the matched
    * observation a campaign A/B on the same calendar reads); zero diffs
    * DROPPED per the test's classical definition (counted, published),
    * |d| ranked with exact tie-corrected MIDRANKS over the VALUE DOMAIN
    * (M33's machinery: group by |d|, one DistRank.globalCumSum range
    * shuffle, midrank2 = 2·cum − cnt + 1 so ranks stay integral ×2),
    * W⁺ = Σ ranks of positive diffs. Tie-corrected normal approximation
    * via the all-integer V12 = 2n(n+1)(2n+1) − Σ(t³−t), so
    * z = (2W⁺ − n(n+1)/2) / sqrt(V12/12) — integer numerator, sqrt of an
    * exactly-representable integer double, ONE closing division.
    *
    * Scale shape: one map-side-combined corpus aggregate to the
    * calendar-day frame; everything after is value-domain-sized (the
    * cumsum replaces any global row window — M33's discipline). */
  private val wilcoxonSignedRank = QueryDef(
    "wilcoxon_signed_rank",
    (s, d) => {
      val daily = t(s, d, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(F.to_date(F.col("o_orderdate")).as("day"))
        .agg(
          F.expr("CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN " +
            "CAST(o_totalprice AS DECIMAL(18,4)) END) * 100 AS BIGINT)")
            .as("c1"),
          F.expr("CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN " +
            "CAST(o_totalprice AS DECIMAL(18,4)) END) * 100 AS BIGINT)")
            .as("c2"))
        .where(F.col("c1").isNotNull && F.col("c2").isNotNull)
      val vals = daily
        .select(F.expr("abs(c1 - c2)").as("ad"),
          F.expr("CASE WHEN c1 > c2 THEN 1L ELSE 0L END").as("p1"))
        .groupBy("ad")
        .agg(F.count(F.lit(1)).as("cnt"), F.sum("p1").as("pos"))
      val zeros = vals.agg(F.coalesce(
        F.sum(F.when(F.col("ad") === 0, F.col("cnt"))), F.lit(0L))
        .as("n_zero"))
      val cum = graft.operators.DistRank.globalCumSum(
        vals.where(F.col("ad") =!= 0), "cnt", "cum", F.col("ad").asc)
      cum.agg(
          F.coalesce(F.sum("cnt"), F.lit(0L)).as("n_pairs"),
          F.coalesce(F.sum(F.expr("pos * (2 * cum - cnt + 1)")), F.lit(0L))
            .as("_w2"),
          F.coalesce(F.sum(F.expr("cnt * cnt * cnt - cnt")), F.lit(0L))
            .as("_tie"))
        .crossJoin(F.broadcast(zeros))
        .withColumn("_num2",
          F.expr("_w2 - n_pairs * (n_pairs + 1) div 2"))
        .withColumn("_v12", F.expr(
          "2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - _tie"))
        .select(F.col("n_pairs"), F.col("n_zero"),
          F.expr("CAST(_w2 AS DOUBLE) / 2").as("w_plus"),
          // matched rank-biserial r = (W⁺ − W⁻)/S with S = n(n+1)/2:
          // the EFFECT SIZE the z answers significance for (r13, the
          // r12 verdict's "how big, in a robust unit" item) — exact
          // integer numerator _num2 = 2W⁺ − S already on hand, one
          // closing division
          F.expr("""CASE WHEN n_pairs = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round(CAST(_num2 AS DOUBLE)
            |      / (n_pairs * (n_pairs + 1) div 2), 6) END"""
            .stripMargin).as("rank_biserial_r"),
          F.expr("""CASE WHEN _v12 <= 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round(CAST(_num2 AS DOUBLE)
            |      / sqrt(CAST(_v12 AS DOUBLE) / 12.0), 6) END"""
            .stripMargin).as("z"))
        .orderBy("n_pairs")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN
                 CAST(o_totalprice AS DECIMAL(18,4)) END) * 100 AS BIGINT)
                 AS c1,
               CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN
                 CAST(o_totalprice AS DECIMAL(18,4)) END) * 100 AS BIGINT)
                 AS c2
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY 1),
      pr AS (SELECT abs(c1 - c2) AS ad,
                    CASE WHEN c1 > c2 THEN 1 ELSE 0 END AS p1
             FROM daily WHERE c1 IS NOT NULL AND c2 IS NOT NULL),
      v AS (SELECT ad, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(p1) AS BIGINT) AS pos
            FROM pr GROUP BY 1),
      z0 AS (SELECT CAST(coalesce(sum(CASE WHEN ad = 0 THEN cnt END), 0)
                         AS BIGINT) AS n_zero FROM v),
      c AS (SELECT ad, cnt, pos,
                   CAST(sum(cnt) OVER (ORDER BY ad) AS BIGINT) AS cum
            FROM v WHERE ad <> 0),
      a AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_pairs,
                   CAST(coalesce(sum(pos * (2 * cum - cnt + 1)), 0)
                        AS BIGINT) AS w2,
                   CAST(coalesce(sum(cnt * cnt * cnt - cnt), 0) AS BIGINT)
                     AS tie_t
            FROM c),
      b AS (SELECT n_pairs, w2,
                   w2 - n_pairs * (n_pairs + 1) // 2 AS num2,
                   2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tie_t
                     AS v12
            FROM a)
      SELECT n_pairs, n_zero,
             CAST(w2 AS DOUBLE) / 2 AS w_plus,
             CASE WHEN n_pairs = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round(CAST(num2 AS DOUBLE)
                     / (n_pairs * (n_pairs + 1) // 2), 6) END
               AS rank_biserial_r,
             CASE WHEN v12 <= 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round(CAST(num2 AS DOUBLE)
                     / sqrt(CAST(v12 AS DOUBLE) / 12.0), 6) END AS z
      FROM b, z0 ORDER BY n_pairs"""))

  // ---------------------------------------------------------------- M45
  /** 1-Wasserstein (earth-mover) distance between the M33/M36 arms on
    * extended price — the INTEGRAL distribution distance completing the
    * two-sample family (M33 tests location, M36's KS is the sup gap;
    * W₁ = ∫|F₁ − F₂| dx is the total work to morph one distribution
    * into the other, in the value's own units). Exact integers end to
    * end over the VALUE DOMAIN: per distinct cent value, the scaled CDF
    * gap |cum₁·n₂ − cum₂·n₁| times the gap to the NEXT domain value —
    * the next value via a rownumber self-join (rn+1), NOT a global
    * lead() window (the domain can approach row count, M38's lesson) —
    * summed through DECIMAL(38,0)/HUGEINT, ONE closing string-routed
    * division by n₁·n₂. The final domain row's term is provably 0
    * (both CDFs are complete there), so the join dropping it is exact.
    *
    * Scale shape: one map-side-combined corpus aggregate to the domain
    * frame, two DistRank range passes (cumsum + rownumber), one
    * domain-sized self-join. */
  private val wasserstein1 = QueryDef(
    "wasserstein_1",
    (s, d) => {
      val vals = t(s, d, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(F.expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT)")
          .as("cents"),
          F.when(F.col("l_returnflag") === "R", 1L).otherwise(0L).as("i1"))
        .groupBy("cents")
        .agg(F.sum("i1").as("n1v"), F.expr("count(*) ").cast("long")
          .as("cnt"))
      // fused DistRank pass (r15, §2.4): both running sums and the row
      // number in ONE range shuffle + sort instead of three
      val rn = graft.operators.DistRank.globalCumSumsRowNumber(
        vals, Seq("cnt" -> "cumt", "n1v" -> "cum1"), Some("rn"),
        F.col("cents").asc)
      val nxt = rn.select(F.expr("rn - 1").as("rn"),
        F.col("cents").as("_next"))
      val tot = rn.agg(F.sum("n1v").cast("long").as("n1"),
        F.expr("sum(cnt) - sum(n1v)").cast("long").as("n2"))
      rn.join(nxt, "rn")
        .crossJoin(F.broadcast(tot))
        .agg(F.max("n1").as("n1"), F.max("n2").as("n2"),
          F.sum(F.expr(
            """abs(CAST(cum1 AS DECIMAL(38,0)) * n2
              |    - CAST(cumt - cum1 AS DECIMAL(38,0)) * n1)
              |* (_next - cents)""".stripMargin)).as("_w"))
        .select(F.col("n1"), F.col("n2"),
          F.expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round(CAST(CAST(_w AS STRING) AS DOUBLE)
            |     / (CAST(n1 AS DOUBLE) * n2) / 100.0, 6) END"""
            .stripMargin).as("w1"))
        .orderBy("n1")
    },
    Some("""
      WITH v AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100
                    AS BIGINT) AS cents,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      c AS (SELECT cents, n1v, cnt,
                   CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cumt,
                   CAST(sum(n1v) OVER (ORDER BY cents) AS BIGINT) AS cum1,
                   CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rn
            FROM v),
      t AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
                   CAST(sum(cnt) - sum(n1v) AS BIGINT) AS n2
            FROM v),
      w AS (SELECT a.cents, a.cum1, a.cumt, b.cents AS nxt
            FROM c a JOIN c b ON b.rn = a.rn + 1)
      SELECT n1, n2,
             CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(CAST(CAST(sum(abs(CAST(cum1 AS HUGEINT) * n2
                     - CAST(cumt - cum1 AS HUGEINT) * n1)
                     * (nxt - cents)) AS VARCHAR) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * n2) / 100.0, 6) END AS w1
      FROM w, t GROUP BY n1, n2 ORDER BY n1"""))

  // ---------------------------------------------------------------- M49
  /** Fleiss' κ across the three M42 keep/drop rules treated as RATERS —
    * the chance-corrected AGREEMENT companion to Cochran's Q (Q asks
    * "do the raters keep different fractions"; κ asks "beyond chance,
    * do they agree on WHICH documents"). Two categories (keep/drop),
    * k = 3 raters, so everything reduces to two exact integers from
    * ONE map-side-combined pass: S = Σ_i Σ_j n_ij(n_ij−1) (per-doc
    * agreement pairs) and C = total keeps; with E = C² + (3N−C)²,
    * κ = (9N²S − 6N·E) / (54N³ − 6N·E) — exact DECIMAL(38,0)/HUGEINT
    * numerator and denominator, ONE string-routed closing division,
    * degenerate guard when P̄e = 1 (all raters unanimous on one
    * category everywhere). */
  private val fleissKappa = QueryDef(
    "fleiss_kappa",
    (s, d) => {
      t(s, d, "documents")
        .select(
          F.expr("CASE WHEN n_chars >= 200 THEN 1L ELSE 0L END").as("a"),
          F.expr("CASE WHEN regexp_count(text, '[a-z0-9]+') >= 40" +
            " THEN 1L ELSE 0L END").as("b"),
          F.expr("CASE WHEN regexp_count(text, '[.!?]') >= 3" +
            " THEN 1L ELSE 0L END").as("c"))
        .select(F.expr("a + b + c").as("nk"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum("nk").as("n_keeps"),
          F.sum(F.expr("nk * (nk - 1) + (3 - nk) * (2 - nk)")).as("_s"))
        .withColumn("_e", F.expr(
          """CAST(n_keeps AS DECIMAL(38,0)) * n_keeps
            |+ CAST(3 * n_docs - n_keeps AS DECIMAL(38,0))
            |  * (3 * n_docs - n_keeps)""".stripMargin))
        .withColumn("_num", F.expr(
          "9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs * _s - 6 * n_docs * _e"))
        .withColumn("_den", F.expr(
          "54 * CAST(n_docs AS DECIMAL(38,0)) * n_docs * n_docs" +
            " - 6 * n_docs * _e"))
        .select(F.col("n_docs"), F.col("n_keeps"),
          F.expr("""CASE WHEN _den <= 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round(CAST(CAST(_num AS STRING) AS DOUBLE)
            |     / CAST(CAST(_den AS STRING) AS DOUBLE), 6) END"""
            .stripMargin).as("kappa"))
        .orderBy("n_docs")
    },
    Some("""
      WITH p AS (
        SELECT (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
                + CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+'))
                       >= 40 THEN 1 ELSE 0 END
                + CASE WHEN len(regexp_extract_all(text, '[.!?]'))
                       >= 3 THEN 1 ELSE 0 END) AS nk
        FROM documents),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nk) AS BIGINT) AS n_keeps,
                   CAST(sum(nk * (nk - 1) + (3 - nk) * (2 - nk))
                        AS BIGINT) AS s
            FROM p),
      b AS (SELECT n_docs, n_keeps, s,
                   CAST(n_keeps AS HUGEINT) * n_keeps
                   + CAST(3 * n_docs - n_keeps AS HUGEINT)
                     * (3 * n_docs - n_keeps) AS e
            FROM a)
      SELECT n_docs, n_keeps,
             CASE WHEN 54 * CAST(n_docs AS HUGEINT) * n_docs * n_docs
                       - 6 * n_docs * e <= 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(
                 CAST(CAST(9 * CAST(n_docs AS HUGEINT) * n_docs * s
                           - 6 * n_docs * e AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(54 * CAST(n_docs AS HUGEINT) * n_docs
                             * n_docs - 6 * n_docs * e AS VARCHAR)
                        AS DOUBLE), 6) END AS kappa
      FROM b ORDER BY n_docs"""))

  // ---------------------------------------------------------------- M50
  /** Simpson's-paradox audit on the urgent-vs-high order value gap —
    * does the OVERALL direction of "urgent orders are bigger/smaller
    * than high-priority orders" reverse inside any customer segment?
    * (The aggregation-reversal trap every dashboard mean walks into.)
    * All-INTEGER sign tests: mean₁ vs mean₂ compares as
    * sgn(s₁·n₂ − s₂·n₁) on exact myriacent sums over DECIMAL(38,0)/
    * HUGEINT — no division anywhere, so no rounding can flip a sign.
    * One row per segment: counts, the segment's sign, the overall
    * sign, and the reversal flag. One fact aggregate + a broadcast
    * 1-row overall frame. */
  private val simpsonsCheck = QueryDef(
    "simpsons_check",
    (s, d) => {
      val o = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("c_mktsegment").as("segment"),
          F.expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1L " +
            "ELSE 0L END").as("u"),
          F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 " +
            "AS BIGINT)").as("myr"))
      def arms(df: org.apache.spark.sql.RelationalGroupedDataset) = df.agg(
        F.sum("u").as("n1"),
        F.sum(F.expr("1 - u")).as("n2"),
        F.sum(F.expr("CASE WHEN u = 1 THEN CAST(myr AS DECIMAL(38,0)) " +
          "ELSE CAST(0 AS DECIMAL(38,0)) END")).as("s1"),
        F.sum(F.expr("CASE WHEN u = 0 THEN CAST(myr AS DECIMAL(38,0)) " +
          "ELSE CAST(0 AS DECIMAL(38,0)) END")).as("s2"))
      val overall = arms(o.groupBy())
        .select(F.expr("CAST(sign(s1 * n2 - s2 * n1) AS BIGINT)")
          .as("overall_sign"))
      arms(o.groupBy("segment"))
        .withColumn("seg_sign",
          F.expr("CAST(sign(s1 * n2 - s2 * n1) AS BIGINT)"))
        .crossJoin(F.broadcast(overall))
        .select(F.col("segment"), F.col("n1"), F.col("n2"),
          F.col("seg_sign"), F.col("overall_sign"),
          F.expr("""CASE WHEN seg_sign <> 0 AND overall_sign <> 0
            |AND seg_sign <> overall_sign THEN 1L ELSE 0L END"""
            .stripMargin).as("simpson_flag"))
        .orderBy("segment")
    },
    Some("""
      WITH o AS (
        SELECT c_mktsegment AS segment,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                 AS u,
               CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                    AS BIGINT) AS myr
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
      seg AS (
        SELECT segment, CAST(sum(u) AS BIGINT) AS n1,
               CAST(sum(1 - u) AS BIGINT) AS n2,
               sum(CASE WHEN u = 1 THEN CAST(myr AS HUGEINT)
                   ELSE 0 END) AS s1,
               sum(CASE WHEN u = 0 THEN CAST(myr AS HUGEINT)
                   ELSE 0 END) AS s2
        FROM o GROUP BY 1),
      ov AS (
        SELECT CAST(sign(sum(CASE WHEN u = 1 THEN CAST(myr AS HUGEINT)
                             ELSE 0 END) * sum(1 - u)
                    - sum(CASE WHEN u = 0 THEN CAST(myr AS HUGEINT)
                          ELSE 0 END) * sum(u)) AS BIGINT)
          AS overall_sign
        FROM o)
      SELECT segment, n1, n2,
             CAST(sign(s1 * n2 - s2 * n1) AS BIGINT) AS seg_sign,
             overall_sign,
             CASE WHEN sign(s1 * n2 - s2 * n1) <> 0
                   AND overall_sign <> 0
                   AND CAST(sign(s1 * n2 - s2 * n1) AS BIGINT)
                       <> overall_sign
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
               AS simpson_flag
      FROM seg, ov ORDER BY segment"""))

  // ---------------------------------------------------------------- M53
  /** Cliff's delta between the M33 arms (returned 'R' vs pending 'N'
    * line items on quantity) — the ROBUST EFFECT SIZE beside the
    * significance ladder (r13, the r12 verdict's "eleven ways to ask
    * 'is there a difference', zero to ask 'how big'"):
    * δ = (#{x₁ > x₂} − #{x₁ < x₂}) / (n₁·n₂) over all cross pairs,
    * ordinal-only (no variance, no normality), range [−1, 1].
    *
    * Pair counting is EXACT and never enumerates pairs: on the same
    * value-grouped domain frame as mann_whitney, one
    * [[graft.operators.DistRank.globalCumSum]] over the arm-2 counts
    * gives cum₂(v) (inclusive); then with A = Σ n1v·cum₂(v) and
    * B = Σ n1v·n2v (DECIMAL(38,0)/HUGEINT),
    * concordant = A − B, tied = B, discordant = n₁n₂ − A — the
    * cross-multiplied-CDF trick, all exact integers to ONE closing
    * string-routed division. Publishes the raw pair counts (double via
    * the string route — they square past int64 at corpus scale), δ at
    * 6dp, and the Romano et al. 2006 magnitude label computed from the
    * ROUNDED δ so both engines label identically.
    *
    * Scale shape: identical to M33 — one map-side-combined corpus
    * aggregate to the value domain, one range-shuffle cumsum, one
    * closing one-row reduction. */
  private val cliffsDelta = QueryDef(
    "cliffs_delta",
    (s, d) => {
      val vals = t(s, d, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(F.col("l_quantity").cast("long").as("q"),
          F.when(F.col("l_returnflag") === "R", 1L).otherwise(0L).as("i1"))
        .groupBy("q")
        .agg(F.sum("i1").as("n1v"),
          F.sum(F.expr("1 - i1")).as("n2v"))
      val cum = graft.operators.DistRank.globalCumSum(
        vals, "n2v", "cum2", F.col("q").asc)
      cum.agg(
          F.sum("n1v").cast("long").as("n1"),
          F.sum("n2v").cast("long").as("n2"),
          F.sum(F.expr("CAST(n1v AS DECIMAL(38,0)) * cum2")).as("_a"),
          F.sum(F.expr("CAST(n1v AS DECIMAL(38,0)) * n2v")).as("_b"))
        .withColumn("_conc", F.expr("_a - _b"))
        .withColumn("_disc",
          F.expr("CAST(n1 AS DECIMAL(38,0)) * n2 - _a"))
        .withColumn("_delta", F.expr(
          """CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            |round(CAST(CAST(_conc - _disc AS STRING) AS DOUBLE)
            |      / (CAST(n1 AS DOUBLE) * n2), 6) END""".stripMargin))
        .select(F.col("n1"), F.col("n2"),
          F.expr("CAST(CAST(_conc AS STRING) AS DOUBLE)")
            .as("n_concordant"),
          F.expr("CAST(CAST(_disc AS STRING) AS DOUBLE)")
            .as("n_discordant"),
          F.expr("CAST(CAST(_b AS STRING) AS DOUBLE)").as("n_tied"),
          F.col("_delta").as("cliffs_delta"),
          F.expr("""CASE WHEN abs(_delta) < 0.147 THEN 'negligible'
            |WHEN abs(_delta) < 0.33 THEN 'small'
            |WHEN abs(_delta) < 0.474 THEN 'medium'
            |ELSE 'large' END""".stripMargin).as("magnitude"))
        .orderBy("n1")
    },
    Some("""
      WITH v AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1v,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2v
        FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      c AS (SELECT n1v, n2v,
                   CAST(sum(n2v) OVER (ORDER BY q) AS BIGINT) AS cum2
            FROM v),
      a AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
                   CAST(sum(n2v) AS BIGINT) AS n2,
                   sum(CAST(n1v AS HUGEINT) * cum2) AS a,
                   sum(CAST(n1v AS HUGEINT) * n2v) AS b
            FROM c),
      b AS (SELECT n1, n2, a - b AS conc,
                   CAST(n1 AS HUGEINT) * n2 - a AS disc, b AS tied
            FROM a),
      f AS (SELECT n1, n2, conc, disc, tied,
                   CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE)
                     ELSE round(CAST(CAST(conc - disc AS VARCHAR) AS DOUBLE)
                                / (CAST(n1 AS DOUBLE) * n2), 6) END
                     AS delta
            FROM b)
      SELECT n1, n2,
             CAST(CAST(conc AS VARCHAR) AS DOUBLE) AS n_concordant,
             CAST(CAST(disc AS VARCHAR) AS DOUBLE) AS n_discordant,
             CAST(CAST(tied AS VARCHAR) AS DOUBLE) AS n_tied,
             delta AS cliffs_delta,
             CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                  WHEN abs(delta) < 0.33 THEN 'small'
                  WHEN abs(delta) < 0.474 THEN 'medium'
                  ELSE 'large' END AS magnitude
      FROM f ORDER BY n1"""))

  // ---------------------------------------------------------------- M56
  /** Cohen's κ between the two M41 keep/drop rules as raters (r13) —
    * the TWO-rater chance-corrected agreement completing the family
    * (M41 mcnemar: did swapping change decisions systematically; M49
    * Fleiss: 3+ raters; this: how much do two specific rules agree
    * beyond chance — the number a curation team reads before swapping
    * rule A for rule B). Same paired cells as mcnemar from ONE
    * map-side-combined pass (n11 both-keep, n10 A-only, n01 B-only,
    * n00 neither); κ = (N·(n11+n00) − pe) / (N² − pe) with
    * pe = (n11+n10)(n11+n01) + (n01+n00)(n10+n00) — all exact
    * DECIMAL(38,0)/HUGEINT (cell products square past int64 at corpus
    * scale), ONE string-routed closing division, perfect-agreement /
    * degenerate-marginal guard (N² = pe ⇒ κ defined as 0). */
  private val cohensKappa = QueryDef(
    "cohens_kappa",
    (s, d) => {
      t(s, d, "documents")
        .select(
          F.expr("CASE WHEN n_chars >= 200 THEN 1L ELSE 0L END").as("a"),
          F.expr("CASE WHEN regexp_count(text, '[a-z0-9]+') >= 40" +
            " THEN 1L ELSE 0L END").as("b"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.expr("CASE WHEN a = 1 AND b = 1 THEN 1L ELSE 0L END"))
            .as("n11"),
          F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1L ELSE 0L END"))
            .as("n10"),
          F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1L ELSE 0L END"))
            .as("n01"),
          F.sum(F.expr("CASE WHEN a = 0 AND b = 0 THEN 1L ELSE 0L END"))
            .as("n00"))
        .withColumn("_pe", F.expr(
          """CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)
            |+ CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00)"""
            .stripMargin))
        .withColumn("_den", F.expr(
          "CAST(n_docs AS DECIMAL(38,0)) * n_docs - _pe"))
        .select(F.col("n_docs"), F.col("n11"), F.col("n10"),
          F.col("n01"), F.col("n00"),
          F.expr("""CASE WHEN _den = 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round(CAST(CAST(CAST(n_docs AS DECIMAL(38,0))
            |                      * (n11 + n00) - _pe AS STRING)
            |                AS DOUBLE)
            |           / CAST(CAST(_den AS STRING) AS DOUBLE), 6) END"""
            .stripMargin).as("kappa"))
        .orderBy("n_docs")
    },
    Some("""
      WITH p AS (
        SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= 40
                    THEN 1 ELSE 0 END AS b
        FROM documents),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n11,
                     CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n10,
                     CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n01,
                     CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n00
              FROM p),
      k AS (SELECT n_docs, n11, n10, n01, n00,
                   CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                   + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS pe,
                   CAST(n_docs AS HUGEINT) * n_docs
                   - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                      + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS den
            FROM agg)
      SELECT n_docs, n11, n10, n01, n00,
             CASE WHEN den = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round(CAST(CAST(CAST(n_docs AS HUGEINT) * (n11 + n00)
                                    - pe AS VARCHAR) AS DOUBLE)
                          / CAST(CAST(den AS VARCHAR) AS DOUBLE), 6)
             END AS kappa
      FROM k ORDER BY n_docs"""))

  // ---------------------------------------------------------------- M58
  /** Wald–Wolfowitz runs test on the direction of day-over-day revenue
    * moves (r13) — the RANDOMNESS gate beside M55's autocorrelation
    * read (a series can pass Ljung-Box yet alternate suspiciously;
    * runs counts the actual up/down streak structure): signs of
    * cents_t − cents_{t−1} over adjacent OBSERVED days (zeros dropped
    * per the classical test, counted), R = 1 + #(sign changes between
    * CONSECUTIVE elements of the filtered sequence), z = (R − μ)/σ
    * with μ = 2n₁n₂/n + 1 and σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)).
    *
    * Scale shape: one corpus aggregate to the calendar frame; sequence
    * adjacency via [[graft.operators.DistRank.globalRowNumber]] + an
    * rn+1 self-join (M45's pattern — never a global lag() window);
    * R, n₁, n₂ exact integers, z one closing double from string-routed
    * operands, degenerate guard (σ² ≤ 0 ⇒ 0). */
  private val runsTest = QueryDef(
    "runs_test",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val diffs = daily.join(
          daily.select(F.expr("date_add(day, 1)").as("day"),
            F.col("cents").as("prev")), "day")
        .select(F.col("day"),
          F.expr("CAST(sign(cents - prev) AS BIGINT)").as("sgn"))
      val zeros = diffs.agg(F.coalesce(
        F.sum(F.expr("CASE WHEN sgn = 0 THEN 1L ELSE 0L END")), F.lit(0L))
        .as("n_zero"))
      val seq0 = graft.operators.DistRank.globalRowNumber(
        diffs.where(F.col("sgn") =!= 0), "rn", F.col("day").asc)
      val nxt = seq0.select(F.expr("rn - 1").as("rn"),
        F.col("sgn").as("_next"))
      val changes = seq0.join(nxt, "rn")
        .agg(F.coalesce(F.sum(F.expr(
          "CASE WHEN sgn <> _next THEN 1L ELSE 0L END")), F.lit(0L))
          .as("n_changes"))
      seq0.agg(
          F.coalesce(F.sum(F.expr("CASE WHEN sgn = 1 THEN 1L ELSE 0L END")),
            F.lit(0L)).as("n_up"),
          F.coalesce(F.sum(F.expr("CASE WHEN sgn = -1 THEN 1L ELSE 0L END")),
            F.lit(0L)).as("n_down"))
        .crossJoin(F.broadcast(changes))
        .crossJoin(F.broadcast(zeros))
        .withColumn("runs", F.expr(
          "CASE WHEN n_up + n_down = 0 THEN 0L ELSE n_changes + 1 END"))
        .select(F.col("n_up"), F.col("n_down"), F.col("n_zero"),
          F.col("runs"),
          F.expr("""CASE WHEN n_up + n_down < 2 OR n_up = 0 OR n_down = 0
            |THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(runs AS DOUBLE)
            |        - (2.0 * n_up * n_down
            |           / (CAST(n_up AS DOUBLE) + n_down) + 1))
            |      / sqrt(2.0 * n_up * n_down
            |             * (2.0 * n_up * n_down - n_up - n_down)
            |             / ((CAST(n_up AS DOUBLE) + n_down)
            |                * (CAST(n_up AS DOUBLE) + n_down)
            |                * (CAST(n_up AS DOUBLE) + n_down - 1))), 6)
            |END""".stripMargin).as("z"))
        .orderBy("runs")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      df AS (SELECT a.day, CAST(sign(a.cents - b.cents) AS BIGINT) AS sgn
             FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 1 DAY),
      z0 AS (SELECT CAST(coalesce(sum(CASE WHEN sgn = 0 THEN 1 END), 0)
                         AS BIGINT) AS n_zero FROM df),
      sq AS (SELECT sgn, row_number() OVER (ORDER BY day) AS rn
             FROM df WHERE sgn <> 0),
      ch AS (SELECT CAST(coalesce(sum(CASE WHEN a.sgn <> b.sgn THEN 1 END),
                                  0) AS BIGINT) AS n_changes
             FROM sq a JOIN sq b ON b.rn = a.rn + 1),
      ag AS (SELECT CAST(coalesce(sum(CASE WHEN sgn = 1 THEN 1 END), 0)
                         AS BIGINT) AS n_up,
                    CAST(coalesce(sum(CASE WHEN sgn = -1 THEN 1 END), 0)
                         AS BIGINT) AS n_down
             FROM sq),
      f AS (SELECT n_up, n_down, n_zero,
                   CASE WHEN n_up + n_down = 0 THEN 0
                        ELSE n_changes + 1 END AS runs
            FROM ag, ch, z0)
      SELECT n_up, n_down, n_zero, CAST(runs AS BIGINT) AS runs,
             CASE WHEN n_up + n_down < 2 OR n_up = 0 OR n_down = 0
               THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(runs AS DOUBLE)
                       - (2.0 * n_up * n_down
                          / (CAST(n_up AS DOUBLE) + n_down) + 1))
                     / sqrt(2.0 * n_up * n_down
                            * (2.0 * n_up * n_down - n_up - n_down)
                            / ((CAST(n_up AS DOUBLE) + n_down)
                               * (CAST(n_up AS DOUBLE) + n_down)
                               * (CAST(n_up AS DOUBLE) + n_down - 1))), 6)
             END AS z
      FROM f ORDER BY runs"""))

  // ---------------------------------------------------------------- M59
  /** Cohen's d (and Hedges' g) between the M33 arms on quantity (r13)
    * — the PARAMETRIC effect size beside M53's ordinal Cliff's δ (δ is
    * robust; d is the unit a power analysis and the meta-analysis
    * literature speak): d = (m₁ − m₂)/s_pooled with
    * s²_pooled = ((n₁−1)s₁² + (n₂−1)s₂²)/(n₁+n₂−2), g = d·J with the
    * small-sample correction J = 1 − 3/(4(n₁+n₂) − 9). Exact
    * DECIMAL(38,0)/HUGEINT moments (n, Σx, Σx² per arm) from ONE
    * map-side-combined pass; the closing formula is the identical
    * double expression in both engines (string-routed operands),
    * degenerate guards. */
  private val cohensD = QueryDef(
    "cohens_d",
    (s, d) => {
      t(s, d, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(F.col("l_quantity").cast("long").as("q"),
          F.when(F.col("l_returnflag") === "R", 1L).otherwise(0L).as("i1"))
        .agg(
          F.sum("i1").as("n1"),
          F.sum(F.expr("1 - i1")).as("n2"),
          F.sum(F.expr("CAST(i1 * q AS DECIMAL(38,0))")).as("s1"),
          F.sum(F.expr("CAST((1 - i1) * q AS DECIMAL(38,0))")).as("s2"),
          F.sum(F.expr("CAST(i1 AS DECIMAL(38,0)) * q * q")).as("q1"),
          F.sum(F.expr("CAST(1 - i1 AS DECIMAL(38,0)) * q * q")).as("q2"))
        .withColumn("dn1", F.expr("CAST(n1 AS DOUBLE)"))
        .withColumn("dn2", F.expr("CAST(n2 AS DOUBLE)"))
        .withColumn("ds1", F.expr("CAST(CAST(s1 AS STRING) AS DOUBLE)"))
        .withColumn("ds2", F.expr("CAST(CAST(s2 AS STRING) AS DOUBLE)"))
        .withColumn("dq1", F.expr("CAST(CAST(q1 AS STRING) AS DOUBLE)"))
        .withColumn("dq2", F.expr("CAST(CAST(q2 AS STRING) AS DOUBLE)"))
        .withColumn("_d", F.expr(
          """CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(0.0 AS DOUBLE) ELSE
            |(ds1 / dn1 - ds2 / dn2)
            |/ sqrt(((dq1 - ds1 * ds1 / dn1) + (dq2 - ds2 * ds2 / dn2))
            |       / (dn1 + dn2 - 2)) END""".stripMargin))
        .select(F.col("n1"), F.col("n2"),
          F.expr("round(_d, 6)").as("cohens_d"),
          F.expr("""round(_d * (CAST(1 AS DOUBLE)
            |- 3 / (4 * (dn1 + dn2) - 9)), 6)""".stripMargin)
            .as("hedges_g"))
        .orderBy("n1")
    },
    Some("""
      WITH a AS (
        SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               sum(CASE WHEN l_returnflag = 'R'
                   THEN CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                   ELSE 0 END) AS s1,
               sum(CASE WHEN l_returnflag = 'N'
                   THEN CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                   ELSE 0 END) AS s2,
               sum(CASE WHEN l_returnflag = 'R'
                   THEN CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                        * CAST(l_quantity AS BIGINT) ELSE 0 END) AS q1,
               sum(CASE WHEN l_returnflag = 'N'
                   THEN CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                        * CAST(l_quantity AS BIGINT) ELSE 0 END) AS q2
        FROM lineitem WHERE l_returnflag IN ('R', 'N')),
      b AS (SELECT n1, n2,
                   CAST(n1 AS DOUBLE) AS dn1, CAST(n2 AS DOUBLE) AS dn2,
                   CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS ds1,
                   CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS ds2,
                   CAST(CAST(q1 AS VARCHAR) AS DOUBLE) AS dq1,
                   CAST(CAST(q2 AS VARCHAR) AS DOUBLE) AS dq2
            FROM a),
      c AS (SELECT n1, n2, dn1, dn2,
                   CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(0.0 AS DOUBLE) ELSE
                     (ds1 / dn1 - ds2 / dn2)
                     / sqrt(((dq1 - ds1 * ds1 / dn1)
                             + (dq2 - ds2 * ds2 / dn2))
                            / (dn1 + dn2 - 2)) END AS d
            FROM b)
      SELECT n1, n2, round(d, 6) AS cohens_d,
             round(d * (CAST(1 AS DOUBLE)
                        - 3 / (4 * (dn1 + dn2) - 9)), 6) AS hedges_g
      FROM c ORDER BY n1"""))

  // ---------------------------------------------------------------- M60
  /** Poisson dispersion (variance-to-mean) test on daily ORDER COUNTS
    * (r13) — the arrival-process read beside C86's per-user timing
    * regularity: a Poisson arrival stream has D = s²/x̄ ≈ 1;
    * overdispersion (D ≫ 1) = bursty/campaign-driven traffic,
    * underdispersion (D ≪ 1) = rate-limited/scripted. Statistic
    * (n−1)·D ~ χ²_{n−1} under H₀. Exact integer moments (n days,
    * Σc, Σc² through DECIMAL(38,0)/HUGEINT) from the calendar frame;
    * mean published in exact micros (integral division), D and the
    * χ² statistic as identical closing double expressions. */
  private val poissonDispersion = QueryDef(
    "poisson_dispersion",
    (s, d) => {
      t(s, d, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(F.count(F.lit(1)).as("c"))
        .agg(F.count(F.lit(1)).as("n_days"),
          F.sum("c").cast("decimal(38,0)").as("sc"),
          F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).as("qc"))
        .select(F.col("n_days"),
          F.expr("CAST(sc * 1000000 div n_days AS BIGINT)")
            .as("mean_micro"),
          F.expr("""CASE WHEN n_days < 2 OR sc = 0
            |THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(n_days AS DOUBLE)
            |        * CAST(CAST(qc AS STRING) AS DOUBLE)
            |        - CAST(CAST(sc AS STRING) AS DOUBLE)
            |          * CAST(CAST(sc AS STRING) AS DOUBLE))
            |      / ((CAST(n_days AS DOUBLE) - 1)
            |         * CAST(CAST(sc AS STRING) AS DOUBLE)), 6) END"""
            .stripMargin).as("dispersion"),
          F.expr("""CASE WHEN n_days < 2 OR sc = 0
            |THEN CAST(0.0 AS DOUBLE) ELSE
            |round((CAST(n_days AS DOUBLE)
            |        * CAST(CAST(qc AS STRING) AS DOUBLE)
            |        - CAST(CAST(sc AS STRING) AS DOUBLE)
            |          * CAST(CAST(sc AS STRING) AS DOUBLE))
            |      / CAST(CAST(sc AS STRING) AS DOUBLE), 6) END"""
            .stripMargin).as("chi2_stat"))
        .orderBy("n_days")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                   sum(CAST(c AS HUGEINT)) AS sc,
                   sum(CAST(c AS HUGEINT) * c) AS qc
            FROM daily)
      SELECT n_days,
             CAST(sc * 1000000 // n_days AS BIGINT) AS mean_micro,
             CASE WHEN n_days < 2 OR sc = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(n_days AS DOUBLE)
                       * CAST(CAST(qc AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sc AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(sc AS VARCHAR) AS DOUBLE))
                     / ((CAST(n_days AS DOUBLE) - 1)
                        * CAST(CAST(sc AS VARCHAR) AS DOUBLE)), 6) END
               AS dispersion,
             CASE WHEN n_days < 2 OR sc = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               round((CAST(n_days AS DOUBLE)
                       * CAST(CAST(qc AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sc AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(sc AS VARCHAR) AS DOUBLE))
                     / CAST(CAST(sc AS VARCHAR) AS DOUBLE), 6) END
               AS chi2_stat
      FROM a ORDER BY n_days"""))

  /** Benjamini-Hochberg χ²₁ threshold triangle in integer MICROS:
    * BH_THR(m−1)(k−1) = invχ²₁(1 − α·k/m) for α = 0.05, family sizes
    * m = 1..25 — quantized ONCE at compile time (the leaderboard_rbo
    * integer-pico discipline: no runtime erf/quantile whose last ULP
    * could differ cross-engine; both engines read the same literals).
    * Generated by bisection on erfc(√(c/2)) = α·k/m; the (25,25) and
    * (1,1) corners are the textbook 3.841459 (χ²₁ at 0.95), the (25,1)
    * corner 9.549536 (z = 3.09²). */
  private[graft] val BH_THR: Seq[Seq[Long]] = Seq(
    Seq(3841459L),
    Seq(5023886L, 3841459L),
    Seq(5731139L, 4528577L, 3841459L),
    Seq(6238533L, 5023886L, 4327558L, 3841459L),
    Seq(6634897L, 5411894L, 4709292L, 4217885L, 3841459L),
    Seq(6960401L, 5731139L, 5023886L, 4528577L, 4148693L, 3841459L),
    Seq(7236689L, 6002489L, 5291596L, 4793252L, 4410695L, 4101028L, 3841459L),
    Seq(7476773L, 6238533L, 5524683L, 5023886L, 4639176L, 4327558L, 4066184L, 3841459L),
    Seq(7689093L, 6447460L, 5731139L, 5228302L, 4841807L, 4528577L, 4265715L, 4039597L, 3841459L),
    Seq(7879439L, 6634897L, 5916468L, 5411894L, 5023886L, 4709292L, 4445175L, 4217885L, 4018640L, 3841459L),
    Seq(8051956L, 6804879L, 6084621L, 5578545L, 5189231L, 4873462L, 4608267L, 4379970L, 4179777L, 4001694L, 3841459L),
    Seq(8209716L, 6960401L, 6238533L, 5731139L, 5340681L, 5023886L, 4757749L, 4528577L, 4327558L, 4148693L, 3987709L, 3841459L),
    Seq(8355057L, 7103745L, 6380443L, 5871880L, 5480408L, 5162705L, 4895737L, 4665792L, 4464047L, 4284494L, 4122852L, 3975971L, 3841459L),
    Seq(8489801L, 7236689L, 6512101L, 6002489L, 5610110L, 5291596L, 5023886L, 4793252L, 4590861L, 4410695L, 4248470L, 4101028L, 3965977L, 3841459L),
    Seq(8615396L, 7360651L, 6634897L, 6124336L, 5731139L, 5411894L, 5143517L, 4912264L, 4709292L, 4528577L, 4365828L, 4217885L, 4082351L, 3957366L, 3841459L),
    Seq(8733011L, 7476773L, 6749956L, 6238533L, 5844592L, 5524683L, 5255700L, 5023886L, 4820389L, 4639176L, 4475954L, 4327558L, 4191589L, 4066184L, 3949870L, 3841459L),
    Seq(8843605L, 7585994L, 6858202L, 6345988L, 5951366L, 5630851L, 5361316L, 5128990L, 4925014L, 4743349L, 4579697L, 4430889L, 4294524L, 4168738L, 4052054L, 3943284L, 3841459L),
    Seq(8947972L, 7689093L, 6960401L, 6447460L, 6052212L, 5731139L, 5461096L, 5228302L, 5023886L, 4841807L, 4677761L, 4528577L, 4391850L, 4265715L, 4148693L, 4039597L, 3937453L, 3841459L),
    Seq(9046780L, 7786723L, 7057198L, 6543583L, 6147756L, 5826169L, 5555658L, 5322430L, 5117610L, 4935149L, 4770741L, 4621210L, 4484151L, 4357696L, 4240365L, 4130968L, 4028532L, 3932254L, 3841459L),
    Seq(9140593L, 7879439L, 7149139L, 6634897L, 6238533L, 5916468L, 5645523L, 5411894L, 5206700L, 5023886L, 4859143L, 4709292L, 4571926L, 4445175L, 4327558L, 4217885L, 4115180L, 4018640L, 3927589L, 3841459L),
    Seq(9229895L, 7967714L, 7236689L, 6721863L, 6324998L, 6002489L, 5731139L, 5497138L, 5291596L, 5108454L, 4943400L, 4793252L, 4655602L, 4528577L, 4410695L, 4300765L, 4197811L, 4101028L, 4009741L, 3923380L, 3841459L),
    Seq(9315102L, 8051956L, 7320253L, 6804879L, 6407546L, 6084621L, 5812894L, 5578545L, 5372678L, 5189231L, 5023886L, 4873462L, 4735547L, 4608267L, 4490139L, 4379970L, 4276785L, 4179777L, 4088270L, 4001694L, 3919563L, 3841459L),
    Seq(9396574L, 8132521L, 7400179L, 6884292L, 6486518L, 6163203L, 5891123L, 5656449L, 5450278L, 5266544L, 5100928L, 4950246L, 4812083L, 4684564L, 4566207L, 4455815L, 4352414L, 4255196L, 4163485L, 4076709L, 3994383L, 3916087L, 3841459L),
    Seq(9474626L, 8209716L, 7476773L, 6960401L, 6562214L, 6238533L, 5966120L, 5731139L, 5524683L, 5340681L, 5174811L, 5023886L, 4885491L, 4757749L, 4639176L, 4528577L, 4424973L, 4327558L, 4235656L, 4148693L, 4066184L, 3987709L, 3912906L, 3841459L),
    Seq(9549536L, 8283815L, 7550303L, 7033474L, 6634897L, 6310869L, 6038143L, 5802874L, 5596149L, 5411894L, 5245785L, 5094632L, 4956019L, 4828067L, 4709292L, 4598497L, 4494704L, 4397105L, 4305022L, 4217885L, 4135204L, 4056562L, 3981594L, 3909986L, 3841459L))

  /** Nested-CASE threshold lookup emitted into BOTH engines verbatim
    * (the durbinLevinson shared-text pattern): thr(m, k) in micros. */
  private def bhThrSql(mCol: String, kCol: String): String = {
    val byM = BH_THR.zipWithIndex.map { case (row, mi) =>
      val byK = row.zipWithIndex.map { case (c, ki) =>
        s"WHEN ${ki + 1} THEN $c" }.mkString(" ")
      s"WHEN ${mi + 1} THEN (CASE $kCol $byK END)"
    }.mkString(" ")
    s"CAST((CASE $mCol $byM END) AS BIGINT)"
  }

  // ---------------------------------------------------------------- M62
  /** Benjamini-Hochberg FDR step-up over an IN-DATA hypothesis family
    * (r14, the r13 verdict's multiple-comparison capstone): the family
    * is the C47 priority×segment contingency cells (m ≤ 25 hypotheses
    * — "is this cell's count consistent with row/col independence?"),
    * each carrying the exact-integer 1-df cell statistic
    * χ_i = (n·nt − nr·nc)² / (nt·nr·nc) (the per-cell Pearson term —
    * BH is valid under the PRDS positive dependence these residuals
    * exhibit). p_i = P(χ²₁ > χ_i) is monotone DECREASING in χ_i, so
    * the step-up never touches a p-value: cells rank by χ DESC
    * (deterministic micros + (priority, segment) tie-break), and
    * p_(k) ≤ k·α/m ⟺ χ_(k) ≥ invχ²₁(1 − k·α/m) — the right side read
    * from the compile-time [[BH_THR]] triangle for the OBSERVED family
    * size m, the comparison exact integer cross-multiplication
    * ((n·nt − nr·nc)²·10⁶ ≥ thr_micro·nt·nr·nc, DECIMAL(38,0)/HUGEINT).
    * Published: every cell with its rank, exact-integer χ micros, its
    * rank's threshold, the largest-k pick k*, and the step-up
    * rejection flag (rank ≤ k* — step-up rejects everything above the
    * crossing, including interior ranks that miss their own
    * threshold).
    *
    * Scale shape: one map-side-combined fact aggregate (the C47
    * assembly); everything after is the ≤25-row cell frame — the
    * global window is metadata-sized by construction (WindowAuditSpec
    * entry). Exact to nt < 10⁸ facts as written (A²·10⁶ headroom in
    * 38 digits); beyond that, rescale micros. */
  private val fdrBh = QueryDef(
    "fdr_bh",
    (s, d) => {
      val cells = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("o_orderpriority").as("priority"),
          F.col("c_mktsegment").as("segment"))
        .agg(F.count(F.lit(1)).as("n"))
      val rows = cells.groupBy("priority")
        .agg(F.sum("n").cast("long").as("nr"))
      val colsT = cells.groupBy("segment")
        .agg(F.sum("n").cast("long").as("nc"))
      val total = cells.agg(F.sum("n").cast("long").as("nt"),
        F.count(F.lit(1)).as("m"))
      val base = cells
        .join(F.broadcast(rows), Seq("priority"))
        .join(F.broadcast(colsT), Seq("segment"))
        .crossJoin(F.broadcast(total))
        .withColumn("_a", F.expr(
          "CAST(n AS DECIMAL(38,0)) * nt - CAST(nr AS DECIMAL(38,0)) * nc"))
        .withColumn("_den", F.expr("CAST(nt AS DECIMAL(38,0)) * nr * nc"))
        .withColumn("chi_micro",
          F.expr("CAST(_a * _a * 1000000 div _den AS BIGINT)"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(F.col("chi_micro").desc, F.col("priority"),
          F.col("segment"))
      val ranked = base
        .withColumn("k", F.row_number().over(w).cast("long"))
        .withColumn("thr_micro", F.expr(bhThrSql("m", "k")))
        .withColumn("_pass", F.expr(
          "_a * _a * 1000000 >= CAST(thr_micro AS DECIMAL(38,0)) * _den"))
      val kstar = ranked
        .agg(F.max(F.when(F.col("_pass"), F.col("k"))).as("_ks"))
      ranked.crossJoin(F.broadcast(kstar))
        .select(F.col("k"), F.col("priority"), F.col("segment"),
          F.col("n"), F.col("chi_micro"), F.col("thr_micro"),
          F.expr("CAST(coalesce(_ks, 0) AS BIGINT)").as("k_star"),
          F.expr("CASE WHEN _ks IS NOT NULL AND k <= _ks THEN 1L" +
            " ELSE 0L END").as("rejected"))
        .orderBy("k")
    },
    Some(s"""
      WITH cells AS (
        SELECT o_orderpriority AS priority, c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      r AS (SELECT priority, CAST(sum(n) AS BIGINT) AS nr
            FROM cells GROUP BY 1),
      c AS (SELECT segment, CAST(sum(n) AS BIGINT) AS nc
            FROM cells GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(*) AS BIGINT) AS m FROM cells),
      base AS (
        SELECT priority, segment, n, m,
               CAST(n AS HUGEINT) * nt - CAST(nr AS HUGEINT) * nc AS a,
               CAST(nt AS HUGEINT) * nr * nc AS den
        FROM cells JOIN r USING (priority) JOIN c USING (segment), t),
      ranked AS (
        SELECT priority, segment, n, m, a, den,
               CAST(a * a * 1000000 // den AS BIGINT) AS chi_micro,
               CAST(row_number() OVER (
                 ORDER BY a * a * 1000000 // den DESC, priority, segment)
                 AS BIGINT) AS k
        FROM base),
      flags AS (
        SELECT *, ${bhThrSql("m", "k")} AS thr_micro,
               CASE WHEN a * a * 1000000 >=
                 CAST(${bhThrSql("m", "k")} AS HUGEINT) * den
               THEN 1 ELSE 0 END AS pass
        FROM ranked),
      ks AS (SELECT max(CASE WHEN pass = 1 THEN k END) AS kstar
             FROM flags)
      SELECT k, priority, segment, n, chi_micro, thr_micro,
             CAST(coalesce(kstar, 0) AS BIGINT) AS k_star,
             CAST(CASE WHEN kstar IS NOT NULL AND k <= kstar
                  THEN 1 ELSE 0 END AS BIGINT) AS rejected
      FROM flags, ks ORDER BY k"""))

  def all: Seq[QueryDef] =
    Seq(mannWhitney, anovaF, cramersV, ks2Sample, leveneBf, kruskalWallis,
      friedman, kendallW, mcnemar, cochranQ, wilcoxonSignedRank,
      wasserstein1, fleissKappa, simpsonsCheck, cliffsDelta, cohensKappa,
      runsTest, cohensD, poissonDispersion, fdrBh)
}
