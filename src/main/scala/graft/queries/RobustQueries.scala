package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-21 inventory (r6): robust statistics and graph/feature
  * analytics — the estimators a pipeline reaches for when OLS / plain
  * counts are too fragile: Theil–Sen median slopes (50% breakdown
  * point vs OLS's zero), mutual information between categorical
  * metadata columns, common-neighbor link prediction on the
  * co-purchase graph, and the per-dimension embedding profile that
  * drives feature selection for quantized ANN.
  *
  * House rules as everywhere (SURVEY §5): integer-exact micro
  * arithmetic with wide products through DECIMAL(38,0)/HUGEINT; logs
  * are single per-cell IEEE ops rounded to micros BEFORE any sum so
  * aggregation stays order-independent; every frame that gets a window
  * sort is bounded by calendar/alphabet/dimension count, never by the
  * corpus.
  */
object RobustQueries {

  // ---------------------------------------------------------------- C64
  /** Theil–Sen robust trend per month: daily revenue cents (exact
    * decimal sums), all day-pairs WITHIN a month (≤ C(31,2) = 465 pairs
    * per group — calendar-bounded, never corpus-bounded), slope of each
    * pair in floor-division micros, and the deterministic median slope
    * via the percentile_disc cum-count pick (no NTILE tie ambiguity).
    * Floor division is spelled (a − ((a%b)+b)%b) div b on BOTH engines
    * — both native operators (Spark `div`, DuckDB `//`) truncate toward
    * zero, so they already agree; the explicit mod-adjusted form pins
    * TRUE FLOOR semantics independent of either engine's truncation
    * choice (and of any future engine swap) for negative dy. */
  /** Shared 1995 daily-revenue frame — (month, day-of-month x, exact
    * cents): ONE corpus aggregate to a ≤365-row calendar frame, the
    * common input of C64's slope estimate and M44's trend test. */
  private def dailyCents1995(s: org.apache.spark.sql.SparkSession,
      d: String) =
    t(s, d, "orders")
      .where(F.year(F.col("o_orderdate")) === 1995)
      .groupBy(F.date_format(F.col("o_orderdate"), "yyyy-MM").as("month"),
        F.dayofmonth(F.col("o_orderdate")).cast("long").as("x"))
      .agg(F.expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)")
        .as("cents"))

  private val dailyCtesSql = """daily AS (
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
               CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100
                    AS BIGINT) AS cents
        FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
        GROUP BY 1, 2)"""

  private val theilSen = QueryDef(
    "theil_sen",
    (s, d) => {
      val daily = dailyCents1995(s, d)
      val pairs = daily.as("a")
        .join(daily.as("b"), F.expr("a.month = b.month AND a.x < b.x"))
        .select(F.col("a.month").as("month"),
          F.expr("CAST(b.cents - a.cents AS DECIMAL(38,0)) * 1000000")
            .as("dy"),
          F.expr("b.x - a.x").as("dx"))
        .select(F.col("month"),
          F.expr("CAST((dy - ((dy % dx) + dx) % dx) div dx AS BIGINT)")
            .as("slope_micro"))
      val grouped = pairs.groupBy("month", "slope_micro")
        .agg(F.count(F.lit(1)).as("c"))
      val w = Window.partitionBy("month").orderBy("slope_micro")
      grouped
        .withColumn("cum", F.sum("c").over(w))
        .withColumn("tot", F.sum("c").over(Window.partitionBy("month")))
        .groupBy("month")
        .agg(F.max("tot").as("n_pairs"),
          F.min(F.when(F.expr("2 * cum >= tot + 1"),
            F.col("slope_micro"))).as("median_slope_micro"))
        .orderBy("month")
    },
    Some(s"""
      WITH $dailyCtesSql,
      pr AS (
        SELECT a.month,
               CAST(b.cents - a.cents AS HUGEINT) * 1000000 AS dy,
               b.x - a.x AS dx
        FROM daily a JOIN daily b ON a.month = b.month AND a.x < b.x),
      sl AS (
        SELECT month,
               CAST((dy - ((dy % dx) + dx) % dx) // dx AS BIGINT)
                 AS slope_micro
        FROM pr),
      g AS (
        SELECT month, slope_micro, CAST(count(*) AS BIGINT) AS c
        FROM sl GROUP BY 1, 2),
      cu AS (
        SELECT month, slope_micro, c,
               sum(c) OVER (PARTITION BY month ORDER BY slope_micro
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY month) AS tot
        FROM g)
      SELECT month, CAST(max(tot) AS BIGINT) AS n_pairs,
             CAST(min(CASE WHEN 2 * cum >= tot + 1 THEN slope_micro END)
                  AS BIGINT) AS median_slope_micro
      FROM cu GROUP BY month ORDER BY month"""))

  // ---------------------------------------------------------------- M44
  /** Mann-Kendall trend test per month — the SIGNIFICANCE companion to
    * C64's Theil–Sen slope (the slope says how steep; S says whether the
    * monotone trend is distinguishable from noise), sharing the same
    * calendar-bounded daily frame and ≤ C(31,2) within-month pair
    * budget. S = Σ_{i<j} sign(cents_j − cents_i) is pure integer
    * pair-sign counting; the tie-corrected variance numerator
    * V18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) is an exact integer from the
    * per-(month, value) tie groups; z applies the classical continuity
    * correction ((S−1) above / (S+1) below / 0 at S = 0) with ONE
    * closing division by sqrt(V18/18) — integer numerator, sqrt of an
    * exactly-representable integer double.
    *
    * Scale shape: one corpus aggregate to the ≤365-row daily frame;
    * pairs, tie groups and the closing math are all calendar-bounded
    * metadata. */
  private val mannKendall = QueryDef(
    "mann_kendall",
    (s, d) => {
      val daily = dailyCents1995(s, d)
      val sPerM = daily.as("a")
        .join(daily.as("b"), F.expr("a.month = b.month AND a.x < b.x"))
        .select(F.col("a.month").as("month"),
          F.expr("""CASE WHEN b.cents > a.cents THEN 1L
            |WHEN b.cents < a.cents THEN -1L ELSE 0L END""".stripMargin)
            .as("sg"))
        .groupBy("month").agg(F.sum("sg").as("s_stat"))
      val nPerM = daily.groupBy("month")
        .agg(F.count(F.lit(1)).as("n_days"))
      val tiePerM = daily.groupBy("month", "cents")
        .agg(F.count(F.lit(1)).as("_t"))
        .groupBy("month")
        .agg(F.sum(F.expr("_t * (_t - 1) * (2 * _t + 5)")).as("_tt"))
      nPerM.join(sPerM, "month").join(tiePerM, "month")
        .withColumn("_v18", F.expr(
          "n_days * (n_days - 1) * (2 * n_days + 5) - _tt"))
        .select(F.col("month"), F.col("n_days"), F.col("s_stat"),
          F.expr("""CASE WHEN _v18 <= 0 OR s_stat = 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE round((CAST(s_stat AS DOUBLE)
            |            - CASE WHEN s_stat > 0 THEN 1 ELSE -1 END)
            |           / sqrt(CAST(_v18 AS DOUBLE) / 18.0), 6) END"""
            .stripMargin).as("z"))
        .orderBy("month")
    },
    Some(s"""
      WITH $dailyCtesSql,
      sm AS (SELECT a.month, CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                                      WHEN b.cents < a.cents THEN -1
                                      ELSE 0 END) AS BIGINT) AS s_stat
             FROM daily a JOIN daily b
               ON a.month = b.month AND a.x < b.x
             GROUP BY 1),
      nm AS (SELECT month, CAST(count(*) AS BIGINT) AS n_days
             FROM daily GROUP BY 1),
      tm AS (SELECT month,
                    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
             FROM (SELECT month, cents, CAST(count(*) AS BIGINT) AS t
                   FROM daily GROUP BY 1, 2) GROUP BY 1),
      v AS (SELECT nm.month, n_days, s_stat,
                   n_days * (n_days - 1) * (2 * n_days + 5) - tt AS v18
            FROM nm JOIN sm ON nm.month = sm.month
                 JOIN tm ON nm.month = tm.month)
      SELECT month, n_days, s_stat,
             CASE WHEN v18 <= 0 OR s_stat = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE round((CAST(s_stat AS DOUBLE)
                           - CASE WHEN s_stat > 0 THEN 1 ELSE -1 END)
                          / sqrt(CAST(v18 AS DOUBLE) / 18.0), 6) END AS z
      FROM v ORDER BY month"""))

  // ---------------------------------------------------------------- M46
  /** Hodges-Lehmann location estimator per month — the ROBUST "typical
    * daily revenue" that pairs with C64's robust slope and M43's
    * signed-rank test (it is the estimator that test inverts): the
    * median of all Walsh averages (cᵢ+cⱼ)/2 over day pairs i ≤ j within
    * the month — ≤ C(31,2)+31 pairs, calendar-bounded like C64's slope
    * pairs. Exactness: Walsh sums ride ×2 (cᵢ+cⱼ stays integral), the
    * median is the deterministic cumulative-count pick over the
    * value-GROUPED pair frame (C64's percentile_disc discipline, no
    * NTILE ambiguity), and the published dollars value is one closing
    * division of an exact integer. 50 % breakdown vs the mean's zero. */
  private val hodgesLehmann = QueryDef(
    "hodges_lehmann",
    (s, d) => {
      val daily = dailyCents1995(s, d)
      val walsh = daily.as("a")
        .join(daily.as("b"), F.expr("a.month = b.month AND a.x <= b.x"))
        .select(F.col("a.month").as("month"),
          F.expr("a.cents + b.cents").as("w2"))
      val grouped = walsh.groupBy("month", "w2")
        .agg(F.count(F.lit(1)).as("c"))
      val w = Window.partitionBy("month").orderBy("w2")
      grouped
        .withColumn("cum", F.sum("c").over(w))
        .withColumn("tot", F.sum("c").over(Window.partitionBy("month")))
        .groupBy("month")
        .agg(F.max("tot").as("n_pairs"),
          F.min(F.when(F.expr("2 * cum >= tot + 1"), F.col("w2")))
            .as("_m2"))
        .select(F.col("month"), F.col("n_pairs"),
          F.expr("round(CAST(_m2 AS DOUBLE) / 200.0, 6)").as("hl_dollars"))
        .orderBy("month")
    },
    Some(s"""
      WITH $dailyCtesSql,
      pr AS (SELECT a.month, a.cents + b.cents AS w2
             FROM daily a JOIN daily b
               ON a.month = b.month AND a.x <= b.x),
      g AS (SELECT month, w2, CAST(count(*) AS BIGINT) AS c
            FROM pr GROUP BY 1, 2),
      cu AS (SELECT month, w2, c,
                    sum(c) OVER (PARTITION BY month ORDER BY w2
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(c) OVER (PARTITION BY month) AS tot
             FROM g)
      SELECT month, CAST(max(tot) AS BIGINT) AS n_pairs,
             round(CAST(min(CASE WHEN 2 * cum >= tot + 1 THEN w2 END)
                        AS DOUBLE) / 200.0, 6) AS hl_dollars
      FROM cu GROUP BY month ORDER BY month"""))

  // ---------------------------------------------------------------- M8
  /** Mutual information between two categorical metadata columns
    * (lang × source on documents) — the dependence audit behind "is
    * my domain mix confounded with language". Cell counts are one
    * map-side-combined shuffle; marginals broadcast back onto the
    * (langs × sources)-bounded cell frame; each cell's c·log2 term is
    * rounded to micros before the per-lang integer sum (order
    * independence), published as each language's MI contribution. */
  private val mutualInformation = QueryDef(
    "mutual_information",
    (s, d) => {
      val docs = t(s, d, "documents")
      val cells = docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).as("c"))
      val rows = docs.groupBy("lang").agg(F.count(F.lit(1)).as("ra"))
      val cols = docs.groupBy("source").agg(F.count(F.lit(1)).as("cb"))
      val tot = docs.agg(F.count(F.lit(1)).as("n"))
      cells
        .join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(tot))
        .select(F.col("lang"), F.col("ra"), F.col("n"), F.expr(
          "CAST(round(c * 1000000 * log2((CAST(c AS DOUBLE) * n) / " +
            "(CAST(ra AS DOUBLE) * cb))) AS BIGINT)").as("term_micro"))
        .groupBy("lang")
        // greatest(·,0): the exact per-lang partial is ≥ 0 (it is
        // p(l)·KL(p(s|l)‖p(s))), so any negative is pure micro-rounding
        // noise — clamping keeps the division on a non-negative value,
        // where truncation and floor coincide whatever either engine's
        // native integer division does
        .agg(F.max("ra").as("n_docs"),
          F.expr("CAST(sum(term_micro) AS BIGINT)").as("sum_term_micro"),
          F.expr("greatest(sum(term_micro), 0L) div max(n)")
            .as("mi_part_micro"))
        .orderBy("lang")
    },
    Some("""
      WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, CAST(count(*) AS BIGINT) AS ra
            FROM documents GROUP BY 1),
      co AS (SELECT source, CAST(count(*) AS BIGINT) AS cb
             FROM documents GROUP BY 1),
      tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      tm AS (
        SELECT cells.lang, ra, n,
               CAST(round(c * 1000000 * log2((CAST(c AS DOUBLE) * n) /
                      (CAST(ra AS DOUBLE) * cb))) AS BIGINT) AS term_micro
        FROM cells JOIN r ON cells.lang = r.lang
             JOIN co ON cells.source = co.source, tt)
      SELECT lang, CAST(max(ra) AS BIGINT) AS n_docs,
             CAST(sum(term_micro) AS BIGINT) AS sum_term_micro,
             CAST(greatest(sum(term_micro), 0) // max(n) AS BIGINT)
               AS mi_part_micro
      FROM tm GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------------- D31
  /** Common-neighbor link prediction on the co-purchase graph, batch
    * pattern: score candidate partners for a deterministic ANCHOR
    * COHORT (pk ≡ 0 mod 199 — the systematic product batch a nightly
    * recommender scores), not all-pairs. For each (anchor, candidate)
    * two-hop NON-edge pair: shared-neighbor count and Jaccard micros;
    * top-100 by (score, pair). The anchor restriction is what bounds
    * cost at scale — fan-out is |cohort|·d̄² (the co-purchase graph is
    * degree-uniform, d̄≈120 at every SF, so a degree cap would not
    * discriminate); the full catalog is covered by running successive
    * cohorts, exactly how production batches it. Edges come from the
    * staged pair graph (built once per SF); the oracle recomputes them
    * from lineitem. */
  private val linkPredict = QueryDef(
    "link_predict",
    (s, d) => {
      // staged deduped edge list: four consumers (anchor broadcast,
      // probe side, two degree broadcasts) read it — broadcast subtrees
      // don't share exchanges, so this must be a materialized input
      val edges = Staged.coPurchaseEdges(s, d)
      val adj = edges.select(F.col("pa").as("x"), F.col("pb").as("z"))
        .union(edges.select(F.col("pb").as("x"), F.col("pa").as("z")))
      val deg = graft.operators.CacheScope.persist(
        adj.groupBy("x").agg(F.count(F.lit(1)).as("dg")))
      // the anchor adjacency is |cohort|·d̄ rows (~12k at sf0.1) and the
      // degree table is node-count-sized — BROADCAST both, so the big
      // adjacency is consumed by ONE shuffle-free map-side join + one
      // partial-aggregated groupBy instead of three shuffle rounds
      val anch = adj.where(F.col("x") % 199 === 0)
      val cand = F.broadcast(anch).as("e1")
        .join(adj.as("e2"),
          F.expr("e1.z = e2.z AND e1.x != e2.x"))
        .groupBy(F.col("e1.x").as("a"), F.col("e2.x").as("b"))
        .agg(F.count(F.lit(1)).as("cn"))
        .where(F.col("cn") >= 2)
        .join(edges.select(F.least(F.col("pa"), F.col("pb")).as("lo"),
          F.greatest(F.col("pa"), F.col("pb")).as("hi")),
          F.expr("least(a, b) = lo AND greatest(a, b) = hi"), "left_anti")
      cand
        .join(F.broadcast(deg.select(F.col("x").as("a"),
          F.col("dg").as("da"))), "a")
        .join(F.broadcast(deg.select(F.col("x").as("b"),
          F.col("dg").as("db"))), "b")
        .select(F.col("a"), F.col("b"), F.col("cn"), F.col("da"),
          F.col("db"),
          F.expr("cn * 1000000L div (da + db - cn)").as("jaccard_micro"))
        .orderBy(F.col("jaccard_micro").desc, F.col("a"), F.col("b"))
        .limit(100)
    },
    Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (
        SELECT DISTINCT a.pk AS pa, b.pk AS pb
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      adj AS (
        SELECT pa AS x, pb AS z FROM edges
        UNION ALL SELECT pb AS x, pa AS z FROM edges),
      deg AS (SELECT x, CAST(count(*) AS BIGINT) AS dg
              FROM adj GROUP BY x),
      cand AS (
        SELECT e1.x AS a, e2.x AS b, CAST(count(*) AS BIGINT) AS cn
        FROM adj e1 JOIN adj e2 ON e1.z = e2.z AND e1.x != e2.x
        WHERE e1.x % 199 = 0
        GROUP BY 1, 2 HAVING count(*) >= 2),
      ne AS (
        SELECT c.* FROM cand c
        LEFT JOIN edges e
          ON least(c.a, c.b) = e.pa AND greatest(c.a, c.b) = e.pb
        WHERE e.pa IS NULL)
      SELECT ne.a, ne.b, cn, da.dg AS da, db.dg AS db,
             CAST(cn * 1000000 // (da.dg + db.dg - cn) AS BIGINT)
               AS jaccard_micro
      FROM ne JOIN deg da ON ne.a = da.x JOIN deg db ON ne.b = db.x
      ORDER BY jaccard_micro DESC, ne.a, ne.b LIMIT 100"""))

  // ---------------------------------------------------------------- D32
  /** Per-dimension embedding profile: n / exact-micro mean / exact
    * variance per coordinate, plus the variance rank that drives
    * dimension selection (which prefix to keep for Matryoshka-style
    * truncation, which dims carry signal for quantized search). Values
    * quantize to integer micros at the scan (float32→double is exact;
    * round-half-away matches on both engines), so all sums are
    * order-independent integers; the square-sum routes through
    * DECIMAL(38,0)/HUGEINT because Σq² overflows int64 past ~1e5 rows
    * of ±0.5-range micros. One posexplode + one 64-group shuffle. */
  private val embedDimProfile = QueryDef(
    "embed_dim_profile",
    (s, d) => {
      val q = t(s, d, "embeddings")
        .select(F.posexplode(F.col("embedding")).as(Seq("i", "v")))
        .select(F.expr("CAST(i + 1 AS BIGINT)").as("dim"),
          F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)")
            .as("qm"))
      val sums = q.groupBy("dim").agg(
        F.count(F.lit(1)).as("n"),
        F.sum("qm").as("sq"),
        F.expr("sum(CAST(qm AS DECIMAL(38,0)) * qm)").as("sqq"))
      sums
        .select(F.col("dim"), F.col("n"),
          F.expr("sq div n").as("mean_micro"),
          F.expr("CAST((n * sqq - CAST(sq AS DECIMAL(38,0)) * sq) div " +
            "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("var_micro2"))
        .withColumn("var_rank", F.row_number().over(
          Window.orderBy(F.col("var_micro2").desc, F.col("dim")))
          .cast("long"))
        .orderBy("dim")
    },
    Some("""
      WITH q AS (
        SELECT CAST(i AS BIGINT) AS dim,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qm
        FROM embeddings, generate_series(1, 64) AS t(i)),
      sums AS (
        SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qm) AS BIGINT) AS sq,
               sum(CAST(qm AS HUGEINT) * qm) AS sqq
        FROM q GROUP BY dim),
      v AS (
        SELECT dim, n, CAST(sq // n AS BIGINT) AS mean_micro,
               CAST((n * sqq - CAST(sq AS HUGEINT) * sq) //
                    (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_micro2
        FROM sums)
      SELECT dim, n, mean_micro, var_micro2,
             CAST(row_number() OVER (ORDER BY var_micro2 DESC, dim)
                  AS BIGINT) AS var_rank
      FROM v ORDER BY dim"""))

  val all: Seq[QueryDef] = Seq(theilSen, mannKendall, hodgesLehmann,
    mutualInformation, linkPredict, embedDimProfile)
}
