package graft.queries

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import Tables.t

/** Wave-45 inventory (r7): behavioral audits over the event stream and
  * the canonical causal-inference estimator over orders. */
object BehaviorQueries {

  // ---------------------------------------------------------------- C86
  /** Bot-likeness score per user: event volume, type diversity, and the
    * REGULARITY of inter-arrival gaps — bots fire on timers (squared
    * coefficient of variation ≈ 0) where humans are bursty (cv² ≈ 1 for
    * Poisson arrivals). cv² in exact ppm by integer cross-multiplication
    * ((m·Σg² − (Σg)²)·10⁶ div (Σg)², non-negative by Cauchy–Schwarz,
    * wide products through DECIMAL(38,0)/HUGEINT — gaps are epoch-micro
    * differences, so (Σg)² alone overflows int64). The lag window is
    * PARTITIONED BY user (per-partition sorts bounded by one user's
    * events — never a global sort); one grouped pass after it. The flag
    * thresholds are policy constants; on this corpus's synthetic Poisson
    * arrivals finding NO bots is the expected (and audited) answer. */
  private val botScore = QueryDef(
    "bot_score",
    (s, d) => {
      val ev = t(s, d, "events").select(F.col("user_id"),
        F.unix_micros(F.col("ts")).as("us"), F.col("event_id"),
        F.col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev.withColumn("prev", F.lag("us", 1).over(w))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).as("n_events"),
          F.countDistinct("event_type").as("n_types"),
          F.count("prev").as("m"),
          F.sum(F.expr(
            "CASE WHEN prev IS NULL THEN 0L ELSE us - prev END"))
            .as("sg"),
          F.sum(F.expr(
            "CAST(CASE WHEN prev IS NULL THEN 0 ELSE us - prev END " +
              "AS DECIMAL(38,0)) * " +
              "CASE WHEN prev IS NULL THEN 0 ELSE us - prev END"))
            .as("sg2"))
        .select(F.col("user_id"), F.col("n_events"), F.col("n_types"),
          F.expr("CASE WHEN m > 0 THEN sg div m ELSE 0L END")
            .as("mean_gap_us"),
          F.expr("CASE WHEN m > 1 AND sg > 0 THEN " +
            "CAST((CAST(m AS DECIMAL(38,0)) * sg2 - " +
            "CAST(sg AS DECIMAL(38,0)) * sg) * 1000000 div " +
            "(CAST(sg AS DECIMAL(38,0)) * sg) AS BIGINT) ELSE 0L END")
            .as("cv2_ppm"))
        .withColumn("is_bot",
          F.expr("n_events >= 60 AND cv2_ppm < 250000"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        FROM events),
      g AS (
        SELECT user_id, event_type, us,
               lag(us) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS prev
        FROM e),
      per AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(count(prev) AS BIGINT) AS m,
               CAST(sum(CASE WHEN prev IS NULL THEN 0 ELSE us - prev END)
                    AS BIGINT) AS sg,
               sum(CAST(CASE WHEN prev IS NULL THEN 0 ELSE us - prev END
                        AS HUGEINT)
                   * CASE WHEN prev IS NULL THEN 0 ELSE us - prev END)
                 AS sg2
        FROM g GROUP BY 1),
      sc AS (
        SELECT user_id, n_events, n_types,
               CAST(CASE WHEN m > 0 THEN sg // m ELSE 0 END AS BIGINT)
                 AS mean_gap_us,
               CAST(CASE WHEN m > 1 AND sg > 0 THEN
                 (CAST(m AS HUGEINT) * sg2 - CAST(sg AS HUGEINT) * sg)
                   * 1000000 // (CAST(sg AS HUGEINT) * sg)
                 ELSE 0 END AS BIGINT) AS cv2_ppm
        FROM per)
      SELECT user_id, n_events, n_types, mean_gap_us, cv2_ppm,
             n_events >= 60 AND cv2_ppm < 250000 AS is_bot
      FROM sc ORDER BY user_id"""))

  // ---------------------------------------------------------------- M19
  /** Difference-in-differences on average order value: treated =
    * BUILDING-segment customers, intervention at 1998-06-01 (mid-range of
    * the 1995-2001 order calendar). The four cell means in exact micro-cents
    * (Σcents·10⁶ div n, sums through DECIMAL(38,0)/HUGEINT — corpus
    * cent-sums overflow int64 when multiplied by 10⁶ at SF100), DiD =
    * (post−pre)_treated − (post−pre)_control as plain integer
    * subtraction. ONE conditional-sum aggregate over the broadcast-dim
    * join — the 2×2 grid never materializes as separate passes. */
  private val diffInDiff = QueryDef(
    "diff_in_diff",
    (s, d) => {
      t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(
          F.expr("c_mktsegment = 'BUILDING'").as("tr"),
          F.expr("to_date(o_orderdate) >= DATE '1998-06-01'").as("po"),
          F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .agg(
          F.sum(F.expr("CASE WHEN tr AND NOT po THEN 1L ELSE 0L END")).as("n_t0"),
          F.sum(F.expr("CASE WHEN tr AND po THEN 1L ELSE 0L END")).as("n_t1"),
          F.sum(F.expr("CASE WHEN NOT tr AND NOT po THEN 1L ELSE 0L END")).as("n_c0"),
          F.sum(F.expr("CASE WHEN NOT tr AND po THEN 1L ELSE 0L END")).as("n_c1"),
          F.sum(F.expr("CASE WHEN tr AND NOT po THEN cents ELSE 0L END")).as("s_t0"),
          F.sum(F.expr("CASE WHEN tr AND po THEN cents ELSE 0L END")).as("s_t1"),
          F.sum(F.expr("CASE WHEN NOT tr AND NOT po THEN cents ELSE 0L END")).as("s_c0"),
          F.sum(F.expr("CASE WHEN NOT tr AND po THEN cents ELSE 0L END")).as("s_c1"))
        .select(F.col("n_t0"), F.col("n_t1"), F.col("n_c0"), F.col("n_c1"),
          F.expr("CAST(CAST(s_t0 AS DECIMAL(38,0)) * 1000000 div n_t0 AS BIGINT)").as("m_t0_micro"),
          F.expr("CAST(CAST(s_t1 AS DECIMAL(38,0)) * 1000000 div n_t1 AS BIGINT)").as("m_t1_micro"),
          F.expr("CAST(CAST(s_c0 AS DECIMAL(38,0)) * 1000000 div n_c0 AS BIGINT)").as("m_c0_micro"),
          F.expr("CAST(CAST(s_c1 AS DECIMAL(38,0)) * 1000000 div n_c1 AS BIGINT)").as("m_c1_micro"))
        .withColumn("did_micro",
          F.expr("(m_t1_micro - m_t0_micro) - (m_c1_micro - m_c0_micro)"))
    },
    Some("""
      WITH b AS (
        SELECT c_mktsegment = 'BUILDING' AS tr,
               CAST(o_orderdate AS DATE) >= DATE '1998-06-01' AS po,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey),
      a AS (
        SELECT
          CAST(sum(CASE WHEN tr AND NOT po THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
          CAST(sum(CASE WHEN tr AND po THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
          CAST(sum(CASE WHEN NOT tr AND NOT po THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
          CAST(sum(CASE WHEN NOT tr AND po THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
          CAST(sum(CASE WHEN tr AND NOT po THEN cents ELSE 0 END) AS BIGINT) AS s_t0,
          CAST(sum(CASE WHEN tr AND po THEN cents ELSE 0 END) AS BIGINT) AS s_t1,
          CAST(sum(CASE WHEN NOT tr AND NOT po THEN cents ELSE 0 END) AS BIGINT) AS s_c0,
          CAST(sum(CASE WHEN NOT tr AND po THEN cents ELSE 0 END) AS BIGINT) AS s_c1
        FROM b),
      m AS (
        SELECT n_t0, n_t1, n_c0, n_c1,
               CAST(CAST(s_t0 AS HUGEINT) * 1000000 // n_t0 AS BIGINT) AS m_t0_micro,
               CAST(CAST(s_t1 AS HUGEINT) * 1000000 // n_t1 AS BIGINT) AS m_t1_micro,
               CAST(CAST(s_c0 AS HUGEINT) * 1000000 // n_c0 AS BIGINT) AS m_c0_micro,
               CAST(CAST(s_c1 AS HUGEINT) * 1000000 // n_c1 AS BIGINT) AS m_c1_micro
        FROM a)
      SELECT n_t0, n_t1, n_c0, n_c1,
             m_t0_micro, m_t1_micro, m_c0_micro, m_c1_micro,
             (m_t1_micro - m_t0_micro) - (m_c1_micro - m_c0_micro)
               AS did_micro
      FROM m"""))

  // ---------------------------------------------------------------- C87
  /** Behavioral predictability per user: Shannon entropy of the
    * event-type distribution (F5's integer-micro discipline — each
    * c·log2(c) term rounded to micros BEFORE the sum so the aggregate
    * is order-independent, H = log2(n) − Σ/n in pure int64), plus the
    * dominant type and its exact-ppm share. Low entropy + high top
    * share = scripted single-purpose account; the behavioral complement
    * of C86's timing regularity. Frame bounded by users × 5 types. */
  private val userEntropy = QueryDef(
    "user_entropy",
    (s, d) => {
      val cnt = t(s, d, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).as("c"))
      cnt.groupBy("user_id")
        .agg(F.sum("c").as("n"),
          F.count(F.lit(1)).as("n_types"),
          F.expr("sum(CAST(round(c * log2(c) * 1000000) AS BIGINT))")
            .as("s"),
          F.max(F.struct(F.col("c"), F.col("event_type"))).as("_top"))
        .select(F.col("user_id"), F.col("n"), F.col("n_types"),
          F.expr("CAST(round(log2(n) * 1000000) AS BIGINT) - s div n")
            .as("entropy_micro"),
          F.col("_top.event_type").as("top_type"),
          F.expr("_top.c * 1000000L div n").as("top_share_ppm"))
        .orderBy("user_id")
    },
    Some("""
      WITH cnt AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      top AS (
        SELECT user_id, event_type, c FROM (
          SELECT user_id, event_type, c,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY c DESC, event_type DESC) AS rn
          FROM cnt) WHERE rn = 1),
      per AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CAST(round(c * log2(c) * 1000000) AS BIGINT))
                    AS BIGINT) AS s
        FROM cnt GROUP BY 1)
      SELECT p.user_id, p.n, p.n_types,
             CAST(round(log2(p.n) * 1000000) AS BIGINT) - p.s // p.n
               AS entropy_micro,
             t.event_type AS top_type,
             CAST(t.c * 1000000 // p.n AS BIGINT) AS top_share_ppm
      FROM per p JOIN top t USING (user_id) ORDER BY user_id"""))

  // ---------------------------------------------------------------- C88
  /** Day-of-week × hour traffic heatmap: events and distinct users per
    * (isodow, hour) cell with exact-ppm corpus share — the capacity/
    * on-call planning grid. One map-side-combined aggregate to a ≤168-
    * row frame + 1-row broadcast total; `weekday()+1 == isodow` pinned
    * across engines exactly as M6 does. */
  private val eventHeatmap = QueryDef(
    "event_heatmap",
    (s, d) => {
      val g = t(s, d, "events")
        .groupBy(F.expr("CAST(weekday(ts) + 1 AS BIGINT)").as("dow"),
          F.expr("CAST(hour(ts) AS BIGINT)").as("hr"))
        .agg(F.count(F.lit(1)).as("n_events"),
          F.countDistinct("user_id").as("n_users"))
      val tot = g.agg(F.sum("n_events").as("t"))
      g.crossJoin(F.broadcast(tot))
        .select(F.col("dow"), F.col("hr"), F.col("n_events"),
          F.col("n_users"),
          F.expr("n_events * 1000000L div t").as("share_ppm"))
        .orderBy("dow", "hr")
    },
    Some("""
      WITH g AS (
        SELECT CAST(isodow(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2),
      tt AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM g)
      SELECT dow, hr, n_events, n_users,
             CAST(n_events * 1000000 // t AS BIGINT) AS share_ppm
      FROM g, tt ORDER BY dow, hr"""))

  // ---------------------------------------------------------------- M29
  /** CUPED variance reduction [Deng et al. 2013] beside M19's DiD:
    * metric y = 1997 spend per customer, covariate x = 1996 spend,
    * θ = cov(x,y)/var(x) fit POOLED over the cohort; per group
    * (treated = BUILDING) the adjusted mean ŷ = ȳ_g − θ(x̄_g − x̄). All
    * sums exact (cross-products through DECIMAL(38,0)/HUGEINT), means
    * in exact micro-cents, the θ / adjusted-mean / ρ² closing formulas
    * one string-routed double each (M9's §5 discipline); ρ² is the
    * published variance-reduction fraction. One per-customer
    * conditional aggregate + one group rollup + a 1-row pooled
    * broadcast. */
  private val abCuped = QueryDef(
    "ab_cuped",
    (s, d) => {
      val per = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("o_custkey").as("ck"),
          F.expr("c_mktsegment = 'BUILDING'").as("treated"),
          F.expr("year(to_date(o_orderdate))").as("yr"),
          F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("ck", "treated")
        .agg(
          F.sum(F.expr("CASE WHEN yr = 1996 THEN cents ELSE 0L END")).as("x"),
          F.sum(F.expr("CASE WHEN yr = 1997 THEN cents ELSE 0L END")).as("y"),
          F.sum(F.expr("CASE WHEN yr = 1996 THEN 1L ELSE 0L END")).as("f96"))
        .where(F.col("f96") > 0)
      val pooled = per.agg(F.count(F.lit(1)).as("n"),
        F.sum("x").as("sx"), F.sum("y").as("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      val groups = per.groupBy("treated").agg(
        F.count(F.lit(1)).as("n_g"),
        F.sum("x").as("sx_g"), F.sum("y").as("sy_g"))
      val num = "CAST(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy " +
        "AS STRING) AS DOUBLE)"
      val dx = "CAST(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx " +
        "AS STRING) AS DOUBLE)"
      val dy = "CAST(CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy " +
        "AS STRING) AS DOUBLE)"
      groups.crossJoin(F.broadcast(pooled))
        .select(F.col("treated"), F.col("n_g"),
          F.expr("CAST(CAST(sx_g AS DECIMAL(38,0)) * 1000000 div n_g " +
            "AS BIGINT)").as("mean_x_micro"),
          F.expr("CAST(CAST(sy_g AS DECIMAL(38,0)) * 1000000 div n_g " +
            "AS BIGINT)").as("mean_y_micro"),
          F.expr(s"round($num / $dx, 6)").as("theta"),
          F.expr(s"round(CAST(sy_g AS DOUBLE) / n_g - ($num / $dx) * " +
            "(CAST(sx_g AS DOUBLE) / n_g - CAST(sx AS DOUBLE) / n), 6)")
            .as("adj_mean_y_cents"),
          F.expr(s"round(($num / $dx) * ($num / $dy), 6)").as("rho2"))
        .orderBy("treated")
    },
    Some {
      val num = "CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy " +
        "AS VARCHAR) AS DOUBLE)"
      val dx = "CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx " +
        "AS VARCHAR) AS DOUBLE)"
      val dy = "CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy " +
        "AS VARCHAR) AS DOUBLE)"
      s"""
      WITH per AS (
        SELECT o_custkey AS ck, c_mktsegment = 'BUILDING' AS treated,
               CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                        THEN CAST(floor(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
                        THEN CAST(floor(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y,
               CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                        THEN 1 ELSE 0 END) AS BIGINT) AS f96
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2 HAVING f96 > 0),
      pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM per),
      g AS (
        SELECT treated, CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(x) AS BIGINT) AS sx_g,
               CAST(sum(y) AS BIGINT) AS sy_g
        FROM per GROUP BY 1)
      SELECT treated, n_g,
             CAST(CAST(sx_g AS HUGEINT) * 1000000 // n_g AS BIGINT)
               AS mean_x_micro,
             CAST(CAST(sy_g AS HUGEINT) * 1000000 // n_g AS BIGINT)
               AS mean_y_micro,
             round($num / $dx, 6) AS theta,
             round(CAST(sy_g AS DOUBLE) / n_g - ($num / $dx) *
                   (CAST(sx_g AS DOUBLE) / n_g - CAST(sx AS DOUBLE) / n),
                   6) AS adj_mean_y_cents,
             round(($num / $dx) * ($num / $dy), 6) AS rho2
      FROM g, pooled ORDER BY treated"""
    })

  val all: Seq[QueryDef] = Seq(botScore, diffInDiff, userEntropy,
    eventHeatmap, abCuped)
}
