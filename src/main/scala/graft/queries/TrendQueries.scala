package graft.queries

import graft.operators.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-18 inventory (r5): distributional / temporal analytics —
  * shuffle-free equi-width histograms, cohort term-trend detection,
  * integer EWMA smoothing, sweep-line interval timelines, and graph
  * degree distributions.
  *
  * House rules as everywhere: integer arithmetic end to end (rational
  * EWMA weights, micro-scaled ratios), aggregate-then-sweep shapes so
  * ordered recursions only ever run on metadata-sized day grids, and
  * oracle formulations that are independent of the Spark plan
  * (recursive CTEs vs array folds, blind expansion vs frontier). */
object TrendQueries {

  // ---------------------------------------------------------------- C54
  /** Equi-width histogram of customer balances: global [min, max] from
    * ONE tiny aggregate (broadcast back as a 1-row frame), then bin
    * assignment is a pure map-side projection — integer cents, the
    * +1-width trick pinning max into the last bin — and the per-bin
    * stats aggregate map-side. Contrast with C22's ntile: rank-based
    * binning needs a GLOBAL SORT of the data; equi-width needs only a
    * 1-row broadcast, which is why it is the 100 TB histogram.
    * Empty bins are legitimately absent (no spine join — the output
    * reports mass, not the grid). */
  private val histogramEquiwidth = QueryDef(
    "histogram_equiwidth",
    (s, d) => {
      val nb = 20L
      val c = t(s, d, "customer")
        .select(F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("cents"))
      val ext = c.agg(F.min("cents").as("min_c"), F.max("cents").as("max_c"))
      c.crossJoin(F.broadcast(ext))
        .withColumn("bin",
          F.expr(s"(cents - min_c) * $nb div (max_c - min_c + 1)"))
        .groupBy("bin").agg(
          F.count(F.lit(1)).as("n"),
          F.min("cents").as("lo_cents"),
          F.max("cents").as("hi_cents"),
          F.sum("cents").as("sum_cents"))
        .orderBy("bin")
    },
    Some("""
      WITH c AS (
        SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
      ext AS (SELECT min(cents) AS min_c, max(cents) AS max_c FROM c)
      SELECT (cents - min_c) * 20 // (max_c - min_c + 1) AS bin,
             count(*) AS n, min(cents) AS lo_cents, max(cents) AS hi_cents,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM c, ext GROUP BY 1 ORDER BY bin"""))

  // ---------------------------------------------------------------- E50
  /** Trending-term detection between two deterministic document cohorts
    * (doc_id parity — stands in for the before/after time split of a
    * crawl): per-term counts in each cohort from one exploded
    * aggregate, add-one smoothed ratio in integer micros (exact on
    * both engines — no log-odds, same discipline as the surprisal
    * family), gated to terms with real mass (≥ 10 total), top 20 by
    * (ratio, term). The classic "what changed in this crawl" audit.
    *
    * Scale shape: one explode + one map-side-combined aggregate keyed
    * on term; the top-k plans as TakeOrderedAndProject (no global
    * sort materialization). */
  private val termTrends = QueryDef(
    "term_trends",
    (s, d) => {
      val toks = t(s, d, "documents").select(
        F.expr("doc_id % 2").as("cohort"),
        F.explode(TextOps.tokens(F.col("text"))).as("term"))
      toks.groupBy("term").agg(
        F.sum(F.expr("CASE WHEN cohort = 0 THEN 1 ELSE 0 END")).as("c0"),
        F.sum(F.expr("CASE WHEN cohort = 1 THEN 1 ELSE 0 END")).as("c1"))
        .where(F.expr("c0 + c1 >= 10"))
        .withColumn("ratio_micros",
          F.expr("CAST(CAST(c1 + 1 AS DECIMAL(38,0)) * 1000000 div " +
            "(c0 + 1) AS BIGINT)"))
        .orderBy(F.col("ratio_micros").desc, F.col("term"))
        .limit(20)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id % 2 AS cohort,
               unnest(regexp_split_to_array(lower(text), ' +')) AS term
        FROM documents),
      tc AS (
        SELECT term,
               CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM toks GROUP BY 1)
      SELECT term, c0, c1,
             CAST(CAST(c1 + 1 AS HUGEINT) * 1000000 // (c0 + 1) AS BIGINT)
               AS ratio_micros
      FROM tc WHERE c0 + c1 >= 10
      ORDER BY ratio_micros DESC, term LIMIT 20"""))

  // ---------------------------------------------------------------- E51
  /** Integer EWMA smoothing of daily event volumes, α = 1/4 as the
    * RATIONAL recursion s_i = (3·s_{i−1} + x_i) div 4 (s_1 = x_1) — the
    * floor at each step makes every intermediate exactly representable,
    * so the whole smoothed series is hash-portable (a float EWMA would
    * drift in the last ulp). Same aggregate-then-fold shape as E49's
    * CUSUM: daily counts map-side, then a per-series array fold that
    * EMITS the full smoothed series (accumulator carries the growing
    * (day, cnt, ewma) array — bounded by calendar days), exploded back
    * to rows via the shared [[graft.operators.SeriesOps.ewmaFold]]
    * (also the G12 streaming twin's fold). Oracle replays the
    * recursion as a recursive CTE. */
  private val ewmaSmooth = QueryDef(
    "ewma_smooth",
    (s, d) => {
      val dc = t(s, d, "events")
        .groupBy(F.col("event_type"), F.to_date(F.col("ts")).as("day"))
        .agg(F.count(F.lit(1)).as("cnt"))
      graft.operators.SeriesOps.ewmaFold(dc, "event_type", "day", "cnt")
        .orderBy("event_type", "day")
    },
    Some("""
      WITH RECURSIVE dc AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      seq AS (
        SELECT event_type, day, cnt,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        FROM dc),
      r AS (
        SELECT event_type, rn, day, cnt, cnt AS ewma
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.day, s.cnt,
               CAST((3 * r.ewma + s.cnt) // 4 AS BIGINT)
        FROM r JOIN seq s
          ON s.event_type = r.event_type AND s.rn = r.rn + 1)
      SELECT event_type, day, cnt, CAST(ewma AS BIGINT) AS ewma
      FROM r ORDER BY event_type, day"""))

  // ---------------------------------------------------------------- C55
  /** Open-pipeline timeline by sweep line: each line item is "open"
    * between its two milestone dates (+1 at the earlier of order/ship
    * day, −1 at the later — open on day d iff least ≤ d < greatest;
    * the synthetic dates are independent, so the interval takes
    * least/greatest rather than assuming order ≤ ship). The deltas
    * aggregate PER DAY map-side FIRST — so the ordered cumulative sum
    * runs over the calendar-day grid (metadata-sized at any corpus
    * scale), never over the fact table. The single-partition window on
    * ~2.5k day rows is the correct plan precisely because the
    * aggregate already collapsed 100 TB to days; the same query with
    * the window over raw lineitem would be the global-sort
    * scale-killer this repo keeps out (cf. pack_bins). The order⋈line
    * join co-partitions on the order key (both sides shuffle once,
    * ≤ lines-per-order fan-out). */
  private val inTransitTimeline = QueryDef(
    "open_pipeline_timeline",
    (s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      val ord = t(s, d, "orders").select("o_orderkey", "o_orderdate")
      val j = li.join(ord, F.col("l_orderkey") === F.col("o_orderkey"))
        .select(
          F.least(F.to_date(F.col("o_orderdate")),
            F.to_date(F.col("l_shipdate"))).as("lo"),
          F.greatest(F.to_date(F.col("o_orderdate")),
            F.to_date(F.col("l_shipdate"))).as("hi"))
      val deltas = j.select(F.col("lo").as("day"), F.lit(1L).as("delta"))
        .unionAll(j.select(F.col("hi").as("day"), F.lit(-1L).as("delta")))
      val byDay = deltas.groupBy("day").agg(F.sum("delta").as("net"))
      byDay.withColumn("n_open",
        F.sum("net").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    },
    Some("""
      WITH j AS (
        SELECT least(CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lo,
               greatest(CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS hi
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deltas AS (
        SELECT lo AS day, 1 AS delta FROM j
        UNION ALL
        SELECT hi AS day, -1 AS delta FROM j),
      byday AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS net
        FROM deltas GROUP BY 1)
      SELECT day, net,
             CAST(sum(net) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_open
      FROM byday ORDER BY day"""))

  // ---------------------------------------------------------------- D23
  /** Degree distribution of the co-purchase graph — the first question
    * asked of any similarity/candidate graph before running anything
    * iterative on it (D15 PageRank, D11 CC, D22 BFS): how heavy are the
    * hubs, how long is the tail. Two map-side-combined aggregates
    * (node → degree, degree → node count); output is bounded by the
    * max degree, not the corpus. The pair list is the SHARED staged
    * build ([[Staged.coPurchasePairs]], also feeding D22/C49) with a
    * distinct on top for degree semantics. */
  private val degreeDist = QueryDef(
    "degree_dist",
    (s, d) => {
      val pairs = Staged.coPurchaseEdges(s, d)
      val deg = pairs.select(F.col("pa").as("node"))
        .unionAll(pairs.select(F.col("pb").as("node")))
        .groupBy("node").agg(F.count(F.lit(1)).as("degree"))
      deg.groupBy("degree").agg(F.count(F.lit(1)).as("n_nodes"))
        .orderBy("degree")
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      deg AS (
        SELECT node, count(*) AS degree FROM (
          SELECT pa AS node FROM pairs
          UNION ALL SELECT pb FROM pairs)
        GROUP BY 1)
      SELECT degree, count(*) AS n_nodes
      FROM deg GROUP BY 1 ORDER BY degree"""))

  // ---------------------------------------------------------------- C57
  /** Time-bounded ORDERED funnel (the windowFunnel shape): per user,
    * how deep did view → click → purchase progress, where each later
    * stage must strictly FOLLOW the previous one AND land within 1 h
    * of the first view — C8c's funnel checks order alone; conversion
    * windows are what attribution actually uses.
    *
    * Scale shape: one conditional aggregate per stage, each keyed on
    * user_id — three shuffles on the SAME key (co-partitioned, AQE
    * reuses the exchange), no self-join, per-user state is one
    * timestamp per stage. The sequential dependency (stage n's filter
    * needs stage n−1's timestamp) is inherent to funnel semantics; it
    * costs stages−1 co-partitioned joins, never a per-event window
    * sort. Stage rows left-join onto the user spine so non-entrants
    * report stage 0. */
  private val funnelWindow = QueryDef(
    "funnel_window",
    (s, d) => {
      val ev = t(s, d, "events")
      val (t1, t2, t3) = funnelStageTimes(s, d)
      ev.select("user_id").distinct()
        .join(t1, Seq("user_id"), "left")
        .join(t2.select("user_id", "t_click"), Seq("user_id"), "left")
        .join(t3, Seq("user_id"), "left")
        .withColumn("stage", F.expr(
          """CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                       WHEN t_click IS NOT NULL THEN 2
                       WHEN t_view IS NOT NULL THEN 1
                       ELSE 0 END AS BIGINT)"""))
        .orderBy("user_id")
    },
    Some(funnelWindowOracleSql))

  /** C57's per-stage first-entry timestamps — (t1, t2, t3) frames keyed
    * on user_id, each later stage strictly after the previous and within
    * 1 h of the first view. Shared by `funnel_window` and C61
    * `funnel_time_stats` so both operators audit the SAME funnel. */
  private[queries] def funnelStageTimes(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val ev = t(s, d, "events")
    val hour = F.expr("INTERVAL 1 HOUR")
    val t1 = ev.where(F.col("event_type") === "view")
      .groupBy("user_id").agg(F.min("ts").as("t_view"))
    val t2 = ev.where(F.col("event_type") === "click")
      .join(t1, "user_id")
      .where(F.col("ts") > F.col("t_view") &&
        F.col("ts") <= F.col("t_view") + hour)
      .groupBy("user_id")
      .agg(F.min("ts").as("t_click"), F.min("t_view").as("_tv"))
    val t3 = ev.where(F.col("event_type") === "purchase")
      .join(t2, "user_id")
      .where(F.col("ts") > F.col("t_click") &&
        F.col("ts") <= F.col("_tv") + hour)
      .groupBy("user_id").agg(F.min("ts").as("t_purchase"))
    (t1, t2, t3)
  }

  /** C57 oracle SQL — shared with the G19 streaming twin. */
  private[queries] def funnelWindowOracleSql: String = """
      WITH t1 AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1),
      t2 AS (
        SELECT e.user_id, min(e.ts) AS t_click, min(t1.t_view) AS t_view
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.t_view
          AND e.ts <= t1.t_view + INTERVAL 1 HOUR
        GROUP BY 1),
      t3 AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
          AND e.ts <= t2.t_view + INTERVAL 1 HOUR
        GROUP BY 1)
      SELECT u.user_id, t1.t_view, t2.t_click, t3.t_purchase,
             CAST(CASE WHEN t3.t_purchase IS NOT NULL THEN 3
                       WHEN t2.t_click IS NOT NULL THEN 2
                       WHEN t1.t_view IS NOT NULL THEN 1
                       ELSE 0 END AS BIGINT) AS stage
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN t1 USING (user_id)
      LEFT JOIN t2 USING (user_id)
      LEFT JOIN t3 USING (user_id)
      ORDER BY user_id"""

  val all: Seq[QueryDef] = Seq(histogramEquiwidth, termTrends, ewmaSmooth,
    inTransitTimeline, degreeDist, funnelWindow)
}
