package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Round-6 wave: model-evaluation and distribution-audit operators — the
  * metrics a training-data pipeline runs over its own quality/filter
  * models (exact AUC, calibration, decile lift) and over its corpus and
  * revenue distributions (two-sample KS drift, Gini concentration,
  * day-of-week seasonal index, lag autocorrelation).
  *
  * House rules as everywhere: integer-only arithmetic until the final
  * published figure (micros via exact integer division, or doubles
  * derived from exact decimal sums with the identical closing formula
  * on both engines); every aggregate is a grouped map-side-combined
  * shuffle over the corpus followed by windows over frames whose size
  * is bounded by the DOMAIN (distinct score values, distinct doc
  * lengths, calendar days), never by the corpus.
  *
  * The classifier under evaluation is a deterministic stopword-ratio
  * scorer (score = per-mille of tokens in a tiny English stopword set)
  * against the weak label lang='en' — the same weak-label discipline as
  * E39's NB classifier (reference tests validate constraints on fixed
  * frames; these queries evaluate a *model* on a fixed corpus, the step
  * after E39 trains one).
  */
object EvalQueries {

  /** Spark-side tokenizer shared by the scorer queries (identical to
    * PipelineQueries/PrepQueries' toksSql on the DuckDB side). */
  private val toksSpark = "filter(split(lower(text), ' +'), x -> length(x) > 0)"
  private val toksDuck =
    "list_filter(regexp_split_to_array(lower(text), ' +'), x -> length(x) > 0)"
  private val stopSet = "('the','and','of','to','in','a','is')"

  /** score = per-mille stopword ratio (0..1000, integer); label = lang='en'.
    * Purely per-row (array lambda, no explode): the corpus never shuffles
    * until the score-grouped aggregate. */
  private def scored(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents").select(
      F.col("doc_id"),
      F.expr(s"CASE WHEN lang = 'en' THEN 1L ELSE 0L END").as("lbl"),
      F.expr(
        s"1000L * size(filter($toksSpark, x -> x IN $stopSet)) div " +
          s"greatest(size($toksSpark), 1)").as("score"))

  private val scoredSql = s"""
      SELECT doc_id,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS lbl,
             CAST(1000 * len(list_filter($toksDuck, x -> x IN $stopSet))
                  // greatest(len($toksDuck), 1) AS BIGINT) AS score
      FROM documents"""

  // ---------------------------------------------------------------- M1
  /** Exact ROC AUC via the Mann–Whitney rank-sum identity with the
    * standard ½-credit tie correction, computed from SCORE-GROUPED
    * counts: AUC = Σ_s [pos(s) · (neg(<s) + ½·neg(s))] / (P·N). Doubled
    * (u2) so the tie term stays integer; the published figure is exact
    * integer micros through DECIMAL(38,0) / HUGEINT.
    *
    * Scale shape: ONE map-side-combined groupBy(score) over the corpus
    * (distinct scores ≤ 1001 by construction — the per-mille ratio is
    * domain-bounded), then a window over that ≤1001-row frame. This is
    * how AUC is computed at 100 TB: histogram the scores, never sort
    * the corpus (a global rank() would be a single-partition sort). */
  private val evalAuc = QueryDef(
    "eval_auc",
    (s, d) => {
      val g = scored(s, d).groupBy("score").agg(
        F.sum("lbl").as("np"),
        F.sum(F.expr("1L - lbl")).as("nn"))
      val w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cum_nn", F.coalesce(F.sum("nn").over(w), F.lit(0L)))
        .agg(
          F.sum("np").as("p_count"),
          F.sum("nn").as("n_count"),
          F.sum(F.expr("np * (2 * cum_nn + nn)")).as("u2"))
        .withColumn("auc_micros", F.expr(
          "CAST(CAST(u2 AS DECIMAL(38,0)) * 500000 div " +
            "(CAST(p_count AS DECIMAL(38,0)) * n_count) AS BIGINT)"))
        .select("p_count", "n_count", "u2", "auc_micros")
    },
    Some(s"""
      WITH sc AS ($scoredSql),
      g AS (SELECT score, CAST(sum(lbl) AS BIGINT) AS np,
                   CAST(sum(1 - lbl) AS BIGINT) AS nn
            FROM sc GROUP BY 1),
      w AS (SELECT score, np, nn,
                   CAST(coalesce(sum(nn) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS cum_nn
            FROM g)
      SELECT CAST(sum(np) AS BIGINT) AS p_count,
             CAST(sum(nn) AS BIGINT) AS n_count,
             CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
             CAST(CAST(sum(np * (2 * cum_nn + nn)) AS HUGEINT) * 500000
                  // (CAST(sum(np) AS HUGEINT) * sum(nn)) AS BIGINT)
               AS auc_micros
      FROM w"""))

  // ---------------------------------------------------------------- M2
  /** Calibration (reliability) table: bucket the score into 11 fixed
    * bins of 100 per-mille each, publish per-bin count, positives and
    * the empirical positive rate in exact micros — the reliability
    * diagram a filter-model owner reads before trusting thresholds.
    * Fixed bin edges (not quantiles) so the frame is domain-bounded and
    * rates are comparable across corpus versions. One grouped pass. */
  private val evalCalibration = QueryDef(
    "eval_calibration",
    (s, d) =>
      scored(s, d)
        .groupBy(F.expr("score div 100").as("bucket"))
        .agg(
          F.count(F.lit(1)).as("n_docs"),
          F.sum("lbl").as("n_pos"),
          F.sum("score").as("sum_score"))
        .withColumn("pos_rate_micros",
          F.expr("1000000L * n_pos div n_docs"))
        .select("bucket", "n_docs", "n_pos", "sum_score", "pos_rate_micros")
        .orderBy("bucket"),
    Some(s"""
      WITH sc AS ($scoredSql)
      SELECT CAST(score // 100 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(lbl) AS BIGINT) AS n_pos,
             CAST(sum(score) AS BIGINT) AS sum_score,
             CAST(1000000 * sum(lbl) // count(*) AS BIGINT) AS pos_rate_micros
      FROM sc GROUP BY 1 ORDER BY bucket"""))

  // ---------------------------------------------------------------- M3
  /** Decile lift / gains table WITHOUT a global sort: group by score,
    * cumulate counts descending over the ≤1001-row score frame, and
    * assign every doc in a score group the decile of the group's END
    * position — ((cum−1)·10) div total, deterministic under ties because
    * tied docs are indivisible. Publishes per-decile lift (pos-rate vs
    * base rate) and cumulative capture, both in exact micros via
    * DECIMAL(38,0)/HUGEINT cross-multiplication. A global NTILE would be
    * a single-partition sort of the corpus AND nondeterministic on tie
    * boundaries; the bucketed form is the 100 TB recipe. */
  private val evalLift = QueryDef(
    "eval_lift",
    (s, d) => {
      val g = scored(s, d).groupBy("score").agg(
        F.count(F.lit(1)).as("cnt"), F.sum("lbl").as("pos"))
      val w = Window.orderBy(F.col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g
        .withColumn("cum_cnt", F.sum("cnt").over(w))
        .withColumn("cum_pos", F.sum("pos").over(w))
      val tot = cum.agg(F.max("cum_cnt").as("tot"),
        F.max("cum_pos").as("tot_pos"))
      cum.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("(cum_cnt - 1) * 10 div tot").as("decile"))
        .agg(
          F.sum("cnt").as("n_docs"),
          F.sum("pos").as("n_pos"),
          F.max("cum_pos").as("cum_pos"),
          F.max("tot").as("tot"),
          F.max("tot_pos").as("tot_pos"))
        .withColumn("lift_micros", F.expr(
          "CAST(CAST(n_pos AS DECIMAL(38,0)) * tot * 1000000 div " +
            "(CAST(n_docs AS DECIMAL(38,0)) * tot_pos) AS BIGINT)"))
        .withColumn("capture_micros",
          F.expr("1000000L * cum_pos div tot_pos"))
        .select("decile", "n_docs", "n_pos", "lift_micros", "capture_micros")
        .orderBy("decile")
    },
    Some(s"""
      WITH sc AS ($scoredSql),
      g AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(lbl) AS BIGINT) AS pos
            FROM sc GROUP BY 1),
      c AS (SELECT score, cnt, pos,
                   CAST(sum(cnt) OVER (ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_cnt,
                   CAST(sum(pos) OVER (ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_pos
            FROM g),
      tt AS (SELECT max(cum_cnt) AS tot, max(cum_pos) AS tot_pos FROM c)
      SELECT CAST((cum_cnt - 1) * 10 // tot AS BIGINT) AS decile,
             CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(CAST(sum(pos) AS HUGEINT) * max(tot) * 1000000
                  // (CAST(sum(cnt) AS HUGEINT) * max(tot_pos)) AS BIGINT)
               AS lift_micros,
             CAST(1000000 * max(cum_pos) // max(tot_pos) AS BIGINT)
               AS capture_micros
      FROM c, tt GROUP BY 1 ORDER BY decile"""))

  // ---------------------------------------------------------------- M4
  /** Exact two-sample Kolmogorov–Smirnov statistic between the doc-length
    * distributions of English and non-English docs — the sharp-null drift
    * test next to C45's binned PSI. The sup is taken over the GROUPED
    * value frame (distinct n_chars — bounded by max doc length, not
    * corpus size) and compared by integer cross-multiplication
    * |cum_a·n_b − cum_b·n_a| so no division happens before the final
    * published micros. Also publishes the length at which the sup is
    * attained (smallest such value — deterministic). */
  private val ksDrift = QueryDef(
    "ks_drift",
    (s, d) => {
      val g = t(s, d, "documents").groupBy(F.col("n_chars").as("v")).agg(
        F.sum(F.expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).as("ca"),
        F.sum(F.expr("CASE WHEN lang = 'en' THEN 0L ELSE 1L END")).as("cb"))
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val cum = g
        .withColumn("cum_a", F.sum("ca").over(w))
        .withColumn("cum_b", F.sum("cb").over(w))
      val tot = cum.agg(F.max("cum_a").as("na"), F.max("cum_b").as("nb"))
      val dev = cum.crossJoin(F.broadcast(tot))
        .withColumn("dev", F.expr("abs(cum_a * nb - cum_b * na)"))
      val sup = dev.agg(F.max("dev").as("d_scaled"))
      dev.crossJoin(F.broadcast(sup))
        .where(F.col("dev") === F.col("d_scaled"))
        .agg(F.max("na").as("na"), F.max("nb").as("nb"),
          F.max("d_scaled").as("d_scaled"), F.min("v").as("v_at"))
        .withColumn("ks_micros", F.expr(
          "CAST(CAST(d_scaled AS DECIMAL(38,0)) * 1000000 div " +
            "(CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"))
        .select("na", "nb", "d_scaled", "v_at", "ks_micros")
    },
    Some("""
      WITH g AS (
        SELECT n_chars AS v,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cb
        FROM documents GROUP BY 1),
      c AS (SELECT v,
                   CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
                   CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
            FROM g),
      tt AS (SELECT max(cum_a) AS na, max(cum_b) AS nb FROM c),
      dv AS (SELECT v, cum_a, cum_b, na, nb,
                    abs(cum_a * nb - cum_b * na) AS dev
             FROM c, tt)
      SELECT max(na) AS na, max(nb) AS nb,
             CAST(max(dev) AS BIGINT) AS d_scaled,
             min(CASE WHEN dev = (SELECT max(dev) FROM dv) THEN v END) AS v_at,
             CAST(CAST(max(dev) AS HUGEINT) * 1000000
                  // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT)
               AS ks_micros
      FROM dv"""))

  // ---------------------------------------------------------------- M5
  /** Per-segment Gini coefficient of customer revenue — the standard
    * concentration audit (is 80% of revenue in 2% of customers?). Exact
    * integer pipeline: per-customer revenue in cents (ONE grouped
    * shuffle over orders), then the rank-weighted sum Σ i·xᵢ via the
    * DISTRIBUTED PREFIX RANK
    * ([[graft.operators.DistRank.globalRowNumber]] over (segment,
    * cents, custkey), positionally numbered on one materialized range
    * shuffle — no single-partition sort at any scale), re-based per
    * segment by subtracting each segment's first global rank
    * (segment-count-bounded broadcast).
    * Ties share a value, and Σ i·xᵢ is invariant under permuting ties,
    * so the result is deterministic. G = 2·Σi·xᵢ/(n·S) − (n+1)/n,
    * published in exact integer micros (both terms floored identically
    * on both engines). */
  private val giniConcentration = QueryDef(
    "gini_concentration",
    (s, d) => {
      val rev = t(s, d, "orders")
        .groupBy(F.col("o_custkey").as("ck"))
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val seg = rev.join(
        t(s, d, "customer").select(F.col("c_custkey").as("ck"),
          F.col("c_mktsegment").as("segment")), "ck")
      // per-segment rank = exact distributed GLOBAL rank over
      // (segment, cents, ck) minus the segment's first global rank + 1
      // (DistRank numbers positionally over one materialized shuffle —
      // the former two-branch shard/offset plan could re-sample range
      // boundaries differently per branch and mislabel shards); the
      // offset frame is segment-count-bounded
      val g = graft.operators.DistRank.globalRowNumber(seg, "_grn",
        F.col("segment"), F.col("cents"), F.col("ck"))
      val segOff = g.groupBy("segment").agg(F.min("_grn").as("_soff"))
      g.join(F.broadcast(segOff), Seq("segment"))
        .withColumn("rank", F.col("_grn") - F.col("_soff") + F.lit(1L))
        .groupBy("segment").agg(
          F.count(F.lit(1)).as("n_cust"),
          F.sum("cents").as("sum_cents"),
          F.sum(F.expr("rank * cents")).as("rank_weighted"))
        .withColumn("gini_micros", F.expr(
          "CAST(CAST(rank_weighted AS DECIMAL(38,0)) * 2000000 div " +
            "(CAST(n_cust AS DECIMAL(38,0)) * sum_cents) AS BIGINT) - " +
            "(1000000L * (n_cust + 1) div n_cust)"))
        .select("segment", "n_cust", "sum_cents", "rank_weighted",
          "gini_micros")
        .orderBy("segment")
    },
    Some("""
      WITH rev AS (
        SELECT o_custkey AS ck,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      seg AS (
        SELECT c.c_mktsegment AS segment, r.ck, r.cents
        FROM rev r JOIN customer c ON r.ck = c.c_custkey),
      rk AS (
        SELECT segment, cents,
               CAST(row_number() OVER (PARTITION BY segment
                 ORDER BY cents, ck) AS BIGINT) AS rank
        FROM seg)
      SELECT segment,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(rank * cents) AS BIGINT) AS rank_weighted,
             CAST(CAST(sum(rank * cents) AS HUGEINT) * 2000000
                  // (CAST(count(*) AS HUGEINT) * sum(cents)) AS BIGINT)
               - CAST(1000000 * (count(*) + 1) // count(*) AS BIGINT)
               AS gini_micros
      FROM rk GROUP BY 1 ORDER BY segment"""))

  // ---------------------------------------------------------------- M6
  /** Day-of-week seasonal index of order revenue: per-dow revenue rate
    * vs the all-days rate, exact micros via cross-multiplication of
    * exact cent/count sums — the sanity panel behind any
    * weekly-seasonality claim. One grouped pass to a 7-row frame plus a
    * 1-row broadcast total. weekday()+1 == DuckDB isodow (Mon=1..7). */
  private val seasonalityDow = QueryDef(
    "seasonality_dow",
    (s, d) => {
      val o = t(s, d, "orders").select(
        F.expr("CAST(weekday(o_orderdate) + 1 AS BIGINT)").as("dow"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
      val g = o.groupBy("dow").agg(
        F.count(F.lit(1)).as("n_orders"), F.sum("cents").as("rev_cents"))
      val tot = g.agg(F.sum("n_orders").as("tot_n"),
        F.sum("rev_cents").as("tot_rev"))
      g.crossJoin(F.broadcast(tot))
        .withColumn("index_micros", F.expr(
          "CAST(CAST(rev_cents AS DECIMAL(38,0)) * tot_n * 1000000 div " +
            "(CAST(n_orders AS DECIMAL(38,0)) * tot_rev) AS BIGINT)"))
        .select("dow", "n_orders", "rev_cents", "index_micros")
        .orderBy("dow")
    },
    Some("""
      WITH o AS (
        SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(cents) AS BIGINT) AS rev_cents
            FROM o GROUP BY 1),
      tt AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tot_n,
                    CAST(sum(rev_cents) AS BIGINT) AS tot_rev FROM g)
      SELECT dow, n_orders, rev_cents,
             CAST(CAST(rev_cents AS HUGEINT) * tot_n * 1000000
                  // (CAST(n_orders AS HUGEINT) * tot_rev) AS BIGINT)
               AS index_micros
      FROM g, tt ORDER BY dow"""))

  // ---------------------------------------------------------------- M7
  /** Lag-7 autocorrelation of daily revenue — the one number that says
    * "this series has weekly structure" before anyone fits a seasonal
    * model. Pipeline: daily cents (grouped shuffle; frame bounded by
    * the CALENDAR, ~2.4k rows here and ≤ tens of thousands ever), lag-7
    * self-pairing by date arithmetic, then Pearson r over the pairs via
    * C43's exact-decimal-sums discipline (sums are order-independent
    * integers; the closing formula is the identical double expression
    * on both engines, rounded to 6). */
  private val autocorrLag = QueryDef(
    "autocorr_lag",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val lagged = daily.alias("a").join(
        daily.select(F.expr("date_add(day, 7)").as("day"),
          F.col("cents").as("lag_cents")).alias("b"), Seq("day"))
      val one = lagged.agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.col("cents").cast(DecimalType(38, 0))).as("sx"),
        F.sum(F.col("lag_cents").cast(DecimalType(38, 0))).as("sy"),
        F.sum((F.col("cents").cast(DecimalType(38, 0)) *
          F.col("lag_cents")).cast(DecimalType(38, 0))).as("sxy"),
        F.sum((F.col("cents").cast(DecimalType(38, 0)) *
          F.col("cents")).cast(DecimalType(38, 0))).as("sxx"),
        F.sum((F.col("lag_cents").cast(DecimalType(38, 0)) *
          F.col("lag_cents")).cast(DecimalType(38, 0))).as("syy"))
      val nn = F.col("n").cast("double")
      val dbl = (name: String) => F.col(name).cast("string").cast("double")
      one.select(
        F.col("n"),
        F.round((dbl("sxy") - dbl("sx") * dbl("sy") / nn) /
          (F.sqrt(dbl("sxx") - dbl("sx") * dbl("sx") / nn) *
            F.sqrt(dbl("syy") - dbl("sy") * dbl("sy") / nn)), 6)
          .as("autocorr_7"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      pairs AS (
        SELECT a.cents AS x, b.cents AS y
        FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 7 DAY),
      sums AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sum(CAST(y AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(sum(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(sum(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy
        FROM pairs)
      SELECT n,
             round((sxy - sx * sy / CAST(n AS DOUBLE))
                   / (sqrt(sxx - sx * sx / CAST(n AS DOUBLE))
                      * sqrt(syy - sy * sy / CAST(n AS DOUBLE))), 6)
               AS autocorr_7
      FROM sums"""))

  /** PACF horizon (M54) and the shared Durbin-Levinson recursion,
    * generated ONCE as (column, expression) pairs over rho columns
    * r1..r$PACF_LAGS and emitted into BOTH engines verbatim — the
    * whole recursion is a closing double formula, and textual identity
    * is what makes the two engines' IEEE results bit-equal. */
  private val PACF_LAGS = 7

  private def durbinLevinson: Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    out += (("phi_1_1", "r1"))
    for (k <- 2 to PACF_LAGS) {
      val num = s"r$k - (${(1 until k)
        .map(j => s"phi_${k - 1}_$j * r${k - j}").mkString(" + ")})"
      val den = s"CAST(1 AS DOUBLE) - (${(1 until k)
        .map(j => s"phi_${k - 1}_$j * r$j").mkString(" + ")})"
      out += ((s"phi_${k}_$k",
        s"CASE WHEN ($den) = 0 THEN CAST(0.0 AS DOUBLE) " +
          s"ELSE ($num) / ($den) END"))
      for (j <- 1 until k)
        out += ((s"phi_${k}_$j",
          s"phi_${k - 1}_$j - phi_${k}_$k * phi_${k - 1}_${k - j}"))
    }
    out.toSeq
  }

  /** rho_k closing formula over string-routed double moments dn, ds,
    * dq (global) and dp$k, dab$k, dm$k (per lag) — identical text both
    * engines. The mean-centering term carries the ACTUAL pair count
    * m_k (dm$k), not the gapless-calendar shorthand n−k: pairing is by
    * date arithmetic, so on a calendar with holes the lag-k frame has
    * fewer than n−k rows and n−k would push rho_k outside [−1, 1]
    * (r13 advice; dense TPC-H dates make dm$k = n−k, so values are
    * unchanged there — but the formula no longer assumes it). */
  private def rhoExpr(k: Int): String =
    s"""CASE WHEN (dn * dn * dq - dn * ds * ds) = 0
       |THEN CAST(0.0 AS DOUBLE)
       |ELSE (dn * dn * dp$k - dn * ds * dab$k + dm$k * ds * ds)
       |     / (dn * dn * dq - dn * ds * ds) END""".stripMargin

  /** Shared 1-row rho frame (M54 pacf_lags / M55 ljung_box): exact
    * integer calendar moments → string-routed doubles dn, ds, dq,
    * dp1..dp7, dab1..dab7, r1..r7. One corpus aggregate + a ×7
    * calendar-bounded pair frame. */
  private def rhoFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val daily = t(s, d, "orders")
      .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val glob = daily.agg(
      F.count(F.lit(1)).as("n"),
      F.sum(F.col("cents").cast(DecimalType(38, 0))).as("s"),
      F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("q"))
    val lags = s.range(1, PACF_LAGS + 1).select(F.col("id").as("lag"))
    val shifted = daily.crossJoin(F.broadcast(lags))
      .select(F.expr("date_add(day, CAST(lag AS INT))").as("day"),
        F.col("lag"), F.col("cents").as("x_early"))
    val perLag = daily.join(shifted, "day")
      .groupBy("lag")
      .agg(
        F.sum(F.expr("CAST(x_early AS DECIMAL(38,0)) * cents")).as("p"),
        F.sum(F.expr("CAST(x_early AS DECIMAL(38,0)) + cents")).as("ab"),
        F.count(F.lit(1)).as("m"))
    val wideCols = (1 to PACF_LAGS).flatMap { k =>
      Seq(
        F.max(F.when(F.col("lag") === k, F.col("p"))).as(s"_p$k"),
        F.max(F.when(F.col("lag") === k, F.col("ab"))).as(s"_ab$k"),
        F.max(F.when(F.col("lag") === k, F.col("m"))).as(s"_m$k"))
    }
    val wide = perLag.groupBy().agg(wideCols.head, wideCols.tail: _*)
    var row = glob.crossJoin(F.broadcast(wide))
      .withColumn("dn", F.expr("CAST(n AS DOUBLE)"))
      .withColumn("ds", F.expr("CAST(CAST(s AS STRING) AS DOUBLE)"))
      .withColumn("dq", F.expr("CAST(CAST(q AS STRING) AS DOUBLE)"))
    for (k <- 1 to PACF_LAGS) {
      row = row
        .withColumn(s"dp$k", F.expr(
          s"CAST(CAST(coalesce(_p$k, CAST(0 AS DECIMAL(38,0)))" +
            s" AS STRING) AS DOUBLE)"))
        .withColumn(s"dab$k", F.expr(
          s"CAST(CAST(coalesce(_ab$k, CAST(0 AS DECIMAL(38,0)))" +
            s" AS STRING) AS DOUBLE)"))
        .withColumn(s"dm$k",
          F.expr(s"CAST(coalesce(_m$k, 0L) AS DOUBLE)"))
        .withColumn(s"r$k", F.expr(rhoExpr(k)))
    }
    row
  }

  /** DuckDB mirror of [[rhoFrame]]: CTE chain ending in `rho`
    * (columns dn, r1..r7). */
  private def rhoCtesSql: String = {
    val lagMoments = (1 to PACF_LAGS).map(k =>
      s"""SELECT $k AS lag,
         |  sum(CAST(b.cents AS HUGEINT) * a.cents) AS p,
         |  sum(CAST(b.cents AS HUGEINT) + a.cents) AS ab,
         |  CAST(count(*) AS BIGINT) AS m
         |FROM daily a JOIN daily b
         |  ON a.day = b.day + INTERVAL $k DAY""".stripMargin)
      .mkString("\nUNION ALL\n")
    val wideCols = (1 to PACF_LAGS).map(k =>
      s"""CAST(CAST(coalesce(max(CASE WHEN lag = $k THEN p END), 0)
         |  AS VARCHAR) AS DOUBLE) AS dp$k,
         |CAST(CAST(coalesce(max(CASE WHEN lag = $k THEN ab END), 0)
         |  AS VARCHAR) AS DOUBLE) AS dab$k,
         |CAST(coalesce(max(CASE WHEN lag = $k THEN m END), 0)
         |  AS DOUBLE) AS dm$k""".stripMargin)
      .mkString(",\n")
    val rhoCols = (1 to PACF_LAGS).map(k => s"${rhoExpr(k)} AS r$k")
      .mkString(",\n")
    s"""daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
       |              AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |gmom AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS dn,
       |         CAST(CAST(sum(CAST(cents AS HUGEINT)) AS VARCHAR)
       |              AS DOUBLE) AS ds,
       |         CAST(CAST(sum(CAST(cents AS HUGEINT) * cents)
       |              AS VARCHAR) AS DOUBLE) AS dq
       |  FROM daily),
       |lagm AS ($lagMoments),
       |wide AS (SELECT
       |$wideCols
       |FROM lagm),
       |rho AS (SELECT dn,
       |$rhoCols
       |FROM gmom, wide)""".stripMargin
  }

  // ---------------------------------------------------------------- M54
  /** Partial autocorrelation function, lags 1..7 — the AR-order read
    * beside M7's raw autocorrelation (r13, the r12 verdict's PACF
    * item): ACF says "lag k correlates"; PACF says "lag k correlates
    * AFTER regressing out lags 1..k−1", which is what an AR(p) pick
    * actually reads (PACF cuts off at p).
    *
    * Moments are EXACT integers on the calendar frame: daily cents
    * (M7's daily CTE), per lag k ∈ 1..7 the pair moments P_k = Σx_t·
    * x_{t+k}, AB_k = Σx_t + Σx_{t+k} over the date-arithmetic pairs
    * (a ×7 lag explode + ONE equi-join on day — no range join, no
    * window), global n, S = Σx, Q = Σx² — all DECIMAL(38,0)/HUGEINT,
    * order-independent. The closing math is doubles: ρ_k from the
    * mean-centered moment identity n²γ_k = n²P_k − nS·AB_k + (n−k)S²,
    * then the Durbin-Levinson recursion φ_kk unrolled as ~28 generated
    * columns — the SAME generated expression text runs in both engines
    * (sharing [[durbinLevinson]]), so the IEEE results are bit-equal;
    * published at 6dp.
    *
    * Scale shape: one corpus aggregate to the calendar frame; the ×7
    * pair frame is calendar-bounded metadata; the recursion runs on a
    * 1-row frame. */
  private val pacfLags = QueryDef(
    "pacf_lags",
    (s, d) => {
      var row = rhoFrame(s, d)
      for ((name, e) <- durbinLevinson) row = row.withColumn(name, F.expr(e))
      val stacked = (1 to PACF_LAGS).map(k =>
        s"${k}L, round(r$k, 6), round(phi_${k}_$k, 6)").mkString(", ")
      row.selectExpr(
        s"stack($PACF_LAGS, $stacked) AS (lag, rho, pacf)")
        .orderBy("lag")
    },
    Some {
      val dlCtes = durbinLevinson.zipWithIndex.map { case ((name, e), i) =>
        val prev = if (i == 0) "rho" else s"lv${i - 1}"
        s"lv$i AS (SELECT *, $e AS $name FROM $prev)"
      }.mkString(",\n")
      val last = s"lv${durbinLevinson.size - 1}"
      val rows = (1 to PACF_LAGS).map(k =>
        s"SELECT $k AS lag, round(r$k, 6) AS rho, " +
          s"round(phi_${k}_$k, 6) AS pacf FROM $last")
        .mkString("\nUNION ALL\n")
      s"""WITH $rhoCtesSql,
         |$dlCtes
         |SELECT CAST(lag AS BIGINT) AS lag, rho, pacf FROM ($rows)
         |ORDER BY lag""".stripMargin
    })

  // ---------------------------------------------------------------- M55
  /** Ljung-Box portmanteau test at horizon 7 (r13) — the "is this
    * series autocorrelated AT ALL" gate read before M7/M54's per-lag
    * structure: Q_LB = n(n+2)·Σ_{k=1..7} ρ̂_k²/(n−k), large Q ⇒ reject
    * white noise. Shares [[rhoFrame]]'s exact-integer moment machinery
    * verbatim (one corpus aggregate + a ×7 calendar-bounded pair
    * frame); the closing sum is the identical double expression in
    * both engines. Publishes h, Q, the χ²₀.₉₅(7) literal both engines
    * compare against, and the reject flag computed on the ROUNDED Q so
    * the decision is engine-identical. */
  private val ljungBox = QueryDef(
    "ljung_box",
    (s, d) => {
      val terms = (1 to PACF_LAGS)
        .map(k => s"r$k * r$k / (dn - $k)").mkString(" + ")
      rhoFrame(s, d)
        .withColumn("_q", F.expr(s"round(dn * (dn + 2) * ($terms), 6)"))
        .select(F.lit(PACF_LAGS.toLong).as("h"),
          F.col("n").as("n_days"),
          F.col("_q").as("q_lb"),
          F.lit(14.067140).as("chi2_crit_95"),
          F.expr("CAST(CASE WHEN _q > 14.067140 THEN 1 ELSE 0 END" +
            " AS BIGINT)").as("reject_white_noise"))
    },
    Some {
      val terms = (1 to PACF_LAGS)
        .map(k => s"r$k * r$k / (dn - $k)").mkString(" + ")
      s"""WITH $rhoCtesSql,
         |q AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
         |f AS (SELECT round(dn * (dn + 2) * ($terms), 6) AS q_lb, n_days
         |      FROM rho, q)
         |SELECT CAST($PACF_LAGS AS BIGINT) AS h, n_days, q_lb,
         |       CAST(14.067140 AS DOUBLE) AS chi2_crit_95,
         |       CAST(CASE WHEN q_lb > 14.067140 THEN 1 ELSE 0 END
         |            AS BIGINT) AS reject_white_noise
         |FROM f""".stripMargin
    })

  // ---------------------------------------------------------------- M57
  /** Durbin-Watson statistic on the mean-centered daily revenue series
    * (r13) — the lag-1 serial-correlation read (DW ≈ 2(1−ρ₁); < 2 ⇒
    * positive autocorrelation) on the classical successive-difference
    * form, the companion every regression report prints beside M55's
    * portmanteau: DW = Σ(x_t − x_{t−1})² / Σ(x_t − x̄)² — the mean
    * cancels in the numerator differences, so DW = n·ΣΔ² / (nQ − S²)
    * with ΣΔ² over ADJACENT observed days (date-arithmetic pairing;
    * calendar gaps break adjacency and the pair count is published).
    * Exact DECIMAL(38,0)/HUGEINT moments, ONE string-routed closing
    * division; zero-variance guard. One corpus aggregate to the
    * calendar frame + one lag-1 equi-join on it. */
  private val durbinWatson = QueryDef(
    "durbin_watson",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val glob = daily.agg(
        F.count(F.lit(1)).as("n_days"),
        F.sum(F.col("cents").cast(DecimalType(38, 0))).as("s"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("q"))
      val diffs = daily.join(
          daily.select(F.expr("date_add(day, 1)").as("day"),
            F.col("cents").as("prev")), "day")
        .agg(F.count(F.lit(1)).as("n_pairs"),
          F.coalesce(F.sum(F.expr(
            "CAST(cents - prev AS DECIMAL(38,0)) * (cents - prev)")),
            F.expr("CAST(0 AS DECIMAL(38,0))")).as("dd"))
      glob.crossJoin(F.broadcast(diffs))
        .select(F.col("n_days"), F.col("n_pairs"),
          F.expr("""CASE WHEN CAST(n_days AS DECIMAL(38,0)) * q - s * s = 0
            |THEN CAST(0.0 AS DOUBLE)
            |ELSE round(CAST(n_days AS DOUBLE)
            |           * CAST(CAST(dd AS STRING) AS DOUBLE)
            |           / CAST(CAST(CAST(n_days AS DECIMAL(38,0)) * q
            |                       - s * s AS STRING) AS DOUBLE), 6)
            |END""".stripMargin).as("dw"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                   sum(CAST(cents AS HUGEINT)) AS s,
                   sum(CAST(cents AS HUGEINT) * cents) AS q
            FROM daily),
      df AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                    coalesce(sum(CAST(a.cents - b.cents AS HUGEINT)
                                 * (a.cents - b.cents)), 0) AS dd
             FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 1 DAY)
      SELECT n_days, n_pairs,
             CASE WHEN CAST(n_days AS HUGEINT) * q - s * s = 0
               THEN CAST(0.0 AS DOUBLE)
               ELSE round(CAST(n_days AS DOUBLE)
                          * CAST(CAST(dd AS VARCHAR) AS DOUBLE)
                          / CAST(CAST(CAST(n_days AS HUGEINT) * q - s * s
                                      AS VARCHAR) AS DOUBLE), 6)
             END AS dw
      FROM g, df"""))

  // ---------------------------------------------------------------- M14
  /** Precision–recall curve from SCORE-GROUPED counts (M1's histogram
    * discipline — the corpus shuffles once into ≤1001 score rows, the
    * cumulative window runs on that bounded frame, descending: high
    * score = predicted positive first). Per distinct score threshold:
    * cumulative TP/FP and exact ppm precision/recall. The PR read on
    * the same weak-label scorer M1 grades by ROC — PR is the one that
    * matters when positives are rare, which is exactly the filter-model
    * regime. */
  private val evalPrCurve = QueryDef(
    "eval_pr_curve",
    (s, d) => {
      val g = scored(s, d).groupBy("score").agg(
        F.sum("lbl").as("np"), F.sum(F.expr("1L - lbl")).as("nn"))
      val w = Window.orderBy(F.col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = g.agg(F.sum("np").as("p_count"))
      g.withColumn("cum_tp", F.sum("np").over(w))
        .withColumn("cum_fp", F.sum("nn").over(w))
        .crossJoin(F.broadcast(tot))
        .select(F.col("score"), F.col("cum_tp"), F.col("cum_fp"),
          F.expr("cum_tp * 1000000L div (cum_tp + cum_fp)")
            .as("precision_ppm"),
          F.expr("cum_tp * 1000000L div p_count").as("recall_ppm"))
        .orderBy(F.col("score").desc)
    },
    Some(s"""
      WITH sc AS ($scoredSql),
      g AS (SELECT score, CAST(sum(lbl) AS BIGINT) AS np,
                   CAST(sum(1 - lbl) AS BIGINT) AS nn
            FROM sc GROUP BY 1),
      w AS (SELECT score, np, nn,
                   CAST(sum(np) OVER (ORDER BY score DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tp,
                   CAST(sum(nn) OVER (ORDER BY score DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_fp
            FROM g),
      tt AS (SELECT CAST(sum(np) AS BIGINT) AS p_count FROM g)
      SELECT score, cum_tp, cum_fp,
             CAST(cum_tp * 1000000 // (cum_tp + cum_fp) AS BIGINT)
               AS precision_ppm,
             CAST(cum_tp * 1000000 // p_count AS BIGINT) AS recall_ppm
      FROM w, tt ORDER BY score DESC"""))

  // ---------------------------------------------------------------- M15
  /** Average precision (the PR-AUC scalar): AP = Σ_t Δrecall_t ·
    * precision_t over descending score thresholds = Σ_t np_t ·
    * prec_ppm_t div P, with precision fixed per threshold in exact ppm
    * BEFORE the sum (each term an integer, so the sum is
    * order-independent) and ONE closing integral division. Same bounded
    * score-grouped frame as M14; products through DECIMAL(38,0)/HUGEINT
    * (np · prec can reach corpus · 10⁶). */
  private val evalPrAuc = QueryDef(
    "eval_pr_auc",
    (s, d) => {
      val g = scored(s, d).groupBy("score").agg(
        F.sum("lbl").as("np"), F.sum(F.expr("1L - lbl")).as("nn"))
      val w = Window.orderBy(F.col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      g.withColumn("cum_tp", F.sum("np").over(w))
        .withColumn("cum_fp", F.sum("nn").over(w))
        .withColumn("prec_ppm",
          F.expr("cum_tp * 1000000L div (cum_tp + cum_fp)"))
        .agg(F.sum("np").as("p_count"), F.sum("nn").as("n_count"),
          F.sum(F.expr("CAST(np AS DECIMAL(38,0)) * prec_ppm"))
            .as("_num"))
        .select(F.col("p_count"), F.col("n_count"),
          F.expr("CAST(_num div p_count AS BIGINT)").as("ap_ppm"))
    },
    Some(s"""
      WITH sc AS ($scoredSql),
      g AS (SELECT score, CAST(sum(lbl) AS BIGINT) AS np,
                   CAST(sum(1 - lbl) AS BIGINT) AS nn
            FROM sc GROUP BY 1),
      w AS (SELECT np, nn,
                   CAST(sum(np) OVER (ORDER BY score DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tp,
                   CAST(sum(nn) OVER (ORDER BY score DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_fp
            FROM g)
      SELECT CAST(sum(np) AS BIGINT) AS p_count,
             CAST(sum(nn) AS BIGINT) AS n_count,
             CAST(sum(CAST(np AS HUGEINT)
                      * (cum_tp * 1000000 // (cum_tp + cum_fp)))
                  // sum(np) AS BIGINT) AS ap_ppm
      FROM w"""))

  // ---------------------------------------------------------------- M16
  /** Threshold-sweep confusion matrix: TP/FP/TN/FN plus exact ppm
    * accuracy and F1 at the fixed 100..900 per-mille threshold ladder —
    * the operating-point table a filter-model owner picks a cutoff
    * from. One score-grouped pass, then a 9-threshold explode over the
    * ≤1001-row frame (never over the corpus). F1 ppm = 2·TP·10⁶ div
    * (2·TP + FP + FN), all integer. */
  private val evalConfusion = QueryDef(
    "eval_confusion",
    (s, d) => {
      val g = scored(s, d).groupBy("score").agg(
        F.sum("lbl").as("np"), F.sum(F.expr("1L - lbl")).as("nn"))
      g.select(F.col("score"), F.col("np"), F.col("nn"),
        F.explode(F.expr(
          "transform(sequence(1, 9), k -> k * 100L)")).as("th"))
        .groupBy("th")
        .agg(
          F.sum(F.expr("CASE WHEN score >= th THEN np ELSE 0L END")).as("tp"),
          F.sum(F.expr("CASE WHEN score >= th THEN nn ELSE 0L END")).as("fp"),
          F.sum(F.expr("CASE WHEN score < th THEN nn ELSE 0L END")).as("tn"),
          F.sum(F.expr("CASE WHEN score < th THEN np ELSE 0L END")).as("fn"))
        .select(F.col("th"), F.col("tp"), F.col("fp"), F.col("tn"),
          F.col("fn"),
          F.expr("(tp + tn) * 1000000L div (tp + fp + tn + fn)")
            .as("accuracy_ppm"),
          F.expr("CASE WHEN 2*tp + fp + fn > 0 " +
            "THEN 2 * tp * 1000000L div (2*tp + fp + fn) END")
            .as("f1_ppm"))
        .orderBy("th")
    },
    Some(s"""
      WITH sc AS ($scoredSql),
      g AS (SELECT score, CAST(sum(lbl) AS BIGINT) AS np,
                   CAST(sum(1 - lbl) AS BIGINT) AS nn
            FROM sc GROUP BY 1),
      c AS (
        SELECT CAST(k * 100 AS BIGINT) AS th,
               CAST(sum(CASE WHEN score >= k * 100 THEN np ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(sum(CASE WHEN score >= k * 100 THEN nn ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(sum(CASE WHEN score < k * 100 THEN nn ELSE 0 END)
                    AS BIGINT) AS tn,
               CAST(sum(CASE WHEN score < k * 100 THEN np ELSE 0 END)
                    AS BIGINT) AS fn
        FROM g, unnest(generate_series(1, 9)) AS u(k) GROUP BY 1)
      SELECT th, tp, fp, tn, fn,
             CAST((tp + tn) * 1000000 // (tp + fp + tn + fn) AS BIGINT)
               AS accuracy_ppm,
             CAST(CASE WHEN 2*tp + fp + fn > 0
                  THEN 2 * tp * 1000000 // (2*tp + fp + fn) END AS BIGINT)
               AS f1_ppm
      FROM c ORDER BY th"""))

  // ---------------------------------------------------------------- M18
  /** Brier score of the per-mille scorer, EXACTLY: with score ∈ [0,1000]
    * and label ∈ {0,1}, each squared error (score − 1000·lbl)² is an
    * integer in per-mille² (= micro-probability²) units, so the corpus
    * sum is order-independent and the mean is ONE integral division —
    * brier = brier_micro/10⁶. The proper-scoring-rule complement of
    * M2's reliability table (calibration + refinement in one number).
    * Sum routed through DECIMAL(38,0)/HUGEINT (n·10⁶ exceeds int64 at
    * trillion-doc scale). One map-side-combined aggregate. */
  private val evalBrier = QueryDef(
    "eval_brier",
    (s, d) => scored(s, d)
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.expr("CAST((score - 1000*lbl) * (score - 1000*lbl) " +
          "AS DECIMAL(38,0))")).as("_se"))
      .select(F.col("n"),
        F.expr("CAST(_se div n AS BIGINT)").as("brier_micro")),
    Some(s"""
      WITH sc AS ($scoredSql)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST((score - 1000*lbl) * (score - 1000*lbl)
                           AS HUGEINT)) // count(*) AS BIGINT)
               AS brier_micro
      FROM sc"""))

  // ---------------------------------------------------------------- M23
  /** Split-conformal prediction threshold [Vovk et al. 2005]: on a
    * deterministic 20% calibration slice (hash60(doc_id) % 5 = 0),
    * nonconformity s = |score − 1000·lbl| (per-mille "how wrong"), and
    * the finite-sample threshold is the ⌈(n+1)(1−α)⌉-th smallest s at
    * α = 0.1 — computed by a cumulative count over the SCORE-GROUPED
    * ascending frame (≤1001 distinct nonconformity values), never a
    * corpus sort. Published with the empirical coverage on the held-out
    * 80% in exact ppm (the ≈90% guarantee made checkable). ⌈(n+1)·9/10⌉
    * = ((n+1)·9 + 9) div 10 — exact integer ceiling both engines. */
  /** The (cal, nc) projection every conformal consumer starts from. */
  private[queries] def conformalInput(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    scored(s, d).withColumn("cal",
      F.pmod(graft.operators.Hashing.hash60(
        F.col("doc_id").cast("string")), F.lit(5)) === 0)
      .withColumn("nc", F.expr("abs(score - 1000 * lbl)"))
      .select("cal", "nc")

  /** Threshold + held-out coverage assembly over the (cal, nc, c)
    * grouped-count frame (≤ 2·1002 rows) — shared by the batch query
    * and the G29 streaming twin. */
  private[queries] def conformalAssemble(
      grouped: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val calG = grouped.where(F.col("cal")).select("nc", "c")
    val w = Window.orderBy("nc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val nCal = calG.agg(F.sum("c").as("n_cal"))
    val thr = calG.withColumn("cum", F.sum("c").over(w))
      .crossJoin(F.broadcast(nCal))
      .where(F.expr("cum >= ((n_cal + 1) * 9 + 9) div 10"))
      .agg(F.max("n_cal").as("n_cal"),
        F.max(F.expr("((n_cal + 1) * 9 + 9) div 10")).as("k_rank"),
        F.min("nc").as("q_threshold"))
    val testG = grouped.where(!F.col("cal"))
    val test = testG.agg(F.sum("c").as("n_test"))
    val testCov = testG.crossJoin(F.broadcast(thr))
      .agg(F.sum(F.expr(
        "CASE WHEN nc <= q_threshold THEN c ELSE 0L END"))
        .as("n_covered"))
    thr.crossJoin(test).crossJoin(testCov)
      .select(F.col("n_cal"), F.col("k_rank"), F.col("q_threshold"),
        F.col("n_test"), F.col("n_covered"),
        F.expr("n_covered * 1000000L div n_test").as("coverage_ppm"))
  }

  /** Shared with G29. */
  private[queries] val conformalOracleSql: String = {
    val h = graft.operators.Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")
    s"""
      WITH sc AS ($scoredSql),
      f AS (SELECT doc_id, abs(score - 1000 * lbl) AS nc,
                   $h % 5 = 0 AS cal
            FROM sc),
      calg AS (SELECT nc, CAST(count(*) AS BIGINT) AS c
               FROM f WHERE cal GROUP BY 1),
      ncal AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM calg),
      cum AS (SELECT nc, CAST(sum(c) OVER (ORDER BY nc
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM calg),
      thr AS (
        SELECT CAST(max(n_cal) AS BIGINT) AS n_cal,
               CAST(max(((n_cal + 1) * 9 + 9) // 10) AS BIGINT) AS k_rank,
               CAST(min(nc) AS BIGINT) AS q_threshold
        FROM cum, ncal WHERE cum >= ((n_cal + 1) * 9 + 9) // 10),
      test AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
                      CAST(sum(CASE WHEN nc <= t.q_threshold
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
               FROM f, thr t WHERE NOT cal)
      SELECT n_cal, k_rank, q_threshold, n_test, n_covered,
             CAST(n_covered * 1000000 // n_test AS BIGINT) AS coverage_ppm
      FROM thr, test"""
  }

  private val conformalThreshold = QueryDef(
    "conformal_threshold",
    (s, d) => conformalAssemble(
      conformalInput(s, d).groupBy("cal", "nc")
        .agg(F.count(F.lit(1)).as("c"))),
    Some(conformalOracleSql))


  // ---------------------------------------------------------------- M24
  /** Two-proportion power analysis (the "how long must this A/B run"
    * table): baseline conversion measured from the corpus (purchase
    * share of events in exact ppm), required n per arm at α = .05
    * two-sided / 80% power for relative lifts of 5/10/20% — z values
    * HARDCODED as integer micros (1.959964, 0.841621 — no inverse-CDF
    * in either engine, the E42 hardcoded-constant discipline), one
    * closing double formula (sqrt is correctly-rounded IEEE on both
    * engines) with the result ceiling'd to whole users. The corpus
    * contributes ONE aggregate row; the 3-row ladder is a literal. */
  private val powerSampleSize = QueryDef(
    "power_sample_size",
    (s, d) => {
      val base = t(s, d, "events").agg(
        F.count(F.lit(1)).as("n_events"),
        F.sum(F.expr(
          "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END"))
          .as("n_conv"))
        .select(F.col("n_events"), F.col("n_conv"),
          F.expr("n_conv * 1000000L div n_events").as("p1_ppm"))
      base.select(F.col("p1_ppm"),
        F.explode(F.expr("array(5L, 10L, 20L)")).as("lift_pct"))
        .select(F.col("lift_pct"), F.col("p1_ppm"),
          F.expr("p1_ppm * (100 + lift_pct) div 100").as("p2_ppm"))
        .withColumn("n_per_arm", F.expr(
          """CAST(ceil(
            |  pow(1.959964 * sqrt(2 * ((p1_ppm + p2_ppm) / 2e6) *
            |        (1 - (p1_ppm + p2_ppm) / 2e6))
            |    + 0.841621 * sqrt((p1_ppm / 1e6) * (1 - p1_ppm / 1e6)
            |        + (p2_ppm / 1e6) * (1 - p2_ppm / 1e6)), 2)
            |  / pow((p2_ppm - p1_ppm) / 1e6, 2)) AS BIGINT)""".stripMargin))
        .orderBy("lift_pct")
    },
    Some("""
      WITH b AS (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS n_conv
        FROM events),
      p AS (SELECT CAST(n_conv * 1000000 // n_events AS BIGINT) AS p1_ppm
            FROM b),
      l AS (SELECT CAST(unnest(ARRAY[5, 10, 20]) AS BIGINT) AS lift_pct),
      g AS (SELECT lift_pct, p1_ppm,
                   CAST(p1_ppm * (100 + lift_pct) // 100 AS BIGINT)
                     AS p2_ppm
            FROM p, l)
      SELECT lift_pct, p1_ppm, p2_ppm,
             CAST(ceil(
               pow(1.959964 * sqrt(2 * ((p1_ppm + p2_ppm) / 2e6) *
                     (1 - (p1_ppm + p2_ppm) / 2e6))
                 + 0.841621 * sqrt((p1_ppm / 1e6) * (1 - p1_ppm / 1e6)
                     + (p2_ppm / 1e6) * (1 - p2_ppm / 1e6)), 2)
               / pow((p2_ppm - p1_ppm) / 1e6, 2)) AS BIGINT) AS n_per_arm
      FROM g ORDER BY lift_pct"""))

  // ---------------------------------------------------------------- M25
  /** Inverse-propensity-score off-policy evaluation [Horvitz–Thompson;
    * Li et al. 2011]: events are (action = event_type, reward = value)
    * from the logged behavior policy; the target policy is UNIFORM over
    * the k logged actions (k DERIVED from the frame and published as
    * n_actions — an arm that logged zero events has no per-action row,
    * so a hardcoded k would silently drop its term). IPS estimate =
    * mean(reward · π(a)/μ(a)) with μ(a) = n_a/n empirical, so the
    * per-action term collapses to Σr_micro div (k·n_a) — one exact
    * integral division per action, no per-row weighting pass at all.
    * Published per action
    * (the diagnostic: max weight = n/(k·n_a) is the variance alarm)
    * plus the behavior-policy mean beside it. Two aggregates over the
    * corpus, both map-side combined. */
  /** IPS assembly over the per-action (n_a, sr) frame — shared by the
    * batch query and the G30 streaming twin. */
  private[queries] def ipsAssemble(
      per: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // the action count is DERIVED from the frame (one row per logged
    // action) and published: an arm with zero logged events cannot
    // contribute a per-action row, so a hardcoded count would silently
    // drop that arm's term — n_actions in the output makes it visible
    val tot = per.agg(F.sum("n_a").as("n"),
      F.sum("sr").as("sr_all"),
      F.count(F.lit(1)).as("n_actions"))
    per.crossJoin(F.broadcast(tot))
      .select(F.col("action"), F.col("n_a"), F.col("n_actions"),
        F.expr("CAST(sr div n_a AS BIGINT)").as("mean_reward_micro"),
        F.expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div " +
          "(n_actions * n_a) AS BIGINT)").as("ips_weight_ppm"),
        F.expr("CAST(sr div (n_actions * n_a) AS BIGINT)")
          .as("ips_term_micro"),
        F.expr("CAST(sr_all div n AS BIGINT)")
          .as("behavior_mean_micro"))
      .orderBy("action")
  }

  /** Shared with G30. */
  private[queries] val ipsOracleSql: String = """
      WITH e AS (
        SELECT event_type AS action,
               CAST(floor(value * 1e6) AS BIGINT) AS r_micro
        FROM events),
      per AS (
        SELECT action, CAST(count(*) AS BIGINT) AS n_a,
               CAST(sum(r_micro) AS BIGINT) AS sr
        FROM e GROUP BY 1),
      tt AS (SELECT CAST(sum(n_a) AS BIGINT) AS n,
                    CAST(sum(sr) AS BIGINT) AS sr_all,
                    CAST(count(*) AS BIGINT) AS n_actions FROM per)
      SELECT action, n_a, n_actions,
             CAST(sr // n_a AS BIGINT) AS mean_reward_micro,
             CAST(CAST(n AS HUGEINT) * 1000000 // (n_actions * n_a)
                  AS BIGINT) AS ips_weight_ppm,
             CAST(sr // (n_actions * n_a) AS BIGINT) AS ips_term_micro,
             CAST(sr_all // n AS BIGINT) AS behavior_mean_micro
      FROM per, tt ORDER BY action"""

  private val ipsEval = QueryDef(
    "ips_eval",
    (s, d) => ipsAssemble(
      t(s, d, "events").select(F.col("event_type").as("action"),
        F.expr("CAST(floor(value * 1e6) AS BIGINT)").as("r_micro"))
        .groupBy("action").agg(
          F.count(F.lit(1)).as("n_a"), F.sum("r_micro").as("sr"))),
    Some(ipsOracleSql))


  // ---------------------------------------------------------------- M26
  /** Per-subgroup fairness audit of a scorer (the responsible-AI table
    * every model release reads): label = long-doc (n_chars > 1000),
    * score = the E2 quality per-mille, subgroups = language. Per group:
    * exact positive rate, the parity gap vs the corpus rate (signed
    * ppm), and the within-group ROC AUC via M1's rank-sum identity
    * computed from score-GROUPED counts PARTITIONED BY group (each
    * group's frame ≤ 1001 score rows — the window never sees the
    * corpus). Degenerate groups (single-class) publish NULL AUC rather
    * than a fabricated number. */
  private val fairnessAudit = QueryDef(
    "fairness_audit",
    (s, d) => {
      val cols = graft.operators.TextOps.qualityColumns(F.col("text")).toMap
      val sc = t(s, d, "documents").select(F.col("lang"),
        F.expr("CASE WHEN n_chars > 1000 THEN 1L ELSE 0L END").as("lbl"),
        F.round(cols("quality") * 1000).cast("long").as("score"))
      val g = sc.groupBy("lang", "score").agg(
        F.sum("lbl").as("np"), F.sum(F.expr("1L - lbl")).as("nn"))
      val w = Window.partitionBy("lang").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val u = g
        .withColumn("nn_below",
          F.coalesce(F.sum("nn").over(w), F.lit(0L)))
        .groupBy("lang")
        .agg(F.sum("np").as("p_count"), F.sum("nn").as("n_count"),
          F.sum(F.expr("np * (2 * nn_below + nn)")).as("u2"))
      val tot = sc.agg(F.sum("lbl").as("gp"),
        F.count(F.lit(1)).as("gn"))
      u.crossJoin(F.broadcast(tot))
        .select(F.col("lang"),
          F.expr("p_count + n_count").as("n_docs"),
          F.col("p_count"),
          F.expr("p_count * 1000000L div (p_count + n_count)")
            .as("pos_rate_ppm"),
          F.expr("p_count * 1000000L div (p_count + n_count) - " +
            "gp * 1000000L div gn").as("parity_gap_ppm"),
          F.expr("CASE WHEN p_count > 0 AND n_count > 0 THEN " +
            "CAST(CAST(u2 AS DECIMAL(38,0)) * 500000 div " +
            "(CAST(p_count AS DECIMAL(38,0)) * n_count) AS BIGINT) " +
            "END").as("auc_micros"))
        .orderBy("lang")
    },
    Some {
      val stop = graft.operators.TextOps.stopwords
        .map(m => s"x = '$m'").mkString(" OR ")
      val toksSql = "regexp_split_to_array(lower(text), ' +')"
      s"""
      WITH f AS (
        SELECT lang,
               CAST(CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END AS BIGINT)
                 AS lbl,
               CAST(len($toksSql) AS BIGINT) AS nt,
               len(list_filter($toksSql, x -> $stop)) AS n_stop,
               CAST(len(regexp_extract_all(text, '[.,!?;]')) AS BIGINT)
                 AS n_punct,
               CAST(length(text) AS BIGINT) AS nc
        FROM documents),
      sc AS (
        SELECT lang, lbl,
               CAST(round(round((n_stop * 1.0 / nt) * 0.5
                     + (n_punct * 1.0 / nc) * 0.3
                     + least(nt / 100.0, 1.0) * 0.2, 6) * 1000)
                 AS BIGINT) AS score
        FROM f),
      g AS (SELECT lang, score, CAST(sum(lbl) AS BIGINT) AS np,
                   CAST(sum(1 - lbl) AS BIGINT) AS nn
            FROM sc GROUP BY 1, 2),
      cum AS (
        SELECT lang, score, np, nn,
               CAST(coalesce(sum(nn) OVER (PARTITION BY lang
                 ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS nn_below
        FROM g),
      u AS (
        SELECT lang, CAST(sum(np) AS BIGINT) AS p_count,
               CAST(sum(nn) AS BIGINT) AS n_count,
               CAST(sum(np * (2 * nn_below + nn)) AS BIGINT) AS u2
        FROM cum GROUP BY 1),
      tt AS (SELECT CAST(sum(lbl) AS BIGINT) AS gp,
                    CAST(count(*) AS BIGINT) AS gn FROM sc)
      SELECT lang, p_count + n_count AS n_docs, p_count,
             CAST(p_count * 1000000 // (p_count + n_count) AS BIGINT)
               AS pos_rate_ppm,
             CAST(p_count * 1000000 // (p_count + n_count)
                  - gp * 1000000 // gn AS BIGINT) AS parity_gap_ppm,
             CAST(CASE WHEN p_count > 0 AND n_count > 0 THEN
               CAST(u2 AS HUGEINT) * 500000 //
               (CAST(p_count AS HUGEINT) * n_count) END AS BIGINT)
               AS auc_micros
      FROM u, tt ORDER BY lang"""
    })

  // ---------------------------------------------------------------- M27
  /** CROSS-FITTED doubly-robust off-policy evaluation [Dudík et al.
    * 2011]: the reward model q̂(a) = per-action mean is fit on the
    * hash-split MODEL half and evaluated on the EVAL half (in-sample DR
    * would make the correction vanish by construction — cross-fitting
    * is what keeps it honest). Per action: q̂ from the model half,
    * direct term q̂ div 5 (uniform target), correction
    * (sr_E − n_E·q̂) div (5·n_E) from eval-half residuals, dr_term =
    * their sum — all exact integer micros, both halves aggregated in
    * the SAME single pass via conditional sums. */
  private val drEval = QueryDef(
    "dr_eval",
    (s, d) => {
      val ev = t(s, d, "events").select(F.col("event_type").as("action"),
        F.expr("CAST(floor(value * 1e6) AS BIGINT)").as("r_micro"),
        F.pmod(graft.operators.Hashing.hash60(
          F.col("event_id").cast("string")), F.lit(2)).as("half"))
      ev.groupBy("action")
        .agg(
          F.sum(F.expr("CASE WHEN half = 0 THEN 1L ELSE 0L END")).as("n_m"),
          F.sum(F.expr("CASE WHEN half = 0 THEN r_micro ELSE 0L END")).as("sr_m"),
          F.sum(F.expr("CASE WHEN half = 1 THEN 1L ELSE 0L END")).as("n_e"),
          F.sum(F.expr("CASE WHEN half = 1 THEN r_micro ELSE 0L END")).as("sr_e"))
        .select(F.col("action"), F.col("n_m"), F.col("n_e"),
          F.expr("sr_m div n_m").as("q_hat_micro"),
          F.expr("(sr_m div n_m) div 5").as("direct_micro"),
          F.expr("(sr_e - n_e * (sr_m div n_m)) div (5 * n_e)")
            .as("correction_micro"))
        .withColumn("dr_term_micro",
          F.expr("direct_micro + correction_micro"))
        .orderBy("action")
    },
    Some(s"""
      WITH e AS (
        SELECT event_type AS action,
               CAST(floor(value * 1e6) AS BIGINT) AS r_micro,
               ${graft.operators.Hashing.hash60Sql(
                 "CAST(event_id AS VARCHAR)")} % 2 AS half
        FROM events),
      g AS (
        SELECT action,
               CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_m,
               CAST(sum(CASE WHEN half = 0 THEN r_micro ELSE 0 END)
                    AS BIGINT) AS sr_m,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_e,
               CAST(sum(CASE WHEN half = 1 THEN r_micro ELSE 0 END)
                    AS BIGINT) AS sr_e
        FROM e GROUP BY 1)
      SELECT action, n_m, n_e,
             CAST(sr_m // n_m AS BIGINT) AS q_hat_micro,
             CAST((sr_m // n_m) // 5 AS BIGINT) AS direct_micro,
             CAST((sr_e - n_e * (sr_m // n_m)) // (5 * n_e) AS BIGINT)
               AS correction_micro,
             CAST((sr_m // n_m) // 5
                  + (sr_e - n_e * (sr_m // n_m)) // (5 * n_e) AS BIGINT)
               AS dr_term_micro
      FROM g ORDER BY action"""))

  // ---------------------------------------------------------------- M28
  /** Expected / maximum calibration error scalars over M2's fixed-bin
    * reliability table: ECE = Σ_b n_b·|rate_b − mid_b| div n, MCE =
    * max_b |rate_b − mid_b| — both in exact integer micros (bucket
    * midpoint = (100b+50)·10³ micros of probability, rate exact from
    * counts). The top bin is INCLUSIVE (least(score div 100, 9)) so a
    * perfect score of 1000 lands in bin 9 with midpoint 0.95 —
    * standard 10-bin ECE; an unclamped 11th bin's midpoint 1.05 sits
    * outside [0,1] and would charge perfectly-confident correct
    * predictions a 50 000-micro gap. The one-number calibration
    * summary beside M2's full table; single grouped pass to a 10-row
    * frame. */
  private val calibrationEce = QueryDef(
    "calibration_ece",
    (s, d) => {
      val b = scored(s, d)
        .groupBy(F.expr("least(score div 100, 9)").as("bucket"))
        .agg(F.count(F.lit(1)).as("n_b"), F.sum("lbl").as("p_b"))
        .select(F.col("bucket"), F.col("n_b"),
          F.expr("abs(p_b * 1000000L div n_b - " +
            "(bucket * 100 + 50) * 1000)").as("gap_micro"))
      b.agg(F.sum("n_b").as("n"),
        F.sum(F.expr("CAST(n_b AS DECIMAL(38,0)) * gap_micro")).as("_w"),
        F.max("gap_micro").as("mce_micro"))
        .select(F.col("n"),
          F.expr("CAST(_w div n AS BIGINT)").as("ece_micro"),
          F.col("mce_micro"))
    },
    Some(s"""
      WITH sc AS ($scoredSql),
      b AS (
        SELECT CAST(least(score // 100, 9) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(lbl) AS BIGINT) AS p_b
        FROM sc GROUP BY 1),
      g AS (
        SELECT bucket, n_b,
               abs(p_b * 1000000 // n_b - (bucket * 100 + 50) * 1000)
                 AS gap_micro
        FROM b)
      SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(sum(CAST(n_b AS HUGEINT) * gap_micro) // sum(n_b)
                  AS BIGINT) AS ece_micro,
             CAST(max(gap_micro) AS BIGINT) AS mce_micro
      FROM g"""))

  val all: Seq[QueryDef] = Seq(evalAuc, evalCalibration, evalLift,
    ksDrift, giniConcentration, seasonalityDow, autocorrLag,
    evalPrCurve, evalPrAuc, evalConfusion, evalBrier,
    conformalThreshold, powerSampleSize, ipsEval, fairnessAudit,
    drEval, calibrationEce, pacfLags, ljungBox, durbinWatson)
}
