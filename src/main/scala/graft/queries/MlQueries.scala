package graft.queries

import graft.operators.Hashing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-16 inventory (r5): record linkage, ML-prep featurization and
  * selection — fuzzy entity matching, smoothed target encoding,
  * stratified fold assignment, nearest as-of joins, peer-exact
  * cumulative-distribution windows, and systematic importance
  * resampling via a distributed prefix sum (SURVEY §2 D21/E44/E46/
  * E47/C13c/C50).
  *
  * House rules as everywhere: transcendental-free integer
  * formulations so every estimate is oracle-checkable bit-for-bit,
  * and no operator whose output grows with anything but the
  * quantity it reports on.
  */
object MlQueries {

  // ---------------------------------------------------------------- D21
  /** Record linkage by blocked fuzzy match: candidate pairs share a
    * cheap blocking key (brand × size — the standard ER move that turns
    * the all-pairs O(n²) into Σ block²), then survive an edit-distance
    * gate. Levenshtein is codegen'd in Spark and built-in in DuckDB, so
    * the gate itself is oracle-exact.
    *
    * Scale shape: one shuffle on the blocking key; fan-out bounded by
    * the largest block (7 rows here — at 100 TB you'd df-cap blocks
    * exactly like the shingle index, same discipline as D5). */
  private val fuzzyMatch = QueryDef(
    "fuzzy_match",
    (s, d) => {
      val p = t(s, d, "part")
      val a = p.select(F.col("p_partkey").as("id_a"), F.col("p_name").as("name_a"),
        F.col("p_brand").as("brand"), F.col("p_size").as("size"))
      val b = p.select(F.col("p_partkey").as("id_b"), F.col("p_name").as("name_b"),
        F.col("p_brand").as("brand"), F.col("p_size").as("size"))
      a.join(b, Seq("brand", "size"))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"))
        .where(F.col("dist") <= 4)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
        .orderBy("id_a", "id_b")
    },
    Some("""
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 4
      ORDER BY id_a, id_b"""))

  // ---------------------------------------------------------------- E44
  /** Smoothed target (mean) encoding of a categorical — the leakage-
    * resistant featurization for high-cardinality categoricals:
    * enc = (Σy + m·global_mean) / (n + m), m = 20. Computed entirely in
    * integer micros (value floored to micros first), so the shrinkage
    * arithmetic is exact integer division in both engines — no
    * float-sum order dependence.
    *
    * Scale shape: one map-side-combined aggregate over the fact join;
    * the global mean is a broadcast one-row frame. Output = |categories|. */
  private val targetEncode = QueryDef(
    "target_encode",
    (s, d) => {
      val M = 20L
      val oc = t(s, d, "orders").join(
        t(s, d, "customer").select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.floor(F.col("o_totalprice") * 1000000.0).cast("long").as("micros"))
      val per = oc.groupBy("segment").agg(
        F.count(F.lit(1)).as("n"),
        F.sum("micros").as("sum_micros"))
      val glob = per.agg(
        (F.sum("sum_micros") / F.sum("n")).cast("long").as("g_mean"))
      per.crossJoin(F.broadcast(glob))
        .select(F.col("segment"), F.col("n"),
          F.expr("sum_micros div n").as("seg_mean_micros"),
          F.col("g_mean").as("global_mean_micros"),
          F.expr(s"(sum_micros + $M * g_mean) div (n + $M)").as("enc_micros"))
        .orderBy("segment")
    },
    Some("""
      WITH oc AS (
        SELECT c_mktsegment AS segment,
               CAST(floor(o_totalprice * 1000000.0) AS BIGINT) AS micros
        FROM orders JOIN customer ON o_custkey = c_custkey),
      per AS (
        SELECT segment, count(*) AS n, CAST(sum(micros) AS BIGINT) AS sum_micros
        FROM oc GROUP BY 1),
      gm AS (
        SELECT CAST(sum(sum_micros) // sum(n) AS BIGINT) AS g_mean FROM per)
      SELECT segment, n,
             CAST(sum_micros // n AS BIGINT) AS seg_mean_micros,
             g_mean AS global_mean_micros,
             CAST((sum_micros + 20 * g_mean) // (n + 20) AS BIGINT) AS enc_micros
      FROM per, gm ORDER BY segment"""))

  // ---------------------------------------------------------------- E46
  /** Stratified k-fold assignment by portable hash — the deterministic
    * split every training pipeline needs (same doc lands in the same
    * fold on every engine, every run, any cluster size). Audited
    * in-query: per (stratum, fold) counts plus the deviation from the
    * stratum's ideal n/k, which is the number a skew check reads.
    *
    * Scale shape: narrow hash projection + one aggregate; output =
    * strata × k. */
  private val foldAssign = QueryDef(
    "fold_assign",
    (s, d) => {
      val k = 5
      val w = Window.partitionBy("lang")
      t(s, d, "documents")
        .select(F.col("lang"), F.col("n_chars"),
          F.pmod(Hashing.hash60(F.col("doc_id").cast("string")), F.lit(k))
            .cast("long").as("fold"))
        .groupBy("lang", "fold").agg(
          F.count(F.lit(1)).as("n_docs"),
          F.sum("n_chars").as("n_chars"))
        .withColumn("dev_from_ideal",
          F.col("n_docs") - F.expr(s"sum(n_docs) over (partition by lang) div $k"))
        .select("lang", "fold", "n_docs", "n_chars", "dev_from_ideal")
        .orderBy("lang", "fold")
    },
    Some(s"""
      WITH f AS (
        SELECT lang, n_chars,
               ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")} % 5 AS fold
        FROM documents),
      g AS (
        SELECT lang, fold, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM f GROUP BY 1, 2)
      SELECT lang, fold, n_docs, n_chars,
             CAST(n_docs - sum(n_docs) OVER (PARTITION BY lang) // 5 AS BIGINT)
               AS dev_from_ideal
      FROM g ORDER BY lang, fold"""))

  // --------------------------------------------------------------- C13c
  /** Nearest as-of join: attach the click closest in time to each error
    * in EITHER direction (backward and forward as-of, then pick the
    * smaller |Δt|; tie → the past row, matching the "no lookahead on
    * ties" convention). Composition of two window passes plus an
    * equi-join on the left id — still one shuffle per direction, no
    * range join explosion.
    *
    * Δt is integer micros (unix_micros / epoch_us), so the
    * which-side-wins decision is bit-portable. */
  private val asofNearest = QueryDef(
    "asof_nearest",
    (s, d) => {
      val ev = t(s, d, "events")
      val errors = ev.filter(F.col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.col("ts"),
          F.col("ts").as("r_ts"), F.col("event_id").as("r_event_id"))
      val payload = Seq("r_ts", "r_event_id")
      val bwd = graft.operators.AsOfJoin.asOf(errors, clicks, "user_id", "ts",
        payload, direction = "backward")
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"),
          F.col("asof_r_ts").as("b_ts"), F.col("asof_r_event_id").as("b_id"))
      val fwd = graft.operators.AsOfJoin.asOf(errors, clicks, "user_id", "ts",
        payload, direction = "forward")
        .select(F.col("event_id"),
          F.col("asof_r_ts").as("f_ts"), F.col("asof_r_event_id").as("f_id"))
      val db = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
      val df_ = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
      bwd.join(fwd, Seq("event_id"))
        .withColumn("_db", db).withColumn("_df", df_)
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"),
          F.when(F.col("_df").isNull ||
              (F.col("_db").isNotNull && F.col("_db") <= F.col("_df")),
            F.col("b_id")).otherwise(F.col("f_id")).as("near_event_id"),
          F.when(F.col("_df").isNull ||
              (F.col("_db").isNotNull && F.col("_db") <= F.col("_df")),
            F.col("_db")).otherwise(F.col("_df")).as("delta_us"),
          F.when(F.col("_db").isNull && F.col("_df").isNull, "none")
            .when(F.col("_df").isNull ||
              (F.col("_db").isNotNull && F.col("_db") <= F.col("_df")), "past")
            .otherwise("future").as("side"))
        .orderBy("event_id")
    },
    Some("""
      WITH lefts AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
      rights AS (
        SELECT user_id, ts, ts AS r_ts, event_id AS r_event_id
        FROM events WHERE event_type = 'click'),
      bwd AS (
        SELECT l.event_id, l.user_id, l.ts, r.r_ts AS b_ts, r.r_event_id AS b_id
        FROM lefts l ASOF LEFT JOIN rights r
          ON l.user_id = r.user_id AND l.ts >= r.ts),
      fwd AS (
        SELECT l.event_id, r.r_ts AS f_ts, r.r_event_id AS f_id
        FROM lefts l ASOF LEFT JOIN rights r
          ON l.user_id = r.user_id AND l.ts <= r.ts),
      j AS (
        SELECT b.event_id, b.user_id, b.ts,
               epoch_us(b.ts) - epoch_us(b.b_ts) AS db,
               epoch_us(f.f_ts) - epoch_us(b.ts) AS df,
               b.b_id, f.f_id
        FROM bwd b JOIN fwd f ON b.event_id = f.event_id)
      SELECT event_id, user_id, ts,
             CASE WHEN df IS NULL OR (db IS NOT NULL AND db <= df)
                  THEN b_id ELSE f_id END AS near_event_id,
             CASE WHEN df IS NULL OR (db IS NOT NULL AND db <= df)
                  THEN db ELSE df END AS delta_us,
             CASE WHEN db IS NULL AND df IS NULL THEN 'none'
                  WHEN df IS NULL OR (db IS NOT NULL AND db <= df) THEN 'past'
                  ELSE 'future' END AS side
      FROM j ORDER BY event_id"""))

  // ---------------------------------------------------------------- C50
  /** Peer-exact cumulative distribution per customer within nation:
    * n_le counts peers via a RANGE frame (ties count together — the
    * exact cume_dist numerator, kept integer instead of the built-in's
    * double), cume reported in micros, plus the poorest/richest
    * customer name over the full partition frame with a deterministic
    * (acctbal, custkey) tie-break.
    *
    * Scale shape: one (nation × (acctbal, custkey)) window sort shared
    * by all four functions — Spark plans a single Window node. */
  private val windowCumeDist = QueryDef(
    "window_cume_dist",
    (s, d) => {
      val ord = Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal"), F.col("c_custkey"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val peers = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "customer")
        .select(F.col("c_custkey"), F.col("c_nationkey").cast("long").as("nation"),
          F.col("c_acctbal"),
          F.count(F.lit(1)).over(peers).as("n_le"),
          F.count(F.lit(1)).over(
            Window.partitionBy("c_nationkey")
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("n_part"),
          F.first("c_name").over(full).as("poorest"),
          F.last("c_name").over(full).as("richest"))
        .withColumn("cume_micros", F.expr("n_le * 1000000 div n_part"))
        .select("c_custkey", "nation", "c_acctbal", "n_le", "cume_micros",
          "poorest", "richest")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation, c_acctbal,
             count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le,
             CAST(count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
               // count(*) OVER (PARTITION BY c_nationkey) AS BIGINT)
               AS cume_micros,
             first_value(c_name) OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS poorest,
             last_value(c_name) OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS richest
      FROM customer ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- E47
  /** Systematic importance resampling: select ~N docs with probability
    * proportional to an integer weight (chars here; any importance
    * score plugs in) by marking every crossing of a step = totalW/N
    * boundary in the global weight cumsum — the zero-variance
    * alternative to Bernoulli sampling, and heavy docs legitimately
    * yield >1 copy (n_copies column; exploding is the caller's choice).
    *
    * Scale shape: the global cumsum is a DISTRIBUTED PREFIX SUM
    * ([[graft.operators.DistRank.globalCumSum]]) — range partition by
    * id, per-shard subtotals (one long per shard) stitched into offsets
    * over the SINGLE materialized shuffle, then an intra-shard running
    * sum. No single global sort, and no second sampled exchange that
    * could label shards differently from the first. */
  private val sampleSystematic = QueryDef(
    "sample_systematic",
    (s, d) => {
      val target = 100L
      val base = t(s, d, "documents")
        .select(F.col("doc_id"), F.col("n_chars").cast("long").as("w"))
      // exact distributed running sum (DistRank: one range exchange,
      // numbered positionally over the ONE materialized shuffle — the
      // former two-branch shard/offset plan could re-sample different
      // range boundaries per branch and mislabel shards)
      val tot = base.agg(F.sum("w").as("_tot"))
      graft.operators.DistRank
        .globalCumSum(base, "w", "cum", F.col("doc_id"))
        .crossJoin(F.broadcast(tot))
        .withColumn("n_copies",
          F.expr(s"cum div (_tot div $target) - (cum - w) div (_tot div $target)"))
        .where(F.col("n_copies") > 0)
        .select("doc_id", "w", "cum", "n_copies")
        .orderBy("doc_id")
    },
    Some("""
      WITH c AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        FROM documents),
      t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM c)
      SELECT doc_id, w, cum,
             CAST(cum // (tot // 100) - (cum - w) // (tot // 100) AS BIGINT)
               AS n_copies
      FROM c, t
      WHERE cum // (tot // 100) - (cum - w) // (tot // 100) > 0
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- M22
  /** Churn-label construction (the supervised-dataset prep step a churn
    * model trains on): observation window 1996 → features (frequency,
    * monetary cents, recency days from the window end), outcome window
    * 1997 → label (churned = zero 1997 orders). ONE conditional-sum
    * aggregate per customer builds both windows — the fact table is
    * scanned once, never per-window; cohort = customers active in the
    * observation window. Frame bounded by customers. */
  private val churnLabels = QueryDef(
    "churn_labels",
    (s, d) => {
      t(s, d, "orders")
        .select(F.col("o_custkey").as("ck"),
          F.to_date(F.col("o_orderdate")).as("dt"),
          F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("ck")
        .agg(
          F.sum(F.expr("CASE WHEN year(dt) = 1996 THEN 1L ELSE 0L END"))
            .as("f96"),
          F.sum(F.expr("CASE WHEN year(dt) = 1996 THEN cents ELSE 0L END"))
            .as("m96"),
          F.max(F.expr("CASE WHEN year(dt) = 1996 THEN dt END"))
            .as("last96"),
          F.sum(F.expr("CASE WHEN year(dt) = 1997 THEN 1L ELSE 0L END"))
            .as("f97"))
        .where(F.col("f96") > 0)
        .select(F.col("ck").as("c_custkey"),
          F.col("f96").as("n_orders_obs"),
          F.col("m96").as("cents_obs"),
          F.expr("CAST(datediff(DATE '1996-12-31', last96) AS BIGINT)")
            .as("recency_days"),
          F.expr("CASE WHEN f97 = 0 THEN 1L ELSE 0L END").as("churned"))
        .orderBy("c_custkey")
    },
    Some("""
      WITH o AS (
        SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS dt,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      g AS (
        SELECT ck,
               CAST(sum(CASE WHEN year(dt) = 1996 THEN 1 ELSE 0 END)
                    AS BIGINT) AS f96,
               CAST(sum(CASE WHEN year(dt) = 1996 THEN cents ELSE 0 END)
                    AS BIGINT) AS m96,
               max(CASE WHEN year(dt) = 1996 THEN dt END) AS last96,
               CAST(sum(CASE WHEN year(dt) = 1997 THEN 1 ELSE 0 END)
                    AS BIGINT) AS f97
        FROM o GROUP BY 1)
      SELECT ck AS c_custkey, f96 AS n_orders_obs, m96 AS cents_obs,
             CAST(date_diff('day', last96, DATE '1996-12-31') AS BIGINT)
               AS recency_days,
             CAST(CASE WHEN f97 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS churned
      FROM g WHERE f96 > 0 ORDER BY c_custkey"""))

  val all: Seq[QueryDef] = Seq(fuzzyMatch, targetEncode, foldAssign,
    asofNearest, windowCumeDist, sampleSystematic, churnLabels)
}
