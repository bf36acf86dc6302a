package graft.queries

import graft.operators.{CacheScope, Hashing, Warehouse}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-13 inventory (r5): warehouse-modeling queries over the same
  * operators a reference user composes by hand — SCD Type-2 dimension
  * builds, multi-touch attribution, growth accounting, robust outlier
  * flags — plus a trained NB quality classifier with a held-out
  * confusion-matrix oracle. Money and scores flow through integer
  * micro-units / integer log2 so every aggregate is an exact long
  * (SURVEY §5 portability discipline). */
object WarehouseQueries {

  // ---------------------------------------------------------------- C34
  /** events as an attribute change-log: the user's event_type stream
    * collapses into versioned [valid_from, valid_to) dimension rows. */
  private val scd2Build = QueryDef(
    "scd2_build",
    (s, d) => Warehouse.scd2Build(t(s, d, "events"),
      "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version"),
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (SELECT user_id, ts, event_id, event_type FROM o
             WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type AS attr, ts AS valid_from,
             lead(ts) OVER w AS valid_to,
             CAST(row_number() OVER w AS BIGINT) AS version,
             CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
                  AS BIGINT) AS is_current
      FROM ch
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version"""))

  // ---------------------------------------------------------------- C35
  /** Purchases split evenly across the user's click/view/signup touches
    * in the prior 24 h; a `(none)` bucket reconciles the untouched
    * remainder. 24 h ≈ 2–3 touches per purchase on the sf corpus, and
    * some purchases have zero — both sides of the split exercised. */
  private val attributionLinear = QueryDef(
    "attribution_linear",
    (s, d) => Warehouse.linearAttribution(t(s, d, "events"),
      "user_id", "ts", "event_id", "event_type", "value",
      convType = "purchase", touchTypes = Seq("click", "view", "signup"),
      lookbackHours = 24),
    Some("""
      WITH conv AS (SELECT user_id AS cu, ts AS pts, event_id AS pid,
                           CAST(floor(value * 1e6) AS BIGINT) AS vmicro
                    FROM events WHERE event_type = 'purchase'),
      tch AS (SELECT user_id AS tu, ts AS tts, event_type AS channel
              FROM events WHERE event_type IN ('click', 'view', 'signup')),
      pairs AS (SELECT channel, pid, vmicro
                FROM tch JOIN conv ON tu = cu AND tts <= pts
                     AND tts > pts - INTERVAL 24 HOUR),
      wc AS (SELECT channel, pid, vmicro,
                    count(*) OVER (PARTITION BY pid) AS ntouch
             FROM pairs),
      att AS (SELECT channel,
                     CAST(count(*) AS BIGINT) AS n_touches,
                     CAST(count(DISTINCT pid) AS BIGINT) AS n_conversions,
                     CAST(sum(vmicro // ntouch) AS BIGINT) AS attr_micro
              FROM wc GROUP BY 1),
      un AS (SELECT '(none)' AS channel, CAST(0 AS BIGINT) AS n_touches,
                    CAST(count(*) AS BIGINT) AS n_conversions,
                    CAST(coalesce(sum(vmicro), 0) AS BIGINT) AS attr_micro
             FROM conv WHERE pid NOT IN (SELECT pid FROM pairs))
      SELECT channel, n_touches, n_conversions, attr_micro,
             round(attr_micro / 1e6, 6) AS attr_value
      FROM (SELECT * FROM att UNION ALL SELECT * FROM un)
      ORDER BY channel"""))

  // ---------------------------------------------------------------- C89
  /** Position-based (U-shaped) multi-touch attribution beside C35's
    * equal split and C65's decay: first and last touch in the 24 h
    * lookback take 40% each, middles split the remaining 20% evenly
    * (1 touch → 100%, 2 touches → 50/50). Every share is an exact
    * integer division of the micro-floored value (remainders stay
    * deliberately unallocated — C35's reconciliation discipline); the
    * position windows PARTITION BY conversion, so each sort is bounded
    * by one conversion's lookback touches, never the corpus. Same
    * join shape as C35: one equi-join on the user key with a range
    * predicate. */
  private val attributionPosition = QueryDef(
    "attribution_position",
    (s, d) => {
      val ev = t(s, d, "events")
      val conv = ev.where(F.expr("event_type = 'purchase'"))
        .select(F.col("user_id").as("cu"), F.col("ts").as("pts"),
          F.col("event_id").as("pid"),
          F.expr("CAST(floor(value * 1e6) AS BIGINT)").as("vmicro"))
      val tch = ev.where(
        F.expr("event_type IN ('click', 'view', 'signup')"))
        .select(F.col("user_id").as("tu"), F.col("ts").as("tts"),
          F.col("event_id").as("tid"), F.col("event_type").as("channel"))
      val pairs = tch.join(conv, F.expr(
        "tu = cu AND tts <= pts AND tts > pts - INTERVAL 24 HOURS"))
      val w = Window.partitionBy("pid")
      val wa = Window.partitionBy("pid").orderBy("tts", "tid")
      val wd = Window.partitionBy("pid")
        .orderBy(F.col("tts").desc, F.col("tid").desc)
      val att = pairs
        .withColumn("ntouch", F.count(F.lit(1)).over(w))
        .withColumn("ra", F.row_number().over(wa))
        .withColumn("rd", F.row_number().over(wd))
        .withColumn("share_micro", F.expr(
          """CASE WHEN ntouch = 1 THEN vmicro
            |     WHEN ntouch = 2 THEN vmicro div 2
            |     WHEN ra = 1 OR rd = 1 THEN vmicro * 2 div 5
            |     ELSE vmicro div 5 div (ntouch - 2) END""".stripMargin))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).as("n_touches"),
          F.countDistinct("pid").as("n_conversions"),
          F.sum("share_micro").as("attr_micro"))
      val none = conv.join(
        pairs.select("pid").distinct(), Seq("pid"), "left_anti")
        .agg(F.count(F.lit(1)).as("n_conversions"),
          F.coalesce(F.sum("vmicro"), F.lit(0L)).as("attr_micro"))
        .select(F.lit("(none)").as("channel"),
          F.lit(0L).as("n_touches"), F.col("n_conversions"),
          F.col("attr_micro"))
      att.unionByName(none)
        .withColumn("attr_value",
          F.round(F.col("attr_micro") / 1e6, 6))
        .orderBy("channel")
    },
    Some("""
      WITH conv AS (SELECT user_id AS cu, ts AS pts, event_id AS pid,
                           CAST(floor(value * 1e6) AS BIGINT) AS vmicro
                    FROM events WHERE event_type = 'purchase'),
      tch AS (SELECT user_id AS tu, ts AS tts, event_id AS tid,
                     event_type AS channel
              FROM events WHERE event_type IN ('click', 'view', 'signup')),
      pairs AS (SELECT channel, pid, vmicro, tts, tid
                FROM tch JOIN conv ON tu = cu AND tts <= pts
                     AND tts > pts - INTERVAL 24 HOUR),
      pos AS (SELECT channel, pid, vmicro,
                     count(*) OVER (PARTITION BY pid) AS ntouch,
                     row_number() OVER (PARTITION BY pid
                       ORDER BY tts, tid) AS ra,
                     row_number() OVER (PARTITION BY pid
                       ORDER BY tts DESC, tid DESC) AS rd
              FROM pairs),
      sh AS (SELECT channel, pid,
                    CASE WHEN ntouch = 1 THEN vmicro
                         WHEN ntouch = 2 THEN vmicro // 2
                         WHEN ra = 1 OR rd = 1 THEN vmicro * 2 // 5
                         ELSE vmicro // 5 // (ntouch - 2) END AS share_micro
             FROM pos),
      att AS (SELECT channel,
                     CAST(count(*) AS BIGINT) AS n_touches,
                     CAST(count(DISTINCT pid) AS BIGINT) AS n_conversions,
                     CAST(sum(share_micro) AS BIGINT) AS attr_micro
              FROM sh GROUP BY 1),
      un AS (SELECT '(none)' AS channel, CAST(0 AS BIGINT) AS n_touches,
                    CAST(count(*) AS BIGINT) AS n_conversions,
                    CAST(coalesce(sum(vmicro), 0) AS BIGINT) AS attr_micro
             FROM conv WHERE pid NOT IN (SELECT pid FROM pairs))
      SELECT channel, n_touches, n_conversions, attr_micro,
             round(attr_micro / 1e6, 6) AS attr_value
      FROM (SELECT * FROM att UNION ALL SELECT * FROM un)
      ORDER BY channel"""))

  // ---------------------------------------------------------------- E76
  /** Differentially-private count release (ε = 1, Laplace mechanism),
    * completing the privacy ladder E40 → E58 → E71: per-segment order
    * counts released with additive Laplace(1/ε) noise whose draw is the
    * C68 bootstrap discipline — the unit draw comes from the portable
    * 60-bit hash of the release key and maps through a HARDCODED
    * 16-entry integer inverse-CDF table (micros of the Laplace quantile
    * at (i+½)/16 — no ln() at query time, both engines read identical
    * literals), so every "random" release is bit-reproducible and
    * oracle-checkable. Sensitivity of a disjoint-partition count is 1 ⇒
    * scale b = 1/ε. The true count is published BESIDE the release for
    * the audit (a production release would drop it — documented here so
    * the noise magnitude is itself verifiable). One map-side-combined
    * aggregate to a 5-row frame. */
  private val dpRelease = QueryDef(
    "dp_release",
    (s, d) => {
      val lap = Seq(-2772589L, -1673976L, -1163151L, -826679L, -575364L,
        -374693L, -207639L, -64539L, 64539L, 207639L, 374693L, 575364L,
        826679L, 1163151L, 1673976L, 2772589L)
      val arr = lap.mkString("array(", "L, ", "L)")
      t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").as("segment"))
        .agg(F.count(F.lit(1)).as("n_true"))
        .withColumn("_h", F.pmod(
          Hashing.hash60(F.concat(F.lit("dp:"), F.col("segment"))),
          F.lit(16)).cast("int"))
        .withColumn("noise_micro",
          F.expr(s"element_at($arr, _h + 1)"))
        .select(F.col("segment"), F.col("n_true"), F.col("noise_micro"),
          F.expr("n_true * 1000000L + noise_micro").as("released_micro"),
          F.lit(1000000L).as("epsilon_micro"))
        .orderBy("segment")
    },
    Some {
      val lap = Seq(-2772589L, -1673976L, -1163151L, -826679L, -575364L,
        -374693L, -207639L, -64539L, 64539L, 207639L, 374693L, 575364L,
        826679L, 1163151L, 1673976L, 2772589L).mkString("[", ", ", "]")
      s"""
      WITH g AS (
        SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_true
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1)
      SELECT segment, n_true,
             CAST((ARRAY$lap)[CAST(
               ${Hashing.hash60Sql("'dp:' || segment")} % 16 AS INTEGER)
               + 1] AS BIGINT) AS noise_micro,
             CAST(n_true * 1000000 + (ARRAY$lap)[CAST(
               ${Hashing.hash60Sql("'dp:' || segment")} % 16 AS INTEGER)
               + 1] AS BIGINT) AS released_micro,
             CAST(1000000 AS BIGINT) AS epsilon_micro
      FROM g ORDER BY segment"""
    })

  // ---------------------------------------------------------------- C36
  private val runningDistinct = QueryDef(
    "running_distinct",
    (s, d) => Warehouse.cumulativeDistinct(t(s, d, "events"),
      "user_id", "ts"),
    Some("""
      WITH f AS (SELECT user_id, min(ts) AS ft FROM events GROUP BY 1),
      n AS (SELECT date_trunc('day', ft) AS day,
                   CAST(count(*) AS BIGINT) AS new_users
            FROM f GROUP BY 1),
      a AS (SELECT day, CAST(count(*) AS BIGINT) AS active_users
            FROM (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                  FROM events) GROUP BY 1)
      SELECT a.day, active_users, coalesce(new_users, 0) AS new_users,
             CAST(sum(coalesce(new_users, 0))
                    OVER (ORDER BY a.day ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_users
      FROM a LEFT JOIN n USING (day)
      ORDER BY day"""))

  // ---------------------------------------------------------------- C37
  /** Robust per-segment price outliers: |x − median| > 3·MAD. */
  private val anomalyMad = QueryDef(
    "anomaly_mad",
    (s, d) => Warehouse.madOutliers(
      t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.col("o_totalprice").as("price")),
      "segment", "price", k = 3.0),
    Some("""
      WITH j AS (SELECT c_mktsegment AS segment, o_totalprice AS price
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      med AS (SELECT segment, quantile_cont(price, 0.5) AS m
              FROM j GROUP BY 1),
      dev AS (SELECT j.segment, price, m, abs(price - m) AS adev
              FROM j JOIN med USING (segment)),
      mad AS (SELECT segment, quantile_cont(adev, 0.5) AS dd
              FROM dev GROUP BY 1)
      SELECT dev.segment, CAST(count(*) AS BIGINT) AS n,
             round(min(m), 6) AS median_val, round(min(dd), 6) AS mad,
             CAST(sum(CASE WHEN adev > 3.0 * dd THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers,
             round(sum(CASE WHEN adev > 3.0 * dd THEN 1 ELSE 0 END)
                   * 1.0 / count(*), 6) AS outlier_frac
      FROM dev JOIN mad USING (segment)
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- E39
  /** Train on the hash-even half against the weak label lang='en',
    * evaluate on the held-out half; output = confusion matrix. */
  private val qualityClassifier = QueryDef(
    "quality_classifier",
    (s, d) => graft.operators.Curation.nbQuality(
      t(s, d, "documents"), "doc_id", "text",
      labelCol = F.col("lang") === "en"),
    Some(s"""
      WITH base AS (SELECT doc_id, lang = 'en' AS lbl,
                           ${Hashing.hash60Sql("CAST(doc_id AS VARCHAR)")}
                             % 2 = 0 AS train,
                           regexp_split_to_array(lower(text), ' +') AS t
                    FROM documents),
      tok AS (SELECT doc_id, lbl, train, unnest(t) AS tok FROM base),
      tf AS (SELECT doc_id, lbl, train, tok, count(*) AS tf FROM tok
             WHERE length(tok) > 0 GROUP BY 1, 2, 3, 4),
      vocab AS (SELECT tok,
                       CAST(sum(CASE WHEN lbl THEN tf ELSE 0 END)
                            AS BIGINT) AS ct,
                       CAST(sum(CASE WHEN NOT lbl THEN tf ELSE 0 END)
                            AS BIGINT) AS cf
                FROM tf WHERE train GROUP BY 1),
      tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
                     CAST(sum(cf) AS BIGINT) AS tfo,
                     CAST(count(*) AS BIGINT) AS v FROM vocab),
      pri AS (SELECT CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END)
                          AS BIGINT) AS ndt,
                     CAST(sum(CASE WHEN NOT lbl THEN 1 ELSE 0 END)
                          AS BIGINT) AS ndf
              FROM base WHERE train),
      sc AS (SELECT tf.doc_id, tf.lbl,
                    CAST(sum(tf.tf) AS BIGINT) AS ntok,
                    CAST(sum(tf.tf *
                          ((length(bin(coalesce(ct, 0) + 1)) - 1)
                           - (length(bin(coalesce(cf, 0) + 1)) - 1)))
                         AS BIGINT) AS sw
             FROM tf LEFT JOIN vocab USING (tok)
             WHERE NOT train GROUP BY 1, 2),
      fin AS (SELECT lbl,
                     sw - ntok * ((length(bin(tt + v)) - 1)
                                  - (length(bin(tfo + v)) - 1))
                        + ((length(bin(ndt + 1)) - 1)
                           - (length(bin(ndf + 1)) - 1)) AS score
              FROM sc, tot, pri)
      SELECT CAST(CASE WHEN lbl THEN 1 ELSE 0 END AS BIGINT) AS label,
             CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
             CAST(count(*) AS BIGINT) AS n_docs,
             round(CAST(sum(score) AS DOUBLE) / count(*), 6) AS avg_score
      FROM fin GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ----------------------------------------------------------------- H7
  /** MERGE apply: snapshot = latest per-user state before Jan 15, CDC
    * stream = everything after; latest 'error' change deletes the key,
    * any other change upserts, untouched keys pass through as 'base'. */
  private val cdcMerge = QueryDef(
    "cdc_merge",
    (s, d) => {
      val ev = t(s, d, "events")
      val cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
      val base = ev.where(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(F.max(F.struct(F.col("ts"), F.col("event_id"),
          F.col("event_type"))).as("_b"))
        .select(F.col("user_id"), F.col("_b.event_type").as("event_type"))
      val changes = ev.where(F.col("ts") >= cutoff)
        .withColumn("op",
          F.when(F.col("event_type") === "error", "D").otherwise("U"))
      Warehouse.mergeChangelog(base, changes,
        "user_id", "ts", "event_id", "op", "event_type")
        .orderBy("user_id")
    },
    Some("""
      WITH b AS (
        SELECT user_id, event_type AS bstate FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1),
      c AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               event_type AS cstate FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1)
      SELECT user_id, coalesce(cstate, bstate) AS state,
             CASE WHEN op IS NULL THEN 'base' ELSE 'cdc' END AS src
      FROM b FULL OUTER JOIN c USING (user_id)
      WHERE op IS NULL OR op <> 'D'
      ORDER BY user_id"""))

  // ---------------------------------------------------------------- C38
  private val markovTransitions = QueryDef(
    "markov_transitions",
    (s, d) => Warehouse.transitionMatrix(t(s, d, "events"),
      "user_id", "ts", "event_id", "event_type"),
    Some("""
      WITH p AS (SELECT event_type AS src,
                        lead(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS dst
                 FROM events),
      c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM p
            WHERE dst IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT src, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1)
      SELECT src, dst, n, total,
             CAST(n * 1000000 // total AS BIGINT) AS p_micro,
             round(CAST(n AS DOUBLE) / total, 6) AS p
      FROM c JOIN t USING (src)
      ORDER BY src, dst"""))

  // ---------------------------------------------------------------- E40
  /** Quasi-identifier release audit: equivalence classes of
    * (nation, segment, priority) with k=10. */
  private val kAnonymity = QueryDef(
    "k_anonymity",
    (s, d) => graft.operators.Privacy.kAnonymity(
      t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_nationkey").as("nation"),
          F.col("c_mktsegment").as("segment"),
          F.col("o_orderpriority").as("priority")),
      Seq("nation", "segment", "priority"), k = 10L),
    Some("""
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CASE WHEN count(*) >= 10 THEN 1 ELSE 0 END AS BIGINT)
               AS k_anonymous
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // ---------------------------------------------------------------- E71
  /** t-closeness audit (the step after E40's k-anonymity: a class can
    * be k-anonymous yet leak because its SENSITIVE distribution differs
    * from the table's): per quasi-identifier class (nation, segment),
    * the ordinal EMD between the class's order-priority distribution
    * and the global one — EMD = Σ|cumdiff| / (V−1) over the ordered
    * categories, computed EXACTLY by cross-multiplying the cumulative
    * counts (|cumc·n − cumg·n_c| through DECIMAL(38,0)/HUGEINT, ONE
    * integral division at the end). Every frame is category-bounded
    * (nations × segments × 5 priorities); the fact shuffles once into
    * the cell counts. */
  private val tCloseness = QueryDef(
    "t_closeness",
    (s, d) => {
      val base = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.expr("CAST(c_nationkey AS BIGINT)").as("nation"),
          F.col("c_mktsegment").as("segment"),
          F.col("o_orderpriority").as("pri"))
      val cells = base.groupBy("nation", "segment", "pri")
        .agg(F.count(F.lit(1)).as("n_cv"))
      val classes = cells.groupBy("nation", "segment")
        .agg(F.sum("n_cv").as("n_c"))
      val pris = cells.groupBy("pri").agg(F.sum("n_cv").as("n_v"))
      val tot = pris.agg(F.sum("n_v").as("n"),
        F.count(F.lit(1)).as("v"))
      val prisCum = pris // 5-row frame: the window is category-bounded
        .withColumn("cumg", F.sum("n_v").over(
          Window.orderBy("pri").rowsBetween(Window.unboundedPreceding, 0)))
        .select("pri", "cumg")
      val grid = classes.crossJoin(F.broadcast(prisCum))
        .join(cells, Seq("nation", "segment", "pri"), "left")
        .na.fill(0L, Seq("n_cv"))
      grid
        .withColumn("cumc", F.sum("n_cv").over(
          Window.partitionBy("nation", "segment").orderBy("pri")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(F.broadcast(tot))
        .groupBy("nation", "segment")
        .agg(F.max("n_c").as("n_c"), F.max("n").as("n"),
          F.max("v").as("v"),
          F.sum(F.expr(
            "abs(CAST(cumc AS DECIMAL(38,0)) * n - " +
              "CAST(cumg AS DECIMAL(38,0)) * n_c)")).as("_num"))
        .select(F.col("nation"), F.col("segment"), F.col("n_c"),
          F.expr("CAST(1000000 * _num div (CAST(n_c AS DECIMAL(38,0)) " +
            "* n * (v - 1)) AS BIGINT)").as("t_micro"))
        .orderBy("nation", "segment")
    },
    Some("""
      WITH base AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
               c_mktsegment AS segment, o_orderpriority AS pri
        FROM orders JOIN customer ON o_custkey = c_custkey),
      cells AS (
        SELECT nation, segment, pri, CAST(count(*) AS BIGINT) AS n_cv
        FROM base GROUP BY 1, 2, 3),
      classes AS (
        SELECT nation, segment, CAST(sum(n_cv) AS BIGINT) AS n_c
        FROM cells GROUP BY 1, 2),
      pris AS (
        SELECT pri, CAST(sum(n_cv) AS BIGINT) AS n_v FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS v FROM pris),
      pcum AS (
        SELECT pri, CAST(sum(n_v) OVER (ORDER BY pri
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumg
        FROM pris),
      grid AS (
        SELECT c.nation, c.segment, c.n_c, p.pri, p.cumg,
               coalesce(ce.n_cv, 0) AS n_cv
        FROM classes c CROSS JOIN pcum p
             LEFT JOIN cells ce ON ce.nation = c.nation
                  AND ce.segment = c.segment AND ce.pri = p.pri),
      cum AS (
        SELECT nation, segment, n_c, cumg,
               CAST(sum(n_cv) OVER (PARTITION BY nation, segment
                 ORDER BY pri ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumc
        FROM grid)
      SELECT nation, segment, CAST(max(n_c) AS BIGINT) AS n_c,
             CAST(1000000 * sum(abs(CAST(cumc AS HUGEINT) * n
                                    - CAST(cumg AS HUGEINT) * n_c))
                  // (CAST(max(n_c) AS HUGEINT) * max(n) * (max(v) - 1))
                  AS BIGINT) AS t_micro
      FROM cum, tot GROUP BY nation, segment ORDER BY nation, segment"""))

  // ---------------------------------------------------------------- C41
  /** Point-in-time dimension lookup: the C34 SCD2 table sliced at one
    * timestamp (valid_from ≤ t < valid_to, open current rows included).
    * The oracle derives the same state INDEPENDENTLY as each user's
    * latest raw event ≤ t — a cross-check that the interval semantics
    * reconstruct history exactly. At scale the slice is a pure filter
    * over the already-built dimension (no re-shuffle). */
  private val scd2Asof = QueryDef(
    "scd2_asof",
    (s, d) => {
      val asof = F.lit("2024-01-15 00:00:00").cast("timestamp")
      Warehouse.scd2Build(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type")
        .where(F.col("valid_from") <= asof &&
          (F.col("valid_to").isNull || F.col("valid_to") > asof))
        .select(F.col("user_id"), F.col("attr"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_type AS attr FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
      WHERE rn = 1 ORDER BY user_id"""))

  // ---------------------------------------------------------------- C42
  /** Event-type co-occurrence with PMI: which behaviors share users
    * more than independence predicts. Lift is an EXACT integer micro
    * (n_ab·N·1e6 div n_a·n_b — the hash-checked column); PMI is its
    * rounded log2, derived per row.
    *
    * Scale shape: distinct (user, type) is one map-side-combined
    * aggregate; the pair self-join co-partitions on user with fan-out
    * bounded by |types|² per user; the per-type totals and the 1-row
    * user count broadcast. Nothing quadratic in users. */
  private val pmiCooccur = QueryDef(
    "pmi_cooccur",
    (s, d) => {
      val ev = t(s, d, "events")
      val ut = CacheScope.persist(
        ev.select("user_id", "event_type").distinct())
      val perType = ut.groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n_t"))
      val users = ev.agg(
        F.countDistinct(F.col("user_id")).as("n_users"))
      val pairs = ut.as("a")
        .join(ut.as("b"), F.col("a.user_id") === F.col("b.user_id") &&
          F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(F.col("a.event_type").as("ta"),
          F.col("b.event_type").as("tb"))
        .agg(F.count(F.lit(1)).as("n_ab"))
      pairs
        .join(F.broadcast(perType.select(
          F.col("event_type").as("ta"), F.col("n_t").as("n_a"))), Seq("ta"))
        .join(F.broadcast(perType.select(
          F.col("event_type").as("tb"), F.col("n_t").as("n_b"))), Seq("tb"))
        .crossJoin(F.broadcast(users))
        .select(F.col("ta"), F.col("tb"), F.col("n_ab"), F.col("n_a"),
          F.col("n_b"), F.col("n_users"),
          F.expr("n_ab * n_users * 1000000L div (n_a * n_b)")
            .as("lift_micro"),
          F.round(F.log2(F.col("n_ab").cast("double") * F.col("n_users") /
            (F.col("n_a") * F.col("n_b"))), 6).as("pmi"))
        .orderBy("ta", "tb")
    },
    Some("""
      WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
            FROM ut GROUP BY 1),
      u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events),
      p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2)
      SELECT ta, tb, n_ab, na.n_t AS n_a, nb.n_t AS n_b, n_users,
             CAST(n_ab * n_users * 1000000 // (na.n_t * nb.n_t)
                  AS BIGINT) AS lift_micro,
             round(log2(CAST(n_ab AS DOUBLE) * n_users
                        / (na.n_t * nb.n_t)), 6) AS pmi
      FROM p JOIN n na ON na.event_type = ta
             JOIN n nb ON nb.event_type = tb, u
      ORDER BY ta, tb"""))

  // ---------------------------------------------------------------- C44
  /** 7-day rolling EXACT median of daily revenue: daily totals are
    * exact decimal sums (order-independent → portable doubles), the
    * rolling median sorts the ≤7-element window frame — bounded state
    * by construction, never a percentile over raw rows. The global
    * day-ordered window is metadata-sized at any SF (it orders days,
    * not orders). */
  private val rollingMedian = QueryDef(
    "rolling_median",
    (s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(F.to_date(F.col("o_orderdate")).as("day"))
        .agg(F.expr(
          "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE)")
          .as("rev"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("l", F.array_sort(F.collect_list(F.col("rev")).over(w)))
        .withColumn("med7", F.round(F.expr(
          "(element_at(l, CAST(((size(l) - 1) div 2) + 1 AS INT))" +
            " + element_at(l, CAST((size(l) div 2) + 1 AS INT))) / 2"), 6))
        .select("day", "rev", "med7")
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS rev
        FROM orders GROUP BY 1),
      w AS (SELECT day, rev,
              list_sort(list(rev) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
            FROM daily)
      SELECT day, rev,
             round((l[((len(l) - 1) // 2) + 1] + l[(len(l) // 2) + 1]) / 2,
                   6) AS med7
      FROM w ORDER BY day"""))

  // ---------------------------------------------------------------- C45
  /** Population-stability-index drift audit between two periods: decile
    * bounds taken as DISCRETE values from the baseline period (exact
    * rank positions ⌊n·k/10⌋ over a (price, key) order — actual data
    * points, no interpolation, so the bounds are bit-identical in both
    * engines), both periods binned against them, per-bin shares as
    * exact integer micros, PSI terms derived. PSI > 0.25 is the classic
    * retrain trigger.
    *
    * Scale shape: the baseline rank is a DISTRIBUTED exact rank
    * ([[graft.operators.DistRank.globalRowNumber]] — range-partitioned,
    * no single-partition window anywhere); binning is a broadcast of 9
    * doubles; the bin histogram map-side combines. */
  private val driftPsi = QueryDef(
    "drift_psi",
    (s, d) => {
      val cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
      val o = t(s, d, "orders").select(F.col("o_orderkey"),
        F.col("o_totalprice").as("price"),
        (F.col("o_orderdate") < cutoff).as("is_a"))
      val a = o.where(F.col("is_a"))
      val na = a.agg(F.count(F.lit(1)).as("n"))
      val ranked = graft.operators.DistRank
        .globalRowNumber(a, "rn", F.col("price"), F.col("o_orderkey"))
        .crossJoin(F.broadcast(na))
      val bounds = ranked
        .where(F.expr(
          "array_contains(transform(sequence(1, 9), k -> (n * k) div 10), rn)"))
        .agg(F.sort_array(F.collect_list(F.col("price"))).as("bounds"))
      val binned = o.crossJoin(F.broadcast(bounds))
        .select(F.col("is_a"),
          F.expr("size(filter(bounds, b -> price > b))").cast("long")
            .as("bin"))
      val counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_a"), 1L).otherwise(0L)).as("n_a"),
        F.sum(F.when(!F.col("is_a"), 1L).otherwise(0L)).as("n_b"))
      val totals = counts.agg(F.sum("n_a").cast("long").as("ta"),
        F.sum("n_b").cast("long").as("tb"))
      counts.crossJoin(F.broadcast(totals))
        .select(F.col("bin"), F.col("n_a"), F.col("n_b"),
          F.expr("n_a * 1000000L div ta").as("share_a_micro"),
          F.expr("n_b * 1000000L div tb").as("share_b_micro"),
          F.when(F.col("n_a") > 0 && F.col("n_b") > 0,
            F.round((F.col("n_a").cast("double") / F.col("ta") -
                F.col("n_b").cast("double") / F.col("tb")) *
              F.log(F.col("n_a").cast("double") * F.col("tb") /
                (F.col("n_b").cast("double") * F.col("ta"))), 6))
            .as("psi_term"))
        .orderBy("bin")
    },
    Some("""
      WITH o AS (SELECT o_orderkey, o_totalprice AS price,
                        o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AS is_a
                 FROM orders),
      a AS (SELECT price, o_orderkey FROM o WHERE is_a),
      na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a),
      r AS (SELECT price,
                   row_number() OVER (ORDER BY price, o_orderkey) AS rn
            FROM a),
      b AS (SELECT list_sort(list(price)) AS bounds FROM r, na
            WHERE list_contains(
              list_transform(range(1, 10), k -> (n * k) // 10), rn)),
      binned AS (SELECT is_a,
                   CAST(len(list_filter(bounds, bb -> price > bb))
                        AS BIGINT) AS bin
                 FROM o, b),
      c AS (SELECT bin,
              CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
            FROM binned GROUP BY 1),
      t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                   CAST(sum(n_b) AS BIGINT) AS tb FROM c)
      SELECT bin, n_a, n_b,
             CAST(n_a * 1000000 // ta AS BIGINT) AS share_a_micro,
             CAST(n_b * 1000000 // tb AS BIGINT) AS share_b_micro,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               round((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
                     * ln(CAST(n_a AS DOUBLE) * tb
                          / (CAST(n_b AS DOUBLE) * ta)), 6)
             END AS psi_term
      FROM c, t ORDER BY bin"""))

  // ---------------------------------------------------------------- C46
  /** Per-segment revenue trend: OLS slope/intercept of daily revenue
    * over the day index, from EXACT integer/decimal sums (n, Σx, Σx²
    * as longs; Σy, Σxy as decimals) — order-independent, so the sums
    * hash-check and the closing slope algebra is one double division
    * per group. Two map-side-combined aggregates (day grain, then
    * segment); the fact shuffles once on (segment, day).
    *
    * x = days since 1995-01-01 (intrinsic grid — no window, no sort);
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²). */
  private val trendFit = QueryDef(
    "trend_fit",
    (s, d) => {
      val daily = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").as("segment"),
          F.datediff(F.to_date(F.col("o_orderdate")), F.lit("1995-01-01"))
            .cast("long").as("x"))
        .agg(F.expr(
          "sum(CAST(o_totalprice AS DECIMAL(18,4)))").as("y"))
      val sums = daily.groupBy("segment").agg(
        F.count(F.lit(1)).as("n"),
        F.sum("x").as("sx"),
        F.sum(F.col("x") * F.col("x")).as("sxx"),
        F.expr("CAST(CAST(sum(y) AS STRING) AS DOUBLE)").as("sy"),
        F.expr("CAST(CAST(sum(CAST(x AS DECIMAL(18,0)) * y) AS STRING) AS DOUBLE)")
          .as("sxy"))
      // sy/sxy pass through RAW: the string-routed decimal→double is
      // already bitwise-identical on both engines, while round(d, 4) at
      // ~1e13 magnitude asks for precision BELOW the double's ulp —
      // Spark (BigDecimal) and DuckDB (float path) then legitimately
      // disagree in the last bit (seen at sf0.1)
      sums.select(F.col("segment"), F.col("n"), F.col("sx"), F.col("sxx"),
        F.col("sy"), F.col("sxy"),
        F.round((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) /
          (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")), 6)
          .as("slope"))
        .withColumn("intercept",
          F.round((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"), 6))
        .orderBy("segment")
    },
    Some("""
      WITH daily AS (
        SELECT c_mktsegment AS segment,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
               sum(CAST(o_totalprice AS DECIMAL(18,4))) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      sums AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(sum(CAST(x AS DECIMAL(18,0)) * y) AS VARCHAR)
                    AS DOUBLE) AS sxy
        FROM daily GROUP BY 1)
      SELECT segment, n, sx, sxx, sy, sxy,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
             round((sy - round((n * sxy - sx * sy)
                               / (n * sxx - sx * sx), 6) * sx) / n, 6)
               AS intercept
      FROM sums ORDER BY segment"""))

  // ---------------------------------------------------------------- C48
  /** RFM customer segmentation: recency (days from last order to the
    * corpus max date — data-derived so the query is reproducible),
    * frequency, exact-decimal monetary, each scored 1–5 with a
    * customer-key tie-break (bit-stable quintiles). One fact aggregate;
    * all three quintiles ride ONE exact distributed rank
    * ([[graft.operators.DistRank.globalRowNumber]] over exploded
    * (dimension, sort-value) rows with dim-leading range keys) closed
    * by the ntile arithmetic ([[graft.operators.DistRank.ntileExpr]])
    * — one range shuffle of 3n rows instead of three chained full
    * passes, and never a single-partition ntile window (billions of
    * customers at 100 TB would serialize on one task). Oracle stays
    * plain ntile(5): the rank+formula is bit-identical per dim. */
  private val rfm = QueryDef(
    "rfm",
    (s, d) => {
      val per = t(s, d, "orders").groupBy(F.col("o_custkey").as("custkey"))
        .agg(F.max(F.to_date(F.col("o_orderdate"))).as("last_day"),
          F.count(F.lit(1)).as("f"),
          F.expr("CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE)")
            .as("m"))
      val mx = per.agg(F.max("last_day").as("mx"))
      val base = per.crossJoin(F.broadcast(mx))
        .select(F.col("custkey"),
          F.datediff(F.col("mx"), F.col("last_day")).cast("long").as("r"),
          F.col("f"), F.col("m"))
      val nC = base.agg(F.count(F.lit(1)).as("nc"))
      // All three quintiles in ONE range shuffle (r7/r8 advice: the
      // three chained DistRank passes re-shuffled the customer frame
      // three times): explode each customer into one (dim, sort-value)
      // row per dimension — descending dims negate their value — and
      // range-partition ONCE on (dim, sv, custkey). dim leads the range
      // keys, so within the single total order every dim-d row precedes
      // every dim-(d+1) row and the per-dim rank is just
      // global_rownumber − dim·n_customers. r/f are small exact longs
      // and m is already the exact-decimal double, so the double sort
      // value preserves each dimension's exact order.
      val exploded = base.crossJoin(F.broadcast(nC)).select(
        F.col("custkey"), F.col("r"), F.col("f"), F.col("m"), F.col("nc"),
        F.explode(F.array(
          F.struct(F.lit(0).as("dim"),
            F.col("r").cast("double").as("sv")),         // recency asc
          F.struct(F.lit(1).as("dim"),
            (-F.col("f")).cast("double").as("sv")),      // frequency desc
          F.struct(F.lit(2).as("dim"),
            (-F.col("m")).cast("double").as("sv"))))     // monetary desc
          .as("t")
      ).select(F.col("custkey"), F.col("r"), F.col("f"), F.col("m"),
        F.col("nc"), F.col("t.dim").as("dim"), F.col("t.sv").as("sv"))
      val ranked = graft.operators.DistRank.globalRowNumber(exploded,
        "_grn", F.col("dim").asc, F.col("sv").asc, F.col("custkey").asc)
        .withColumn("_rn", F.expr("_grn - dim * nc"))
        .withColumn("_score",
          graft.operators.DistRank.ntileExpr("_rn", "nc", 5).cast("long"))
      ranked.groupBy("custkey")
        .agg(F.max("r").as("r"), F.max("f").as("f"), F.max("m").as("m"),
          F.max(F.when(F.col("dim") === 0, F.col("_score"))).as("r_score"),
          F.max(F.when(F.col("dim") === 1, F.col("_score"))).as("f_score"),
          F.max(F.when(F.col("dim") === 2, F.col("_score"))).as("m_score"))
        .select(F.col("custkey"), F.col("r"), F.col("f"), F.col("m"),
          F.col("r_score"), F.col("f_score"), F.col("m_score"))
        .orderBy("custkey")
    },
    Some("""
      WITH per AS (
        SELECT o_custkey AS custkey,
               max(CAST(o_orderdate AS DATE)) AS last_day,
               CAST(count(*) AS BIGINT) AS f,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS m
        FROM orders GROUP BY 1),
      mx AS (SELECT max(last_day) AS mx FROM per),
      b AS (SELECT custkey,
                   CAST(date_diff('day', last_day, mx) AS BIGINT) AS r,
                   f, m
            FROM per, mx)
      SELECT custkey, r, f, m,
             CAST(ntile(5) OVER (ORDER BY r ASC, custkey ASC) AS BIGINT)
               AS r_score,
             CAST(ntile(5) OVER (ORDER BY f DESC, custkey ASC) AS BIGINT)
               AS f_score,
             CAST(ntile(5) OVER (ORDER BY m DESC, custkey ASC) AS BIGINT)
               AS m_score
      FROM b ORDER BY custkey"""))

  // ---------------------------------------------------------------- C49
  /** Market-basket affinity: top co-purchased part pairs over the
    * SHARED staged pair graph ([[Staged.coPurchasePairs]] — one row
    * per (order, pair), so per-pair counts group directly); pair
    * counts map-side combine, support is an exact integer micro over
    * the basket count, and the top-50 closes as TakeOrderedAndProject.
    * The complement of C42's user-level PMI: basket-level, support-
    * thresholded, never quadratic in parts or baskets. */
  private val basketAffinity = QueryDef(
    "basket_affinity",
    (s, d) => {
      val baskets = t(s, d, "lineitem")
        .agg(F.countDistinct(F.col("l_orderkey")).as("n_baskets"))
      val pairs = Staged.coPurchasePairs(s, d)
        .groupBy(F.col("pa").as("part_a"), F.col("pb").as("part_b"))
        .agg(F.count(F.lit(1)).as("n"))
      pairs.where(F.col("n") >= 2)
        .crossJoin(F.broadcast(baskets))
        .select(F.col("part_a"), F.col("part_b"), F.col("n"),
          F.expr("n * 1000000L div n_baskets").as("support_micro"))
        .orderBy(F.col("n").desc, F.col("part_a"), F.col("part_b"))
        .limit(50)
    },
    Some("""
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                  FROM lineitem),
      nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM li),
      p AS (SELECT a.pk AS part_a, b.pk AS part_b,
                   CAST(count(*) AS BIGINT) AS n
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY 1, 2)
      SELECT part_a, part_b, n,
             CAST(n * 1000000 // n_baskets AS BIGINT) AS support_micro
      FROM p, nb WHERE n >= 2
      ORDER BY n DESC, part_a, part_b LIMIT 50"""))

  // ---------------------------------------------------------------- C91
  /** Association rules over the co-purchase baskets (r13) — the
    * support/confidence/lift triple completing C49's support-only read
    * (support says the pair is common; CONFIDENCE says "given a, how
    * often b" — the cross-sell direction; LIFT says whether the pair
    * beats independence — the number a recommender thresholds on):
    * per unordered pair, supp = n_ab/N, conf(a→b) = n_ab/n_a,
    * conf(b→a) = n_ab/n_b, lift = N·n_ab/(n_a·n_b) — ALL exact
    * integer micros (the lift numerator rides DECIMAL(38,0)/HUGEINT:
    * n_ab·N·10⁶ squares past int64 at corpus scale), min-support
    * n_ab ≥ 3, top-50 by (lift DESC, part_a, part_b) — deterministic
    * ranked read.
    *
    * Scale shape: pair counts read the STAGED weighted edge list
    * ([[Staged.coPurchaseWeights]] — the build C49 prices live);
    * per-part basket counts are one map-side-combined aggregate on the
    * distinct (order, part) frame; the rule math is per-pair-row
    * arithmetic, the ranked cut a bounded TopK. */
  private val assocRules = QueryDef(
    "assoc_rules",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(F.col("l_orderkey").as("ok"), F.col("l_partkey").as("pk"))
        .distinct()
      val baskets = li.agg(
        F.countDistinct(F.col("ok")).as("n_baskets"))
      val perPart = li.groupBy("pk").agg(F.count(F.lit(1)).as("n_one"))
      val pairs = Staged.coPurchaseWeights(s, d)
        .select(F.col("pa").as("part_a"), F.col("pb").as("part_b"),
          F.col("w").as("n_ab"))
        .where(F.col("n_ab") >= 3)
      pairs
        .join(perPart.select(F.col("pk").as("part_a"),
          F.col("n_one").as("n_a")), "part_a")
        .join(perPart.select(F.col("pk").as("part_b"),
          F.col("n_one").as("n_b")), "part_b")
        .crossJoin(F.broadcast(baskets))
        .select(F.col("part_a"), F.col("part_b"), F.col("n_ab"),
          F.col("n_a"), F.col("n_b"),
          F.expr("n_ab * 1000000L div n_baskets").as("support_micro"),
          F.expr("n_ab * 1000000L div n_a").as("conf_ab_micro"),
          F.expr("n_ab * 1000000L div n_b").as("conf_ba_micro"),
          F.expr("""CAST(CAST(n_ab AS DECIMAL(38,0)) * n_baskets * 1000000
            |div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
            .stripMargin).as("lift_micro"))
        .orderBy(F.col("lift_micro").desc, F.col("part_a"),
          F.col("part_b"))
        .limit(50)
    },
    Some("""
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                  FROM lineitem),
      nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
             FROM li),
      pp AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_one
             FROM li GROUP BY 1),
      pr AS (SELECT a.pk AS part_a, b.pk AS part_b,
                    CAST(count(*) AS BIGINT) AS n_ab
             FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT part_a, part_b, n_ab,
             pa.n_one AS n_a, pb.n_one AS n_b,
             CAST(n_ab * 1000000 // n_baskets AS BIGINT) AS support_micro,
             CAST(n_ab * 1000000 // pa.n_one AS BIGINT) AS conf_ab_micro,
             CAST(n_ab * 1000000 // pb.n_one AS BIGINT) AS conf_ba_micro,
             CAST(CAST(n_ab AS HUGEINT) * n_baskets * 1000000
                  // (CAST(pa.n_one AS HUGEINT) * pb.n_one) AS BIGINT)
               AS lift_micro
      FROM pr JOIN pp pa ON pa.pk = pr.part_a
              JOIN pp pb ON pb.pk = pr.part_b, nb
      ORDER BY lift_micro DESC, part_a, part_b LIMIT 50"""))

  def all: Seq[QueryDef] = Seq(
    scd2Build, attributionLinear, runningDistinct, anomalyMad,
    qualityClassifier, cdcMerge, markovTransitions, kAnonymity,
    tCloseness, scd2Asof, pmiCooccur, rollingMedian, driftPsi, trendFit,
    rfm, basketAffinity, attributionPosition, dpRelease, assocRules)
}
