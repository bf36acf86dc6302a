package graft.queries

import graft.operators.Audit
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-15 inventory (r5): nightly data-quality audits — referential
  * integrity both directions, one-scan column profiles, Benford
  * first-digit drift, session path analysis. Every output is
  * metadata-sized regardless of fact scale (SURVEY §2 H8/E41/E42/C39).
  */
object AuditQueries {

  // ----------------------------------------------------------------- H8
  /** Three FK relations audited in one result: orphaned children and
    * childless parents per relation (orders that never got lineitems
    * are a real completeness finding on this data: 257 at sf0.01). */
  private val fkCheck = QueryDef(
    "fk_check",
    (s, d) =>
      Audit.fkCheck(t(s, d, "lineitem"), "l_orderkey",
        t(s, d, "orders"), "o_orderkey", "lineitem->orders")
      .unionAll(Audit.fkCheck(t(s, d, "orders"), "o_custkey",
        t(s, d, "customer"), "c_custkey", "orders->customer"))
      .unionAll(Audit.fkCheck(t(s, d, "lineitem"), "l_suppkey",
        t(s, d, "supplier"), "s_suppkey", "lineitem->supplier"))
      .orderBy("relation"),
    Some("""
      WITH ck1 AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
      pk1 AS (SELECT DISTINCT o_orderkey AS k FROM orders),
      ck2 AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
      pk2 AS (SELECT DISTINCT c_custkey AS k FROM customer),
      ck3 AS (SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
      pk3 AS (SELECT DISTINCT s_suppkey AS k FROM supplier)
      SELECT 'lineitem->orders' AS relation,
        (SELECT CAST(sum(c) AS BIGINT) FROM ck1) AS child_rows,
        (SELECT CAST(count(*) AS BIGINT) FROM ck1) AS child_keys,
        CAST(coalesce((SELECT sum(c) FROM ck1 WHERE k NOT IN (SELECT k FROM pk1)), 0) AS BIGINT) AS orphan_rows,
        (SELECT CAST(count(*) AS BIGINT) FROM ck1 WHERE k NOT IN (SELECT k FROM pk1)) AS orphan_keys,
        (SELECT CAST(count(*) AS BIGINT) FROM pk1 WHERE k NOT IN (SELECT k FROM ck1)) AS childless_parents
      UNION ALL
      SELECT 'orders->customer',
        (SELECT CAST(sum(c) AS BIGINT) FROM ck2),
        (SELECT CAST(count(*) AS BIGINT) FROM ck2),
        CAST(coalesce((SELECT sum(c) FROM ck2 WHERE k NOT IN (SELECT k FROM pk2)), 0) AS BIGINT),
        (SELECT CAST(count(*) AS BIGINT) FROM ck2 WHERE k NOT IN (SELECT k FROM pk2)),
        (SELECT CAST(count(*) AS BIGINT) FROM pk2 WHERE k NOT IN (SELECT k FROM ck2))
      UNION ALL
      SELECT 'lineitem->supplier',
        (SELECT CAST(sum(c) AS BIGINT) FROM ck3),
        (SELECT CAST(count(*) AS BIGINT) FROM ck3),
        CAST(coalesce((SELECT sum(c) FROM ck3 WHERE k NOT IN (SELECT k FROM pk3)), 0) AS BIGINT),
        (SELECT CAST(count(*) AS BIGINT) FROM ck3 WHERE k NOT IN (SELECT k FROM pk3)),
        (SELECT CAST(count(*) AS BIGINT) FROM pk3 WHERE k NOT IN (SELECT k FROM ck3))
      ORDER BY relation"""))

  // ---------------------------------------------------------------- E41
  /** One-scan exact profile of every orders column. */
  private val profileTable = QueryDef(
    "profile_table",
    (s, d) => Audit.tableProfile(t(s, d, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")),
    Some {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM orders"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })

  // ---------------------------------------------------------------- E42
  /** Benford first-digit audit of o_totalprice. The synthetic uniform
    * price distribution deviates hard from Benford — the audit's
    * abs_dev_micro column says so explicitly. */
  private val benfordAudit = QueryDef(
    "benford_audit",
    (s, d) => Audit.benfordAudit(t(s, d, "orders"), "o_totalprice"),
    Some {
      val cases = Audit.benfordMicro.toSeq.sortBy(_._1)
        .map { case (dd, m) => s"WHEN '$dd' THEN ${m}" }.mkString(" ")
      s"""
      WITH c AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
      tt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      SELECT digit, n,
             CAST(n * 1000000 // total AS BIGINT) AS share_micro,
             CAST(CASE digit $cases END AS BIGINT) AS benford_micro,
             CAST(abs(n * 1000000 // total - CASE digit $cases END) AS BIGINT) AS abs_dev_micro
      FROM c, tt ORDER BY digit"""
    })

  // ---------------------------------------------------------------- C39
  /** Top-20 opening session paths: each user's first three event types
    * joined with '>' (shorter histories keep their shorter path), ranked
    * by user count with a deterministic path tie-break.
    *
    * Scale shape: one (user × (ts, tie)) window shuffle bounded to
    * rn ≤ 3 rows out per user, a per-user 3-way pivot aggregate, then a
    * map-side-combined path count closed by TakeOrderedAndProject —
    * nothing global ever sorts more than the |paths| matrix. */
  private val sessionPaths = QueryDef(
    "session_paths",
    (s, d) => {
      val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val first3 = t(s, d, "events")
        .select(F.col("user_id"), F.col("event_type"),
          F.row_number().over(ord).as("rn"))
        .where(F.col("rn") <= 3)
      val paths = first3.groupBy("user_id").agg(
        F.concat_ws(">",
          F.max(F.when(F.col("rn") === 1, F.col("event_type"))),
          F.max(F.when(F.col("rn") === 2, F.col("event_type"))),
          F.max(F.when(F.col("rn") === 3, F.col("event_type"))))
          .as("path"))
      paths.groupBy("path").agg(F.count(F.lit(1)).as("n"))
        .orderBy(F.col("n").desc, F.col("path")).limit(20)
    },
    Some("""
      WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      p AS (
        SELECT user_id,
               concat_ws('>',
                 max(CASE WHEN rn = 1 THEN event_type END),
                 max(CASE WHEN rn = 2 THEN event_type END),
                 max(CASE WHEN rn = 3 THEN event_type END)) AS path
        FROM r WHERE rn <= 3 GROUP BY 1)
      SELECT path, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 20"""))

  // ---------------------------------------------------------------- C40
  /** Per-key count-of-counts histogram of the lineitem join key — the
    * pre-join skew diagnostic (a heavy top bucket ⇒ salt the key). */
  private val keySkew = QueryDef(
    "key_skew",
    (s, d) => Audit.skewProfile(t(s, d, "lineitem"), "l_orderkey"),
    Some("""
      WITH k AS (SELECT l_orderkey, count(*) AS cnt
                 FROM lineitem GROUP BY 1)
      SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS rows,
             CAST(min(cnt) AS BIGINT) AS min_cnt,
             CAST(max(cnt) AS BIGINT) AS max_cnt
      FROM k GROUP BY 1 ORDER BY bucket"""))

  // ---------------------------------------------------------------- C47
  /** Chi-square independence audit of order priority × customer
    * segment, reported PER CELL (observed n, exact integer-micro
    * expected under independence, the cell's χ² term) — per-cell output
    * keeps everything deterministic: no cross-cell double summation
    * whose order could differ between engines. Row/col totals broadcast
    * (|priorities| × |segments| cells is metadata); the fact aggregates
    * once, map-side combined. */
  private val chisqCells = QueryDef(
    "chisq_cells",
    (s, d) => {
      val cells = t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .groupBy(F.col("o_orderpriority").as("priority"),
          F.col("c_mktsegment").as("segment"))
        .agg(F.count(F.lit(1)).as("n"))
      val rows = cells.groupBy("priority").agg(F.sum("n").cast("long").as("nr"))
      val colsT = cells.groupBy("segment").agg(F.sum("n").cast("long").as("nc"))
      val total = cells.agg(F.sum("n").cast("long").as("nt"))
      cells
        .join(F.broadcast(rows), Seq("priority"))
        .join(F.broadcast(colsT), Seq("segment"))
        .crossJoin(F.broadcast(total))
        .select(F.col("priority"), F.col("segment"), F.col("n"),
          F.col("nr"), F.col("nc"),
          F.expr("nr * nc * 1000000L div nt").as("expected_micro"),
          F.round(
            F.pow(F.col("n") - F.col("nr") * F.col("nc") / F.col("nt").cast("double"), 2) /
              (F.col("nr") * F.col("nc") / F.col("nt").cast("double")), 6)
            .as("chi_term"))
        .orderBy("priority", "segment")
    },
    Some("""
      WITH cells AS (
        SELECT o_orderpriority AS priority, c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      r AS (SELECT priority, CAST(sum(n) AS BIGINT) AS nr FROM cells GROUP BY 1),
      c AS (SELECT segment, CAST(sum(n) AS BIGINT) AS nc FROM cells GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells)
      SELECT priority, segment, n, nr, nc,
             CAST(nr * nc * 1000000 // nt AS BIGINT) AS expected_micro,
             round(pow(n - nr * nc / CAST(nt AS DOUBLE), 2)
                   / (nr * nc / CAST(nt AS DOUBLE)), 6) AS chi_term
      FROM cells JOIN r USING (priority) JOIN c USING (segment), t
      ORDER BY priority, segment"""))

  // ---------------------------------------------------------------- E45
  /** Hashing-trick featurization (the pre-training featurize step):
    * two feature families per event — type:<event_type> and
    * dow:<day-of-week> — hashed into 64 buckets by the portable hash60,
    * counted per user. Collisions merge by design; the bucket space is
    * fixed regardless of vocabulary, which is the point of the trick.
    * One explode (×2) + one map-side-combined aggregate; no vocabulary
    * table, no broadcast, scales with rows only. */
  private val featureHash = QueryDef(
    "feature_hash",
    (s, d) => {
      val ev = t(s, d, "events")
      val feats = F.array(
        F.concat(F.lit("type:"), F.col("event_type")),
        F.concat(F.lit("dow:"), F.dayofweek(F.col("ts")).cast("string")))
      ev.select(F.col("user_id"), F.explode(feats).as("f"))
        .select(F.col("user_id"),
          F.pmod(graft.operators.Hashing.hash60(F.col("f")), F.lit(64L))
            .as("bucket"))
        .groupBy("user_id", "bucket").agg(F.count(F.lit(1)).as("n"))
        .orderBy("user_id", "bucket")
    },
    Some(s"""
      WITH f AS (
        SELECT user_id, 'type:' || event_type AS f FROM events
        UNION ALL
        SELECT user_id, 'dow:' || CAST(dayofweek(ts) + 1 AS VARCHAR)
        FROM events)
      SELECT user_id, ${graft.operators.Hashing.hash60Sql("f")} % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM f GROUP BY 1, 2 ORDER BY user_id, bucket"""))

  def all: Seq[QueryDef] =
    Seq(fkCheck, profileTable, benfordAudit, sessionPaths, keySkew,
      chisqCells, featureHash)
}
