package graft.queries

import graft.dsl.{col => gcol, lit => glit}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.DecimalType
import Tables.t

/** Wave-1 inventory: schema/validation (A), DSL (B), relational (C).
  *
  * Oracle-parity rules (SURVEY.md §5): decimal-cast before double sums,
  * identical aliases, explicit deterministic ORDER BY.
  */
object CoreQueries {

  /** Exact decimal image of a ≤2dp double column (sums become exact and
    * engine-independent). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Hash-portable output image of an exact decimal aggregate. Decimal
    * output types hash-mismatch the oracle (Spark's DECIMAL(p+10,s) vs
    * DuckDB's DECIMAL(38,s) land as different pandas types on the
    * driver), so format the exact decimal to its plain string and parse
    * it back as a double: both engines produce the identical string and
    * both parse it with a correctly-rounded strtod → identical bits.
    * DuckDB side: CAST(CAST(x AS VARCHAR) AS DOUBLE). */
  private def pd(c: Column): Column = c.cast("string").cast("double")
  private def ts(s: String): Column = F.to_timestamp(F.lit(s))

  // ---------------------------------------------------------------- A3
  private val validateFilter = QueryDef(
    "validate_filter",
    (s, d) => Schemas.lineitem.validator
      .filterValid(t(s, d, "lineitem"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
             l_shipdate
      FROM lineitem
      WHERE l_orderkey >= 0 AND l_quantity >= 1 AND l_quantity <= 45
        AND l_extendedprice > 0 AND l_discount >= 0 AND l_discount <= 0.05
        AND l_tax >= 0
        AND length(l_returnflag) BETWEEN 1 AND 1
        AND regexp_matches(l_returnflag, '^[ANR]$')
        AND l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
        AND l_extendedprice / l_quantity <= 2000.0
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- A5
  private val violationReport = QueryDef(
    "violation_report",
    (s, d) => Schemas.lineitem.validator
      .report(t(s, d, "lineitem"))
      .orderBy("check_name"),
    Some {
      // one SELECT per constraint, same messages as the Validator emits
      val checks: Seq[(String, String)] = Seq(
        "l_orderkey must not be null" -> "l_orderkey IS NULL",
        "l_partkey must not be null" -> "l_partkey IS NULL",
        "l_suppkey must not be null" -> "l_suppkey IS NULL",
        "l_linenumber must not be null" -> "l_linenumber IS NULL",
        "l_quantity must not be null" -> "l_quantity IS NULL",
        "l_extendedprice must not be null" -> "l_extendedprice IS NULL",
        "l_discount must not be null" -> "l_discount IS NULL",
        "l_tax must not be null" -> "l_tax IS NULL",
        "l_returnflag must not be null" -> "l_returnflag IS NULL",
        "l_linestatus must not be null" -> "l_linestatus IS NULL",
        "l_shipdate must not be null" -> "l_shipdate IS NULL",
        "l_orderkey must be >= 0" -> "NOT coalesce(l_orderkey >= 0, TRUE)",
        "l_quantity must be >= 1.0" -> "NOT coalesce(l_quantity >= 1, TRUE)",
        "l_quantity must be <= 45.0" -> "NOT coalesce(l_quantity <= 45, TRUE)",
        "l_extendedprice must be > 0.0" -> "NOT coalesce(l_extendedprice > 0, TRUE)",
        "l_discount must be >= 0.0" -> "NOT coalesce(l_discount >= 0, TRUE)",
        "l_discount must be <= 0.05" -> "NOT coalesce(l_discount <= 0.05, TRUE)",
        "l_tax must be >= 0.0" -> "NOT coalesce(l_tax >= 0, TRUE)",
        "l_returnflag must have at least 1 characters" -> "NOT coalesce(length(l_returnflag) >= 1, TRUE)",
        "l_returnflag must have at most 1 characters" -> "NOT coalesce(length(l_returnflag) <= 1, TRUE)",
        "l_returnflag must match pattern: ^[ANR]$" -> "NOT coalesce(regexp_matches(l_returnflag, '^[ANR]$'), TRUE)",
        "l_shipdate must be >= 1995-06-01T00:00:00Z" -> "NOT coalesce(l_shipdate >= TIMESTAMP '1995-06-01 00:00:00', TRUE)",
        "unit price must be <= 2000" -> "NOT coalesce(l_extendedprice / l_quantity <= 2000.0, TRUE)")
      checks.map { case (msg, cond) =>
        s"SELECT '${msg.replace("'", "''")}' AS check_name, " +
          s"CAST(count(*) FILTER (WHERE $cond) AS BIGINT) AS violations FROM lineitem"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY check_name")
    })

  // ---------------------------------------------------------------- A6
  private val fillDefaults = QueryDef(
    "fill_defaults",
    (s, d) => Schemas.events.validator
      .coerce(t(s, d, "events"), fillNulls = true)
      .orderBy("event_id"),
    Some("""
      SELECT event_id, ts, user_id, event_type,
             coalesce(value, 0.0) AS value,
             coalesce(props, '{}') AS props,
             CAST(1 AS BIGINT) AS schema_version
      FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- A7
  private val castCoerce = QueryDef(
    "cast_coerce",
    (s, d) => Schemas.eventsCoerced.validator
      .coerce(t(s, d, "events"))
      .orderBy("event_id"),
    Some("""
      SELECT CAST(event_id AS INTEGER) AS event_id, CAST(ts AS DATE) AS ts,
             user_id, event_type
      FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- A9
  private val uniqueCheck = QueryDef(
    "unique_check",
    (s, d) => Schemas.documents.validator
      .uniqueViolations(t(s, d, "documents"))
      .orderBy("field", "key_value"),
    Some("""
      SELECT * FROM (
        SELECT 'doc_id' AS field, CAST(doc_id AS VARCHAR) AS key_value,
               count(*) AS occurrences
        FROM documents GROUP BY doc_id HAVING count(*) > 1
        UNION ALL
        SELECT 'lang' AS field, lang AS key_value, count(*) AS occurrences
        FROM documents GROUP BY lang HAVING count(*) > 1
      ) ORDER BY field, key_value"""))

  // ---------------------------------------------------------------- B1
  private val dslCompareArith = QueryDef(
    "dsl_compare_arith",
    (s, d) => {
      val li = t(s, d, "lineitem")
      li.select(
        F.col("l_orderkey"), F.col("l_linenumber"),
        (gcol("l_extendedprice") * (glit(1.0) - gcol("l_discount"))).toColumn.as("revenue"),
        (gcol("l_quantity") + 1.0).toColumn.as("qplus"),
        (gcol("l_quantity") / 2.0).toColumn.as("qhalf"),
        (gcol("l_discount") > 0.05).toColumn.as("high_disc"),
        (gcol("l_tax") !== 0.0).toColumn.as("has_tax"),
        (!(gcol("l_discount") > 0.05)).toColumn.as("not_high"),
        gcol("l_discount").isNull.toColumn.as("disc_null"),
        gcol("l_discount").isNotNull.toColumn.as("disc_set"))
        .filter(F.col("l_orderkey") < 500)
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS revenue,
             l_quantity + 1.0 AS qplus,
             l_quantity / 2.0 AS qhalf,
             l_discount > 0.05 AS high_disc,
             l_tax != 0.0 AS has_tax,
             NOT (l_discount > 0.05) AS not_high,
             l_discount IS NULL AS disc_null,
             l_discount IS NOT NULL AS disc_set
      FROM lineitem WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- B2
  private val dslMath = QueryDef(
    "dsl_math",
    (s, d) => t(s, d, "lineitem").select(
      F.col("l_orderkey"), F.col("l_linenumber"),
      (gcol("l_discount") - 0.05).abs.toColumn.as("d_abs"),
      (gcol("l_quantity") / 7.0).round(3).toColumn.as("q_round"),
      gcol("l_extendedprice").floor.toColumn.as("p_floor"),
      gcol("l_extendedprice").ceil.toColumn.as("p_ceil"),
      gcol("l_quantity").sqrt.toColumn.as("q_sqrt"),
      gcol("l_quantity").pow(2.0).toColumn.as("q_pow"),
      (gcol("l_orderkey") % 7L).toColumn.as("k_mod"))
      .filter(F.col("l_orderkey") < 500)
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS d_abs,
             round(l_quantity / 7.0, 3) AS q_round,
             CAST(floor(l_extendedprice) AS BIGINT) AS p_floor,
             CAST(ceil(l_extendedprice) AS BIGINT) AS p_ceil,
             sqrt(l_quantity) AS q_sqrt,
             pow(l_quantity, 2.0) AS q_pow,
             l_orderkey % 7 AS k_mod
      FROM lineitem WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- B3
  private val dslString = QueryDef(
    "dsl_string",
    (s, d) => t(s, d, "documents").select(
      F.col("doc_id"),
      gcol("text").str.contains("spark").toColumn.as("has_spark"),
      gcol("text").str.startsWith("the").toColumn.as("starts_the"),
      gcol("text").str.endsWith("dup").toColumn.as("ends_dup"),
      gcol("text").str.lenChars.toColumn.cast("long").as("n_len"),
      gcol("text").str.stripChars.str.lenChars.toColumn.cast("long").as("n_stripped"),
      gcol("source").str.toUppercase.toColumn.as("src_up"),
      gcol("source").str.toLowercase.toColumn.as("src_lo"),
      gcol("text").str.slice(0, 20).toColumn.as("head20"),
      gcol("text").str.slice(0, 20).str.replace("[aeiou]", "").toColumn.as("head20_novowel"),
      gcol("text").str.extract("^([a-z]+)", 1).toColumn.as("first_word"),
      gcol("text").str.countMatches("ab").toColumn.cast("long").as("ab_count"))
      .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             regexp_matches(text, 'spark') AS has_spark,
             starts_with(text, 'the') AS starts_the,
             ends_with(text, 'dup') AS ends_dup,
             length(text) AS n_len,
             length(trim(text)) AS n_stripped,
             upper(source) AS src_up,
             lower(source) AS src_lo,
             substr(text, 1, 20) AS head20,
             regexp_replace(substr(text, 1, 20), '[aeiou]', '', 'g') AS head20_novowel,
             regexp_extract(text, '^([a-z]+)', 1) AS first_word,
             CAST(length(regexp_extract_all(text, 'ab')) AS BIGINT) AS ab_count
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- B4
  private val dslDatetime = QueryDef(
    "dsl_datetime",
    (s, d) => t(s, d, "events").select(
      F.col("event_id"),
      gcol("ts").dt.year.toColumn.cast("long").as("y"),
      gcol("ts").dt.month.toColumn.cast("long").as("mo"),
      gcol("ts").dt.day.toColumn.cast("long").as("dom"),
      gcol("ts").dt.hour.toColumn.cast("long").as("h"),
      gcol("ts").dt.minute.toColumn.cast("long").as("mi"),
      gcol("ts").dt.second.toColumn.cast("long").as("sec"),
      F.round(gcol("ts").dt.totalDays(java.time.Instant.parse("2024-01-01T00:00:00Z")).toColumn, 6)
        .as("days_since"))
      .filter(F.col("event_id") < 2000)
      .orderBy("event_id"),
    Some("""
      SELECT event_id,
             CAST(year(ts) AS BIGINT) AS y,
             CAST(month(ts) AS BIGINT) AS mo,
             CAST(day(ts) AS BIGINT) AS dom,
             CAST(hour(ts) AS BIGINT) AS h,
             CAST(minute(ts) AS BIGINT) AS mi,
             CAST(second(ts) AS BIGINT) AS sec,
             round(date_diff('microsecond', TIMESTAMP '2024-01-01 00:00:00', ts)
                   / 86400000000.0, 6) AS days_since
      FROM events WHERE event_id < 2000 ORDER BY event_id"""))

  // ---------------------------------------------------------------- B5
  private val dslMembership = QueryDef(
    "dsl_membership",
    (s, d) => t(s, d, "lineitem").select(
      F.col("l_orderkey"), F.col("l_linenumber"),
      gcol("l_returnflag").isIn(Seq("A", "R")).toColumn.as("flag_ar"),
      gcol("l_quantity").isBetween(10.0, 20.0, "both").toColumn.as("q_both"),
      gcol("l_quantity").isBetween(10.0, 20.0, "left").toColumn.as("q_left"),
      gcol("l_quantity").isBetween(10.0, 20.0, "right").toColumn.as("q_right"),
      gcol("l_quantity").isBetween(10.0, 20.0, "none").toColumn.as("q_none"))
      .filter(F.col("l_orderkey") < 500)
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             l_returnflag IN ('A', 'R') AS flag_ar,
             l_quantity >= 10 AND l_quantity <= 20 AS q_both,
             l_quantity >= 10 AND l_quantity < 20 AS q_left,
             l_quantity > 10 AND l_quantity <= 20 AS q_right,
             l_quantity > 10 AND l_quantity < 20 AS q_none
      FROM lineitem WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- C1
  private val aggQ1 = QueryDef(
    "agg_q1",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val discPrice = dec(F.col("l_extendedprice")) * dec(F.lit(1.0) - F.col("l_discount"))
      val taxMul = (dec(F.lit(1.0) - F.col("l_discount")) * dec(F.lit(1.0) + F.col("l_tax")))
        .cast(DecimalType(18, 8))
      li.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          pd(F.sum(dec(F.col("l_quantity")))).as("sum_qty"),
          pd(F.sum(dec(F.col("l_extendedprice")))).as("sum_base_price"),
          pd(F.sum(discPrice)).as("sum_disc_price"),
          pd(F.sum(dec(F.col("l_extendedprice")) * taxMul)).as("sum_charge"),
          F.round(pd(F.sum(dec(F.col("l_quantity")))) / F.count(F.lit(1)), 6).as("avg_qty"),
          F.round(pd(F.sum(dec(F.col("l_discount")))) / F.count(F.lit(1)), 6).as("avg_disc"),
          F.count(F.lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(CAST(1.0 - l_discount AS DECIMAL(18,4))
                        * CAST(1.0 + l_tax AS DECIMAL(18,4)) AS DECIMAL(18,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
             round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS avg_qty,
             round(CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- C2
  private val joinPricing = QueryDef(
    "join_pricing",
    (s, d) => {
      val cust = t(s, d, "customer").filter(F.col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(F.col("o_orderdate") < ts("1996-07-01 00:00:00"))
      val li = t(s, d, "lineitem").filter(F.col("l_shipdate") > ts("1996-07-01 00:00:00"))
      li.join(ord, F.col("l_orderkey") === F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") === F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(pd(F.sum(dec(F.col("l_extendedprice")) * dec(F.lit(1.0) - F.col("l_discount"))))
          .as("revenue"))
        .orderBy(F.col("revenue").desc, F.col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  // ---------------------------------------------------------------- C3
  private val joinMulti = QueryDef(
    "join_multi",
    (s, d) => {
      val region = t(s, d, "region").filter(F.col("r_name") === "ASIA")
      val nation = t(s, d, "nation")
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      li.join(ord, F.col("l_orderkey") === F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") === F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") === F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") === F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          pd(F.sum(dec(F.col("l_extendedprice")) * dec(F.lit(1.0) - F.col("l_discount"))))
            .as("revenue"),
          F.count(F.lit(1)).as("n_items"))
        .orderBy(F.col("revenue").desc, F.col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM region, nation, customer, orders, lineitem
      WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        AND c_nationkey = n_nationkey AND o_custkey = c_custkey
        AND l_orderkey = o_orderkey
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // ---------------------------------------------------------------- C4
  private val joinSemi = QueryDef(
    "join_semi",
    (s, d) => {
      val cust = t(s, d, "customer").filter(F.col("c_mktsegment") === "BUILDING")
      val urgent = t(s, d, "orders").filter(F.col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, F.col("c_custkey") === F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE c_mktsegment = 'BUILDING'
        AND EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  private val joinAnti = QueryDef(
    "join_anti",
    (s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, F.col("c_custkey") === F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- C5
  private val windowTopN = QueryDef(
    "window_topn",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderpriority, rn"""))

  // ------------------------------------------------------ C5c (rewrite)
  /** Written as the plain window top-N — but the ordering is all-DESC,
    * so the TopKRewrite optimizer rule replaces the full per-partition
    * sort with the bounded-heap top_k aggregate (PlanSpec asserts the
    * rewritten plan; this query proves result equivalence vs the
    * window-form oracle). */
  private val windowTopNRewrite = QueryDef(
    "window_topn_rewrite",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").desc)
      t(s, d, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey DESC) AS INTEGER) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderpriority, rn"""))

  // ------------------------------------------------------- C5b (top_k)
  /** Same result as window_topn but via the bounded-heap TopKStruct
    * aggregate: shuffle carries k rows per group instead of the table. */
  private val aggTopK = QueryDef(
    "agg_topk",
    (s, d) => {
      val sortStruct = F.struct(
        F.col("o_totalprice"),
        (-F.col("o_orderkey")).as("_negkey"), // tie: smaller orderkey ranks first
        F.col("o_orderkey"))
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(graft.functions.TopKFunctions.topK(sortStruct, 3).as("top"))
        .select(F.col("o_orderpriority"), F.posexplode(F.col("top")).as(Seq("pos", "s")))
        .select(
          F.col("o_orderpriority"),
          (F.col("pos") + 1).cast("int").as("rn"),
          F.col("s.o_orderkey").as("o_orderkey"),
          F.col("s.o_totalprice").as("o_totalprice"))
        .orderBy("o_orderpriority", "rn")
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderpriority, rn"""))

  // ------------------------------------------------- C5e (top_k_distinct)
  /** Top-3 DISTINCT customer keys per priority via the bounded TreeSet
    * aggregate [[graft.functions.TopKDistinct]] — the scale-safe form of
    * distinct-top-k (collect_set would buffer every distinct key of the
    * group before truncating; this keeps 3). */
  private val aggTopKDistinct = QueryDef(
    "agg_topk_distinct",
    (s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(graft.functions.TopKFunctions
          .topKDistinct(F.struct(F.col("o_custkey")), 3).as("top"))
        .select(F.col("o_orderpriority"), F.posexplode(F.col("top")).as(Seq("pos", "s")))
        .select(
          F.col("o_orderpriority"),
          (F.col("pos") + 1).cast("int").as("rnk"),
          F.col("s.o_custkey").as("o_custkey"))
        .orderBy("o_orderpriority", "rnk")
    },
    Some("""
      SELECT o_orderpriority, rnk, o_custkey FROM (
        SELECT o_orderpriority, o_custkey,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_custkey DESC) AS INTEGER) AS rnk
        FROM (SELECT DISTINCT o_orderpriority, o_custkey FROM orders))
      WHERE rnk <= 3 ORDER BY o_orderpriority, rnk"""))

  // ------------------------------------------------------ C5d (rank)
  /** rank() ≤ k with TIES — deliberately NOT rewritten by TopKRewrite
    * (the heap cannot represent boundary ties): Spark 4's native
    * InferWindowGroupLimit bounds this pattern instead, inserting a
    * map-side WindowGroupLimit that keeps ≤ k+ties rows per group per
    * input partition BEFORE the shuffle — single scan, which beats any
    * semi-join prefilter we could build (those need a second scan to
    * re-probe the child). TopKRewriteSpec asserts the native node fires;
    * this query proves tie semantics vs the window oracle (o_custkey
    * repeats within a priority → real >k-rows tie groups). */
  private val windowRankTopK = QueryDef(
    "window_rank_topk",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority")
        .orderBy(F.col("o_custkey").desc)
      t(s, d, "orders")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_custkey")
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    },
    Some("""
      SELECT o_orderpriority, rnk, o_orderkey, o_custkey FROM (
        SELECT o_orderpriority, o_orderkey, o_custkey,
               CAST(rank() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_custkey DESC) AS INTEGER) AS rnk
        FROM orders)
      WHERE rnk <= 3 ORDER BY o_orderpriority, rnk, o_orderkey"""))

  // ---------------------------------------------------------------- C6
  private val windowRunning = QueryDef(
    "window_running",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val wRows = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, d, "events").filter(F.col("user_id") < 20)
        .select(
          F.col("user_id"), F.col("event_id"),
          F.row_number().over(w).as("rn"),
          F.lag("value", 1).over(w).as("prev_value"),
          pd(F.sum(dec(F.col("value"))).over(wRows)).as("run_sum"))
        .orderBy("user_id", "rn")
    },
    Some("""
      SELECT user_id, event_id,
             CAST(row_number() OVER w AS INTEGER) AS rn,
             lag(value, 1) OVER w AS prev_value,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS run_sum
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, rn"""))

  // ---------------------------------------------------------------- C8
  private val sessionize = QueryDef(
    "sessionize",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val micros = F.unix_micros(F.col("ts"))
      val gap = micros - F.lag(micros, 1).over(w)
      val isNew = F.when(gap.isNull || gap > 1800L * 1000000L, 1L).otherwise(0L)
      t(s, d, "events")
        .withColumn("is_new", isNew)
        .withColumn("session_id", F.sum("is_new")
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(
          F.count(F.lit(1)).as("n_events"),
          F.min("ts").as("session_start"),
          F.max("ts").as("session_end"))
        .orderBy("user_id", "session_id")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  // --------------------------------------------------------------- C8b
  /** Native session_window (gap-based) sessions. Boundary semantics:
    * Spark merges events whose [ts, ts+gap) intervals OVERLAP, so a gap
    * of exactly 30 min starts a NEW session (>= in the oracle), and
    * session_end is last_ts + gap. */
  private val sessionWindow = QueryDef(
    "session_window",
    (s, d) => t(s, d, "events")
      .groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
      .agg(F.count(F.lit(1)).as("n_events"))
      .select(
        F.col("user_id"),
        F.col("session_window.start").as("session_start"),
        F.col("session_window.end").as("session_end"),
        F.col("n_events"))
      .orderBy("user_id", "session_start"),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  // ---------------------------------------------------------------- C9
  private val aggRollup = QueryDef(
    "agg_rollup",
    (s, d) => {
      // SQL path: the DataFrame rollup+grouping() combination trips
      // Spark's ambiguous-self-join lint; spark.sql is the cleaner plan.
      t(s, d, "orders").createOrReplaceTempView("g_orders")
      t(s, d, "customer").createOrReplaceTempView("g_customer")
      t(s, d, "nation").createOrReplaceTempView("g_nation")
      s.sql("""
        SELECT /*+ BROADCAST(g_customer), BROADCAST(g_nation) */
               n_name, CAST(grouping(n_name) AS INT) AS grp,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total_price,
               count(*) AS n_orders
        FROM g_orders JOIN g_customer ON o_custkey = c_custkey
             JOIN g_nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name)
        ORDER BY grp, n_name""")
    },
    Some("""
      SELECT n_name, CAST(grouping(n_name) AS INTEGER) AS grp,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price,
             count(*) AS n_orders
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name)
      ORDER BY grp, n_name"""))

  // ---------------------------------------------------------------- C10
  private val pivotEvents = QueryDef(
    "pivot_events",
    (s, d) => t(s, d, "events").filter(F.col("user_id") < 50)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(F.count(F.lit(1)))
      .na.fill(0L)
      .select(
        F.col("user_id"),
        F.col("click").as("n_click"), F.col("view").as("n_view"),
        F.col("purchase").as("n_purchase"), F.col("signup").as("n_signup"),
        F.col("error").as("n_error"))
      .orderBy("user_id"),
    Some("""
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS n_click,
             count(*) FILTER (WHERE event_type = 'view') AS n_view,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             count(*) FILTER (WHERE event_type = 'error') AS n_error
      FROM events WHERE user_id < 50
      GROUP BY user_id ORDER BY user_id"""))

  // --------------------------------------------------------------- C13
  /** As-of join (composed union+window re-expression) vs DuckDB's
    * native ASOF JOIN as the oracle. */
  private val asofJoin = QueryDef(
    "asof_join",
    (s, d) => {
      val ev = t(s, d, "events")
      val errors = ev.filter(F.col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.col("ts"),
          F.col("event_id").as("r_event_id"), F.col("value").as("r_value"))
      graft.operators.AsOfJoin.asOf(errors, clicks, "user_id", "ts",
        Seq("r_event_id", "r_value"))
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"),
          F.col("asof_r_event_id").as("asof_event_id"),
          F.col("asof_r_value").as("asof_value"))
        .orderBy("event_id")
    },
    Some("""
      WITH lefts AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
      rights AS (
        SELECT user_id, ts, event_id AS r_event_id, value AS r_value
        FROM events WHERE event_type = 'click')
      SELECT l.event_id, l.user_id, l.ts,
             r.r_event_id AS asof_event_id, r.r_value AS asof_value
      FROM lefts l ASOF LEFT JOIN rights r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""))

  // -------------------------------------------------------------- C13b
  /** Forward as-of join (earliest following click per error). */
  private val asofForward = QueryDef(
    "asof_forward",
    (s, d) => {
      val ev = t(s, d, "events")
      val errors = ev.filter(F.col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.col("ts"),
          F.col("event_id").as("r_event_id"), F.col("value").as("r_value"))
      graft.operators.AsOfJoin.asOf(errors, clicks, "user_id", "ts",
        Seq("r_event_id", "r_value"), direction = "forward")
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"),
          F.col("asof_r_event_id").as("asof_event_id"),
          F.col("asof_r_value").as("asof_value"))
        .orderBy("event_id")
    },
    Some("""
      WITH lefts AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
      rights AS (
        SELECT user_id, ts, event_id AS r_event_id, value AS r_value
        FROM events WHERE event_type = 'click')
      SELECT l.event_id, l.user_id, l.ts,
             r.r_event_id AS asof_event_id, r.r_value AS asof_value
      FROM lefts l ASOF LEFT JOIN rights r
        ON l.user_id = r.user_id AND l.ts <= r.ts
      ORDER BY l.event_id"""))

  // --------------------------------------------------------------- C14
  private val aggPercentile = QueryDef(
    "agg_percentile",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        F.round(F.expr("percentile(l_discount, 0.5)"), 4).as("median_disc"))
      .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
             round(quantile_cont(l_discount, 0.5), 4) AS median_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- C15
  /** RANGE-frame window: events per user in the trailing hour. */
  private val windowRange = QueryDef(
    "window_range",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600000000L, 0)
      t(s, d, "events").filter(F.col("user_id") < 50)
        .select(
          F.col("event_id"), F.col("user_id"),
          F.count(F.lit(1)).over(w).as("n_last_hour"),
          pd(F.sum(dec(F.col("value"))).over(w)).as("sum_last_hour"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id,
             count(*) OVER w AS n_last_hour,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS sum_last_hour
      FROM events WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  // -------------------------------------------------------------- C15b
  /** Centered sliding ROWS frame (±2 rows around each event). */
  private val windowSliding = QueryDef(
    "window_sliding",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
      t(s, d, "events").filter(F.col("user_id") < 20)
        .select(
          F.col("user_id"), F.col("event_id"),
          F.count(F.lit(1)).over(w).as("n_nearby"),
          pd(F.sum(dec(F.col("value"))).over(w)).as("sum_nearby"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id,
             count(*) OVER w AS n_nearby,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS sum_nearby
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      ORDER BY user_id, event_id"""))

  // -------------------------------------------------------------- C10b
  /** Pivot → unpivot round trip: melt the wide per-user counts back to
    * long form; equals the direct grouped counts (zero rows dropped
    * because the pivot filled absent combinations with 0). */
  private val unpivotCounts = QueryDef(
    "unpivot_counts",
    (s, d) => {
      val wide = t(s, d, "events").filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(F.count(F.lit(1)))
        .na.fill(0L)
      wide.unpivot(
        Array(F.col("user_id")),
        Array(F.col("click"), F.col("view"), F.col("purchase"),
          F.col("signup"), F.col("error")),
        "event_type", "n")
        .orderBy("user_id", "event_type")
    },
    Some("""
      SELECT u.user_id, t.event_type,
             coalesce(c.n, 0) AS n
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u
      CROSS JOIN (VALUES ('click'), ('view'), ('purchase'), ('signup'), ('error')) t(event_type)
      LEFT JOIN (SELECT user_id, event_type, count(*) AS n
                 FROM events WHERE user_id < 50 GROUP BY 1, 2) c
        ON u.user_id = c.user_id AND t.event_type = c.event_type
      ORDER BY u.user_id, t.event_type"""))

  // --------------------------------------------------------------- C16
  private val aggCube = QueryDef(
    "agg_cube",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("g_orders2")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g1,
               CAST(grouping(o_orderpriority) AS INT) AS g2,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total_price,
               count(*) AS n
        FROM g_orders2
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY g1, g2, o_orderstatus, o_orderpriority""")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS INTEGER) AS g1,
             CAST(grouping(o_orderpriority) AS INTEGER) AS g2,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price,
             count(*) AS n
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g1, g2, o_orderstatus, o_orderpriority"""))

  // --------------------------------------------------------------- C17
  private val windowLead = QueryDef(
    "window_lead",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events").filter(F.col("user_id") < 20)
        .select(
          F.col("user_id"), F.col("event_id"),
          F.lead("event_type", 1).over(w).as("next_type"),
          F.lead("event_type", 2, "none").over(w).as("next2_type"),
          F.first("event_type").over(w).as("first_type"),
          F.last("event_type").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.unboundedFollowing)).as("last_type"),
          F.nth_value(F.col("event_type"), 2).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .as("second_type"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id,
             lead(event_type, 1) OVER w AS next_type,
             lead(event_type, 2, 'none') OVER w AS next2_type,
             first_value(event_type) OVER w AS first_type,
             last_value(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
             nth_value(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_type
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""))

  // -------------------------------------------------------------- C2b
  /** Q14-style promo revenue share: broadcast part dim, conditional
    * aggregation, single scalar output. */
  private val joinPromo = QueryDef(
    "join_promo",
    (s, d) => {
      val li = t(s, d, "lineitem")
        .filter(F.col("l_shipdate") >= ts("1996-01-01 00:00:00")
          && F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
      val part = t(s, d, "part").select("p_partkey", "p_type")
      val rev = dec(F.col("l_extendedprice")) * dec(F.lit(1.0) - F.col("l_discount"))
      li.join(F.broadcast(part), F.col("l_partkey") === F.col("p_partkey"))
        .agg(
          pd(F.sum(F.when(F.col("p_type") === "PROMO", rev)
            .otherwise(F.lit(0).cast(DecimalType(18, 4))))).as("promo_rev"),
          pd(F.sum(rev)).as("total_rev"),
          F.count(F.lit(1)).as("n_items"))
        .select(
          F.round(F.col("promo_rev") * 100.0 / F.col("total_rev"), 6).as("promo_pct"),
          F.col("promo_rev"), F.col("total_rev"), F.col("n_items"))
    },
    Some("""
      SELECT round(promo_rev * 100.0 / total_rev, 6) AS promo_pct,
             promo_rev, total_rev, n_items
      FROM (
        SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1.0 - l_discount AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS promo_rev,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_rev,
               count(*) AS n_items
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')"""))

  // -------------------------------------------------------------- C8c
  /** Sequential funnel: per user, did a click precede a purchase?
    * Conditional min/max aggregation — one shuffle, no self-join. */
  private val funnel = QueryDef(
    "funnel",
    (s, d) => t(s, d, "events")
      .groupBy("user_id")
      .agg(
        F.min(F.when(F.col("event_type") === "click", F.col("ts"))).as("first_click"),
        F.max(F.when(F.col("event_type") === "purchase", F.col("ts"))).as("last_purchase"),
        F.count(F.when(F.col("event_type") === "click", F.lit(1))).as("n_clicks"),
        F.count(F.when(F.col("event_type") === "purchase", F.lit(1))).as("n_purchases"))
      .withColumn("converted",
        F.col("first_click").isNotNull && F.col("last_purchase").isNotNull &&
          F.col("first_click") < F.col("last_purchase"))
      .orderBy("user_id"),
    Some("""
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'click') AS first_click,
             max(ts) FILTER (WHERE event_type = 'purchase') AS last_purchase,
             count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
             coalesce(min(ts) FILTER (WHERE event_type = 'click')
                      < max(ts) FILTER (WHERE event_type = 'purchase'), FALSE)
               AS converted
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- C7
  private val aggDistinct = QueryDef(
    "agg_distinct",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        F.countDistinct(F.col("l_orderkey")).as("n_orders"),
        F.countDistinct(F.col("l_partkey")).as("n_parts"),
        F.count(F.lit(1)).as("n_rows"))
      .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_orders,
             count(DISTINCT l_partkey) AS n_parts,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- G2
  private val windowTumbling = QueryDef(
    "window_tumbling",
    (s, d) => t(s, d, "events")
      .groupBy(
        F.window(F.col("ts"), "1 hour").getField("start").as("win_start"),
        F.col("event_type"))
      .agg(
        F.count(F.lit(1)).as("n"),
        pd(F.sum(dec(F.col("value")))).as("sum_value"))
      .orderBy("win_start", "event_type"),
    Some("""
      SELECT date_trunc('hour', ts) AS win_start, event_type,
             count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  // ---------------------------------------------------------------- A11
  /** Schema EVOLUTION applied to data: migrate v1-shaped lineitem rows
    * to [[Schemas.lineitemV2]] (drop l_linestatus, widen l_linenumber,
    * add the defaulted l_audit). Migration IS coercion against the new
    * version — one narrow codegen'd projection, no shuffle at any
    * scale. The diff/DDL halves (alterStatements, breaking report) are
    * spec-covered in `EvolutionSpec`. */
  private val schemaMigrate = QueryDef(
    "schema_migrate",
    (s, d) => graft.schema.Evolution.migrate(
      t(s, d, "lineitem"), Schemas.lineitemV2)
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_partkey, l_suppkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_shipdate,
             CAST(0 AS BIGINT) AS l_audit
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- C26
  /** Cohort retention matrix — the standard product-analytics query:
    * users are bucketed by the week of their FIRST event, and each cell
    * (cohort_week, week_offset) counts how many of that cohort were
    * active `offset` weeks later. Weeks are integer day-diffs div 7
    * from a fixed epoch — exact integer arithmetic on both engines.
    *
    * Scale shape: two user-keyed aggregates (first-event and distinct
    * active weeks — both map-side combined) joined on the user key
    * (one co-partitioned shuffle), then a metadata-sized cell
    * aggregate. No window over the event stream, no self-join. */
  private val cohortRetention = QueryDef(
    "cohort_retention",
    (s, d) => {
      val ev = t(s, d, "events")
      def week(c: Column): Column =
        F.floor(F.datediff(F.to_date(c), F.lit("2024-01-01")) / 7).cast("long")
      val first = ev.groupBy("user_id").agg(week(F.min("ts")).as("cohort_week"))
      val active = ev.select(F.col("user_id"), week(F.col("ts")).as("active_week"))
        .distinct()
      first.join(active, "user_id")
        .groupBy(F.col("cohort_week"),
          (F.col("active_week") - F.col("cohort_week")).as("week_offset"))
        .agg(F.count(F.lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""
      WITH f AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '2024-01-01',
                              CAST(min(ts) AS DATE)) // 7 AS BIGINT)
                 AS cohort_week
        FROM events GROUP BY 1),
      a AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '2024-01-01',
                              CAST(ts AS DATE)) // 7 AS BIGINT) AS active_week
        FROM events)
      SELECT cohort_week, active_week - cohort_week AS week_offset,
             count(*) AS n_users
      FROM f JOIN a USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""))

  // ---------------------------------------------------------------- C27
  /** Histogram-sketch approximate percentiles — the O(buckets)-state
    * scale path next to the exact interpolated C14 (whose sort touches
    * every group row): ONE map-side-combined aggregate builds an
    * integer-bucket histogram per group, and the quantiles read off the
    * bucket cumsum — the window runs over ≤ #buckets rows per group,
    * never the event stream. All-integer (2·cum ≥ n / 10·cum ≥ 9·n
    * avoids any float quantile rank), so the sketch is bit-portable —
    * the ESTIMATE itself is oracle-checked, where t-digest/KLL layouts
    * never could be. */
  private val approxPercentileHist = QueryDef(
    "approx_percentile_hist",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = t(s, d, "events")
        .groupBy(F.col("event_type"), F.floor(F.col("value")).as("bucket"))
        .agg(F.count(F.lit(1)).as("c"))
      hist
        .withColumn("cum",
          F.sum("c").over(Window.partitionBy("event_type").orderBy("bucket")))
        .withColumn("n", F.sum("c").over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          F.max("n").as("n"),
          F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("bucket")))
            .as("p50_bucket"),
          F.min(F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("bucket")))
            .as("p90_bucket"))
        .orderBy("event_type")
    },
    Some("""
      WITH hist AS (
        SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket,
               count(*) AS c
        FROM events GROUP BY 1, 2),
      cums AS (
        SELECT event_type, bucket, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM hist)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             min(CASE WHEN cum * 2 >= n THEN bucket END) AS p50_bucket,
             min(CASE WHEN cum * 10 >= n * 9 THEN bucket END) AS p90_bucket
      FROM cums GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[QueryDef] = Seq(
    validateFilter, violationReport, fillDefaults, castCoerce, uniqueCheck,
    dslCompareArith, dslMath, dslString, dslDatetime, dslMembership,
    aggQ1, joinPricing, joinPromo, joinMulti, joinSemi, joinAnti,
    windowTopN, windowTopNRewrite, aggTopK, aggTopKDistinct, windowRankTopK,
    windowRunning, sessionize, sessionWindow,
    funnel,
    aggRollup, pivotEvents,
    aggDistinct, windowTumbling, asofJoin, asofForward, aggPercentile,
    windowRange, windowSliding, unpivotCounts,
    aggCube, windowLead, cohortRetention, approxPercentileHist,
    schemaMigrate)
}
