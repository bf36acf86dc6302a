package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import Tables.t

/** Wave-22 inventory (r6): warehouse-operations completions — bucketed
  * time-decay attribution (the C35 linear model's recency-weighted
  * sibling), integer-exact log2 histograms, distributed ID-gap
  * auditing without a global sort, and fixed-depth BOM/hierarchy
  * rollup via ancestor arithmetic instead of iterative joins.
  *
  * House rules (SURVEY §5): integer micro/ppm arithmetic throughout —
  * the decay weights here are DISCRETE half-life buckets (2^-k ppm,
  * exact) rather than a per-row pow() whose last-ULP behavior differs
  * between libm implementations; wide products through
  * DECIMAL(38,0)/HUGEINT; no operator sorts anything bigger than a
  * block summary or a bounded group.
  */
object OpsQueries {

  // ---------------------------------------------------------------- C65
  /** Bucketed time-decay multi-touch attribution: touches within the
    * 24 h lookback are weighted by HALF-LIFE BUCKET — weight ppm =
    * 10⁶ / 2^(age div 12h) (k ≤ 2 under the lookback, so weights are
    * the exact integers 10⁶ / 250000·{4,2,1}⁻¹… i.e. 1000000, 500000,
    * 250000) — recency-weighted like production "time decay" models but
    * with integer-exact weights (a continuous 2^(−age/λ) needs pow(),
    * whose final ULP differs between glibc and the JVM). Per-conversion
    * share = vmicro · wᵢ div Σw, the product through DECIMAL(38,0).
    * Unattributed conversions land in the '(none)' channel, mirroring
    * C35. One touch⋈conversion time-range join co-partitioned on user,
    * one window over each conversion's ≤lookback touch set. */
  private val attributionDecay = QueryDef(
    "attribution_decay",
    (s, d) => {
      val ev = t(s, d, "events")
      val conv = ev.where(F.col("event_type") === "purchase")
        .select(F.col("user_id").as("cu"), F.col("ts").as("pts"),
          F.col("event_id").as("pid"),
          F.expr("CAST(floor(value * 1e6) AS BIGINT)").as("vmicro"))
      val tch = ev.where(F.col("event_type").isin("click", "view", "signup"))
        .select(F.col("user_id").as("tu"), F.col("ts").as("tts"),
          F.col("event_type").as("channel"))
      val pairs = tch.join(conv,
        F.col("tu") === F.col("cu") && F.col("tts") <= F.col("pts") &&
          F.col("tts") > F.col("pts") - F.expr("INTERVAL 24 HOURS"))
        .select(F.col("channel"), F.col("pid"), F.col("vmicro"),
          F.expr("1000000L div CAST(pow(2, (unix_micros(pts) - " +
            "unix_micros(tts)) div 43200000000) AS BIGINT)").as("w_ppm"))
      val wc = pairs.withColumn("sw",
        F.sum("w_ppm").over(Window.partitionBy("pid")))
      val att = wc.groupBy("channel").agg(
        F.count(F.lit(1)).as("n_touches"),
        F.countDistinct("pid").as("n_conversions"),
        F.expr("CAST(sum(CAST(vmicro AS DECIMAL(38,0)) * w_ppm div sw) " +
          "AS BIGINT)").as("attr_micro"))
      val un = conv.join(pairs.select("pid").distinct(), Seq("pid"),
        "left_anti")
        .agg(F.lit("(none)").as("channel"), F.lit(0L).as("n_touches"),
          F.count(F.lit(1)).as("n_conversions"),
          F.coalesce(F.sum("vmicro"), F.lit(0L)).as("attr_micro"))
      att.unionByName(un).orderBy("channel")
    },
    Some("""
      WITH conv AS (SELECT user_id AS cu, ts AS pts, event_id AS pid,
                           CAST(floor(value * 1e6) AS BIGINT) AS vmicro
                    FROM events WHERE event_type = 'purchase'),
      tch AS (SELECT user_id AS tu, ts AS tts, event_type AS channel
              FROM events WHERE event_type IN ('click', 'view', 'signup')),
      pairs AS (SELECT channel, pid, vmicro,
                       CAST(1000000 // CAST(pow(2,
                         date_diff('microsecond', tts, pts)
                           // 43200000000) AS BIGINT) AS BIGINT) AS w_ppm
                FROM tch JOIN conv ON tu = cu AND tts <= pts
                     AND tts > pts - INTERVAL 24 HOUR),
      wc AS (SELECT channel, pid, vmicro, w_ppm,
                    sum(w_ppm) OVER (PARTITION BY pid) AS sw
             FROM pairs),
      att AS (SELECT channel,
                     CAST(count(*) AS BIGINT) AS n_touches,
                     CAST(count(DISTINCT pid) AS BIGINT) AS n_conversions,
                     CAST(sum(CAST(vmicro AS HUGEINT) * w_ppm // sw)
                          AS BIGINT) AS attr_micro
              FROM wc GROUP BY 1),
      un AS (SELECT '(none)' AS channel, CAST(0 AS BIGINT) AS n_touches,
                    CAST(count(*) AS BIGINT) AS n_conversions,
                    CAST(coalesce(sum(vmicro), 0) AS BIGINT) AS attr_micro
             FROM conv WHERE pid NOT IN (SELECT pid FROM pairs))
      SELECT * FROM (SELECT * FROM att UNION ALL SELECT * FROM un)
      ORDER BY channel"""))

  // ---------------------------------------------------------------- C66
  /** Log2-bucketed order-value histogram per segment — the dynamic-range
    * histogram for long-tailed money amounts where C54's equi-width bins
    * waste resolution. The bucket is INTEGER-EXACT: length(bin(cents))
    * = ⌊log2⌋+1 computed from the binary string, immune to the
    * floor(log2(x)) float boundary at exact powers of two. One
    * map-side-combined groupBy; output bounded by segments × 64. */
  private val histogramLog2 = QueryDef(
    "histogram_log2",
    (s, d) => {
      t(s, d, "orders")
        .join(F.broadcast(t(s, d, "customer")),
          F.col("o_custkey") === F.col("c_custkey"))
        .select(F.col("c_mktsegment").as("segment"),
          F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy(F.col("segment"),
          F.expr("CAST(length(bin(cents)) AS BIGINT)").as("bucket"))
        .agg(F.count(F.lit(1)).as("n"),
          F.min("cents").as("min_cents"), F.max("cents").as("max_cents"))
        .orderBy("segment", "bucket")
    },
    Some("""
      SELECT c_mktsegment AS segment,
             CAST(length(bin(CAST(round(o_totalprice * 100) AS BIGINT)))
                  AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS min_cents,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS max_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2 ORDER BY segment, bucket"""))

  // ---------------------------------------------------------------- H12
  /** Distributed ID-gap audit WITHOUT a global sort, over the order
    * keys that actually carry line items (the ledger entries with no
    * detail rows are the gaps — a real reconciliation condition): keys
    * partition into 1024-wide blocks; within-block gaps come from a
    * lead() window PARTITIONED BY block (each partition sorts ≤1024
    * keys). Cross-block gaps recurse the SAME blocking one level up:
    * the per-block (min,max) summary is itself blocked into 1024-block
    * superblocks — lead(mn) PARTITIONED BY superblock (≤1024 summary
    * rows per partition) catches block-boundary gaps inside a
    * superblock, and the final lead over per-superblock (min,max)
    * rows (one row per 2²⁰ keys — metadata-sized at any SF, and the
    * recursion admits a third level before that stops being true)
    * catches superblock-boundary gaps. Union == the global-sort
    * answer, which is what the oracle computes the naive way. Output:
    * every missing run with its width. */
  private val idGaps = QueryDef(
    "id_gaps",
    (s, d) => {
      val keys = t(s, d, "lineitem")
        .select(F.col("l_orderkey").as("k")).distinct()
        .withColumn("blk", F.expr("k div 1024"))
      val wb = Window.partitionBy("blk").orderBy("k")
      val within = keys
        .withColumn("nxt", F.lead("k", 1).over(wb))
        .where(F.expr("nxt IS NOT NULL AND nxt - k > 1"))
        .select(F.expr("k + 1").as("gap_start"),
          F.expr("nxt - 1").as("gap_end"))
      val summary = keys.groupBy("blk")
        .agg(F.min("k").as("mn"), F.max("k").as("mx"))
        .withColumn("sblk", F.expr("blk div 1024"))
      val wsb = Window.partitionBy("sblk").orderBy("blk")
      val crossBlk = summary
        .withColumn("nxt_mn", F.lead("mn", 1).over(wsb))
        .where(F.expr("nxt_mn IS NOT NULL AND nxt_mn - mx > 1"))
        .select(F.expr("mx + 1").as("gap_start"),
          F.expr("nxt_mn - 1").as("gap_end"))
      val ssummary = summary.groupBy("sblk")
        .agg(F.min("mn").as("smn"), F.max("mx").as("smx"))
      val crossSblk = ssummary
        .withColumn("nxt_smn",
          F.lead("smn", 1).over(Window.orderBy("sblk")))
        .where(F.expr("nxt_smn IS NOT NULL AND nxt_smn - smx > 1"))
        .select(F.expr("smx + 1").as("gap_start"),
          F.expr("nxt_smn - 1").as("gap_end"))
      within.unionByName(crossBlk).unionByName(crossSblk)
        .select(F.col("gap_start"), F.col("gap_end"),
          F.expr("gap_end - gap_start + 1").as("n_missing"))
        .orderBy("gap_start")
    },
    Some("""
      WITH ks AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
      o AS (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM ks)
      SELECT CAST(k + 1 AS BIGINT) AS gap_start,
             CAST(nxt - 1 AS BIGINT) AS gap_end,
             CAST(nxt - k - 1 AS BIGINT) AS n_missing
      FROM o WHERE nxt IS NOT NULL AND nxt - k > 1
      ORDER BY gap_start"""))

  // ---------------------------------------------------------------- C67
  /** Fixed-depth hierarchy (BOM-style) rollup over the synthetic
    * decimal part tree (parent(pk) = pk div 10): each part contributes
    * to its ancestors at 1–3 hops via ANCESTOR ARITHMETIC — an explode
    * of 3 (hop, ancestor) rows per part and one grouped aggregate —
    * never an iterative self-join (depth is fixed; the unbounded case
    * is D11/D15's iterate-to-fixpoint territory). Ancestors are kept
    * only if they exist in the part table (broadcast semi-join).
    * Output per (ancestor, hop): descendant count + exact rolled-up
    * retail cents. */
  private val bomExplode = QueryDef(
    "bom_explode",
    (s, d) => {
      val parts = t(s, d, "part")
        .select(F.col("p_partkey").as("pk"),
          F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
      val contrib = parts
        .select(F.col("pk"), F.col("cents"), F.explode(F.expr(
          "filter(transform(sequence(1, 3), h -> named_struct(" +
            "'hop', CAST(h AS BIGINT), " +
            "'anc', pk div CAST(pow(10, h) AS BIGINT))), " +
            "x -> x.anc >= 1)")).as("a"))
        .select(F.col("a.anc").as("ancestor"),
          F.col("a.hop").as("hop"), F.col("cents"))
      contrib
        .join(F.broadcast(parts.select(F.col("pk").as("ancestor"))),
          Seq("ancestor"), "left_semi")
        .groupBy("ancestor", "hop")
        .agg(F.count(F.lit(1)).as("n_desc"),
          F.sum("cents").as("desc_cents"))
        .orderBy("ancestor", "hop")
    },
    Some("""
      WITH p AS (SELECT p_partkey AS pk,
                        CAST(round(p_retailprice * 100) AS BIGINT) AS cents
                 FROM part),
      c AS (SELECT pk, cents, CAST(h AS BIGINT) AS hop,
                   pk // CAST(pow(10, h) AS BIGINT) AS ancestor
            FROM p, unnest(generate_series(1, 3)) AS u(h)
            WHERE pk // CAST(pow(10, h) AS BIGINT) >= 1)
      SELECT ancestor, hop, CAST(count(*) AS BIGINT) AS n_desc,
             CAST(sum(cents) AS BIGINT) AS desc_cents
      FROM c WHERE ancestor IN (SELECT pk FROM p)
      GROUP BY 1, 2 ORDER BY ancestor, hop"""))

  val all: Seq[QueryDef] = Seq(attributionDecay, histogramLog2, idGaps,
    bomExplode)
}
