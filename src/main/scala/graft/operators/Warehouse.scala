package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Classic-warehouse modeling operators the reference's users run on top
  * of its relational layer (reference: the query-surface catalog in
  * README.md:1 and generators/polars.py windowed examples): slowly-
  * changing-dimension builds, multi-touch attribution, growth-accounting
  * distinct counts, and robust (MAD-based) outlier detection.
  *
  * Portability discipline (SURVEY §5): money flows through integer
  * MICRO-units so every sum is an order-independent exact long; medians
  * use `percentile` (Spark) == `quantile_cont` (DuckDB), both exact
  * linear interpolation on doubles.
  */
object Warehouse {

  /** SCD Type-2 dimension build from an attribute change log: collapse
    * consecutive duplicate attribute values per key, then version the
    * surviving change rows with [valid_from, valid_to) ranges and an
    * `is_current` flag (valid_to NULL on the open row).
    *
    * Scale shape: ONE shuffle on the dimension key; both windows (the
    * change-collapse lag and the versioning lead/row_number) share the
    * same (key × (ts, tie)) sort order, so Catalyst plans a single
    * Window exchange+sort pair. Per-key state is one row — no skew
    * hazard beyond a genuinely hot dimension key. Ordering ties broken
    * by `tieCol` so rebuilds are bit-stable. */
  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    changes
      .withColumn("_prev", F.lag(F.col(attrCol), 1).over(ord))
      .where(F.col("_prev").isNull || F.col("_prev") =!= F.col(attrCol))
      .select(
        F.col(keyCol),
        F.col(attrCol).as("attr"),
        F.col(tsCol).as("valid_from"),
        F.lead(F.col(tsCol), 1).over(ord).as("valid_to"),
        F.row_number().over(ord).cast("long").as("version"),
        F.when(F.lead(F.col(tsCol), 1).over(ord).isNull, 1L)
          .otherwise(0L).as("is_current"))
  }

  /** Linear (equal-split) multi-touch attribution: each conversion
    * event's value is split evenly across the same user's touch events
    * inside the lookback window, plus an explicit `(none)` bucket for
    * conversions with no preceding touch (so attributed + unattributed
    * reconciles to total conversion value up to integer-division
    * remainders, which stay deliberately unallocated).
    *
    * Money is floored into micro-units BEFORE the split so the per-touch
    * share is an exact integer division and every downstream sum is an
    * exact long. Scale shape: one equi-join on the user key with a range
    * predicate — per-user fan-out is bounded by the lookback window; for
    * hot users at 100 TB compose with the binned interval-join pattern
    * (ExtendedQueries `interval_join_binned`). The per-conversion touch
    * count is a window over the conversion id, reusing the join's
    * shuffle output. */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackHours: Int): DataFrame = {
    val conv = events.where(F.col(typeCol) === convType)
      .select(F.col(userCol).as("_cu"), F.col(tsCol).as("_pts"),
        F.col(idCol).as("_pid"),
        F.floor(F.col(valueCol) * 1e6).cast("long").as("_vmicro"))
    val touch = events.where(F.col(typeCol).isin(touchTypes: _*))
      .select(F.col(userCol).as("_tu"), F.col(tsCol).as("_tts"),
        F.col(typeCol).as("channel"))
    val pairs = CacheScope.persist(
      touch.join(conv,
        F.col("_tu") === F.col("_cu") &&
          F.col("_tts") <= F.col("_pts") &&
          F.col("_tts") > F.col("_pts") -
            F.expr(s"INTERVAL $lookbackHours HOURS")))
    val attributed = pairs
      .withColumn("_ntouch",
        F.count(F.lit(1)).over(Window.partitionBy("_pid")))
      .withColumn("_share", F.expr("_vmicro div _ntouch"))
      .groupBy("channel")
      .agg(
        F.count(F.lit(1)).as("n_touches"),
        F.countDistinct("_pid").as("n_conversions"),
        F.sum("_share").as("attr_micro"))
    val unattributed = conv
      .join(pairs.select("_pid").distinct(), Seq("_pid"), "left_anti")
      .agg(F.count(F.lit(1)).as("n_conversions"),
        F.coalesce(F.sum("_vmicro"), F.lit(0L)).as("attr_micro"))
      .select(F.lit("(none)").as("channel"), F.lit(0L).as("n_touches"),
        F.col("n_conversions"), F.col("attr_micro"))
    attributed.unionByName(unattributed)
      .withColumn("attr_value", F.round(F.col("attr_micro") / 1e6, 6))
      .orderBy("channel")
  }

  /** Growth accounting: per-day new vs active distinct keys plus the
    * running cumulative distinct count. First occurrence is found with
    * a `min(ts)` aggregate on the key (map-side combined — NOT a
    * row_number window, which would sort every event), so the fact
    * table is scanned twice with one shuffle each and everything after
    * the per-day rollup is metadata-sized (the running sum's global
    * window orders days-not-events; at 100 TB that is still ~1 row per
    * day). */
  def cumulativeDistinct(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val day = F.date_trunc("DAY", F.col(tsCol))
    val newPerDay = events.groupBy(F.col(keyCol))
      .agg(F.min(F.col(tsCol)).as("_first_ts"))
      .select(F.date_trunc("DAY", F.col("_first_ts")).as("day"))
      .groupBy("day").agg(F.count(F.lit(1)).as("new_users"))
    val activePerDay = events.select(day.as("day"), F.col(keyCol).as("_k"))
      .distinct()
      .groupBy("day").agg(F.count(F.lit(1)).as("active_users"))
    activePerDay.join(newPerDay, Seq("day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", F.sum("new_users").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("day")
  }

  /** Per-group (median, MAD) threshold table — the reusable half of
    * [[madOutliers]]: batch jobs aggregate against it, and a streaming
    * scorer broadcast-joins it as a STATIC frame (the production shape:
    * thresholds refreshed periodically, the stream scored statelessly
    * against the last snapshot — see `stream_anomaly`). Two grouped
    * exact-percentile passes; group cardinality is assumed
    * dimension-like so the result broadcasts. */
  def madThresholds(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(F.expr(s"percentile($valCol, 0.5D)").as("_med"))
    df.join(F.broadcast(med), Seq(groupCol))
      .withColumn("_adev", F.abs(F.col(valCol) - F.col("_med")))
      .groupBy(groupCol)
      .agg(F.min("_med").as("_med"),
        F.expr("percentile(_adev, 0.5D)").as("_mad"))
  }

  /** Robust outlier detection via median absolute deviation: flag rows
    * whose |x − median| exceeds k·MAD within their group. Exact
    * interpolated medians (portable: `percentile` == `quantile_cont`)
    * — the right oracle config; at 100 TB swap the two exact percentile
    * passes for `approx_percentile`, the plan shape (two grouped
    * aggregates + two broadcast joins of per-group scalars) is
    * unchanged. Group cardinality is assumed dimension-like (the
    * per-group medians broadcast); the input is persisted once and
    * feeds all three scans (median, MAD, final flags). */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    val in = CacheScope.persist(df)
    val th = madThresholds(in, groupCol, valCol)
    val dev = in.join(F.broadcast(th), Seq(groupCol))
      .withColumn("_adev", F.abs(F.col(valCol) - F.col("_med")))
    dev
      .groupBy(groupCol)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.min("_med").as("_m"),
        F.min("_mad").as("_d"),
        F.sum(F.when(F.col("_adev") > F.lit(k) * F.col("_mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(F.col(groupCol),
        F.col("n"),
        F.round(F.col("_m"), 6).as("median_val"),
        F.round(F.col("_d"), 6).as("mad"),
        F.col("n_outliers"),
        F.round(F.col("n_outliers") / F.col("n"), 6).as("outlier_frac"))
      .orderBy(groupCol)
  }

  /** MERGE-style changelog application: collapse a CDC stream to its
    * latest change per key (max(struct) aggregate — O(1) state, never a
    * window sort), then resolve against the base snapshot with a full
    * outer join: latest op 'D' deletes the key, any other op upserts its
    * state, untouched base rows pass through tagged `src='base'`.
    *
    * Scale shape: one map-side-combined aggregate on the changelog key +
    * one co-partitioned full outer join on the same key — both sides
    * shuffle once; a 100 TB snapshot with a small daily changelog keeps
    * the join skew-free because the key is the PRIMARY key of both
    * sides (at most one row each). Deterministic: change order inside a
    * key resolves by (ts, tie) struct ordering. */
  def mergeChangelog(base: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, opCol: String,
      stateCol: String): DataFrame = {
    val latest = changes.groupBy(F.col(keyCol))
      .agg(F.max(F.struct(F.col(tsCol), F.col(tieCol), F.col(opCol),
        F.col(stateCol))).as("_c"))
      .select(F.col(keyCol), F.col(s"_c.$opCol").as("_op"),
        F.col(s"_c.$stateCol").as("_cstate"))
    base.select(F.col(keyCol), F.col(stateCol).as("_bstate"))
      .join(latest, Seq(keyCol), "full_outer")
      .where(F.col("_op").isNull || F.col("_op") =!= "D")
      .select(
        F.col(keyCol),
        F.coalesce(F.col("_cstate"), F.col("_bstate")).as("state"),
        F.when(F.col("_op").isNull, "base").otherwise("cdc").as("src"))
  }

  /** First-order Markov transition matrix over a per-key event sequence:
    * counts of (state → next state) pairs with row-normalized
    * probabilities. Probabilities are integer MICRO-units via exact
    * integer division (n·1e6 div total) so the matrix itself is
    * hash-portable; the double `p` is derived by one rounded division.
    *
    * Scale shape: one window shuffle on the sequence key (lead), then a
    * map-side-combined aggregate onto the (src, dst) matrix — matrix
    * cardinality is |states|², metadata-sized, so the row totals join
    * broadcasts. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val pairs = events
      .select(F.col(stateCol).as("src"),
        F.lead(F.col(stateCol), 1).over(ord).as("dst"))
      .where(F.col("dst").isNotNull)
    val counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).as("n"))
    val totals = counts.groupBy("src").agg(F.sum("n").as("total"))
    counts.join(F.broadcast(totals), Seq("src"))
      .select(F.col("src"), F.col("dst"), F.col("n"), F.col("total"),
        F.expr("n * 1000000L div total").as("p_micro"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).as("p"))
      .orderBy("src", "dst")
  }
}
