package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Ordered per-series recursions over pre-aggregated day grids. The
  * shape shared by the smoothing/changepoint family (E49 CUSUM, E51
  * EWMA and its streaming twin): the corpus collapses to (series, day,
  * count) map-side FIRST, so the inherently ordered fold only ever
  * touches per-series arrays bounded by CALENDAR DAYS — metadata-sized
  * at any corpus scale. */
object SeriesOps {

  /** Additive HOLT-WINTERS (triple exponential smoothing, season
    * length 7 observations) over a (day, cnt) day grid, entirely in
    * integer arithmetic so every state — level, trend, seasonal — is
    * hash-portable across engines (r14): α = 1/4, β = γ = 1/8 as
    * rational recursions with the PORTABLE truncating division
    * (a − a%k)/k (both engines' % is dividend-signed, so this is
    * truncation on BOTH even for the negative deseasonalized terms —
    * the §5 signed-division rule; the cleared numerator divides
    * exactly, so the double division is exact to 2⁵³ ≈ 9·10¹⁵ cents).
    *
    *   bootstrap (obs 1): L = x, B = 0, S = [0 ×7], fitted = x
    *   step (obs t ≥ 2), s₇ = head of the 7-slot season queue:
    *     fitted = L + B + s₇                (one-step-ahead, pre-x)
    *     L' = (x − s₇)/4 + 3(L + B)/4
    *     B' = (L' − L)/8 + 7B/8
    *     s' = (x − L')/8 + 7s₇/8            (queue: drop head, push s')
    *
    * The seasonal lag is by OBSERVATION index (7 observations back),
    * so calendar gaps shift phase — callers on gapped series document
    * that (the pacf_lags convention, now measured not assumed).
    *
    * Scale shape: one map-side corpus collapse to the day grid, ONE
    * array fold over the calendar-bounded series (the ewmaFold shape)
    * — never an ordered pass over facts. */
  def holtWintersFold(daily: DataFrame, dayCol: String,
      cntCol: String): DataFrame = {
    def tdiv(e: org.apache.spark.sql.Column, k: Int) =
      ((e - (e % k)) / k).cast("long")
    val rowType = "ARRAY<STRUCT<day: DATE, cents: BIGINT, " +
      "fitted: BIGINT, err: BIGINT, level: BIGINT, trend: BIGINT, " +
      "seasonal: BIGINT>>"
    val per = daily.agg(F.array_sort(F.collect_list(
      F.struct(F.col(dayCol).as("day"), F.col(cntCol).as("cnt"))))
      .as("arr"))
    val init = F.expr("named_struct('lvl', 0L, 'tr', 0L, " +
      "'seas', array(0L, 0L, 0L, 0L, 0L, 0L, 0L), " +
      s"'out', CAST(array() AS $rowType))")
    val folded = per.withColumn("st", F.aggregate(
      F.col("arr"), init,
      (acc, x) => {
        val isFirst = F.size(acc.getField("out")) === 0
        val xv = x.getField("cnt")
        val lvl = acc.getField("lvl")
        val tr = acc.getField("tr")
        val s7 = F.element_at(acc.getField("seas"), 1)
        val fitted = F.when(isFirst, xv).otherwise(lvl + tr + s7)
        val lnew = F.when(isFirst, xv)
          .otherwise(tdiv(xv - s7, 4) + tdiv((lvl + tr) * 3, 4))
        val tnew = F.when(isFirst, F.lit(0L))
          .otherwise(tdiv(lnew - lvl, 8) + tdiv(tr * 7, 8))
        val snew = F.when(isFirst, F.lit(0L))
          .otherwise(tdiv(xv - lnew, 8) + tdiv(s7 * 7, 8))
        val seas2 = F.concat(
          F.slice(acc.getField("seas"), 2, 6), F.array(snew))
        val row = F.struct(x.getField("day").as("day"),
          xv.as("cents"), fitted.as("fitted"),
          (xv - fitted).as("err"), lnew.as("level"),
          tnew.as("trend"), snew.as("seasonal"))
        F.struct(lnew.as("lvl"), tnew.as("tr"), seas2.as("seas"),
          F.concat(acc.getField("out"), F.array(row)).as("out"))
      }))
    folded.select(F.explode(F.col("st.out")).as("r"))
      .select(F.col("r.day").as("day"), F.col("r.cents").as("cents"),
        F.col("r.fitted").as("fitted"), F.col("r.err").as("err"),
        F.col("r.level").as("level"), F.col("r.trend").as("trend"),
        F.col("r.seasonal").as("seasonal"))
  }

  /** Integer EWMA over a (key, day, cnt) day grid, α = 1/4 as the
    * RATIONAL recursion s_i = (3·s_{i−1} + x_i) div 4 (s_1 = x_1): the
    * floor at each step keeps every intermediate exactly representable,
    * so the smoothed series is hash-portable where a float EWMA drifts
    * in the last ulp. Emits the full (key, day, cnt, ewma) series from
    * one array fold (accumulator bounded by calendar days). */
  def ewmaFold(dayCounts: DataFrame, keyCol: String, dayCol: String,
      cntCol: String): DataFrame = {
    val per = dayCounts.groupBy(keyCol).agg(
      F.array_sort(F.collect_list(
        F.struct(F.col(dayCol).as("day"), F.col(cntCol).as("cnt"))))
        .as("arr"))
    val folded = per.withColumn("out", F.aggregate(
      F.col("arr"),
      F.expr("CAST(array() AS ARRAY<STRUCT<day: DATE, cnt: BIGINT, ewma: BIGINT>>)"),
      (acc, x) => {
        val prev = F.element_at(acc, -1)("ewma")
        val sm = F.when(F.size(acc) === 0, x("cnt"))
          .otherwise((F.lit(3L) * prev + x("cnt")) / F.lit(4L))
        F.concat(acc, F.array(F.struct(
          x("day").as("day"), x("cnt").as("cnt"),
          F.floor(sm).cast("long").as("ewma"))))
      }))
    folded.select(F.col(keyCol), F.explode(F.col("out")).as("r"))
      .select(F.col(keyCol), F.col("r.day").as("day"),
        F.col("r.cnt").as("cnt"), F.col("r.ewma").as("ewma"))
  }
}
