package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Ordered per-series recursions over pre-aggregated day grids. The
  * shape shared by the smoothing/changepoint family (E49 CUSUM, E51
  * EWMA and its streaming twin): the corpus collapses to (series, day,
  * count) map-side FIRST, so the inherently ordered fold only ever
  * touches per-series arrays bounded by CALENDAR DAYS — metadata-sized
  * at any corpus scale. */
object SeriesOps {

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
