package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Distributed, engine-portable cardinality sketching.
  *
  * KMV (k-minimum-values) distinct-count estimation [Bar-Yossef et al.
  * 2002]: hash every value onto [0, 2^60); keep the k smallest DISTINCT
  * hashes per group; if the group holds ≥ k distinct hashes, estimate
  * |D| ≈ (k-1) · 2^60 / h_(k), else the kept count is exact.
  *
  * Why not HyperLogLog (`approx_count_distinct`)? HLL register layouts
  * and hash functions differ per engine, so results can't be
  * oracle-checked bit-for-bit. KMV over the portable md5-based
  * [[Hashing.hash60]] is deterministic and reproducible in ANY engine
  * with md5 — the DuckDB oracle recomputes the identical sketch in SQL.
  *
  * Scale shape: ONE shuffle, O(k) aggregation state per group — the
  * [[graft.functions.TopKDistinct]] TreeSet aggregate dedupes inside
  * the sketch with map-side partial aggregation, so a 100 TB corpus
  * never materializes its distinct set (the classic
  * `count(DISTINCT x)` two-shuffle expansion) — estimate error is
  * ~1/sqrt(k-2), ~4.6% at k=512.
  */
object Sketch {

  private val MaxHash: Double = 1152921504606846976.0 // 2^60, exact in double

  /** Bottom-k DISTINCT non-negative longs per group, ascending: the
    * TreeSet top-k on the negated key (distinctness on (-v, v) ==
    * distinctness on v; negation exact for v ≥ 0). */
  def bottomKDistinctLong(key: Column, k: Int): Column =
    F.transform(
      graft.functions.TopKFunctions.topKDistinct(
        F.struct((-key).as("_neg"), key.as("v")), k),
      x => x.getField("v"))

  /** Per-group distinct-count estimate of `valueCol` via a k-minimum-
    * values sketch over [[Hashing.hash60]]. Emits `n_kept` (sketch
    * fill), `kth_min` (the kth smallest hash, null when under-filled)
    * and `est_distinct` (double, exact when the group has < k distinct
    * values). */
  def kmvDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 512): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val sketch = df
      .groupBy(groupCols.map(F.col): _*)
      .agg(bottomKDistinctLong(Hashing.hash60(F.col(valueCol).cast("string")), k)
        .as("_mins"))
    val nKept = F.size(F.col("_mins")).cast("long")
    // try_: an under-filled sketch has no kth element (ANSI element_at
    // would throw INVALID_ARRAY_INDEX, not return null)
    val kth = F.try_element_at(F.col("_mins"), F.lit(k))
    sketch.select(
      groupCols.map(F.col) ++ Seq(
        nKept.as("n_kept"),
        F.when(nKept === k, kth).as("kth_min"),
        F.round(
          F.when(nKept === k,
            F.lit((k - 1).toDouble * MaxHash) / kth.cast("double"))
            .otherwise(nKept.cast("double")),
          6).as("est_distinct")): _*)
  }

  /** DuckDB SQL fragment mirroring [[kmvDistinct]]'s estimate for a
    * group whose k minimum distinct hashes sit in rows `rn <= k` of a
    * window-ranked CTE (see the `approx_distinct_kmv` oracle). */
  def kmvEstimateSql(k: Int): String =
    s"""round(CASE WHEN count(*) >= $k
       |      THEN ${(k - 1).toDouble} * 1152921504606846976.0 / max(h)
       |      ELSE CAST(count(*) AS DOUBLE) END, 6)""".stripMargin
}
