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

  // ------------------------------------------------- count-min sketch

  /** Bucket of `term` in CMS hash row `row`: the same portable
    * [[Hashing.hash60]] family as every other sketch here (seeded by a
    * literal prefix), so the DuckDB oracle reproduces each cell. */
  def cmsBucket(term: Column, row: Int, width: Int): Column =
    F.pmod(Hashing.hash60(F.concat(F.lit(s"cms$row:"), term)),
      F.lit(width.toLong))

  /** Count-min sketch [Cormode & Muthukrishnan 2005] over an already
    * aggregated (term, count) table: `depth` hash rows × `width`
    * buckets, cell = Σ counts of terms hashing there. Point estimate =
    * min over rows (never underestimates; overestimate bounded by
    * εN, ε = e/width, w.p. 1 − e^−depth).
    *
    * Scale shape: the sketch is built from the VOCABULARY table (the
    * map-side-combined output of the corpus scan), so the d× hashing
    * runs over millions of vocab rows, not trillions of tokens; the
    * result is d·w cells — a broadcastable, mergeable (cell-wise sum)
    * summary. This is the frequency complement of [[kmvDistinct]]:
    * same one-scan shape, O(d·w) total state instead of O(k) per
    * group. */
  def cmsSketch(
      termCounts: DataFrame, termCol: String, cntCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    termCounts
      .select(F.col(cntCol).as("_c"),
        F.explode(F.array((0 until depth).map(i =>
          F.struct(F.lit(i).as("r"),
            cmsBucket(F.col(termCol), i, width).as("b"))): _*)).as("_cell"))
      .select(F.col("_cell.r").as("row"), F.col("_cell.b").as("bucket"),
        F.col("_c"))
      .groupBy("row", "bucket").agg(F.sum("_c").as("total"))

  // ------------------------------------------------- KMV set algebra

  /** Set-operation estimates between two cohorts from their KMV
    * sketches [Beyer et al. 2007]: the union sketch is the k smallest
    * distinct hashes of the merged min-arrays (KMV sketches are
    * mergeable — the property that makes them work distributed), the
    * Jaccard estimator is ρ = |union-sketch hashes present in BOTH
    * cohort sketches| / k, and intersection ≈ ρ · |union|. When the
    * union holds < k hashes the sketches ARE the exact distinct sets
    * and every output is exact.
    *
    * Scale shape: one distinct-hash shuffle + two O(k)-state
    * aggregates; the set algebra runs on a 1-row frame of two k-length
    * arrays (pure metadata). Estimating crawl-overlap between two
    * 100 TB snapshot cohorts costs two scans and k longs of state —
    * never a join of the corpora. */
  def kmvSetOps(
      df: DataFrame, cohortCol: Column, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val mins = df
      .select(cohortCol.cast("int").as("_cohort"),
        Hashing.hash60(F.col(valueCol).cast("string")).as("_h"))
      .groupBy("_cohort")
      .agg(bottomKDistinctLong(F.col("_h"), k).as("_mins"))
    val a = mins.where(F.col("_cohort") === 0).select(F.col("_mins").as("_a"))
    val b = mins.where(F.col("_cohort") === 1).select(F.col("_mins").as("_b"))
    // both sides are <=1 row (one aggregate row per cohort), but only a
    // BROADCAST hint makes that visible to the planner at any corpus
    // size — unhinted, this is a cartesian shuffle (PlanAuditSpec)
    val merged = a.crossJoin(F.broadcast(b)).select(
      F.col("_a"), F.col("_b"),
      F.slice(F.array_sort(F.array_distinct(F.concat(F.col("_a"), F.col("_b")))),
        1, k).as("_u"))
    def est(arr: Column): Column = {
      val n = F.size(arr).cast("long")
      F.round(F.when(n === k,
        F.lit((k - 1).toDouble * MaxHash)
          / F.element_at(arr, k).cast("double"))
        .otherwise(n.cast("double")), 6)
    }
    val shared = F.size(F.filter(F.col("_u"), x =>
      F.array_contains(F.col("_a"), x) && F.array_contains(F.col("_b"), x)))
      .cast("long")
    val uFull = F.size(F.col("_u")) === k
    merged.select(
      F.size(F.col("_a")).cast("long").as("kept_a"),
      F.size(F.col("_b")).cast("long").as("kept_b"),
      est(F.col("_a")).as("est_a"),
      est(F.col("_b")).as("est_b"),
      est(F.col("_u")).as("est_union"),
      shared.as("n_shared"),
      F.round(shared.cast("double")
        / F.when(uFull, F.lit(k.toDouble))
          .otherwise(F.size(F.col("_u")).cast("double")), 6).as("jaccard"),
      F.round(F.when(uFull,
        shared.cast("double") / k * (F.lit((k - 1).toDouble * MaxHash)
          / F.element_at(F.col("_u"), k).cast("double")))
        .otherwise(shared.cast("double")), 6).as("est_intersection"))
  }

  /** Point estimates for `probes`' `termCol` against a (row, bucket,
    * total) sketch. The sketch (d·w rows) broadcasts. LEFT join: a
    * probe hashing into a cell no corpus term touched has an exact
    * count of 0 there, and min-of-rows must see that 0 — an inner join
    * would silently drop (or overestimate) out-of-corpus probes. */
  def cmsEstimate(
      sketch: DataFrame, probes: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame =
    probes
      .select(F.col(termCol),
        F.explode(F.array((0 until depth).map(i =>
          F.struct(F.lit(i).as("row"),
            cmsBucket(F.col(termCol), i, width).as("bucket"))): _*)).as("_cell"))
      .select(F.col(termCol), F.col("_cell.row").as("row"),
        F.col("_cell.bucket").as("bucket"))
      .join(F.broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(termCol)
      .agg(F.min(F.coalesce(F.col("total"), F.lit(0L))).as("est_cnt"))
}
