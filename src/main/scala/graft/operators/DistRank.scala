package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types.LongType

/** Distributed exact global row-number / prefix-sum — the scale-safe
  * replacement for `row_number().over(Window.orderBy(...))` and
  * `sum(w).over(Window.orderBy(...))`, which funnel the whole input
  * through ONE partition (Spark's "No Partition Defined for Window"
  * warning — fine at sf0.1, dead at 100 TB).
  *
  * Shape: range-partition on the sort keys, sort within each shard,
  * then number positionally with `zipWithIndex` over the ONE resulting
  * RDD instance. zipWithIndex runs a small per-partition count job plus
  * the main pass, and both read the SAME shuffle output (the exchange
  * is materialized once, on disk, never recomputed), so the numbering
  * is exact and deterministic.
  *
  * Why the RDD hop instead of a two-branch DataFrame plan (offsets =
  * groupBy(shard) joined back onto the shards): range-exchange
  * boundaries are SAMPLED with a seed derived from the RDD id, and
  * column pruning makes the two branches' exchanges non-identical so
  * exchange reuse does not kick in — each branch re-samples its own
  * boundaries and the shard labels can disagree between the count pass
  * and the rank pass (observed as off-by-one quantiles at sf0.1). A
  * single RDD instance cannot disagree with itself; and even across
  * runs, position in (shard range, intra-shard order) is the total
  * order regardless of where the sampled boundaries fall.
  *
  * The keys should form a total order (append a unique tie-break
  * column) so the rank itself — not just its existence — is
  * deterministic and matches a DuckDB `row_number()` oracle exactly.
  */
object DistRank {

  private def shardsFor(df: DataFrame): Int =
    math.max(8, df.sparkSession.sparkContext.defaultParallelism)

  /** Exact global 1-based row number over `keys` (must be a total
    * order), emitted as long column `out`. */
  def globalRowNumber(df: DataFrame, out: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(shardsFor(df), keys: _*)
      .sortWithinPartitions(keys: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact global running sum of long column `weight` in `keys` order
    * (inclusive of the current row), emitted as long column `out` —
    * the distributed form of `sum(w) OVER (ORDER BY keys ROWS UNBOUNDED
    * PRECEDING)`. Same single-RDD two-job shape as [[globalRowNumber]]:
    * job 1 sums each shard (one long per shard collected), job 2 adds
    * the per-shard offset to the intra-shard running sum. */
  def globalCumSum(df: DataFrame, weight: String, out: String,
      keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(shardsFor(df), keys: _*)
      .sortWithinPartitions(keys: _*)
    val wIdx = sorted.schema.fieldIndex(weight)
    val rdd = sorted.rdd // ONE instance: both jobs reuse its shuffle
    val partSums = rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(wIdx)).sum),
        preservesPartitioning = true)
      .collect() // one long per shard — bounded by partition count
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val withCum = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i)
      it.map { row => cum += row.getLong(wIdx); Row.fromSeq(row.toSeq :+ cum) }
    }
    spark.createDataFrame(withCum, schema)
  }

  /** FUSED form (r15, §2.4): several exact global running sums plus an
    * optional global row number computed in ONE range-partition + sort
    * + two-job pass. Chaining [[globalCumSum]] / [[globalRowNumber]]
    * calls re-range-shuffles, re-sorts and re-crosses the RDD↔DataFrame
    * boundary once per call on identically-ordered data (wasserstein_1
    * paid the pass three times, ks_2sample twice); the fusion computes
    * the same columns — same names, same order, same values, `keys`
    * still a total order — from a single sorted RDD instance. */
  def globalCumSumsRowNumber(df: DataFrame,
      weights: Seq[(String, String)], rowNumOut: Option[String],
      keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(shardsFor(df), keys: _*)
      .sortWithinPartitions(keys: _*)
    val wIdx = weights.map { case (w, _) => sorted.schema.fieldIndex(w) }
      .toArray
    val rdd = sorted.rdd // ONE instance: both jobs reuse its shuffle
    val partStats = rdd
      .mapPartitions({ it =>
        val sums = new Array[Long](wIdx.length)
        var n = 0L
        it.foreach { row =>
          var i = 0
          while (i < wIdx.length) { sums(i) += row.getLong(wIdx(i)); i += 1 }
          n += 1L
        }
        Iterator.single((sums, n))
      }, preservesPartitioning = true)
      .collect() // one (sums, count) per shard — bounded by shard count
    val sumOffsets = partStats.map(_._1)
      .scanLeft(new Array[Long](wIdx.length)) { (acc, s) =>
        Array.tabulate(wIdx.length)(i => acc(i) + s(i))
      }
    val rowOffsets = partStats.map(_._2).scanLeft(0L)(_ + _)
    var schema = sorted.schema
    weights.foreach { case (_, out) =>
      schema = schema.add(out, LongType, nullable = false)
    }
    rowNumOut.foreach { out =>
      schema = schema.add(out, LongType, nullable = false)
    }
    val emitRn = rowNumOut.isDefined
    val withCum = rdd.mapPartitionsWithIndex { (i, it) =>
      val cums = sumOffsets(i).clone()
      var rn = rowOffsets(i)
      it.map { row =>
        val extra = new Array[Any](wIdx.length + (if (emitRn) 1 else 0))
        var j = 0
        while (j < wIdx.length) {
          cums(j) += row.getLong(wIdx(j)); extra(j) = cums(j); j += 1
        }
        if (emitRn) { rn += 1L; extra(wIdx.length) = rn }
        Row.fromSeq(row.toSeq ++ extra)
      }
    }
    spark.createDataFrame(withCum, schema)
  }

  /** Exact SQL `ntile(n)` bucket from a 1-based global rank column and
    * a total-count column, matching the standard semantics: with
    * q = total div n and r = total mod n, the first r buckets hold
    * q+1 rows and the rest hold q. Lets quantile scoring ride on
    * [[globalRowNumber]] instead of an unpartitioned ntile window.
    * (When total < n the ELSE branch would divide by q = 0, but every
    * rank then satisfies the THEN guard, and CASE short-circuits.) */
  def ntileExpr(rankCol: String, totalCol: String, n: Int): Column =
    F.expr(
      s"""CASE WHEN $rankCol <= ($totalCol % $n) * ($totalCol div $n + 1)
         |THEN ($rankCol - 1) div ($totalCol div $n + 1) + 1
         |ELSE ($totalCol % $n) +
         |  ($rankCol - ($totalCol % $n) * ($totalCol div $n + 1) - 1)
         |    div ($totalCol div $n) + 1 END""".stripMargin)
}
