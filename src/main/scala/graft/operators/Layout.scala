package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Multi-dimensional data layout for scan pruning.
  *
  * Parquet (and every columnar format) skips row groups via min/max
  * statistics — but sorting on ONE column destroys locality in every
  * other. Z-ordering (Morton interleave) maps two dimensions onto one
  * integer whose contiguous ranges are small rectangles in BOTH dims,
  * so a range-partition + local sort on the z-value gives every file
  * tight min/max on each dimension and point/range predicates on
  * either one prune most files. This is the layout move behind
  * Delta/Iceberg `ZORDER BY`, built here from plain integer
  * expressions (codegen'd, zero shuffle beyond the one
  * `repartitionByRange` the rewrite needs anyway).
  */
object Layout {

  /** Morton z-value of two dimensions reduced to `bits` bits each
    * (pmod keeps them non-negative): bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Disjoint bit positions mean `+` is `|`, and
    * the whole thing is a flat integer expression — whole-stage
    * codegen'd, no UDF. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val aa = F.pmod(a.cast("long"), F.lit(1L << bits))
    val bb = F.pmod(b.cast("long"), F.lit(1L << bits))
    (0 until bits).map { i =>
      F.shiftleft(F.shiftright(aa, i).bitwiseAND(F.lit(1L)), 2 * i) +
        F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Rewrite `df` into z-order on (`a`, `b`): range-partition on the
    * z-value (one shuffle — range boundaries from a driver-side
    * sample, same as any global sort) + sort within partitions, so a
    * subsequent parquet write gets monotone z-ranges per file and
    * tight per-file min/max on BOTH source dimensions. */
  def zOrderBy(df: DataFrame, a: Column, b: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(a, b, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** DuckDB SQL fragment mirroring [[zValue]] for integer expressions
    * `a`, `b` already reduced mod 2^bits. */
  def zValueSql(a: String, b: String, bits: Int): String =
    s"""CAST(list_sum(list_transform(range(0, $bits), i ->
       |  ((($a >> i) & 1) << (2 * i)) + ((($b >> i) & 1) << (2 * i + 1))))
       |  AS BIGINT)""".stripMargin
}
