package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.{functions => F}

/** As-of join: for each left row, attach the most recent right row with
  * right.ts <= left.ts within the same key (the time-series join Spark
  * lacks natively).
  *
  * Built by COMPOSITION (the preferred strategy when semantics allow):
  * union both sides tagged, one window pass carrying the latest right
  * payload forward in (ts, tag) order, then keep left rows. One shuffle
  * on the key — same cost as a regular join, no custom physical node
  * needed, and AQE/codegen apply as usual. Equivalent to DuckDB/kdb
  * `ASOF JOIN`.
  */
object AsOfJoin {

  /** @param left      probe side (must contain keyCol and tsCol)
    * @param right     reference side (must contain keyCol, tsCol, payload)
    * @param keyCol    equi-join key (same name both sides)
    * @param tsCol     event-time column (same name both sides)
    * @param payload   right-side columns to attach as `asof_<name>`
    * @param direction "backward" (latest right.ts <= left.ts, default) or
    *                  "forward" (earliest right.ts >= left.ts)
    * @param tieBreakCol right-side column deciding WHICH right row wins
    *                  when several share the same (key, ts) — use a cheap
    *                  id column on wide payloads. Default: the whole
    *                  payload struct (deterministic, but makes every
    *                  payload column a sort key, so all payload types
    *                  must be orderable — no maps).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payload: Seq[String], direction: String = "backward",
      tieBreakCol: Option[String] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    tieBreakCol.foreach(c => require(payload.contains(c),
      s"tieBreakCol '$c' must be one of the payload columns $payload"))
    if (tieBreakCol.isEmpty) payload.foreach { c =>
      val dt = right.schema(c).dataType
      require(
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"as-of payload column '$c' ($dt) is not orderable and cannot " +
          "serve as the duplicate-(key,ts) tie-break; pass tieBreakCol=" +
          "Some(<orderable right-side column>) to break ties explicitly")
    }
    val leftCols = left.columns.toSeq
    val lType = StructType(leftCols.map(c => StructField(c, left.schema(c).dataType)))
    val pType = StructType(payload.map(c => StructField(c, right.schema(c).dataType)))

    // tag 0 = right, 1 = left → at equal ts the right row sorts first,
    // making the bound inclusive in either direction
    val rightSide = right.select(
      F.col(keyCol), F.col(tsCol), F.lit(0).as("_tag"),
      F.lit(null).cast(lType).as("_l"),
      F.struct(payload.map(F.col): _*).as("_p"))
    val leftSide = left.select(
      F.col(keyCol), F.col(tsCol), F.lit(1).as("_tag"),
      F.struct(leftCols.map(F.col): _*).as("_l"),
      F.lit(null).cast(pType).as("_p"))

    val tsOrder =
      if (direction == "backward") F.col(tsCol).asc else F.col(tsCol).desc
    // final tie-break: several right rows at the same (key, ts) would
    // otherwise attach a shuffle-order-dependent payload. An explicit
    // tieBreakCol keeps the sort key cheap on wide payloads.
    val tie = tieBreakCol.map(c => F.col("_p").getField(c))
      .getOrElse(F.col("_p"))
    val w = Window.partitionBy(keyCol).orderBy(tsOrder, F.col("_tag"), tie)
      .rowsBetween(Window.unboundedPreceding, 0)
    rightSide.unionByName(leftSide)
      .withColumn("_last_p", F.last("_p", ignoreNulls = true).over(w))
      .filter(F.col("_tag") === 1)
      .select(
        leftCols.map(c => F.col(s"_l.$c").as(c)) ++
          payload.map(c => F.col(s"_last_p.$c").as(s"asof_$c")): _*)
  }
}
