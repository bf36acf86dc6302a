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

  /** @param left    probe side (must contain keyCol and tsCol)
    * @param right   reference side (must contain keyCol, tsCol, payload)
    * @param keyCol  equi-join key (same name both sides)
    * @param tsCol   event-time column (same name both sides)
    * @param payload right-side columns to attach as `asof_<name>`
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lType = StructType(leftCols.map(c => StructField(c, left.schema(c).dataType)))
    val pType = StructType(payload.map(c => StructField(c, right.schema(c).dataType)))

    // tag 0 = right, 1 = left → at equal ts the right row sorts first,
    // giving <= ("backward") semantics
    val rightSide = right.select(
      F.col(keyCol), F.col(tsCol), F.lit(0).as("_tag"),
      F.lit(null).cast(lType).as("_l"),
      F.struct(payload.map(F.col): _*).as("_p"))
    val leftSide = left.select(
      F.col(keyCol), F.col(tsCol), F.lit(1).as("_tag"),
      F.struct(leftCols.map(F.col): _*).as("_l"),
      F.lit(null).cast(pType).as("_p"))

    val w = Window.partitionBy(keyCol).orderBy(F.col(tsCol), F.col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rightSide.unionByName(leftSide)
      .withColumn("_last_p", F.last("_p", ignoreNulls = true).over(w))
      .filter(F.col("_tag") === 1)
      .select(
        leftCols.map(c => F.col(s"_l.$c").as(c)) ++
          payload.map(c => F.col(s"_last_p.$c").as(s"asof_$c")): _*)
  }
}
