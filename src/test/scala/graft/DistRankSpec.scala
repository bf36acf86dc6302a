package graft

import graft.operators.DistRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** [[DistRank]] must be bit-identical to the single-partition window
  * forms it replaces (row_number / ntile over an unpartitioned
  * ORDER BY) — that identity is what lets drift_psi / stream_psi / rfm
  * keep their plain-SQL oracles while losing the global sort. */
class DistRankSpec extends SparkSpec {

  import spark.implicits._

  private def sample = {
    // ties in v (every 7th value collides), unique tiebreak k;
    // 1003 % 5 = 3 exercises the uneven-bucket branch of ntile
    (1L to 1003L).map(k => (k, (k * 37) % 143)).toDF("k", "v")
  }

  test("globalRowNumber equals unpartitioned row_number over a total order") {
    val df = sample
    val expected = df.withColumn("rn",
      F.row_number().over(Window.orderBy("v", "k")).cast("long"))
    val got = DistRank.globalRowNumber(df, "rn", F.col("v"), F.col("k"))
    assert(got.select("k", "rn").except(expected.select("k", "rn")).isEmpty)
    assert(expected.select("k", "rn").except(got.select("k", "rn")).isEmpty)
  }

  test("globalRowNumber handles descending keys") {
    val df = sample
    val expected = df.withColumn("rn",
      F.row_number().over(
        Window.orderBy(F.col("v").desc, F.col("k").asc)).cast("long"))
    val got = DistRank.globalRowNumber(df, "rn",
      F.col("v").desc, F.col("k").asc)
    assert(got.select("k", "rn").except(expected.select("k", "rn")).isEmpty)
    assert(expected.count() == got.count())
  }

  test("ntileExpr matches SQL ntile for every total mod 5 residue") {
    for (n <- Seq(1000L, 1001L, 1002L, 1003L, 1004L, 7L, 3L)) {
      val df = (1L to n).toDF("k")
      val expected = df.withColumn("b",
        F.ntile(5).over(Window.orderBy("k")).cast("long"))
      val got = DistRank.globalRowNumber(df, "_rn", F.col("k"))
        .withColumn("nc", F.lit(n))
        .withColumn("b", DistRank.ntileExpr("_rn", "nc", 5).cast("long"))
      assert(got.select("k", "b").except(expected.select("k", "b")).isEmpty,
        s"n=$n")
      assert(expected.select("k", "b").except(got.select("k", "b")).isEmpty,
        s"n=$n")
    }
  }

  test("no window operator at all in the physical plan") {
    val got = DistRank.globalRowNumber(sample, "rn", F.col("v"), F.col("k"))
    val plan = got.queryExecution.executedPlan.toString()
    assert(!plan.linesIterator.exists(_.trim.startsWith("Window")), plan)
  }

  test("globalCumSum equals unpartitioned running sum") {
    val df = sample.withColumn("w", (F.col("v") % 5) + 1)
    val expected = df.withColumn("cum",
      F.sum("w").over(Window.orderBy("v", "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = DistRank.globalCumSum(df, "w", "cum", F.col("v"), F.col("k"))
    assert(got.select("k", "cum").except(expected.select("k", "cum")).isEmpty)
    assert(expected.select("k", "cum").except(got.select("k", "cum")).isEmpty)
  }
}
