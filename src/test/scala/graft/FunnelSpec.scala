package graft

import org.apache.spark.sql.{functions => F}

/** Wave-20 invariants: pipeline funnel accounting, duplicate-family
  * size conservation, and the DPP physical-plan claim. */
class FunnelSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("pipeline_funnel stages chain and conserve counts") {
    val rows = q("pipeline_funnel").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_out <= n_in")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
    // consecutive stages chain: next n_in == previous n_out
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) == a.getLong(2))
    }
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    assert(rows.head.getLong(1) == docs.count())
    val distinctTexts =
      docs.select(F.md5(F.col("text"))).distinct().count()
    assert(rows.head.getLong(2) == distinctTexts, "dedup survivors")
  }

  test("dedup_cluster_sizes conserves the labelled population") {
    val sizes = q("dedup_cluster_sizes").collect()
    assert(sizes.nonEmpty)
    sizes.foreach(r => assert(r.getLong(0) >= 2L, "families have >= 2 docs"))
    val labelled = q("dedup_clusters").count()
    assert(sizes.map(r => r.getLong(0) * r.getLong(1)).sum == labelled)
  }

  test("dpp_join's fact scan carries a dynamic pruning filter") {
    val df = q("dpp_join")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery in the fact scan:\n${plan.take(2000)}")
    // and the result is the static-filter answer
    val viaStatic = graft.queries.Tables.t(spark, sf, "orders")
      .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderstatus").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == viaStatic)
  }
}
