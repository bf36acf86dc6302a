package graft

import org.apache.spark.sql.{functions => F}

/** H4: bucketed tables co-locate joins — the shuffle that dominates a
  * 100 TB fact⋈fact join disappears when both sides are bucketed on the
  * join key. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") === F.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val expected = li.join(orders, F.col("l_orderkey") === F.col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucket pruning applies for key-equality filters") {
    // the planner auto-disables bucketed scans when no exchange is saved;
    // force it so the filter can prune to 1 of 4 buckets
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val pruned = spark.table("b_orders").filter(F.col("o_orderkey") === 42L)
      val expected = spark.read.parquet(s"$sf/orders.parquet")
        .filter(F.col("o_orderkey") === 42L).count()
      assert(pruned.count() == expected)
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 4"),
        s"no bucket pruning evidence in:\n$scan")
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }
}
