package graft

import org.apache.spark.sql.{functions => F}

/** The list-building queries must aggregate through the bounded heap,
  * not collect_list: collect_list buffers the WHOLE group in one
  * aggregation state before any slice — a stopword-sized posting list
  * is the corpus in one buffer at 100×. */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("inverted_index plan aggregates via top_k, never collect_list") {
    val q = SparkEntry.queries("inverted_index")(spark, sf)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("top_k"), s"bounded heap expected:\n$plan")
    assert(!plan.contains("collect_list"), s"unbounded buffer present:\n$plan")
  }

  test("agg_collect first_keys via top_k; only the bounded-domain collect_set remains") {
    val q = SparkEntry.queries("agg_collect")(spark, sf)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("top_k"), s"bounded heap expected:\n$plan")
    assert(!plan.contains("collect_list"), s"unbounded buffer present:\n$plan")
  }

  test("bottomKLong emits the k smallest keys ascending") {
    val df = spark.range(1000).select(
      (F.col("id") % 3).as("g"), ((F.col("id") * 37) % 1000).as("v"))
    val got = df.groupBy("g")
      .agg(graft.functions.TopKFunctions.bottomKLong(F.col("v"), 5).as("vs"))
      .as[(Long, Seq[Long])].collect().toMap
    val exp = (0L until 1000L).map(i => (i % 3, (i * 37) % 1000))
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.map(_._2).distinct.sorted.take(5)
      }
    // (v values within a group are distinct here, so heap==sorted-take)
    assert(got == exp)
  }
}
