package graft

import org.apache.spark.sql.{functions => F}

/** The from-scratch DataSource V2 ([[graft.sources.SynthDocsProvider]]):
  * pushdown, pruning and parallelism claims asserted on the PHYSICAL
  * plan, not just on row counts. */
class SynthSourceSpec extends SparkSpec {

  private def synth(rows: Long = 1000L, slices: Int = 4) =
    spark.read.format("graft.sources.SynthDocsProvider")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("full scan yields `rows` rows across `slices` partitions") {
    val df = synth()
    assert(df.count() == 1000L)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("range predicates are pushed into the source (never generated)") {
    val df = synth().where(F.col("doc_id") >= 900 && F.col("doc_id") < 950)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SynthDocs[900, 950)"),
      s"expected the source to narrow its range, got:\n$plan")
    assert(df.count() == 50)
    // pushed range predicates are exact: no residual Filter node remains
    assert(!plan.contains("Filter "), s"residual filter survived:\n$plan")
  }

  test("column pruning reaches the reader") {
    val df = synth().select("doc_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=doc_id"), plan)
    assert(!plan.contains("cols=doc_id,text"), plan)
  }

  test("generated text matches the engine's own md5 of the id") {
    val bad = synth(100)
      .where(F.col("text") =!= F.md5(F.col("doc_id").cast("string").cast("binary")))
      .count()
    assert(bad == 0)
  }

  test("contradictory pushed range plans zero partitions") {
    val df = synth().where(F.col("doc_id") >= 800 && F.col("doc_id") < 100)
    assert(df.rdd.getNumPartitions == 0 || df.count() == 0)
  }
}
